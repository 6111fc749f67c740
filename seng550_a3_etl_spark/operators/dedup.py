"""Keyed dedup + conditional upsert (SURVEY.md §2.5 W1/W2).

Re-expresses the reference's PostgreSQL idioms:

- ``SELECT DISTINCT ON (keys) ... ORDER BY keys, modified_dt DESC``
  (/root/reference/queries.py:133,150) → ``latest_wins``.
- ``INSERT ... ON CONFLICT (pk) DO UPDATE ... WHERE target.modified_dt <
  EXCLUDED.modified_dt`` (/root/reference/queries.py:151-160) →
  ``merge_upsert`` — union + window dedup with target precedence on ties,
  which is exactly the strictly-newer guard. A Delta ``MERGE INTO`` is the
  transactional variant; this parquet-only path is idempotent and
  rerun-safe the same way the reference's guard makes its upsert
  (/root/reference/etl.py:317-327) idempotent.

Scale: both operators are one hash shuffle on the natural key; no
collect, no skew beyond the key distribution itself (salt upstream if a
single natural key is hot — not possible here since keys are unique in
the target).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PREC = "__prec"
_RN = "__rn"


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``order_by``.

    ``order_by`` should end with a unique tiebreaker for determinism
    (the reference's DISTINCT ON has the same requirement, implicitly).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """Upsert ``source`` into ``target`` keyed by ``keys``; a source row
    replaces the target row only when strictly newer on ``version_col``.

    On a version tie the target wins — the ``<`` (not ``<=``) guard of the
    reference (/root/reference/queries.py:160). Source rows with no target
    match are inserted.
    """
    u = target.withColumn(_PREC, F.lit(0)).unionByName(
        source.withColumn(_PREC, F.lit(1))
    )
    deduped = latest_wins(
        u, keys, [F.desc(version_col), F.asc(_PREC)]
    )
    return deduped.drop(_PREC)
