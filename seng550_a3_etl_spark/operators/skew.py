"""Skew mitigation for shuffle joins (SURVEY §4 / north-star scale ops).

A shuffle equi-join sends every fact row with the same key to one
reducer; a hot key (one customer with 10^9 orders) turns that reducer
into the job's critical path. ``salted_join`` spreads each key over
``n_salt`` reducers: the fact side gets a per-row salt in [0, n_salt),
the dim side is replicated once per salt value, and the join key becomes
(key, salt). The join RESULT is exactly the plain join — only the
physical row placement changes — so the suite oracle is the unsalted
SQL join.

This is the manual form of what AQE's skew-join optimization
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) does for
sort-merge joins at runtime; the explicit operator covers the cases AQE
does not (broadcast-ineligible dims under hash join, pre-partitioned
writes, deterministic plan shape).

Aggregation skew needs no such operator: hash aggregates partial-combine
map-side, and the skew-safe *distinct* pattern is shown by
``distinct_users_per_type`` (suite/relational.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``fact`` to ``dim`` on equi-keys, spreading each
    fact key across ``n_salt`` reducers. ``how`` may be inner or left
    (fact-preserving): each fact row carries exactly one salt and every
    (key, salt) slice of dim is complete, so match semantics are
    unchanged. Output columns = fact's + dim's non-key columns."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (fact-preserving)")
    if len(fact_keys) != len(dim_keys):
        raise ValueError("key lists must pair up")
    # Any per-row salt preserves the result; xxhash64 over the key set
    # plus a physical row tag spreads rows of one hot key without RNG.
    salt = F.pmod(
        F.xxhash64(*fact_keys, F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salt),
    ).cast("int")
    f = fact.withColumn(_SALT, salt)
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    cond = [
        f[fk] == d[dk] for fk, dk in zip(fact_keys, dim_keys)
    ] + [f[_SALT] == d[_SALT]]
    dim_out = [c for c in dim.columns if c not in set(dim_keys)]
    return f.join(d, cond, how).select(
        *[f[c] for c in fact.columns], *[d[c] for c in dim_out]
    )
