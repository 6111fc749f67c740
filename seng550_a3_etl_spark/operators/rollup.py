"""Multi-resolution time rollup (hypertable/continuous-aggregate style).

A time-series store (TimescaleDB hypertable, Druid rollup) maintains the
same aggregate at several granularities — hour for dashboards, day for
reports, month for trends. The reference materializes exactly one grain
(its daily fact table, /root/reference/queries.py:81-91); at 100 TB you
want every grain from ONE pass, not one job per grain.

Spark-first: the truncations are hierarchical (hour ⊂ day ⊂ month), so
``ROLLUP(month, day, hour)`` produces exactly the per-hour, per-day,
per-month, and grand-total groups in a single aggregate — the expansion
happens inside the Expand operator before the one shuffle, and partial
aggregation compresses each grain map-side. N grains cost one extra
Expand row per input row, never N scans or N shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAINS = ("month", "day", "hour")


def time_rollup(
    events: DataFrame,
    ts_col: str,
    aggs: Sequence[Column],
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """One-pass month/day/hour rollup of ``events``.

    Output columns: ``month``, ``day``, ``hour`` (formatted strings,
    NULL where the row aggregates over that grain — e.g. the per-day row
    has month+day set and hour NULL), plus the caller's aggregates. The
    grand-total row has all three NULL. Emitting formatted strings keeps
    the bucket keys engine-portable (DATE/TIMESTAMP round-tripping
    differs between engines; strings never do).

    ``ts_col`` must be non-null: a NULL timestamp would produce NULL
    truncations indistinguishable from the rollup's own subtotal rows —
    filter NULL timestamps upstream (use GROUPING() columns instead if
    the source allows them).
    """
    reserved = set(_GRAINS) & set(events.columns)
    if reserved:
        raise ValueError(
            f"input already has grain column(s) {sorted(reserved)} — "
            f"rename them before time_rollup (output reserves "
            f"{list(_GRAINS)})"
        )
    truncs = [
        F.date_format(F.date_trunc(g, F.col(ts_col)), fmt).alias(g)
        for g in _GRAINS
    ]
    return events.select(*truncs, *events.columns).rollup(*_GRAINS).agg(*aggs)
