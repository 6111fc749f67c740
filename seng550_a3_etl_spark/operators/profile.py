"""Single-pass column profiling — the data-quality/stats scan
(ANALYZE-table equivalent) a pipeline runs before trusting a new drop
of data: null rates for constraint checks, distinct counts for join-key
sanity and dictionary-encoding decisions, min/max for range drift.

One aggregate computes every column's statistics in a single scan
(4 expressions per profiled column, all partial+final aggregated — the
shuffle carries one row per partition), then a literal ``stack`` pivots
the single stats row into one row per column. No second scan, no
per-column jobs — at 100 TB a per-column loop would re-read the table
k times; this reads it once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile ``cols``: (column, n_nulls, n_distinct, min_s, max_s),
    min/max rendered as strings so heterogeneous column types share one
    result schema (timestamps are formatted, not str-cast, for a stable
    cross-engine representation)."""
    aggs = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            rendered = lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
        else:
            rendered = lambda x: x.cast("string")  # noqa: E731
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            rendered(F.min(c)).alias(f"__mn_{c}"),
            rendered(F.max(c)).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) "
            "AS (column_name, n_nulls, n_distinct, min_s, max_s)"
        )
    )
