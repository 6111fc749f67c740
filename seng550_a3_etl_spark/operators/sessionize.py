"""Sessionization — gap-based session assignment over an event stream.

Not in the reference's surface (its events are daily-keyed facts,
/root/reference/queries.py:81-91); this is the standard extension a
training-data / clickstream pipeline needs. Batch form: two analytic
windows (lag to flag gap starts, running sum to number sessions) — one
shuffle on the user key, no UDF. The streaming form
(streaming/jobs.py:sessionize_stream) holds one open session per key in
applyInPandasWithState state and must agree with this operator on every
closed session — asserted in tests.

Semantics: events sort by (ts, tiebreak) per user; an event starts a new
session iff ts > previous ts + gap (a gap of exactly ``gap`` stays in
the session). Session_seq is 1-based per user.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Tag each event with its session_seq (1-based per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak)
    prev = F.lag(ts_col).over(w)
    new_s = (
        prev.isNull() | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}"))
    ).cast("long")
    seq = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_seq", seq)


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: Column | str,
    gap: str = "30 minutes",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregate: start/end, event count, summed value."""
    tagged = sessionize(events, user_col, ts_col, gap, tiebreak)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("total_value"),
    )
