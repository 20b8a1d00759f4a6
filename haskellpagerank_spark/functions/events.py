"""Batch event-log analytics: gap-based sessionization.

Complements the streaming windowed aggregates (streaming/ingest.py) with
the classic batch sessionizer: a user's events belong to one session until
a gap longer than ``gap_s`` seconds appears; session ids are cumulative
gap-break counts over the per-user time order.

Scale shape: one shuffle on user_id (the window partition key), then two
window passes (lag + running sum) inside the same partition ordering —
whole-stage codegen, no Python. Skewed users are bounded by their own
event count; the final per-session agg map-combines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """Assign (session_seq, starting at 1 per user) to every event: a new
    session starts when the gap to the user's previous event exceeds
    ``gap_s`` seconds. Ties in ``ts`` are ordered by event_id for
    determinism. Returns the input columns + session_seq."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev = F.lag(F.col(ts_col)).over(w)
    is_break = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("timestamp").cast("long")
           - prev.cast("timestamp").cast("long") > gap_s),
        F.lit(1)).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Per-session rollup: (user_id, session_seq, n_events, duration_s,
    value_sum) — the standard engagement table derived from the raw log."""
    s = sessionize(events, gap_s=gap_s, user_col=user_col, ts_col=ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col(ts_col).cast("timestamp").cast("long"))
             - F.min(F.col(ts_col).cast("timestamp").cast("long")))
            .alias("duration_s"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
