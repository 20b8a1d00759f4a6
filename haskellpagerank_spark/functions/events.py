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


def _require(events: DataFrame, cols: list[str], fn: str) -> None:
    missing = [c for c in cols if c not in events.columns]
    if missing:
        raise ValueError(
            f"{fn} needs columns {missing} (have {events.columns}); "
            "pass the *_col parameters for a custom schema")


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id",
               ts_col: str = "ts",
               tiebreak_col: str | None = "event_id") -> DataFrame:
    """Assign (session_seq, starting at 1 per user) to every event: a new
    session starts when the gap to the user's previous event exceeds
    ``gap_s`` seconds. Ties in ``ts`` are ordered by ``tiebreak_col`` for
    determinism (pass None if the schema has no unique event id — then
    equal-timestamp ordering is engine-chosen). Returns the input columns
    + session_seq."""
    _require(events, [user_col, ts_col]
             + ([tiebreak_col] if tiebreak_col else []), "sessionize")
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
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
                  ts_col: str = "ts",
                  tiebreak_col: str | None = "event_id",
                  value_col: str | None = "value") -> DataFrame:
    """Per-session rollup: (user_id, session_seq, n_events, duration_s[,
    value_sum]) — the standard engagement table derived from the raw log.
    ``value_col=None`` skips the value_sum column for schemas without a
    numeric payload."""
    _require(events, [value_col] if value_col else [], "session_stats")
    s = sessionize(events, gap_s=gap_s, user_col=user_col, ts_col=ts_col,
                   tiebreak_col=tiebreak_col)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col(ts_col).cast("timestamp").cast("long"))
         - F.min(F.col(ts_col).cast("timestamp").cast("long")))
        .alias("duration_s"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("value_sum"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)
