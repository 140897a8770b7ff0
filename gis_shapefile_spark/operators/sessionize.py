"""Gap-based sessionization over the events stream/table.

The reference has no temporal operators (it is request/response —
SURVEY.md §2.8); a training-data pipeline needs sessions for user-journey
features and leakage-safe splits. Classic two-window formulation, fully
JVM-side:

1. ``lag(ts)`` per user (one shuffle on ``user_id``) flags rows starting a
   new session when the inactivity gap reaches ``gap_s`` (split iff
   ``diff >= gap_s`` — identical boundary semantics to Spark's built-in
   ``session_window``);
2. a running ``sum`` of those flags over the SAME window partitioning
   numbers the sessions 1..n per user — Catalyst reuses the single sort,
   so the whole operator is one exchange + one sort despite two windows.

Determinism: ordering ties break on ``event_id`` (unique), timestamps
compare as integer epoch seconds — identical in the DuckDB oracle.

Scale: state per user is one row (the lag); the shuffle is the unavoidable
per-user colocation. Skewed power-users are bounded by AQE skew handling;
the downstream per-session aggregate combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Append ``session_idx`` (1-based per user) to every event row."""
    epoch = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) >= gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats_native(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Spark's built-in ``session_window`` twin of ``session_stats``.

    Same gap semantics (a session extends while consecutive events are
    within ``gap_s``); this is the form that also runs under Structured
    Streaming with a watermark. ``session_stats`` numbers sessions
    1..n per user via windows; this one identifies them by start epoch —
    tests assert the two partitions of events are identical.
    """
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_s} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            user_col,
            F.unix_timestamp(F.col("sw.start")).alias("start_epoch"),
            "n_events",
            "sum_value_c",
        )
    )


def session_stats(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per (user, session): count, span, integerized value sum."""
    s = sessionize(events, gap_s, user_col, ts_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(epoch).alias("start_epoch"),
            F.max(epoch).alias("end_epoch"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
    )
