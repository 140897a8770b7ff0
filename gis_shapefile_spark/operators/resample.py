"""Hypertable-style time-series resampling: regular-interval rollup with
gap-fill and carry-forward.

The TimescaleDB `time_bucket_gapfill` / `locf` shape re-expressed as
DataFrame ops: (1) one hour-bucket aggregation (partial map-side combine,
one shuffle), (2) per-key span aggregation (same shuffle key, reused
partitioning), (3) the dense hour grid GENERATED in-executor from each
key's span (``sequence`` + ``explode`` — no shuffle, no driver state;
grid size is span-hours per key, not corpus rows), (4) left join of grid
to buckets on (key, hour) — an equi-join Catalyst plans hash/broadcast,
(5) carry-forward as one ordered window per key (``last`` ignoreNulls).

Values are integerized (cents) before aggregation, so the DuckDB twin
(``range`` + ``last_value IGNORE NULLS``) is bit-identical.

Scale: at 10^12 events the bucket agg dominates (one shuffle); the grid
explode is bounded by keys x span-hours (dimension-scale for bounded
retention), and the window sorts only the filled grid, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR = 3600


def hourly_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key dense hourly series over each key's [min, max] hour span.

    Output: (key, hour_epoch, filled_cents, n_events) — one row per key
    per hour; empty hours carry the last seen hourly sum forward
    (n_events = 0 marks them as filled).
    """
    cents = f"CAST(floor({value_col} * 100) AS BIGINT)"
    hourly = (
        events.select(
            F.col(key_col),
            F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("h"),
            F.expr(cents).alias("c"),
        )
        .groupBy(key_col, "h")
        .agg(F.sum("c").alias("cents"), F.count(F.lit(1)).alias("n_events"))
    )
    span = hourly.groupBy(key_col).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(h0, h1, {HOUR})")).alias("hour_epoch"),
    )
    joined = grid.join(
        hourly.withColumnRenamed("h", "hour_epoch"), [key_col, "hour_epoch"], "left"
    )
    filled = F.expr(
        f"coalesce(last(cents, true) OVER (PARTITION BY {key_col} "
        "ORDER BY hour_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW), CAST(0 AS BIGINT))"
    )
    return joined.select(
        key_col,
        "hour_epoch",
        filled.alias("filled_cents"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )
