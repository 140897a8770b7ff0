"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row with right.ts <=
left.ts within the same key group (the "backward" as-of of time-series
stores). The composition is pure DataFrame algebra — no per-row Python,
no range explosion:

1. tag both sides and union on (keys, ts, payload-struct);
2. one window ``last(right_payload, ignoreNulls=True)`` ordered by
   ``(ts, is_left)`` carries the latest right payload forward — right
   rows sort BEFORE left rows at equal ts, so ties match (same-instant
   right row is visible), exactly DuckDB/kdb ``ASOF JOIN`` semantics;
3. filter back to left rows.

Cost: ONE shuffle on the key columns + one sort — the same price as a
regular join, independent of how many right rows each left row skips
over. A range-join formulation (l.ts BETWEEN r.ts AND r.ts+h) explodes;
a per-key ``collect_list`` blows memory on hot keys; this does neither,
which is why it survives 10^12-row event tables.

Determinism: ties among right rows at identical (key, ts) are broken by
``seq_col`` descending before the union (exactly one survivor), so the
result is engine-reproducible — the DuckDB oracle (native ASOF JOIN over
the same deduped right side) value-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right ``value_cols`` with
    ``right[on] <= left[on]`` per ``by`` group (null when none exists).

    ``seq_col`` (unique per right row, e.g. an event id) breaks ties among
    right rows sharing (by, on) — highest wins, deterministically.
    """
    by = by or []
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on and c != seq_col
    ]

    r = right
    if seq_col is not None:
        w_dedup = Window.partitionBy(*by, on).orderBy(F.desc(seq_col))
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    payload = F.struct(*[F.col(c) for c in value_cols]).alias("__r")
    r_tagged = r.select(
        *[F.col(c) for c in by], F.col(on), F.lit(0).alias("__is_left"), payload
    )
    l_tagged = left.select(
        "*", F.lit(1).alias("__is_left"), F.lit(None).cast(
            r_tagged.schema["__r"].dataType
        ).alias("__r"),
    )
    # align columns: left keeps all its columns; right contributes only
    # (by, on, tag, payload) — missing left columns become nulls
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(*left.columns, "__is_left", "__r")
    l_tagged = l_tagged.select(*left.columns, "__is_left", "__r")

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__carry", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__is_left") == 1).drop("__is_left", "__r")
    for c in value_cols:
        out = out.withColumn(f"r_{c}", F.col("__carry").getField(c))
    return out.drop("__carry")
