"""Generic 1-D interval (range) join: points to the intervals containing
them — the numeric-line sibling of the spatial cell join.

Naive formulations are a non-equi theta join (O(n*m) nested loop in most
planners) or a full cross join + filter. This operator bins the number
line at ``bin_width``: intervals explode to the bins they overlap
(interval-side cost, bounded by length/bin_width), points compute ONE
integer bin key in codegen, and Catalyst plans a plain hash equi-join,
refined by the exact containment predicate. Identical machinery to the
spatial cell join (functions/cells.py) in one dimension — same reason it
scales: the big side is never exploded and never leaves the JVM.

Bin width tuning: ~median interval length keeps the explode factor ~2-3x
while the per-bin candidate count stays small; the refine predicate makes
any choice correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    closed: str = "both",
) -> DataFrame:
    """All (point, interval) pairs with point in [lo, hi] (``closed`` =
    'both'|'left'|'right'|'neither'). Interval side explodes to bins via a
    generated sequence; point side is one integer expression."""
    lo_op = ">=" if closed in ("both", "left") else ">"
    hi_op = "<=" if closed in ("both", "right") else "<"
    binned = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    return (
        pts.join(binned, "__bin")
        .where(
            F.expr(f"{point_col} {lo_op} {lo_col}")
            & F.expr(f"{point_col} {hi_op} {hi_col}")
        )
        .drop("__bin")
    )
