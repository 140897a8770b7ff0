"""Cell-partitioned storage layout for point/image tables.

The scale story for repeated spatial queries over the same corpus: lay the
table out on disk partitioned by a COARSE parent cell (directory-level
hive partitioning), so

* any query scoped to a region prunes partitions at the source
  (``PartitionFilters`` in the scan — zero bytes read outside the region);
* a downstream fine-res cell join shuffles only within surviving
  partitions, and AQE coalesces the post-prune plan;
* partition count stays bounded (4^parent_res directories), while file
  sizes stay healthy because fine cells roll up into their parents.

This is the Parquet-directory equivalent of bucketing the Iceberg table by
cell prefix (the sandbox has no Iceberg runtime — SURVEY §7); a real
deployment swaps ``partitionBy`` for Iceberg partition transforms with the
same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C


def write_cell_partitioned(
    points: DataFrame,
    path: str,
    res: int,
    parent_res: int = 4,
    lng_col: str = "lng",
    lat_col: str = "lat",
    mode: str = "overwrite",
) -> None:
    """Write points with a fine ``cell`` column, hive-partitioned by the
    coarse ``pcell`` parent directory key."""
    (
        points.withColumn("cell", C.cell_col(lng_col, lat_col, res))
        .withColumn("pcell", C.parent_col(F.col("cell"), res, parent_res))
        .write.mode(mode)
        .partitionBy("pcell")
        .parquet(path)
    )


def read_cells_pruned(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float],
    parent_res: int = 4,
) -> DataFrame:
    """Read only the partitions whose parent cell intersects ``bbox``.

    The IN-list on the partition column becomes a source-level
    PartitionFilter — directories outside the region are never opened.
    """
    minx, miny, maxx, maxy = bbox
    pcells = [int(c) for c in C.cover_bbox(minx, miny, maxx, maxy, parent_res)]
    return spark.read.parquet(path).where(F.col("pcell").isin(pcells))


def write_bucketed(
    df,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and sorted) by ``bucket_col``.

    Two tables bucketed the same way equi-join WITHOUT any exchange —
    the co-located join the task brief calls for: at 10^12 rows, joining
    points to a same-bucketed enrichment table (or self-joining across
    snapshots) skips the dominant shuffle entirely (plan-asserted in
    tests). ``n_buckets`` should be a multiple of the executor count so
    every core owns whole buckets.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col).sortBy(
        bucket_col
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_col(
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    res: int = 16,
):
    """Z-order (morton-interleaved) sort key over two numeric columns,
    normalized to the given value ranges — the generic data-skipping
    clustering key (Delta OPTIMIZE ZORDER BY / Iceberg sort-order
    shape), built from the same bit-interleave SQL as the spatial cell
    index but over ARBITRARY numeric columns."""
    x0, x1 = x_range
    y0, y1 = y_range
    if not (x1 > x0 and y1 > y0):
        raise ValueError("ranges must be non-degenerate (hi > lo)")
    xi = C.axis_index_sql(x_col, -x0, x1 - x0, res, "spark")
    yi = C.axis_index_sql(y_col, -y0, y1 - y0, res, "spark")
    return F.expr(C.pack_xy_sql(xi, yi, res, "spark"))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
    res: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ORDER-clustered on (x_col, y_col): rows are
    range-partitioned + sorted by the interleaved-bit morton key before
    the parquet write, so each file/row-group's min-max stats span a
    small rectangle of the 2-D value space instead of the whole domain —
    parquet row-group skipping (and Spark's scan-level min-max pruning)
    then prunes selective predicates on EITHER column at the source.
    This is the lakehouse data-skipping layout (Delta's OPTIMIZE ZORDER
    BY, Iceberg's sort orders) expressed with the engine's own morton
    machinery; measured row-group-overlap evidence in
    ``tests/test_zorder_layout.py``.

    Value ranges default to one measured min/max aggregate over the
    input (derive-the-knob-from-data); pass them explicitly to skip the
    pass at corpus scale. Rows outside an explicit range still land in
    the edge cells (``axis_index_sql`` clamps) — correctness never
    depends on the ranges, only skipping effectiveness does.
    """
    if x_range is None or y_range is None:
        row = df.agg(
            F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
        ).first()
        x_range = x_range or (float(row[0]), float(row[1]))
        y_range = y_range or (float(row[2]), float(row[3]))
    z = zorder_col(x_col, y_col, x_range, y_range, res).alias("__z")
    out = df.select("*", z).repartitionByRange(
        *( [num_files] if num_files else [] ), F.col("__z")
    ).sortWithinPartitions("__z").drop("__z")
    out.write.mode(mode).parquet(path)


# ---------------------------------------------------------------------------
# Hilbert-curve clustered writes
# ---------------------------------------------------------------------------

def hilbert_d_numpy(xi, yi, res: int):
    """Vectorized Hilbert index (xy -> d) at ``res`` bits/axis — the
    classical Warren/Wikipedia rotate-and-accumulate, each of the
    ``res`` iterations vectorized over the whole array. Unit-step
    property (|Δx|+|Δy| = 1 between consecutive d) pinned by pytest."""
    import numpy as np

    x = np.asarray(xi, dtype=np.int64).copy()
    y = np.asarray(yi, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (res - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d


def write_hilbert(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
    res: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """``write_zordered``'s Hilbert-curve sibling: rows cluster along
    the Hilbert space-filling curve instead of the morton Z. Hilbert
    never takes the Z curve's long diagonal jumps (consecutive indices
    are always grid NEIGHBORS — the unit-step property), so file-level
    min-max rectangles are tighter on average and box queries overlap
    fewer files; Z remains the pure-codegen default (its interleave is
    a handful of shifts in SQL), Hilbert is the opt-in for layouts
    rewritten rarely and scanned selectively forever — the OPTIMIZE-
    style maintenance trade.

    The Hilbert key is inherently sequential per bit level (each level
    conditionally rotates the frame for all levels below), so a SQL
    formulation would nest ``res`` CASE rotations — the Catalyst
    projection-collapse blowup documented in CLAUDE.md. The key
    therefore computes in ONE Arrow-batched pandas_udf pass at write
    time (vectorized numpy, ~res iterations over the batch), which is
    the documented Python-boundary budget for a maintenance-path
    operator: query paths stay zero-Python, and the written layout is
    plain parquet any engine scans.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if x_range is None or y_range is None:
        row = df.agg(
            F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
        ).first()
        x_range = x_range or (float(row[0]), float(row[1]))
        y_range = y_range or (float(row[2]), float(row[3]))
    x0, x1 = x_range
    y0, y1 = y_range
    if not (x1 > x0 and y1 > y0):
        raise ValueError("ranges must be non-degenerate (hi > lo)")
    n = 1 << res

    def _hkey(xs, ys):
        import numpy as np

        xi = np.clip(
            ((xs.values - x0) / (x1 - x0) * n).astype(np.int64), 0, n - 1
        )
        yi = np.clip(
            ((ys.values - y0) / (y1 - y0) * n).astype(np.int64), 0, n - 1
        )
        return pd.Series(hilbert_d_numpy(xi, yi, res))

    # explicit annotations: the module's `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf cannot
    # resolve for a function defined in this scope
    _hkey.__annotations__ = {
        "xs": pd.Series, "ys": pd.Series, "return": pd.Series,
    }
    hkey = pandas_udf(_hkey, "long")

    out = (
        df.select("*", hkey(F.col(x_col), F.col(y_col)).alias("__h"))
        .repartitionByRange(
            *([num_files] if num_files else []), F.col("__h")
        )
        .sortWithinPartitions("__h")
        .drop("__h")
    )
    out.write.mode(mode).parquet(path)
