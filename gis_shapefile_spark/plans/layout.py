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
