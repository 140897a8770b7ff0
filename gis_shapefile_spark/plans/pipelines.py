"""Checkpointed pipeline compositions (north rule: every stage commits
lineage + metrics and the job resumes mid-flight).

The flagship flow mirrors the reference's startup ETL + query loop
(geocoder.cpp:206-221 load -> index -> serve) as resumable batch stages:
ingest -> cell assign -> PIP join -> tile rollup, each checkpointed via
``plans/checkpoint.py`` so a restart recomputes only uncommitted stages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spatial_join as SJ
from ..operators import tiling as TI
from .checkpoint import CheckpointTable


def checkpointed_image_tiling(
    spark: SparkSession,
    images_parquet: str,
    features_pdf: pd.DataFrame,
    ckpt_root: str,
    res: int = 8,
) -> tuple[DataFrame, CheckpointTable]:
    """Resumable image->tile pipeline over the input_hint table.

    Stage fingerprints chain the input path + params, so changing the
    source or resolution invalidates exactly the affected stages.
    Returns (tile rollup DataFrame, checkpoint table with lineage).
    """
    ck = CheckpointTable(spark, ckpt_root)
    fp = f"src={images_parquet}|res={res}|feat={len(features_pdf)}"

    cells = ck.stage(
        "cells",
        fp,
        lambda: TI.assign_cells(
            spark.read.parquet(images_parquet).select(
                "image_id", "phash", "lng", "lat"
            ),
            res,
        ),
    )

    def _join() -> DataFrame:
        j = SJ.point_in_polygon_join(
            spark,
            cells.select(F.col("image_id").alias("point_id"), "lng", "lat"),
            features_pdf,
            res=res,
            point_id_col="point_id",
        ).select(F.col("point_id").alias("image_id"), "record_number")
        return cells.join(j, "image_id", "left")

    enriched = ck.stage("pip_join", fp, _join)

    tiles = ck.stage(
        "tiles",
        fp,
        lambda: enriched.groupBy("record_number", "cell").agg(
            F.count(F.lit(1)).alias("n_images"),
        ),
    )
    return tiles, ck
