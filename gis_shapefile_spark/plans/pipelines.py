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


def checkpointed_corpus_curation(
    spark: SparkSession,
    docs_parquet: str,
    ckpt_root: str,
    min_quality_u: int = 350_000,
    lang: str = "en",
    jaccard_threshold: float = 0.5,
    split_fractions: dict[str, float] | None = None,
) -> tuple[DataFrame, CheckpointTable]:
    """The full training-corpus curation flow as resumable manifest stages:

    score (quality + lang-ID, Observation metrics) -> filter -> near-dup
    candidate pairs -> connected components -> canonical dedup (keep the
    component minimum) -> leakage-safe train/val/test split.

    Every stage commits lineage + in-flight metrics; a restart (or a
    re-run with identical inputs/params) short-circuits every committed
    stage via its fingerprint, so the pipeline resumes exactly where it
    died. Returns (curated corpus with split labels, checkpoint table).
    """
    from ..functions import text_analysis as TA
    from ..operators import dedup as DD
    from ..operators import splits as SP

    ck = CheckpointTable(spark, ckpt_root)
    fracs = split_fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    fp = (f"src={docs_parquet}|q={min_quality_u}|lang={lang}"
          f"|j={jaccard_threshold}|split={sorted(fracs.items())}")

    scored = ck.stage(
        "scored", fp,
        lambda: spark.read.parquet(docs_parquet).select(
            "doc_id", "text",
            TA.quality_score_col("text").alias("quality_u"),
            TA.lang_id_col("text").alias("lang_pred"),
        ),
        metrics={
            "n_docs": F.count(F.lit(1)),
            "n_lang_match": F.sum((F.col("lang_pred") == lang).cast("long")),
        },
    )

    kept = ck.stage(
        "filtered", fp,
        lambda: scored.where(
            (F.col("quality_u") >= min_quality_u)
            & (F.col("lang_pred") == lang)
        ),
        metrics={"n_kept": F.count(F.lit(1))},
    )

    pairs = ck.stage(
        "neardup_pairs", fp,
        lambda: DD.near_duplicate_pairs(kept, threshold=jaccard_threshold),
        metrics={"n_pairs": F.count(F.lit(1))},
    )

    comp = ck.stage(
        "components", fp,
        # STAR variant as the scale default (VERDICT r1 #6): large-star/
        # small-star converges in O(log^2 n) rounds on ANY graph diameter,
        # while plain label propagation is O(diameter) — a 100-TB dup
        # graph (chained boilerplate edits) is not guaranteed shallow.
        # Both variants are proven equal on high-diameter graphs in
        # tests/test_pipeline_ops.py.
        lambda: DD.connected_components_star(kept.select("doc_id"), pairs),
    )

    canon = ck.stage(
        "canonical", fp,
        lambda: kept.join(comp, "doc_id").where(
            F.col("doc_id") == F.col("component")
        ).drop("component"),
        metrics={"n_canonical": F.count(F.lit(1))},
    )

    curated = ck.stage(
        "split", fp,
        lambda: SP.hash_split(canon, "doc_id", fracs),
        metrics={"n_final": F.count(F.lit(1))},
    )
    return curated, ck
