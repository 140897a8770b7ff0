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


def checkpointed_batch_formation(
    spark: SparkSession,
    images_parquet: str,
    ckpt_root: str,
    capacity: int = 65536,
) -> tuple[DataFrame, CheckpointTable]:
    """Resumable image training-batch formation: decode-verify ->
    aspect-ratio bucket assignment -> never-overflow per-bucket shard
    packing -> shard manifest — the image-side twin of
    ``checkpointed_corpus_curation``, every stage committing lineage +
    in-flight metrics so a restart resumes exactly where it died.

    Fingerprints are PER-STAGE: the verify/assign stages chain only the
    source, the packing stages add ``capacity`` — so retuning the shard
    size re-packs committed assignments without re-decoding a single
    image (at 10^12 rows the decode pass dominates; invalidating it on a
    packing parameter would be the expensive wrong default).
    """
    from ..operators import arbucket as AR
    from ..operators import multimodal as MM
    from ..operators import splits as SP

    ck = CheckpointTable(spark, ckpt_root)
    fp_src = f"src={images_parquet}|ladder={len(AR.LADDER)}"
    fp_pack = f"{fp_src}|cap={capacity}"

    verified = ck.stage(
        "verified", fp_src,
        lambda: MM.decode_stats(
            spark.read.parquet(images_parquet).withColumn(
                "n_bytes", F.length("bytes").cast("long")
            ),
            carry=("w", "h", "n_bytes"),
            means=False,
        ).where(F.col("phash_ok")),
        metrics={
            "n_images": F.count(F.lit(1)),
            "n_phash_ok": F.sum(F.col("phash_ok").cast("long")),
            "sum_bytes": F.sum("n_bytes"),
        },
    )

    assigned = ck.stage(
        "assigned", fp_src,
        lambda: AR.assign_ar_buckets(verified, carry=("n_bytes",)),
        metrics={
            "n_assigned": F.count(F.lit(1)),
            "n_buckets": F.approx_count_distinct("bucket_id"),
        },
    )

    sharded = ck.stage(
        "sharded", fp_pack,
        lambda: SP.shard_pack(
            assigned,
            size_col="n_bytes",
            order_col="image_id",
            source_col="bucket_id",
            capacity=capacity,
        ),
        metrics={"n_rows": F.count(F.lit(1))},
    )

    manifest = ck.stage(
        "shard_manifest", fp_pack,
        lambda: sharded.groupBy("bucket_id", "pack_block", "shard").agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_bytes").alias("n_bytes"),
        ),
        metrics={"n_shards": F.count(F.lit(1))},
    )
    return manifest, ck
