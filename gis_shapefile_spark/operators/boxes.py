"""Bounding-box operators (object-detection dataset curation).

A detection-annotated image corpus at 10^12 images carries O(10) boxes
per image; the curation primitives are IoU-based: find duplicate /
redundant annotations (crowd-sourced labels, merged datasets, ensemble
pseudo-labels) and keep one winner per overlapping cluster — NMS
re-expressed relationally. The reference has no raster/annotation
surface at all (its geometry stops at shapefile polygons,
``src/shapefile_reader.cpp``); this is an engine addition in the image
axis of the graft, built from the same exact-integer join discipline as
the spatial layer.

Scale shape: boxes co-locate by ``image_id`` — ONE shuffle on the image
key, after which the pairwise IoU join is a per-image K x K fan-out
(K = boxes/image, bounded by the annotation pipeline, ~10-100) that
never leaves the partition, and the suppression-cluster labeling runs
on the bounded EDGE table (pairs above the IoU threshold), not the box
table. No cross-image work anywhere; no skew (K is bounded by
construction).

Exactness: box geometry is integer pixels, so intersection and union
areas are exact BIGINTs and the IoU-threshold test ``num * inter >=
den * union`` is pure integer arithmetic — no division, no floats, no
cross-engine hashing hazard. IoU itself is only ever emitted as the
exact (inter_area, union_area) pair.

Cluster-NMS semantics (documented difference from greedy NMS): boxes
whose pairwise IoU clears the threshold form connected components
(transitive closure), and the top-scoring box per component survives.
Greedy score-descending NMS can keep MORE boxes (a suppressed box does
not suppress its own neighbors); the clustering variant is the one
that parallelizes — it needs no sequential scan over the score order —
and is the standard distributed/embedded re-formulation (e.g.
"Cluster-NMS", Zheng et al. 2020). The pytest pins both: == python
cluster-NMS oracle, and a documented case where greedy differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "iou_exprs_sql",
    "iou_edges",
    "box_cluster_nms",
]


def iou_exprs_sql(a: str, b: str) -> tuple[str, str]:
    """(inter_area, union_area) SQL between boxes ``a`` and ``b`` (each
    a table alias with x0, y0, w, h integer-pixel columns) — exact
    BIGINTs, identical text in both dialects."""
    ix = (
        f"greatest(CAST(0 AS BIGINT), "
        f"least({a}.x0 + {a}.w, {b}.x0 + {b}.w)"
        f" - greatest({a}.x0, {b}.x0))"
    )
    iy = (
        f"greatest(CAST(0 AS BIGINT), "
        f"least({a}.y0 + {a}.h, {b}.y0 + {b}.h)"
        f" - greatest({a}.y0, {b}.y0))"
    )
    inter = f"({ix} * {iy})"
    union = f"({a}.w * {a}.h + {b}.w * {b}.h - {ix} * {iy})"
    return inter, union


def iou_edges(
    boxes: DataFrame,
    iou_num: int,
    iou_den: int,
    group_cols: tuple[str, ...] = ("image_id", "class_id"),
    id_col: str = "box_id",
) -> DataFrame:
    """All box pairs within a group whose IoU >= iou_num/iou_den —
    the suppression-edge table. Exact integer test: ``iou_den * inter
    >= iou_num * union`` (areas < ~2^40 for any real image, so the
    products sit far inside int64).

    Output: (id_1, id_2, inter_area, union_area) with id_1 < id_2.
    """
    if not (0 < iou_num <= iou_den):
        raise ValueError(
            f"need 0 < iou_num <= iou_den, got {iou_num}/{iou_den}"
        )
    cols = [*group_cols, id_col, "x0", "y0", "w", "h"]
    a = boxes.select(*cols)
    b = boxes.select(*cols)
    for c in (id_col, "x0", "y0", "w", "h"):
        b = b.withColumnRenamed(c, f"_b_{c}")
    pairs = (
        a.join(b, list(group_cols))
        .where(F.col(id_col) < F.col(f"_b_{id_col}"))
        .selectExpr(
            f"{id_col} AS id_1",
            f"_b_{id_col} AS id_2",
            *_renamed_iou_exprs(),
        )
    )
    return pairs.where(
        F.expr(f"{iou_den} * inter_area >= {iou_num} * union_area")
    )


def _renamed_iou_exprs() -> list[str]:
    """The iou_areas_sql fragments rewritten for the self-join's
    renamed right side (prefix-free left, ``_b_``-prefixed right)."""
    ix = (
        "greatest(CAST(0 AS BIGINT), "
        "least(x0 + w, _b_x0 + _b_w) - greatest(x0, _b_x0))"
    )
    iy = (
        "greatest(CAST(0 AS BIGINT), "
        "least(y0 + h, _b_y0 + _b_h) - greatest(y0, _b_y0))"
    )
    return [
        f"({ix} * {iy}) AS inter_area",
        f"(w * h + _b_w * _b_h - {ix} * {iy}) AS union_area",
    ]


def box_cluster_nms(
    boxes: DataFrame,
    iou_num: int,
    iou_den: int,
    group_cols: tuple[str, ...] = ("image_id", "class_id"),
    id_col: str = "box_id",
    score_col: str = "score_u",
) -> DataFrame:
    """Cluster-NMS: suppression components over the IoU edge graph, one
    surviving box (max score, id tie-break) per component. Singleton
    boxes survive trivially (components include every node).

    Output: one row per SURVIVING box — (*group_cols, box_id, score_u,
    cluster_id, cluster_sz) where cluster_id is the component's minimum
    box id (deterministic) and cluster_sz the number of boxes it
    suppressed + 1.
    """
    from . import dedup as DD

    edges = iou_edges(boxes, iou_num, iou_den, group_cols, id_col)
    comp = DD.connected_components(
        boxes.select(F.col(id_col)), edges.select("id_1", "id_2"),
        id_col=id_col,
    )
    # comp: (<id_col>, component); component = min box id reachable
    labeled = boxes.join(
        comp.withColumnRenamed("component", "cluster_id"), id_col
    )
    win = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    szw = Window.partitionBy("cluster_id")
    return (
        labeled.withColumn("_rk", F.row_number().over(win))
        .withColumn("cluster_sz", F.count("*").over(szw))
        .where(F.col("_rk") == 1)
        .select(
            *group_cols, id_col, score_col, "cluster_id",
            F.col("cluster_sz").cast("long").alias("cluster_sz"),
        )
    )
