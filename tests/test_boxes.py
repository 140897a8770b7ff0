"""Cluster-NMS over detection boxes: == python union-find oracle on the
synthetic annotation table, exact-integer IoU edge semantics, and the
documented greedy-vs-cluster divergence case."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gis_shapefile_spark.operators import boxes as BX  # noqa: E402


def _brute_cluster_nms(pdf: pd.DataFrame, num: int, den: int):
    """Union-find + exact integer IoU over all same-(image, class)
    pairs; winner per component by (score desc, box_id)."""
    parent = {int(b): int(b) for b in pdf.box_id}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    rows = list(pdf.itertuples(index=False))
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            if (a.image_id, a.class_id) != (b.image_id, b.class_id):
                continue
            iw = max(0, min(a.x0 + a.w, b.x0 + b.w) - max(a.x0, b.x0))
            ih = max(0, min(a.y0 + a.h, b.y0 + b.h) - max(a.y0, b.y0))
            inter = iw * ih
            un = a.w * a.h + b.w * b.h - inter
            if den * inter >= num * un:
                union(int(a.box_id), int(b.box_id))
    clusters: dict[int, list] = {}
    for r in rows:
        clusters.setdefault(find(int(r.box_id)), []).append(r)
    out = {}
    for cid, members in clusters.items():
        # min-root after path compression IS the min member id
        cid = min(int(m.box_id) for m in members)
        w = sorted(members, key=lambda m: (-int(m.score_u), int(m.box_id)))[0]
        out[int(w.box_id)] = (cid, len(members))
    return out


def _boxes_pdf():
    import numpy as np

    rng = np.random.default_rng(7)
    n = 400
    keys = np.arange(1, n + 1)
    h1 = (keys * 2654435761) % 1000000007
    h2 = (keys * 3266489917) % 998244353
    img = keys >> 2
    return pd.DataFrame(
        dict(
            box_id=keys,
            image_id=img,
            class_id=h1 % 2,
            x0=(img * 37 % 800) + (h1 % 61) - 30,
            y0=(img * 53 % 500) + (h2 % 61) - 30,
            w=120 + (h1 % 100),
            h=90 + (h2 % 80),
            score_u=(h1 + h2) % 1000,
        )
    ).astype("int64")


def test_cluster_nms_matches_bruteforce(spark):
    pdf = _boxes_pdf()
    got = BX.box_cluster_nms(
        spark.createDataFrame(pdf), 1, 2
    ).toPandas()
    exp = _brute_cluster_nms(pdf, 1, 2)
    got_map = {
        int(r.box_id): (int(r.cluster_id), int(r.cluster_sz))
        for r in got.itertuples(index=False)
    }
    assert got_map == exp
    # the fixture actually suppresses something and keeps singletons
    assert len(got) < len(pdf)
    assert any(sz == 1 for (_, sz) in exp.values())
    assert any(sz > 1 for (_, sz) in exp.values())


def test_cluster_nms_transitive_chain_differs_from_greedy(spark):
    """A-B-C chain at IoU threshold 1/3: cluster-NMS keeps only A
    (one component), greedy score-descending NMS would keep A and C.
    Pins the documented semantics choice."""
    pdf = pd.DataFrame(
        dict(
            box_id=[1, 2, 3],
            image_id=[10, 10, 10],
            class_id=[0, 0, 0],
            x0=[0, 50, 100],
            y0=[0, 0, 0],
            w=[100, 100, 100],
            h=[100, 100, 100],
            score_u=[900, 500, 800],
        )
    ).astype("int64")
    got = BX.box_cluster_nms(
        spark.createDataFrame(pdf), 1, 3
    ).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r.box_id), int(r.cluster_id), int(r.cluster_sz)) == (1, 1, 3)
    # IoU(A, C) = 0 < 1/3: greedy would have kept C as well — the edge
    # set itself confirms A-C is NOT an edge while A-B and B-C are
    edges = BX.iou_edges(spark.createDataFrame(pdf), 1, 3).toPandas()
    assert {(int(e.id_1), int(e.id_2)) for e in edges.itertuples(index=False)} \
        == {(1, 2), (2, 3)}


def test_iou_edges_rejects_bad_threshold(spark):
    with pytest.raises(ValueError):
        BX.iou_edges(None, 3, 2)
