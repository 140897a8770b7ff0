"""Reference-parity first-hit PIP mode (SURVEY.md §5 parity contract).

The reference's reverse-geocode lookup (``src/spatial/spatial_index.cpp:
356-380``) is ORDER-DEPENDENT: it queries the R-tree with an ε-box of
±1e-4 around the point and returns the FIRST candidate in traversal
order — the exact ``PolygonGeometry::contains`` refinement is commented
out (lines 367-375). The engine's default join replaces that with exact
PIP + ``min(record_number)`` (deterministic, defensible); THIS module is
the promised opt-in engine-compat mode that reproduces the reference
byte-for-byte on multi-candidate boundary points.

Why it distributes: the reference's ``RTree::queryHelper``
(spatial_index.cpp:70-89) is a DFS over a static structure — children are
visited in vector order, leaf entries in insertion order, and pruning
(node-bounds miss, line 72-74) only SKIPS subtrees, never reorders the
survivors; node bounds contain every descendant's bounds, so pruning
never removes a true hit. Therefore the first candidate returned for any
query box is exactly the record with the MINIMUM DFS-leaf-position among
records whose exact bbox intersects the box (closed-boundary test,
geometry.cpp:14-17). That reduces the order-dependent traversal to a
data-parallel plan:

    dfs_rank per record  =  one driver-side emulation of the R-tree build
                            (dimension-scale, computed once, broadcast);
    per point            =  cell equi-join -> bbox⨉ε-box intersect filter
                            -> min_by(record_number, dfs_rank).

The point side is never exploded and never touches Python — same 100-TB
shape as the default join. The emulation below transliterates ONLY the
tree-shape logic needed for ranks (insert/choose-child/split:
spatial_index.cpp:18-62, 151-275; max_entries=16, min-enlargement child
choice with first-wins ties, halving split appended at the parent's end,
root growth) — it runs on the polygon DIMENSION (thousands of rows), not
on data, and exists solely so a user migrating off the reference gets
identical rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C

EPS = 1e-4  # the reference's ε (spatial_index.cpp:360-363)
MAX_ENTRIES = 16  # RTree default (include/gis/spatial_index.h:42)


def _intersects(a, b) -> bool:
    """Closed-boundary bbox intersect (geometry.cpp:14-17): touching counts."""
    return not (b[0] > a[2] or b[2] < a[0] or b[1] > a[3] or b[3] < a[1])


def _union(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def _area(a) -> float:
    return (a[2] - a[0]) * (a[3] - a[1])


class _Node:
    __slots__ = ("is_leaf", "bounds", "children", "data", "parent")

    def __init__(self, is_leaf: bool):
        self.is_leaf = is_leaf
        self.bounds = None  # (minx, miny, maxx, maxy)
        self.children: list[_Node] = []
        self.data: list[int] = []
        self.parent: _Node | None = None


class ReferenceRTree:
    """Shape-faithful emulation of the reference ``RTree`` — parity oracle
    AND rank source. Only build + query order matter; no search perf is
    claimed (the engine never traverses this at query time)."""

    def __init__(self, max_entries: int = MAX_ENTRIES):
        self.max_entries = max_entries
        self.object_bounds: list[tuple] = []
        self.root = _Node(True)

    # -- build (spatial_index.cpp:18-62) ----------------------------------

    def insert(self, bounds: tuple) -> None:
        self.object_bounds.append(bounds)
        self._insert(self.root, bounds, len(self.object_bounds) - 1)

    def _insert(self, node: _Node, bounds: tuple, idx: int) -> None:
        if node.is_leaf:
            node.data.append(idx)
            node.bounds = bounds if len(node.data) == 1 else _union(node.bounds, bounds)
            if len(node.data) > self.max_entries:
                self._split(node)
        else:
            best, best_enl = None, float("inf")
            for ch in node.children:  # strict < keeps the FIRST tied child
                enl = _area(_union(ch.bounds, bounds)) - _area(ch.bounds)
                if enl < best_enl:
                    best_enl, best = enl, ch
            self._insert(best, bounds, idx)
            self._update_bounds(node)

    def _update_bounds(self, node: _Node) -> None:
        if node.is_leaf:
            if node.data:
                b = self.object_bounds[node.data[0]]
                for i in node.data[1:]:
                    b = _union(b, self.object_bounds[i])
                node.bounds = b
        elif node.children:
            b = node.children[0].bounds
            for ch in node.children[1:]:
                b = _union(b, ch.bounds)
            node.bounds = b

    def _split(self, node: _Node) -> None:  # spatial_index.cpp:151-218
        if len(node.data if node.is_leaf else node.children) <= self.max_entries:
            return
        new = _Node(node.is_leaf)
        if node.is_leaf:
            sp = len(node.data) // 2
            new.data = node.data[sp:]
            node.data = node.data[:sp]
        else:
            sp = len(node.children) // 2
            new.children = node.children[sp:]
            for ch in new.children:
                ch.parent = new
            node.children = node.children[:sp]
        self._update_bounds(node)
        self._update_bounds(new)
        if node.parent is None:  # root grows
            new_root = _Node(False)
            new_root.children = [node, new]
            node.parent = new_root
            new.parent = new_root
            self._update_bounds(new_root)
            self.root = new_root
        else:
            parent = node.parent
            new.parent = parent
            parent.children.append(new)  # appended at the END
            self._update_bounds(parent)
            if len(parent.children) > self.max_entries:
                self._split(parent)

    # -- query (spatial_index.cpp:64-89) ----------------------------------

    def query(self, qb: tuple) -> list[int]:
        """Indices in the reference's traversal order."""
        out: list[int] = []

        def rec(node: _Node) -> None:
            if node.bounds is None or not _intersects(node.bounds, qb):
                return
            if node.is_leaf:
                for i in node.data:
                    if _intersects(self.object_bounds[i], qb):
                        out.append(i)
            else:
                for ch in node.children:
                    rec(ch)

        rec(self.root)
        return out

    def first_hit(self, x: float, y: float, eps: float = EPS) -> int | None:
        """``SpatialIndex::pointInPolygon`` emulation: first ε-box candidate
        (spatial_index.cpp:356-380; exact test commented out)."""
        cands = self.query((x - eps, y - eps, x + eps, y + eps))
        return cands[0] if cands else None

    def dfs_leaf_order(self) -> list[int]:
        """Every inserted index in DFS leaf-enumeration order — the global
        order that ``query`` preserves under pruning."""
        out: list[int] = []

        def rec(node: _Node) -> None:
            if node.is_leaf:
                out.extend(node.data)
            else:
                for ch in node.children:
                    rec(ch)

        rec(self.root)
        return out


def build_reference_rtree(features_pdf: pd.DataFrame) -> tuple[ReferenceRTree, list[int]]:
    """Build the emulation in record order over rows with geometry
    (``SpatialIndex::buildIndex`` skips null geometries —
    spatial_index.cpp:295-306). Returns (tree, record_number per inserted
    index)."""
    tree = ReferenceRTree()
    recs: list[int] = []
    for _, row in features_pdf.iterrows():
        xs = row["xs"]
        if xs is None or len(xs) == 0:
            continue  # null geometry never enters the index
        tree.insert(
            (float(row["minx"]), float(row["miny"]),
             float(row["maxx"]), float(row["maxy"]))
        )
        recs.append(int(row["record_number"]))
    return tree, recs


def first_hit_dimension(features_pdf: pd.DataFrame) -> pd.DataFrame:
    """(record_number, dfs_rank, minx, miny, maxx, maxy) — the broadcast
    dimension for the compat join. dfs_rank is the record's position in
    the emulated tree's DFS leaf order."""
    tree, recs = build_reference_rtree(features_pdf)
    order = tree.dfs_leaf_order()
    rank_of_idx = {idx: r for r, idx in enumerate(order)}
    rows = []
    for idx, rec in enumerate(recs):
        b = tree.object_bounds[idx]
        rows.append((rec, rank_of_idx[idx], b[0], b[1], b[2], b[3]))
    return pd.DataFrame(
        rows, columns=["record_number", "dfs_rank", "minx", "miny", "maxx", "maxy"]
    ).astype({"record_number": np.int64, "dfs_rank": np.int64})


def point_in_polygon_join_first_hit(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame,
    res: int = 8,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
    eps: float = EPS,
) -> DataFrame:
    """Engine-compat J1: per point, the record the REFERENCE would return.

    Candidate generation mirrors the default join's scale shape: the
    dimension explodes to cells covering each record's bbox EXPANDED by ε
    (a point whose ε-box intersects the bbox always lies in a covered
    cell), the point side computes ONE cell key inside codegen, and the
    equi-join broadcasts the dimension. The exact ε-box⨉bbox closed
    intersect runs as a column filter, then ``min_by(record_number,
    dfs_rank)`` picks the reference's traversal-first candidate. Points
    with no candidate produce no row (reference returns nullptr).
    """
    dim_pdf = first_hit_dimension(features_pdf)
    cells, recs, ranks, bxs = [], [], [], []
    for t in dim_pdf.itertuples(index=False):
        cover = C.cover_bbox(
            t.minx - eps, t.miny - eps, t.maxx + eps, t.maxy + eps, res
        )
        cells.append(cover)
        recs.append(np.full(len(cover), t.record_number, np.int64))
        ranks.append(np.full(len(cover), t.dfs_rank, np.int64))
        bxs.append(
            np.repeat([[t.minx, t.miny, t.maxx, t.maxy]], len(cover), axis=0)
        )
    if not cells:
        return (
            points.select(F.col(point_id_col))
            .where(F.lit(False))
            .withColumn("record_number", F.lit(None).cast("long"))
        )
    bx = np.concatenate(bxs)
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "cell": np.concatenate(cells),
                "record_number": np.concatenate(recs),
                "dfs_rank": np.concatenate(ranks),
                "minx": bx[:, 0], "miny": bx[:, 1],
                "maxx": bx[:, 2], "maxy": bx[:, 3],
            }
        )
    )
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    j = pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner").where(
        (F.col(lng_col) + eps >= F.col("minx"))
        & (F.col(lng_col) - eps <= F.col("maxx"))
        & (F.col(lat_col) + eps >= F.col("miny"))
        & (F.col(lat_col) - eps <= F.col("maxy"))
    )
    return j.groupBy(point_id_col).agg(
        F.expr("min_by(record_number, dfs_rank)").alias("record_number")
    )
