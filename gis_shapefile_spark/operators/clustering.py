"""Grid-based density clustering (DBSCAN on the cell lattice).

Finds spatial hotspots — dense urban clusters, crawl-burst regions, the
skewed cells the partitioner must salt — as connected components of
"core" grid cells (cells holding >= ``min_count`` points, 8-adjacent on
the lattice). This is the classic grid/DBSCAN hybrid (CLIQUE/STING
shape): density estimation is a cell histogram instead of per-point
ε-range queries, which is the only formulation that survives 10^12
points — the point table pays exactly ONE partial-agg shuffle (the same
cost as any keyed count), and every later stage (core filter, adjacency,
label propagation) runs on the BOUNDED occupied-cell table, never on
points.

The reference has no clustering; its spatial index exists to answer
point lookups (``spatial_index.cpp``). This operator exists for the
engine's own scale problem: the fixture's Zipfian urban cluster
(FIXTURES.md §2) is exactly what this surfaces, and the output feeds the
salting/AQE-skew decisions the join layer makes.

Plan shape:
  points --(groupBy cell: 1 shuffle, partial agg)--> hist
  hist --(filter n >= min_count)--> core            [bounded, checkpointed]
  core --(in-plan 8-neighbor explode + pack)--> candidate edges
  candidate edges --(self equi-join on cell id)--> edges
  (core, edges) --> dedup.connected_components      [bounded iterations]

Adjacency is 8-neighborhood on the integer lattice (dx, dy ∈ {-1,0,1}),
computed by demorton → offset → re-pack (``cells.cell_axis_sql`` /
``pack_xy_sql``), all integer SQL inside codegen. Out-of-range neighbor
indices at the grid edge (xi = -1 or 2^res) spread to bit patterns no
real cell at res <= 25 can carry, so they simply never match — there is
deliberately no wraparound (the planar-parity contract, cells.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def _neighbor_offsets_expr() -> str:
    offs = ", ".join(
        f"struct({dx} as dx, {dy} as dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    return f"explode(array({offs}))"


def hotspot_clusters(
    points: DataFrame,
    res: int,
    min_count: int,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Label every core cell with its hotspot cluster.

    Returns (cell BIGINT, n_points BIGINT, cluster BIGINT) — one row per
    core cell (>= ``min_count`` points at ``res``); ``cluster`` is the
    MIN cell id reachable through 8-adjacent core cells (singleton cores
    label themselves), deterministic and engine-portable. Sub-threshold
    cells are noise, excluded entirely (DBSCAN border semantics on the
    grid: a sparse cell between two hotspots does not bridge them).

    ``res`` must be <= 25: the edge-neighbor no-match guarantee above
    needs one spare bit per axis.
    """
    if not 0 <= res <= 25:
        raise ValueError(f"res must be in [0, 25], got {res}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from . import dedup as DD

    cell = F.expr(C.cell_sql(lng_col, lat_col, res, "spark"))
    hist = points.groupBy(cell.alias("cell")).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    # the bounded occupied-cell table is referenced three ways below
    # (nodes, edge-source, edge-target); materialize it once instead of
    # re-running the point-table agg per reference (CLAUDE.md: Catalyst
    # collapses projections — same pattern as dedup_minhash / zonal_stats)
    core = hist.where(F.col("n_points") >= int(min_count)).localCheckpoint(
        eager=True
    )
    ax = core.select(
        "cell",
        F.expr(C.cell_axis_sql("cell", "x", "spark")).alias("_x"),
        F.expr(C.cell_axis_sql("cell", "y", "spark")).alias("_y"),
    )
    nb = ax.select(
        "cell", "_x", "_y", F.expr(_neighbor_offsets_expr()).alias("_o")
    ).select(
        "cell",
        F.expr(
            C.pack_xy_sql("(_x + _o.dx)", "(_y + _o.dy)", res, "spark")
        ).alias("_nb"),
    )
    pairs = (
        nb.join(
            core.select(F.col("cell").alias("_nb")), "_nb"
        )  # neighbor is core too
        .select(
            F.least("cell", "_nb").alias("id_1"),
            F.greatest("cell", "_nb").alias("id_2"),
        )
        .distinct()
    )
    comp = DD.connected_components(
        core.select("cell"), pairs, id_col="cell"
    )
    return core.join(comp, "cell").select(
        "cell", "n_points", F.col("component").alias("cluster")
    )


def hotspot_cluster_sql(
    source_sql: str,
    res: int,
    min_count: int,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> str:
    """DuckDB twin of ``hotspot_clusters`` for oracle checks: cell
    histogram + core filter in the same integer SQL, adjacency as a
    theta join on the demortoned axes (fine on the bounded core set),
    cluster labels as a recursive-CTE reachability closure."""
    cell = C.cell_sql(lng_col, lat_col, res, "duckdb")
    x = C.cell_axis_sql("cell", "x", "duckdb")
    y = C.cell_axis_sql("cell", "y", "duckdb")
    return f"""
        WITH RECURSIVE pts AS ({source_sql}),
        hist AS (
          SELECT {cell} AS cell, count(*)::BIGINT AS n_points
          FROM pts GROUP BY 1
        ),
        core AS (
          SELECT cell, n_points, {x} AS gx, {y} AS gy
          FROM hist WHERE n_points >= {int(min_count)}
        ),
        edges AS (
          SELECT a.cell AS src, b.cell AS dst
          FROM core a JOIN core b
            ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
           AND a.cell <> b.cell
        ),
        reach(node, lbl) AS (
          SELECT cell, cell FROM core
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT c.cell, c.n_points, m.lbl AS cluster
        FROM core c
        JOIN (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node) m
          ON m.node = c.cell
    """
