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


# ---------------------------------------------------------------------------
# Getis-Ord Gi* hotspot z-scores (spatial autocorrelation statistics)
# ---------------------------------------------------------------------------

def gi_z_u_sql() -> str:
    """The Gi* z-score as ONE SQL expression over exact-BIGINT inputs
    (n_cells, sum_x, sum_xx, nb_sum, nb_cnt) — identical text in both
    dialects, so the IEEE op tree matches bit-for-bit and the
    floor(z * 1e6) integerization is cross-engine deterministic.

    Gi* (Getis & Ord 1992/1995, binary 3x3 weights incl. self):

        z_i = (S_i - xbar * W_i)
              / (s * sqrt((N * W_i - W_i^2) / (N - 1)))

    with S_i = nb_sum (neighborhood count sum), W_i = nb_cnt (occupied
    neighbors incl. self), N = n_cells, xbar and s the frame mean/std.
    NULL when the denominator degenerates (N <= 1, all-equal counts, or
    W_i = N). The tiny-negative-variance guard (greatest with 0) keeps
    the all-equal case NULL instead of NaN in both engines."""
    xbar = "(CAST(sum_x AS DOUBLE) / CAST(n_cells AS DOUBLE))"
    s2 = (
        f"(CAST(sum_xx AS DOUBLE) / CAST(n_cells AS DOUBLE)"
        f" - {xbar} * {xbar})"
    )
    s = f"sqrt(greatest({s2}, CAST(0 AS DOUBLE)))"
    wvar = (
        "((CAST(n_cells AS DOUBLE) * CAST(nb_cnt AS DOUBLE)"
        " - CAST(nb_cnt AS DOUBLE) * CAST(nb_cnt AS DOUBLE))"
        " / CAST(n_cells - 1 AS DOUBLE))"
    )
    den = f"({s} * sqrt(greatest({wvar}, CAST(0 AS DOUBLE))))"
    num = f"(CAST(nb_sum AS DOUBLE) - {xbar} * CAST(nb_cnt AS DOUBLE))"
    return (
        f"CASE WHEN n_cells <= 1 OR {den} <= CAST(0 AS DOUBLE) THEN NULL "
        f"ELSE CAST(floor({num} / {den} * CAST(1000000 AS DOUBLE)) "
        f"AS BIGINT) END"
    )


def getis_ord_gi(
    points: DataFrame,
    res: int,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """Gi* hotspot z-score per occupied cell — the inferential twin of
    ``hotspot_clusters``: instead of a binary core threshold, every
    cell gets the classical Getis-Ord statistic ("is this cell's 3x3
    neighborhood count-sum high RELATIVE to the frame, and by how many
    standard errors"), the hot-spot-analysis tool every desktop GIS
    ships. Positive gi_u ~ clustering of high counts, negative ~ cold
    spots; |z| >= 1.96e6 (integerized) is the usual 95% call.

    Frame choice (documented): the statistic is computed over the
    OCCUPIED cells (the data-defined tessellation), not the enclosing
    canvas — empty cells are unobserved support, not zeros. The oracle
    recomputes the same frame.

    Scale shape: the point table pays its ONE partial-agg histogram
    shuffle; the 3x3 neighbor join (demorton -> offset -> re-pack, same
    integer codegen as hotspot_clusters), the single-row frame stats,
    and the z projection all run on the BOUNDED occupied-cell table.
    The frame-stats row broadcasts; nothing driver-side.

    Output: (cell, n_points, nb_sum, nb_cnt, gi_u) — the exact integer
    inputs plus the integerized z, so an oracle mismatch localizes.
    """
    if not 0 <= res <= 25:
        raise ValueError(f"res must be in [0, 25], got {res}")
    cell = F.expr(C.cell_sql(lng_col, lat_col, res, "spark"))
    hist = (
        points.groupBy(cell.alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .localCheckpoint(eager=True)  # referenced 3x below (CLAUDE.md)
    )
    ax = hist.select(
        "cell", "n_points",
        F.expr(C.cell_axis_sql("cell", "x", "spark")).alias("_x"),
        F.expr(C.cell_axis_sql("cell", "y", "spark")).alias("_y"),
    )
    offs = ", ".join(
        f"struct({dx} as dx, {dy} as dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    nb = ax.select(
        "cell",
        F.expr(f"explode(array({offs}))").alias("_o"),
        "_x", "_y",
    ).select(
        "cell",
        F.expr(
            C.pack_xy_sql("(_x + _o.dx)", "(_y + _o.dy)", res, "spark")
        ).alias("_nb"),
    )
    nbagg = (
        nb.join(
            hist.select(
                F.col("cell").alias("_nb"), F.col("n_points").alias("_nn")
            ),
            "_nb",
        )
        .groupBy("cell")
        .agg(
            F.sum("_nn").alias("nb_sum"),
            F.count(F.lit(1)).alias("nb_cnt"),
        )
    )
    glob = hist.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_points").alias("sum_x"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("sum_xx"),
    )
    return (
        hist.join(nbagg, "cell")
        .crossJoin(F.broadcast(glob))
        .selectExpr(
            "cell", "n_points", "nb_sum",
            "CAST(nb_cnt AS BIGINT) AS nb_cnt",
            f"{gi_z_u_sql()} AS gi_u",
        )
    )


def getis_ord_sql(
    source_sql: str,
    res: int,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> str:
    """DuckDB twin of ``getis_ord_gi``: identical integer cell SQL,
    3x3 neighborhood as a theta join on the demortoned axes (bounded
    occupied-cell set), identical z expression text."""
    cell = C.cell_sql(lng_col, lat_col, res, "duckdb")
    x = C.cell_axis_sql("cell", "x", "duckdb")
    y = C.cell_axis_sql("cell", "y", "duckdb")
    return f"""
        WITH pts AS ({source_sql}),
        hist AS (
          SELECT {cell} AS cell, count(*)::BIGINT AS n_points
          FROM pts GROUP BY 1
        ),
        axed AS (
          SELECT cell, n_points, {x} AS gx, {y} AS gy FROM hist
        ),
        nbagg AS (
          SELECT a.cell,
                 sum(b.n_points)::BIGINT AS nb_sum,
                 count(*)::BIGINT AS nb_cnt
          FROM axed a JOIN axed b
            ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
          GROUP BY a.cell
        ),
        frame AS (
          SELECT count(*)::BIGINT AS n_cells,
                 sum(n_points)::BIGINT AS sum_x,
                 sum(n_points * n_points)::BIGINT AS sum_xx
          FROM hist
        )
        SELECT h.cell, h.n_points, nb.nb_sum, nb.nb_cnt,
               {gi_z_u_sql()} AS gi_u
        FROM hist h
        JOIN nbagg nb ON nb.cell = h.cell
        CROSS JOIN frame
    """
