"""Embedding similarity search (ANN) + embedding-based near-dup detection.

The reference's closest notion is the kNN lookup over feature bbox centers
(``src/spatial/spatial_index.cpp:91-121``, a brute-force scan + sort per
query); here the same top-k pattern runs over an ``array<float>`` embedding
column, with a hyperplane-LSH bucketed variant as the 10^12-row scale path.

All kernels are JVM-side SQL expressions (``zip_with`` + ``aggregate``), no
Python on the hot path. Cross-engine determinism for the DuckDB oracle:

* per-dimension products are integerized (``floor(x_i * y_i * 1e12)``) and
  summed as exact integers — order-independent, identical in both engines;
* cosine = (dot_u/1e12) / (sqrt(nx_u/1e12) * sqrt(ny_u/1e12)) is a fixed
  IEEE expression tree on identical doubles, then integerized to
  ``cos_u = floor(cos * 1e9)`` before any ranking, so ties break on ids.

Scale notes: brute-force top-k broadcasts the (small) query set and scans
the corpus once — one shuffle (the per-query window). The LSH variant
buckets both sides by a hyperplane sign signature, turning the cross
product into an equi-join; recall is tunable via signature bits / probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCALE_DOT = 1_000_000_000_000  # 1e12: per-term integerization
SCALE_COS = 1_000_000_000  # 1e9: final cosine integerization


# ---------------------------------------------------------------------------
# dual-dialect kernels (Spark expression == DuckDB oracle expression)
# ---------------------------------------------------------------------------

def dot_u_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Exact integer dot product: sum_i floor(a_i * b_i * 1e12) as BIGINT."""
    term = (
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {SCALE_DOT}) AS BIGINT)"
    )
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> {term}), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    term_d = (
        f"CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"* {SCALE_DOT}) AS BIGINT)"
    )
    return (
        f"CAST(coalesce(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {term_d})), 0) AS BIGINT)"
    )


def norm_u_sql(a: str, dialect: str = "spark") -> str:
    return dot_u_sql(a, a, dialect)


def cosine_u_sql(dot_u: str, n1_u: str, n2_u: str) -> str:
    """cos_u = floor(1e9 * dot / (|x| * |y|)) from the integerized pieces.

    Identical text in both dialects (sqrt/division/floor are IEEE-exact on
    identical inputs). Zero-norm vectors score 0.
    """
    return (
        f"(CASE WHEN {n1_u} <= 0 OR {n2_u} <= 0 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(floor({SCALE_COS} * ((CAST({dot_u} AS DOUBLE) / {SCALE_DOT}.0) / "
        f"(sqrt(CAST({n1_u} AS DOUBLE) / {SCALE_DOT}.0) * "
        f"sqrt(CAST({n2_u} AS DOUBLE) / {SCALE_DOT}.0)))) AS BIGINT) END)"
    )


def quantize_stats_sqls(vec: str, dialect: str = "spark", mx_col: str | None = None) -> dict:
    """Symmetric int8 scalar quantization of an embedding array, as
    dual-dialect SQL expressions over per-vector stats (the
    compression step a training-data pipeline applies before shipping
    10^12 embeddings; 4x smaller than float32, error bounded by mx/127).

    q_i = floor(127 * x_i / mx) with mx = max |x_i| (guarded >= 1e-12);
    outputs are order-free integers so both engines hash identically:

    * ``q_sum`` / ``q_min`` / ``q_max`` — BIGINT stats of the quantized
      codes (the codes themselves, not a float derivative);
    * ``err_u`` — L1 reconstruction error vs dequantized bucket centers
      ``(q_i + 0.5) * mx / 127``, integerized PER ELEMENT (floor(|.|*1e9))
      before the integer sum, so accumulation order cannot perturb it.

    Every float op is an identical IEEE-double expression tree in both
    dialects; all-zero vectors quantize to all-zero codes with err from
    the 0.5-bucket offset (deterministic).

    ``mx_col``: name of a pre-projected max-|x| column (the returned
    ``"mx"`` expression). Without it the O(d) max-abs subexpression is
    inlined into every per-element lambda — Catalyst does not CSE across
    higher-order-function lambda boundaries, so each stat degrades to
    O(d^2) per vector. Project ``mx`` once (a CTE in the DuckDB twin)
    and pass its column name for the scale path; the referenced value is
    the same IEEE tree, so oracle parity is unaffected.
    """
    tf = "transform" if dialect == "spark" else "list_transform"
    amax = "array_max" if dialect == "spark" else "list_max"
    amin = "array_min" if dialect == "spark" else "list_min"
    if dialect == "spark":
        asum = "aggregate({a}, CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    else:
        asum = "CAST(coalesce(list_sum({a}), 0) AS BIGINT)"
    mx_expr = f"greatest({amax}({tf}({vec}, a -> abs(CAST(a AS DOUBLE)))), 1e-12)"
    mx = mx_col if mx_col is not None else mx_expr
    q = f"CAST(floor(127.0 * CAST(x AS DOUBLE) / {mx}) AS BIGINT)"
    qarr = f"{tf}({vec}, x -> {q})"
    err_elem = (
        f"CAST(floor(abs(CAST(x AS DOUBLE) - (CAST({q} AS DOUBLE) + 0.5) "
        f"* {mx} / 127.0) * 1e9) AS BIGINT)"
    )
    errarr = f"{tf}({vec}, x -> {err_elem})"
    return {
        "mx": mx_expr,
        "q_sum": asum.format(a=qarr),
        "q_min": f"{amin}({qarr})",
        "q_max": f"{amax}({qarr})",
        "err_u": asum.format(a=errarr),
    }


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(norm_u_sql(vec_col, "spark")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every corpus row.

    The query side is broadcast (small by construction); scoring pipelines
    with the corpus scan; the only shuffle is the per-query top-k window.
    Output: (query_id, rank, vec_id, cos_u), rank 1..k by (cos desc, id).
    """
    q = F.broadcast(
        _with_norm(
            queries.select(
                F.col(query_id_col), F.col(vec_col).alias("_qvec")
            ),
            "_qvec",
            "_qn",
        )
    )
    c = _with_norm(corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "_cn")
    scored = c.crossJoin(q).withColumn(
        "cos_u",
        F.expr(
            cosine_u_sql(dot_u_sql(vec_col, "_qvec", "spark"), "_cn", "_qn")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_u"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_u")
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Recall@k of the IVF approximation against exact brute force —
    the nprobe/centroid tuning surface every ANN deployment needs
    (recall is a MEASURED property of data + quantizer, never assumed).

    Output: one row per query, (query_id, n_hit BIGINT, k BIGINT) where
    n_hit = |IVF top-k ∩ brute top-k|; aggregate n_hit/k over queries
    for the corpus-level recall curve (run at several nprobe values).
    Both arms share the deterministic tie-break (cos desc, id), so
    recall is exact and engine-portable, not sample-noisy.

    Cost shape: the brute arm is the ground-truth pass you run on a
    query SAMPLE (queries broadcast, corpus scanned once); the IVF arm
    is the production path. The intersection is a (query, id) equi-join
    on two k·|queries|-row frames — negligible. At 10^12 rows you
    evaluate on thousands of sampled queries, never the full query log.
    """
    brute = cosine_topk(
        corpus, queries, k, id_col, vec_col, query_id_col
    ).select(query_id_col, id_col)
    approx = ivf_topk(
        corpus, queries, k, centroids, nprobe, id_col, vec_col, query_id_col
    ).select(query_id_col, id_col)
    hits = brute.join(approx, [query_id_col, id_col]).groupBy(
        query_id_col
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    # left join against the query set so zero-recall queries still report
    qs = queries.select(query_id_col).distinct()
    return qs.join(hits, query_id_col, "left").select(
        query_id_col,
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.lit(int(k)).cast("long").alias("k"),
    )


def hyperplane_signature_sql(
    vec: str, planes: np.ndarray, dialect: str = "spark"
) -> str:
    """Sign-of-dot LSH signature: bit p set iff dot(vec, plane_p) > 0.

    ``planes`` is a (n_planes, dim) float matrix embedded as SQL literals
    (deterministic — same constants in engine and oracle). The dot here is
    a plain double sum with a fixed left-to-right expression order.
    """
    bits = []
    for p, plane in enumerate(planes):
        terms = " + ".join(
            f"CAST({vec}[{i if dialect == 'spark' else i + 1}] AS DOUBLE) * ({w!r})"
            for i, w in enumerate(plane.tolist())
        )
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST((" + " + ".join(bits) + ") AS BIGINT)"


def make_planes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplanes, rounded so SQL literals are exact."""
    rng = np.random.RandomState(seed)
    return np.round(rng.standard_normal((n_planes, dim)), 6)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 10,
) -> DataFrame:
    """Scale-path ANN: hyperplane-LSH bucket equi-join + exact re-rank.

    Both sides get a ``n_planes``-bit sign signature; candidates are rows
    sharing the query's bucket (approximate — recall grows with fewer bits
    or multi-probe). At 10^12 rows the bucket join replaces the cross
    product; the window only ranks O(bucket) candidates per query.
    """
    planes = make_planes(dim, n_planes)
    sig = hyperplane_signature_sql(vec_col, planes, "spark")
    c = _with_norm(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "_cn"
    ).withColumn("_bucket", F.expr(sig))
    qsig = hyperplane_signature_sql("_qvec", planes, "spark")
    q = F.broadcast(
        _with_norm(
            queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
            "_qvec",
            "_qn",
        ).withColumn("_bucket", F.expr(qsig))
    )
    scored = c.join(q, "_bucket").withColumn(
        "cos_u",
        F.expr(
            cosine_u_sql(dot_u_sql(vec_col, "_qvec", "spark"), "_cn", "_qn")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_u"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_u")
    )


def cosine_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    use_lsh: bool = True,
) -> DataFrame:
    """All pairs (id_1 < id_2) with cosine >= threshold.

    With ``use_lsh`` the self-join runs per LSH bucket (near-identical
    vectors share all sign bits with high probability); without, it is the
    exact O(n^2) verify (test/oracle path only). Output includes cos_u.
    """
    c = _with_norm(corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "_n")
    if use_lsh:
        planes = make_planes(dim, n_planes)
        c = c.withColumn(
            "_bucket", F.expr(hyperplane_signature_sql(vec_col, planes, "spark"))
        )
        join_cond = ["_bucket"]
        a = c.alias("a")
        b = c.select(
            F.col("_bucket"),
            F.col(id_col).alias("_id2"),
            F.col(vec_col).alias("_v2"),
            F.col("_n").alias("_n2"),
        ).alias("b")
        pairs = a.join(b, join_cond).where(F.col(id_col) < F.col("_id2"))
    else:
        b = c.select(
            F.col(id_col).alias("_id2"),
            F.col(vec_col).alias("_v2"),
            F.col("_n").alias("_n2"),
        )
        pairs = c.crossJoin(b).where(F.col(id_col) < F.col("_id2"))
    out = pairs.withColumn(
        "cos_u",
        F.expr(cosine_u_sql(dot_u_sql(vec_col, "_v2", "spark"), "_n", "_n2")),
    )
    return out.where(
        F.col("cos_u") >= int(threshold * SCALE_COS)
    ).select(
        F.col(id_col).alias("id_1"), F.col("_id2").alias("id_2"), "cos_u"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> bucket equi-join -> re-rank
# ---------------------------------------------------------------------------

def make_centroids(dim: int, n_centroids: int = 8, seed: int = 11) -> np.ndarray:
    """Deterministic coarse-quantizer centroids (seeded Gaussian, rounded so
    SQL literals are exact in both engines). Used by the oracle-checked
    driver query; data-trained centroids come from ``kmeans_fit``."""
    rng = np.random.RandomState(seed)
    return np.round(rng.standard_normal((n_centroids, dim)) * 0.5, 6)


def kmeans_fit(
    vectors: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Driver-side deterministic Lloyd k-means over a (sampled) vector matrix.

    At 10^12 rows the sample is a hash-filtered ~10^4-row pull — the coarse
    quantizer is dimension-scale state, like the polygon-cell index. The
    result rounds to 6 decimals so centroid literals are engine-exact.
    """
    rng = np.random.RandomState(seed)
    x = vectors.astype(np.float64)
    cent = x[rng.choice(len(x), n_centroids, replace=False)].copy()
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 via one matmul per iter: the
    # broadcasted (n, C, dim) difference tensor is ~270 MB at n=8192,
    # C=64 and this sandbox faults first-touch pages ~25x slower than
    # warm access — the naive form measured 17 s where this runs <0.5 s
    x_sq = (x * x).sum(axis=1)[:, None]
    for _ in range(iters):
        d = x_sq - 2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return np.round(cent, 6)


def centroid_dist_sql(vec: str, centroid: np.ndarray, dialect: str = "spark") -> str:
    """Squared L2 distance to one centroid as a fixed left-to-right sum —
    identical IEEE expression tree in both dialects (1-based in DuckDB)."""
    base = 0 if dialect == "spark" else 1
    terms = " + ".join(
        f"(CAST({vec}[{i + base}] AS DOUBLE) - ({w!r})) * "
        f"(CAST({vec}[{i + base}] AS DOUBLE) - ({w!r}))"
        for i, w in enumerate(centroid.tolist())
    )
    return f"({terms})"


def argmin_case_sql(dist_cols: list[str]) -> str:
    """Earliest-index argmin over precomputed distance columns (ties to the
    lower index; identical text in both dialects)."""
    whens = []
    k = len(dist_cols)
    for i in range(k - 1):
        cond = " AND ".join(f"{dist_cols[i]} <= {dist_cols[j]}" for j in range(i + 1, k))
        whens.append(f"WHEN {cond} THEN {i}")
    return "(CASE " + " ".join(whens) + f" ELSE {k - 1} END)"


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append ``_bucket`` = nearest-centroid index (pure JVM expressions —
    the distances pipeline with the scan inside codegen)."""
    k = len(centroids)
    for i, c in enumerate(centroids):
        df = df.withColumn(f"_d{i}", F.expr(centroid_dist_sql(vec_col, c, "spark")))
    df = df.withColumn(
        "_bucket", F.expr(argmin_case_sql([f"_d{i}" for i in range(k)]))
    )
    return df.drop(*[f"_d{i}" for i in range(k)])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: corpus rows bucket by nearest centroid; each query probes its
    ``nprobe`` nearest buckets; exact integerized cosine re-ranks candidates.

    At 10^12 rows this replaces the brute cross product with a bucket
    equi-join scanning ~nprobe/n_centroids of the corpus per query — and the
    corpus can be written bucket-partitioned so probes prune at the source.
    ``nprobe == len(centroids)`` degrades exactly to brute force (tested).
    """
    n_cent = len(centroids)
    c = ivf_assign(
        _with_norm(corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "_cn"),
        centroids, vec_col,
    )
    q = _with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
        "_qvec", "_qn",
    )
    for i, cen in enumerate(centroids):
        q = q.withColumn(f"_d{i}", F.expr(centroid_dist_sql("_qvec", cen, "spark")))
    probe_arr = F.array(
        *[
            F.struct(F.lit(i).alias("bucket"), F.col(f"_d{i}").alias("pdist"))
            for i in range(n_cent)
        ]
    )
    pw = Window.partitionBy(query_id_col).orderBy("pdist", "_bucket")
    probes = (
        q.withColumn("_p", F.explode(probe_arr))
        .select(query_id_col, "_qvec", "_qn", F.col("_p.bucket").alias("_bucket"),
                F.col("_p.pdist").alias("pdist"))
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= nprobe)
        .drop("_pr", "pdist")
    )
    scored = c.join(F.broadcast(probes), "_bucket").withColumn(
        "cos_u",
        F.expr(cosine_u_sql(dot_u_sql(vec_col, "_qvec", "spark"), "_cn", "_qn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_u"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_u")
    )


# ---------------------------------------------------------------------------
# IVF as a persisted index (the 10^12-row production shape)
# ---------------------------------------------------------------------------

def ivf_assign_batch(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Arrow-batched nearest-centroid assignment (numpy matmul) — the
    index-BUILD path for large centroid counts, where the expression-tree
    assignment (``ivf_assign``) outgrows whole-stage codegen (the argmin
    CASE is O(C^2) comparisons). Vectorized per Arrow batch, no per-row
    Python; ties break to the lowest centroid index like
    ``argmin_case_sql`` (np.argmin keeps the first minimum).

    Appends ``bucket`` (int). Build-time only — queries keep using the
    dual-dialect expressions for oracle parity.
    """
    from pyspark.sql import types as T

    cent = np.asarray(centroids, np.float64)
    c2 = (cent ** 2).sum(axis=1)
    # fresh StructType — StructType.add would MUTATE the input frame's
    # cached schema object (see CLAUDE.md)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("bucket", T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (emb ** 2).sum(axis=1)[:, None] - 2.0 * (emb @ cent.T) + c2[None, :]
            pdf = pdf.copy()
            pdf["bucket"] = d2.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


def ivf_write_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> None:
    """One-time IVF index build: assign buckets, precompute norms, write
    BUCKET-PARTITIONED parquet. This is the amortization that makes IVF
    pay off — ``ivf_topk`` re-derives the assignment inside every query
    plan (fine for oracle checks, assignment-bound at scale), while the
    indexed layout pays assignment once and lets every query's probe set
    prune partitions at the source.

    ``carry_cols`` stores metadata columns (lang, quality decile, source,
    license flag) alongside each vector, making the index FILTERABLE:
    ``ivf_topk_indexed(where=...)`` pushes predicates on these columns
    into the pruned parquet scan (row-group stats + column pruning),
    which is how metadata-filtered ANN avoids a corpus join at query
    time.

    Rows are clustered by bucket before the partitioned write: without it
    every write task emits a file into every bucket directory (tasks ×
    buckets tiny files — measured 3970 files for 64 buckets); clustered,
    each bucket is a handful of scan-sized files."""
    cols = [F.col(id_col), F.col(vec_col), *(F.col(c) for c in carry_cols)]
    assigned = ivf_assign_batch(
        _with_norm(corpus.select(*cols), vec_col, "_cn"),
        centroids,
        vec_col,
    )
    assigned.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(path)


def ivf_index_append(
    spark,
    index_path: str,
    batch: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> None:
    """O(batch) incremental maintenance of a bucket-partitioned IVF index.

    ``carry_cols`` must match the set the index was built with
    (``ivf_write_index``) — schema-divergent appends would union-read
    with nulled metadata and silently drop rows from filtered queries.

    A crawl batch of new vectors is assigned to its nearest centroids
    (the same Arrow-batched ``ivf_assign_batch`` pipeline the full build
    uses) and APPENDED to the partitioned layout: only the touched
    bucket directories gain files, every existing file is untouched, and
    nothing in the job is proportional to the corpus already indexed —
    the index twin of ``tiling.tile_pyramid_delta``'s churn-bounded
    maintenance. At 10^12 rows the alternative (rebuild via
    ``ivf_write_index``) re-assigns and re-writes the whole corpus for a
    1% batch.

    The coarse quantizer (``centroids``) must be the one the index was
    built with — appending under a different quantizer silently corrupts
    probe pruning, so callers version centroids WITH the index (the
    bench writes them next to the parquet). Centroid drift is handled
    the way IVF systems do: periodic re-train + full rebuild, not
    per-batch re-centering.

    Replays are the caller's concern: an append is not idempotent, so a
    resumable pipeline guards it with the journal-marker pattern
    (``plans.checkpoint``) exactly like any other sink."""
    cols = [F.col(id_col), F.col(vec_col), *(F.col(c) for c in carry_cols)]
    assigned = ivf_assign_batch(
        _with_norm(batch.select(*cols), vec_col, "_cn"),
        centroids,
        vec_col,
    )
    # batch-scale shuffle on bucket (<= C partitions of output files);
    # append touches only the bucket dirs present in the batch
    assigned.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
        "append"
    ).parquet(index_path)


def _compact_move(src: str, dst: str) -> None:
    """One journaled file move (seam for crash-injection tests)."""
    import os

    os.replace(src, dst)


def recover_ivf_compact(index_root: str) -> bool:
    """Complete a crashed ``ivf_compact_index`` commit by re-applying its
    intent journal. Idempotent: moves whose staged file is gone were
    already applied; deletes of already-removed files are skipped.
    Invoked automatically at the start of the next compaction. Returns
    True when a journal was found and cleared."""
    import json
    import os
    import shutil

    journal = os.path.join(index_root, "._compact_commit.json")
    if not os.path.exists(journal):
        return False
    with open(journal) as fh:
        plan = json.load(fh)
    for src, dst in plan["moves"]:
        if os.path.exists(src):
            _compact_move(src, dst)
    for src in plan["deletes"]:
        if os.path.exists(src):
            os.remove(src)
    shutil.rmtree(plan["staging"], ignore_errors=True)
    os.remove(journal)
    return True


def ivf_compact_index(
    spark,
    index_root: str,
    max_files_per_bucket: int = 4,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact fragmented IVF index buckets (the small-files maintenance
    pass for the append paths).

    ``ivf_index_append`` and ``streaming_ivf_sink`` each land a few files
    per touched bucket per batch; after thousands of crawl batches a hot
    bucket is thousands of small files and every probe pays their open
    cost. This pass rewrites only buckets holding more than
    ``max_files_per_bucket`` data files into ``ceil(bytes/target_bytes)``
    scan-sized files — bucket-bounded work, untouched buckets are never
    read (the compaction twin of ``CheckpointTable.compact``).

    Works on both index layouts: the flat build (``bucket=<b>/``) and
    the streaming two-level layout (``batch=<id>/bucket=<b>/``), where
    compacted output lands under a NEGATIVE synthetic batch id (stream
    batch ids are non-negative, so the ``batch`` partition column stays
    an integer and future appends can never collide) and the drained
    batch directories are kept as empty replay markers — the streaming
    sink's exactly-once check is ``batch=<id>`` existence, which must
    survive compaction.

    Commit protocol (crash-safe, same shape as the partitioned MERGE):
    compacted files are staged DURABLY first, then an intent journal
    records every (staged -> destination) move and every source-file
    delete, then the plan is applied. A crash mid-apply is completed by
    ``recover_ivf_compact`` — re-invoked automatically at the start of
    the next compaction — so no committed row is ever lost and transient
    duplicates exist only inside a crashed window that recovery clears.
    Single-writer/quiescent, like every maintenance op in this layer.

    Returns ``{bucket: {"files_before": n, "files_after": m}}`` for the
    buckets rewritten."""
    import json
    import math
    import os
    import uuid

    recover_ivf_compact(index_root)

    by_bucket: dict[int, list[str]] = {}
    for dirpath, _dirs, files in os.walk(index_root):
        base = os.path.basename(dirpath)
        if not base.startswith("bucket="):
            continue
        b = int(base.split("=", 1)[1])
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                by_bucket.setdefault(b, []).append(os.path.join(dirpath, f))
    todo = {
        b: sorted(fs)
        for b, fs in by_bucket.items()
        if len(fs) > max_files_per_bucket
    }
    if not todo:
        return {}

    layered = any(
        d.startswith("batch=") for d in os.listdir(index_root)
        if os.path.isdir(os.path.join(index_root, d))
    )
    if layered:
        existing = [
            int(d.split("=", 1)[1])
            for d in os.listdir(index_root)
            if d.startswith("batch=")
        ]
        compact_batch = min(0, min(existing, default=0)) - 1
        dest_root = os.path.join(index_root, f"batch={compact_batch}")
    else:
        dest_root = index_root

    staging = os.path.join(index_root, f".compact-staging-{uuid.uuid4().hex}")
    moves: list[tuple[str, str]] = []
    deletes: list[str] = []
    stats = {}
    for b, fs in todo.items():
        total = sum(os.path.getsize(f) for f in fs)
        n_out = max(1, math.ceil(total / target_bytes))
        stage_dir = os.path.join(staging, f"bucket={b}")
        # data files carry only the data columns (bucket/batch are
        # directory-encoded), so a direct multi-file read rewrites them
        # without re-deriving anything
        spark.read.parquet(*fs).coalesce(n_out).write.mode(
            "overwrite"
        ).parquet(stage_dir)
        dest_dir = os.path.join(dest_root, f"bucket={b}")
        os.makedirs(dest_dir, exist_ok=True)
        staged = sorted(
            f for f in os.listdir(stage_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for f in staged:
            moves.append(
                (
                    os.path.join(stage_dir, f),
                    os.path.join(dest_dir, f"compact-{uuid.uuid4().hex[:8]}-{f}"),
                )
            )
        deletes.extend(fs)
        stats[b] = {"files_before": len(fs), "files_after": len(staged)}

    journal = os.path.join(index_root, "._compact_commit.json")
    tmp = journal + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"staging": staging, "moves": moves, "deletes": deletes}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, journal)

    for src, dst in moves:
        _compact_move(src, dst)
    for src in deletes:
        os.remove(src)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    os.remove(journal)
    return stats


def _probe_table_pdf(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    vec_col: str,
    query_id_col: str,
):
    """Driver-side probe computation: (query_id, bucket, _qvec, _qn) rows.

    The query batch is dimension-scale by contract (it broadcasts), so
    collecting it is the same class of driver state as the polygon-cell
    index or the kmeans sample. Doing the C centroid distances in numpy
    keeps the C expression trees OUT of the query plan entirely — the
    expression formulation (one withColumn per centroid, as ``ivf_topk``
    uses for its 8-centroid oracle twin) costs O(C^2) Catalyst analysis
    and multi-MB task binaries at C=64 (measured: minutes of planning for
    a sub-second scan). Arithmetic matches the SQL text exactly:
    left-to-right (x-c)^2 accumulation for probe ranking (ties to the
    lower bucket) and sum(floor(x*x*1e12)) for the integerized norm.
    """
    import pandas as pd

    cent = np.asarray(centroids, np.float64)
    collected = queries.select(query_id_col, vec_col).collect()
    rows = []
    if collected:
        vmat = np.stack([np.asarray(r[vec_col], np.float64) for r in collected])
        # Vectorized over (Q, C) but accumulated LEFT-TO-RIGHT over the
        # dimension axis: dmat += t*t is elementwise, so each (q, c) cell
        # sees the exact scalar sequence d = d + t*t the SQL text
        # evaluates — numpy's own sum/einsum use pairwise summation and
        # would drift by ulps from the codegen'd expression (parity
        # pinned by test_ivf_indexed_matches_expression).
        dmat = np.zeros((vmat.shape[0], len(cent)), np.float64)
        for j in range(vmat.shape[1]):
            t = vmat[:, j, None] - cent[None, :, j]
            dmat += t * t
        qns = (
            np.floor(vmat * vmat * float(SCALE_DOT)).astype(np.int64).sum(axis=1)
        )
        # probe ranking ties to the lower bucket index (stable argsort on
        # the (dist, bucket) key — bucket order IS numpy's tie order here)
        order_all = np.argsort(dmat, axis=1, kind="stable")[:, :nprobe]
        for qi, r in enumerate(collected):
            # plain-float list, NOT numpy scalars: the non-Arrow
            # createDataFrame path (_inferSchemaFromList) cannot infer a
            # type for list[np.float64] cells and raises
            # CANNOT_INFER_TYPE_FOR_FIELD — bit the round-4 driver gate,
            # whose session runs with Arrow conversion disabled.
            v = [float(x) for x in vmat[qi]]
            qn = int(qns[qi])
            for b in order_all[qi]:
                rows.append((r[query_id_col], int(b), v, qn))
    return pd.DataFrame(rows, columns=[query_id_col, "bucket", "_qvec", "_qn"])


def _probe_schema(queries: DataFrame, query_id_col: str) -> T.StructType:
    """Explicit schema for the probe table (environment-independent:
    never rely on pandas->Spark inference, which differs between the
    Arrow and non-Arrow conversion paths)."""
    qid_type = queries.schema[query_id_col].dataType
    return T.StructType(
        [
            T.StructField(query_id_col, qid_type),
            T.StructField("bucket", T.LongType()),
            T.StructField("_qvec", T.ArrayType(T.DoubleType())),
            T.StructField("_qn", T.LongType()),
        ]
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    where: str | None = None,
) -> DataFrame:
    """IVF ANN over a prebuilt bucket-partitioned index (``ivf_write_index``).

    The probe table (query x nprobe nearest buckets, numpy on the
    dimension-scale query batch — see ``_probe_table_pdf``) broadcasts,
    and its bucket set becomes a STATIC partition filter on the
    partitioned index read, so only ~nprobe/C of the corpus files are
    READ — scan reduction at the source, not post-scan filtering. Exact
    integerized cosine re-ranks candidates; output matches ``ivf_topk``
    with the same centroids/nprobe (tested).

    ``where`` — metadata-filtered ANN: a SQL predicate over the index's
    ``carry_cols`` (e.g. ``"label % 3 = 1"``), applied BEFORE the bucket
    join so Catalyst pushes it into the pruned parquet scan (shows up in
    ``PushedFilters`` alongside the bucket ``PartitionFilters``; both
    reductions happen at the source). Top-k then ranks only rows
    passing the predicate — the "nearest SAFE/en/high-quality images"
    query every curation pipeline runs, with no corpus re-join."""
    probes_pdf = _probe_table_pdf(queries, centroids, nprobe, vec_col, query_id_col)
    assigned = spark.read.parquet(index_path)
    if where is not None:
        assigned = assigned.where(F.expr(where))
    if len(probes_pdf) == 0:
        return (
            assigned.select(
                F.lit(None).cast("long").alias(query_id_col),
                F.lit(0).alias("rank"),
                F.col(id_col),
                F.lit(0).cast("long").alias("cos_u"),
            ).where(F.lit(False))
        )
    probes = spark.createDataFrame(probes_pdf, schema=_probe_schema(queries, query_id_col))
    buckets = sorted(set(probes_pdf["bucket"].tolist()))
    scored = (
        assigned.where(F.col("bucket").isin(buckets))  # partition pruning
        .join(F.broadcast(probes), "bucket")
        .withColumn(
            "cos_u",
            F.expr(cosine_u_sql(dot_u_sql(vec_col, "_qvec", "spark"), "_cn", "_qn")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_u"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_u")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the 10^12-row memory-side companion to IVF
# ---------------------------------------------------------------------------
#
# IVF prunes WHICH rows are scanned; PQ shrinks WHAT a scan reads: each
# embedding compresses to M small integer codes (one per dimension
# subspace), and query scoring reads ONLY the codes via asymmetric
# distance computation (ADC) — the query builds one M x K lookup table
# of subspace distances, and a corpus row's approximate distance is M
# table lookups + M-1 adds. At 64 dims / float32 that is 256 bytes ->
# M=4 bytes per vector (64x), which is the difference between an
# embedding table that fits executor memory at 10^12 rows and one that
# does not. Reference parity note: the reference has no ANN at all
# (its nearest-feature lookup is a brute scan, spatial_index.cpp:91-121);
# PQ extends this engine's similarity family (brute / LSH / IVF) with
# the standard compressed-domain member (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011).
#
# Engine shape (everything JVM-side codegen, zero Python):
# * ``pq_encode``: per subspace, K identical-IEEE-tree distance
#   expressions -> array -> array_position(arr, array_min(arr)) - 1
#   (first-occurrence argmin == lowest-index tie rule; each distance
#   expression appears ONCE in the array literal, so Catalyst's
#   projection collapse cannot duplicate it multiplicatively — the
#   CASE-chain argmin used for the 8-bucket IVF assign references each
#   distance O(K) times and would blow up at K=16).
# * ``pq_adc_topk``: the query side projects M LUT *arrays* in-plan
#   (each element an integerized subspace distance to one codebook
#   entry), broadcasts, and the score is element_at(lut_m, code_m + 1)
#   summed as exact BIGINTs — the ADC lookup expressed relationally.
#
# Cross-engine determinism: every LUT element / encode distance is the
# same textually-identical double expression tree in both dialects
# (``centroid_dist_sql``'s fixed left-to-right sum over literal
# centroids), integerized with the floor-to-BIGINT canon BEFORE the
# (order-free) integer sum; ranking ties break on vec_id.


def make_pq_codebooks(
    dim: int, m: int = 4, k: int = 16, seed: int = 13
) -> np.ndarray:
    """Deterministic PQ codebooks, shape (m, k, dim//m) — seeded Gaussian
    rounded to 6 decimals so SQL literals are engine-exact (the
    ``make_centroids`` convention). Data-trained codebooks come from
    ``pq_fit``."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.RandomState(seed)
    return np.round(rng.standard_normal((m, k, dim // m)) * 0.5, 6)


def pq_fit(
    vectors: np.ndarray, m: int = 4, k: int = 16, iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Per-subspace Lloyd k-means over a driver-side sample (the same
    dimension-scale-state contract as ``kmeans_fit``: at 10^12 rows the
    input is a hash-filtered ~10^4-row pull). Returns (m, k, dim//m),
    rounded to 6 decimals for engine-exact literals."""
    dim = vectors.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    return np.stack([
        kmeans_fit(vectors[:, i * ds:(i + 1) * ds], k, iters=iters, seed=seed + i)
        for i in range(m)
    ])


def pq_sub_dist_sql(
    vec: str, sub_centroid: np.ndarray, m_idx: int, ds: int,
    dialect: str = "spark",
) -> str:
    """Squared L2 distance between subspace ``m_idx`` of ``vec`` (dims
    [m_idx*ds, (m_idx+1)*ds)) and one codebook entry — the same fixed
    left-to-right identical-IEEE tree as ``centroid_dist_sql``."""
    base = (0 if dialect == "spark" else 1) + m_idx * ds
    terms = " + ".join(
        f"(CAST({vec}[{i + base}] AS DOUBLE) - ({w!r})) * "
        f"(CAST({vec}[{i + base}] AS DOUBLE) - ({w!r}))"
        for i, w in enumerate(sub_centroid.tolist())
    )
    return f"({terms})"


def _arr_sql(elems: list[str], dialect: str) -> str:
    inner = ", ".join(elems)
    return f"array({inner})" if dialect == "spark" else f"list_value({inner})"


def pq_code_sql(
    vec: str, codebooks: np.ndarray, m_idx: int, dialect: str = "spark"
) -> str:
    """Subspace code (0..K-1) = first-occurrence argmin over the K
    codebook distances. The K distance expressions sit ONCE each inside
    an array literal; argmin is array_position(arr, array_min(arr)) - 1
    (both engines: 1-based first match on the bit-identical min value),
    so projection collapse duplicates nothing."""
    ds = codebooks.shape[2]
    dists = [
        pq_sub_dist_sql(vec, codebooks[m_idx, j], m_idx, ds, dialect)
        for j in range(codebooks.shape[1])
    ]
    arr = _arr_sql(dists, dialect)
    if dialect == "spark":
        return (
            f"(CAST(array_position({arr}, array_min({arr})) AS INT) - 1)"
        )
    return f"(CAST(list_position({arr}, list_min({arr})) AS INT) - 1)"


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus -> compact code table (id + M int codes), one scan-side
    codegen projection, zero exchanges — the index-build step a pipeline
    runs once per crawl batch and persists (codes parquet is the ANN
    working set; the raw embedding column never needs to be read again
    for search)."""
    m = codebooks.shape[0]
    cols = [F.col(id_col)] + [F.col(c) for c in carry_cols] + [
        F.expr(pq_code_sql(vec_col, codebooks, i, "spark")).alias(f"code{i}")
        for i in range(m)
    ]
    return df.select(*cols)


PQ_SCALE_DIST = 1_000_000  # 1e6: per-LUT-element integerization


def pq_lut_elem_sql(
    qvec: str, codebooks: np.ndarray, m_idx: int, j: int,
    dialect: str = "spark",
) -> str:
    """One integerized LUT element: floor(1e6 * d2(query_sub, cb[m][j]))."""
    ds = codebooks.shape[2]
    d = pq_sub_dist_sql(qvec, codebooks[m_idx, j], m_idx, ds, dialect)
    return f"CAST(floor({d} * {PQ_SCALE_DIST}) AS BIGINT)"


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k over a PQ code table: the query side projects M
    integerized LUT arrays in-plan and broadcasts (queries are batch-
    scale by contract); each corpus code row costs M element_at lookups
    + an exact BIGINT sum. One shuffle total (the per-query top-k
    window) — the compressed-domain brute scan whose cost is O(rows x
    M) lookups instead of O(rows x dim) multiplies, on 64x less I/O.

    Output: (query_id, rank, vec_id, adc_u), rank 1..k by (adc_u ASC,
    vec_id ASC) — ADC approximates DISTANCE, so smaller is nearer.
    """
    m, kk, _ds = codebooks.shape
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    for i in range(m):
        elems = ", ".join(
            pq_lut_elem_sql("_qv", codebooks, i, j, "spark")
            for j in range(kk)
        )
        q = q.withColumn(f"_lut{i}", F.expr(f"array({elems})"))
    q = F.broadcast(q.drop("_qv"))
    adc = " + ".join(
        f"element_at(_lut{i}, code{i} + 1)" for i in range(m)
    )
    scored = codes.crossJoin(q).withColumn("adc_u", F.expr(adc))
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_u"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "adc_u")
    )


def pq_numpy_twin(
    vectors: np.ndarray,
    query: np.ndarray,
    codebooks: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact python twin of (encode, ADC score) with the engine's
    left-to-right accumulation and integerization — for pytest parity
    (returns (codes[n, m] int, adc_u[n] int64) for one query)."""
    m, kk, ds = codebooks.shape
    n = len(vectors)
    codes = np.zeros((n, m), np.int64)
    lut = np.zeros((m, kk), np.int64)
    for mi in range(m):
        sub = vectors[:, mi * ds:(mi + 1) * ds].astype(np.float64)
        qs = query[mi * ds:(mi + 1) * ds].astype(np.float64)
        # left-to-right scalar accumulation == the SQL term chain
        d = np.zeros((n, kk), np.float64)
        dq = np.zeros(kk, np.float64)
        for j in range(kk):
            cw = codebooks[mi, j]
            acc = np.zeros(n, np.float64)
            accq = 0.0
            for t in range(ds):
                acc = acc + (sub[:, t] - cw[t]) * (sub[:, t] - cw[t])
                accq = accq + (qs[t] - cw[t]) * (qs[t] - cw[t])
            d[:, j] = acc
            dq[j] = accq
        codes[:, mi] = d.argmin(axis=1)  # numpy argmin = first occurrence
        lut[mi] = np.floor(dq * PQ_SCALE_DIST).astype(np.int64)
    adc = np.zeros(n, np.int64)
    for mi in range(m):
        adc += lut[mi][codes[:, mi]]
    return codes, adc


def pq_rerank_topk(
    corpus: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    shortlist: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage retrieval (the production serving shape): stage 1 is
    the compressed-domain ADC scan (``pq_adc_topk`` over the codes-only
    table — O(rows x M) int lookups, never a vector) producing a
    ``shortlist``-sized candidate set per query; stage 2 fetches ONLY
    the shortlisted ids' full vectors (candidate ids broadcast into the
    corpus join — nq x shortlist rows survive, the only place a full
    embedding is ever read) and rescores them with the exact integerized
    cosine, re-ranking to the final top-k by (cos_u DESC, id ASC).

    PQ distortion costs RECALL (a true neighbor missing from the
    shortlist stays missing) but never PRECISION among survivors — the
    exact rescoring makes the final ordering of shortlisted rows
    identical to brute force, so shortlist == corpus size degrades
    bit-exactly to ``cosine_topk``. At 10^12 rows the ADC stage reads
    ~4 TB of codes and stage 2 reads nq x shortlist vectors by id —
    the full-vector corpus is never scanned.

    Output: (query_id, rank, vec_id, cos_u), rank 1..k.
    """
    cand = pq_adc_topk(
        codes, queries, codebooks, k=shortlist,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    qv = F.broadcast(
        _with_norm(
            queries.select(
                F.col(query_id_col), F.col(vec_col).alias("_qvec")
            ),
            "_qvec",
            "_qn",
        )
    )
    fetched = corpus.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(cand), on=id_col
    )
    rescored = _with_norm(fetched, vec_col, "_cn").join(
        qv, on=query_id_col
    ).withColumn(
        "cos_u",
        F.expr(
            cosine_u_sql(dot_u_sql(vec_col, "_qvec", "spark"), "_cn", "_qn")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_u"), F.asc(id_col)
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_u")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed 10^12-row production shape (probe-pruned
# partitions x compressed-domain scoring — FAISS's IVFPQ layout,
# expressed relationally)
# ---------------------------------------------------------------------------

def ivfpq_write_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> None:
    """One-time IVF-PQ index build: coarse bucket assignment (IVF) +
    per-subspace PQ codes, written BUCKET-PARTITIONED — and, unlike
    ``ivf_write_index``, the embedding column is NOT stored: the index
    holds (id, code0..codeM-1 [, carry]) only. At 10^12 x 64-dim
    float32 that is the difference between a ~256 TB index and a ~4 TB
    one; queries touch ~nprobe/C of the partitions (source pruning) and
    read M small ints per candidate (ADC), never a vector. Both
    assignment and encoding are one scan-side codegen projection."""
    cols = [F.col(id_col), *(F.col(c) for c in carry_cols)]
    m = codebooks.shape[0]
    encoded = ivf_assign_batch(
        corpus.select(F.col(id_col), F.col(vec_col),
                      *(F.col(c) for c in carry_cols)),
        centroids, vec_col,
    ).select(
        *cols, "bucket",
        *[
            F.expr(pq_code_sql(vec_col, codebooks, i, "spark")).alias(f"code{i}")
            for i in range(m)
        ],
    )
    encoded.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(path)


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    where: str | None = None,
) -> DataFrame:
    """ADC top-k over a prebuilt IVF-PQ index: the probe table (query x
    nprobe nearest coarse buckets, the ``_probe_table_pdf`` machinery)
    broadcasts with M integerized LUT arrays projected IN-PLAN from the
    probe's own query vector; its bucket set statically prunes the
    partitioned code read, and scoring is M element_at lookups + an
    exact BIGINT sum per candidate code row. ``where`` composes exactly
    like ``ivf_topk_indexed``'s: a carry-column predicate pushed into
    the pruned scan. With ``nprobe == n_centroids`` the result equals
    ``pq_adc_topk`` over the full code table (tested) — the IVF layer
    only ever REMOVES candidates, it never changes a survivor's score.

    Output: (query_id, rank, vec_id, adc_u), rank by (adc_u ASC, id)."""
    m, kk, _ds = codebooks.shape
    probes_pdf = _probe_table_pdf(queries, centroids, nprobe, vec_col, query_id_col)
    codes = spark.read.parquet(index_path)
    if where is not None:
        codes = codes.where(F.expr(where))
    if len(probes_pdf) == 0:
        return (
            codes.select(
                F.lit(None).cast("long").alias(query_id_col),
                F.lit(0).alias("rank"),
                F.col(id_col),
                F.lit(0).cast("long").alias("adc_u"),
            ).where(F.lit(False))
        )
    probes = spark.createDataFrame(
        probes_pdf, schema=_probe_schema(queries, query_id_col)
    )
    for i in range(m):
        elems = ", ".join(
            pq_lut_elem_sql("_qvec", codebooks, i, j, "spark")
            for j in range(kk)
        )
        probes = probes.withColumn(f"_lut{i}", F.expr(f"array({elems})"))
    probes = probes.drop("_qvec", "_qn")
    buckets = sorted(set(probes_pdf["bucket"].tolist()))
    adc = " + ".join(f"element_at(_lut{i}, code{i} + 1)" for i in range(m))
    scored = (
        codes.where(F.col("bucket").isin(buckets))  # partition pruning
        .join(F.broadcast(probes), "bucket")
        .withColumn("adc_u", F.expr(adc))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_u"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "adc_u")
    )
