"""Training-data pipeline operators: dedup / similarity / text analysis.

Strategy mirrors SURVEY.md §5: every distributed operator is checked
against an independent implementation — a local numpy/python oracle, or
the engine's own single-expression twin (two code paths, same values).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.functions import text_analysis as TA
from gis_shapefile_spark.operators import dedup as DD
from gis_shapefile_spark.operators import similarity as SIM

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "quick brown fox jumps over the lazy dog near the river bank"),  # near-dup of 0
    (2, "spark plans joins with catalyst and tungsten for columnar speed"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "completely different words about databases indexes and storage"),
    (5, "tiny doc"),  # fewer tokens than any shingle window
]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, n: int) -> list[str]:
    toks = text.lower().strip().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _minhash(text: str, perm: int, n: int = 3) -> int:
    a, b = TA.MINHASH_PERMS[perm]
    hs = [(a * (_hash60(s) % TA.MINHASH_P) + b) % TA.MINHASH_P for s in _shingles(text, n)]
    return min(hs) if hs else TA.MINHASH_P


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_exact_duplicate_map(spark, docs_df):
    out = {
        r.doc_id: r.canonical_id
        for r in DD.exact_duplicate_map(docs_df).collect()
    }
    assert out[3] == 0 and out[0] == 0
    assert all(out[i] == i for i in (1, 2, 4, 5))


def test_minhash_values_match_python_oracle(spark, docs_df):
    mh = DD.minhash_values(docs_df, num_perm=8, shingle_n=3).collect()
    for r in mh:
        text = dict(DOCS)[r.doc_id]
        for p in range(8):
            assert r[f"mh{p}"] == _minhash(text, p), (r.doc_id, p)


def test_minhash_explode_path_matches_expression_path(spark, docs_df):
    """The scale-path (explode + partial min) and the single-expression
    column must agree — two independent code paths over the same spec."""
    expr = docs_df.select(
        "doc_id", TA.minhash_col("text", perm=2, shingle_n=3).alias("mh")
    ).collect()
    flat = {
        r.doc_id: r.mh2
        for r in DD.minhash_values(docs_df, num_perm=3, shingle_n=3).collect()
    }
    for r in expr:
        assert flat[r.doc_id] == r.mh


def test_near_duplicate_pairs_lsh(spark, docs_df):
    pairs = {
        (r.id_1, r.id_2): r.jaccard_u
        for r in DD.near_duplicate_pairs(docs_df, threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1000000  # exact dup
    assert (0, 1) in pairs and 500000 <= pairs[(0, 1)] < 1000000  # near-dup
    assert not any(4 in p or 2 in p for p in pairs)  # dissimilar never paired
    # jaccard value matches the python set oracle
    s0, s1 = set(_shingles(DOCS[0][1], 3)), set(_shingles(DOCS[1][1], 3))
    expected = int(np.floor(1e6 * len(s0 & s1) / len(s0 | s1)))
    assert pairs[(0, 1)] == expected


def _brute_jaccard_pairs(docs: list, t: float, n: int = 3) -> dict:
    """All-pairs python-set oracle: {(id_1, id_2): jaccard_u >= t}."""
    sets = {i: set(_shingles(txt, n)) for i, txt in docs}
    out = {}
    for i, si in sets.items():
        for j, sj in sets.items():
            if i < j and si and sj:
                jac = len(si & sj) / len(si | sj)
                if jac >= t:
                    out[(i, j)] = int(np.floor(1e6 * jac))
    return out


def test_jaccard_prefix_join_matches_bruteforce(spark):
    """Prefix-filtering candidate generation is provably complete for
    Jaccard >= t: the full join must EQUAL the all-pairs oracle (both
    directions — no missed pair, no extra pair), on a corpus with exact
    dups, token-drop/substitution near-dups at several sizes, and
    unrelated docs sharing common shingles."""
    rng = np.random.default_rng(11)
    vocab = [f"w{k}" for k in range(120)]
    docs = []
    did = 0
    for base in range(30):
        toks = list(rng.choice(vocab, size=int(rng.integers(8, 40))))
        docs.append((did, " ".join(toks)))
        did += 1
        kind = base % 3
        if kind == 0:  # exact duplicate
            docs.append((did, " ".join(toks)))
            did += 1
        elif kind == 1:  # drop one token: high-but-lossy overlap
            docs.append((did, " ".join(toks[1:])))
            did += 1
        # kind == 2: singleton
    for t in (0.5, 0.8):
        expected = _brute_jaccard_pairs(docs, t)
        df = spark.createDataFrame(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        )
        got = {
            (r.id_1, r.id_2): r.jaccard_u
            for r in DD.jaccard_join_prefix(df, threshold=t).collect()
        }
        assert got == expected, (
            t,
            sorted(set(expected) - set(got))[:5],
            sorted(set(got) - set(expected))[:5],
        )
        assert expected, "degenerate fixture: oracle found no pairs"


def test_jaccard_prefix_plan_is_equi_join_only(spark, docs_df):
    """The exact join must never degrade to an all-pairs plan: every join
    in the physical plan is a hash/sort-merge EQUI join (prefix-shingle
    key or verify-stage id keys) — no cartesian product, no nested-loop
    fallback, at any size."""
    out = DD.jaccard_join_prefix(docs_df, threshold=0.5, materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_prefix_join_docs_fixture(spark, docs_df):
    """On the shared DOCS fixture the exact join finds the exact-dup and
    the near-dup pair with the same jaccard_u values as the LSH path's
    verify stage, and never pairs dissimilar or sub-shingle docs."""
    pairs = {
        (r.id_1, r.id_2): r.jaccard_u
        for r in DD.jaccard_join_prefix(docs_df, threshold=0.5).collect()
    }
    assert pairs == _brute_jaccard_pairs(DOCS, 0.5)
    assert pairs[(0, 3)] == 1000000
    assert not any(4 in p or 5 in p for p in pairs)


def test_lsh_max_bucket_caps_degenerate_buckets(spark):
    # 30 copies of the same text -> one bucket of 30; cap at 10 kills it
    pdf = pd.DataFrame(
        {"doc_id": range(30), "text": ["same words everywhere all along"] * 30}
    )
    df = spark.createDataFrame(pdf)
    assert DD.lsh_candidate_pairs(df, max_bucket=10).count() == 0
    assert DD.lsh_candidate_pairs(df, max_bucket=None).count() == 30 * 29 // 2


def test_simhash_pigeonhole_completeness(spark, docs_df):
    """Every pair within hamming <= 3 must be found (block scheme is
    complete for <= max_hamming); verified against brute force."""
    sigs = {r.doc_id: r.simhash for r in DD.simhash_table(docs_df).collect()}
    found = {
        (r.id_1, r.id_2): r.hamming
        for r in DD.simhash_near_pairs(docs_df, max_hamming=3).collect()
    }
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j:
                ham = bin(sigs[i] ^ sigs[j]).count("1")
                if ham <= 3:
                    assert found.get((i, j)) == ham
                else:
                    assert (i, j) not in found


def _vecs(n: int, dim: int = 16, seed: int = 3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    return pd.DataFrame({"vec_id": range(n), "embedding": [r.tolist() for r in v]})


def test_cosine_topk_matches_numpy(spark):
    pdf = _vecs(40)
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.cosine_topk(df, queries, k=4).collect()
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf["embedding"]])
    # integerized cosine, exactly as the engine computes it
    for q in range(3):
        cos_u = []
        for c in range(40):
            d = int(np.sum(np.floor(mat[c] * mat[q] * SIM.SCALE_DOT)))
            n1 = int(np.sum(np.floor(mat[c] * mat[c] * SIM.SCALE_DOT)))
            n2 = int(np.sum(np.floor(mat[q] * mat[q] * SIM.SCALE_DOT)))
            cu = int(
                np.floor(
                    SIM.SCALE_COS
                    * ((d / SIM.SCALE_DOT) / (np.sqrt(n1 / SIM.SCALE_DOT) * np.sqrt(n2 / SIM.SCALE_DOT)))
                )
            )
            cos_u.append((cu, c))
        expect = sorted(cos_u, key=lambda t: (-t[0], t[1]))[:4]
        got = sorted(
            [(r.cos_u, r.vec_id) for r in out if r.query_id == q],
            key=lambda t: (-t[0], t[1]),
        )
        assert got == expect, q


def test_lsh_cosine_topk_finds_self(spark):
    pdf = _vecs(60)
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.lsh_cosine_topk(df, queries, k=1, dim=16).collect()
    for r in out:
        assert r.rank == 1 and r.vec_id == r.query_id  # self is always in-bucket


def test_cosine_near_duplicates_copies(spark):
    pdf = _vecs(25)
    df = spark.createDataFrame(pdf)
    corpus = df.unionByName(
        df.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    )
    pairs = SIM.cosine_near_duplicates(corpus, threshold=0.95, dim=16).collect()
    got = {(r.id_1, r.id_2) for r in pairs}
    assert {(i, i + 1000) for i in range(25)} <= got


def test_lang_id_and_quality(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the cat sat in the house and it is warm",
                "der hund ist nicht mit der katze und das haus",
                "zzz qqq xxx",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", TA.lang_id_col("text").alias("lang")).collect()}
    assert out == {0: "en", 1: "de", 2: "unk"}
    q = {r.doc_id: r.q for r in df.select(
        "doc_id", TA.quality_score_col("text").alias("q")).collect()}
    assert q[0] > q[2]  # stopword-free junk scores lower
    assert all(0 <= v <= 1000000 for v in q.values())


def test_dup_ngram_fractions(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a a",            # all dup tokens, all dup 2-grams
                "a b c d",            # no repetition at any n
                "a b a b a",          # 2-grams: (a b, b a, a b, b a) -> 1/2 dup
                "   ",                # blank -> 0 everywhere
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = {
        r.doc_id: (r.d1, r.d2, r.d3)
        for r in df.select(
            "doc_id",
            TA.dup_ngram_frac_col("text", 1).alias("d1"),
            TA.dup_ngram_frac_col("text", 2).alias("d2"),
            TA.dup_ngram_frac_col("text", 3).alias("d3"),
        ).collect()
    }
    assert rows[0] == (750000, 666666, 500000)  # 1-1/4, 1-1/3, 1-1/2
    assert rows[1] == (0, 0, 0)
    assert rows[2] == (600000, 500000, 333333)  # 1-2/5, 1-2/4, 1-2/3
    assert rows[3] == (0, 0, 0)


def test_ivf_full_probe_equals_bruteforce(spark):
    """nprobe == n_centroids covers every bucket => exact brute-force result."""
    pdf = _vecs(80)
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = SIM.make_centroids(16, 4)
    ivf = SIM.ivf_topk(df, queries, k=5, centroids=cents, nprobe=4).collect()
    brute = SIM.cosine_topk(df, queries, k=5).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows)
    assert key(ivf) == key(brute)


def test_ivf_probe_pruning_and_recall(spark):
    """nprobe=1 scans only the query's own bucket; planted near-identical
    vectors land in the same bucket, so recall@1 on them is exact."""
    pdf = _vecs(60)
    # plant: vec 50 = vec 0 + tiny noise (same bucket, cosine ~ 1)
    v0 = np.array(pdf["embedding"][0])
    pdf.at[50, "embedding"] = (v0 + 1e-4).tolist()
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    out = SIM.ivf_topk(df, queries, k=2, centroids=cents, nprobe=1).collect()
    got = {r.vec_id for r in out}
    assert got == {0, 50}


def test_kmeans_fit_deterministic():
    rng = np.random.RandomState(0)
    v = rng.standard_normal((200, 8))
    c1 = SIM.kmeans_fit(v, 4)
    c2 = SIM.kmeans_fit(v, 4)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (4, 8)


def test_connected_components_vs_union_find(spark):
    """Label propagation == python union-find on a hand-built graph with a
    chain (diameter > 1), a triangle, and singletons."""
    nodes = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(10))})
    )
    pairs_pdf = pd.DataFrame(
        {"id_1": [0, 1, 2, 5, 6, 5], "id_2": [1, 2, 3, 6, 7, 7]}
    )
    pairs = spark.createDataFrame(pairs_pdf)
    got = {
        r.doc_id: r.component
        for r in DD.connected_components(nodes, pairs).collect()
    }
    # union-find oracle
    parent = list(range(10))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]; x = parent[x]
        return x
    for a, b in pairs_pdf.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {i: find(i) for i in range(10)}
    assert got == exp
    assert got[3] == 0 and got[7] == 5 and got[9] == 9


def test_connected_components_raises_on_nonconvergence(spark):
    import pytest as _pytest

    n = 12
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
    chain = spark.createDataFrame(
        pd.DataFrame({"id_1": list(range(n - 1)), "id_2": list(range(1, n))})
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(nodes, chain, max_iter=2)
    # and with enough rounds the same chain converges to component 0
    ok = DD.connected_components(nodes, chain, max_iter=15).collect()
    assert {r.component for r in ok} == {0}


def test_star_components_match_label_propagation(spark):
    """Large-star/small-star == label propagation on a random graph plus a
    long chain (the high-diameter case star handles in O(log^2 n) rounds)."""
    rng = np.random.RandomState(17)
    n = 60
    e1 = rng.randint(0, n, 40)
    e2 = rng.randint(0, n, 40)
    chain = [(100 + i, 101 + i) for i in range(25)]
    pairs_pdf = pd.DataFrame(
        {"id_1": list(e1) + [a for a, _ in chain],
         "id_2": list(e2) + [b for _, b in chain]}
    )
    pairs_pdf = pairs_pdf[pairs_pdf.id_1 != pairs_pdf.id_2]
    all_ids = sorted(set(range(n)) | {a for a, _ in chain} | {b for _, b in chain})
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": all_ids}))
    pairs = spark.createDataFrame(pairs_pdf)
    star = {r.doc_id: r.component
            for r in DD.connected_components_star(nodes, pairs).collect()}
    lp = {r.doc_id: r.component
          for r in DD.connected_components(nodes, pairs, max_iter=60).collect()}
    assert star == lp
    assert star[125] == 100  # chain collapses to its minimum


def test_hash_split_stable_and_proportional(spark):
    from gis_shapefile_spark.operators import splits as SP

    df = spark.range(20000).selectExpr("id AS doc_id")
    a = SP.hash_split(df, "doc_id").groupBy("split").count().collect()
    b = SP.hash_split(df, "doc_id").groupBy("split").count().collect()
    ca = {r.split: r["count"] for r in a}
    assert ca == {r.split: r["count"] for r in b}  # deterministic
    assert set(ca) == {"train", "val", "test"}
    assert abs(ca["train"] / 20000 - 0.9) < 0.02
    assert abs(ca["val"] / 20000 - 0.05) < 0.01
    # a different salt reshuffles membership but not determinism
    c = {r.split: r["count"]
         for r in SP.hash_split(df, "doc_id", salt="v2").groupBy("split").count().collect()}
    assert abs(c["train"] / 20000 - 0.9) < 0.02
    rows_a = {r.doc_id: r.split for r in SP.hash_split(df, "doc_id").collect()}
    rows_c = {r.doc_id: r.split for r in SP.hash_split(df, "doc_id", salt="v2").collect()}
    assert rows_a != rows_c


def test_asof_join_semantics(spark):
    """Backward as-of: latest right at-or-before left ts; same-instant
    matches; ties broken by seq desc; no-match -> null; one shuffle."""
    import datetime as dt
    from gis_shapefile_spark.operators import asof as AS

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, 10, t(100)), (2, 10, t(50)), (3, 10, t(10)), (4, 20, t(100))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(50), 101, 5.0),   # same instant as left#2
         (10, t(50), 102, 7.0),   # tie -> higher event_id (102) wins
         (10, t(99), 103, 9.0),
         (30, t(1), 104, 1.0)],   # other user, never matches
        "user_id long, ts timestamp, event_id long, v double",
    )
    out = AS.asof_join(left, right, on="ts", by=["user_id"],
                       value_cols=["v"], seq_col="event_id")
    got = {r.event_id: r.r_v for r in out.collect()}
    assert got == {1: 9.0, 2: 7.0, 3: None, 4: None}
    # plan sanity: no joins at all — the as-of is pure union + window
    import re
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Join", plan)


def test_interval_join_vs_cross_filter(spark):
    """Binned interval join == cross-join + filter, across closed modes and
    bin widths (correctness is bin-width independent)."""
    from gis_shapefile_spark.operators import interval as IV

    pts = spark.range(500).selectExpr("id", "(id % 97) / 3.0 AS x")
    iv = spark.range(20).selectExpr(
        "id AS ivl", "id * 1.7 AS lo", "id * 1.7 + 2.5 AS hi"
    )
    exp = {
        (r.id, r.ivl)
        for r in pts.crossJoin(iv).where("x >= lo AND x <= hi").collect()
    }
    for w in (0.5, 2.0, 10.0):
        got = {
            (r.id, r.ivl)
            for r in IV.interval_join(pts, iv, "x", bin_width=w).collect()
        }
        assert got == exp, w
    half = {
        (r.id, r.ivl)
        for r in IV.interval_join(
            pts, iv, "x", bin_width=2.0, closed="left"
        ).collect()
    }
    exp_half = {
        (r.id, r.ivl)
        for r in pts.crossJoin(iv).where("x >= lo AND x < hi").collect()
    }
    assert half == exp_half


def test_ivf_indexed_matches_inline(spark, tmp_path):
    """ivf_write_index + ivf_topk_indexed == inline ivf_topk (same
    centroids/nprobe), and the probed read actually prunes partitions."""
    pdf = _vecs(120)
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    idx = str(tmp_path / "ivf_idx")
    SIM.ivf_write_index(df, cents, idx)
    import os

    buckets = sorted(
        d for d in os.listdir(idx) if d.startswith("bucket=")
    )
    assert len(buckets) >= 2  # real bucket spread

    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    indexed = SIM.ivf_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, nprobe=2
    )
    inline = SIM.ivf_topk(df, queries, k=5, centroids=cents, nprobe=2)
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows
    )
    assert key(indexed.collect()) == key(inline.collect())
    # the bucket equi-join against the partition column must reach the
    # scan as partition-level pruning (dynamic pruning expression)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan


def test_ann_recall_semantics(spark):
    """Recall@k: nprobe == n_centroids degrades IVF to brute (all hits);
    recall is per-query MONOTONE in nprobe (a member of the true top-k
    inside the probed candidate set is always in the candidate top-k);
    every query reports, bounded by k."""
    pdf = _vecs(200)
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=6
    )
    queries = df.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    by_np = {}
    for nprobe in (1, 3, 6):
        out = SIM.ann_recall(
            df, queries, k=5, centroids=cents, nprobe=nprobe
        ).collect()
        assert len(out) == 12  # every query reports, even zero-recall
        assert all(0 <= r.n_hit <= r.k == 5 for r in out)
        by_np[nprobe] = {r.query_id: r.n_hit for r in out}
    assert all(v == 5 for v in by_np[6].values())  # full probe == brute
    for q in by_np[1]:
        assert by_np[1][q] <= by_np[3][q] <= by_np[6][q]


def test_ivf_filtered_search(spark, tmp_path):
    """Metadata-filtered ANN: carry_cols lands in the index, the where
    predicate restricts top-k exactly to pre-filtered inline results,
    and the predicate is PUSHED into the parquet scan (PushedFilters),
    composing with the probe set's partition pruning."""
    pdf = _vecs(120)
    pdf["label"] = [i % 5 for i in range(120)]
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    idx = str(tmp_path / "ivf_idx_f")
    SIM.ivf_write_index(df, cents, idx, carry_cols=("label",))
    assert "label" in spark.read.parquet(idx).columns

    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    filtered = SIM.ivf_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, nprobe=2,
        where="label % 2 = 0",
    )
    # ground truth: inline IVF over the PRE-filtered corpus (same
    # centroids/nprobe — the filter commutes with bucket assignment
    # because buckets are per-row)
    inline = SIM.ivf_topk(
        df.where("label % 2 = 0"), queries, k=5, centroids=cents, nprobe=2
    )
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows
    )
    got = key(filtered.collect())
    assert got == key(inline.collect())
    # every returned vec_id satisfies the predicate
    ok = {r.vec_id for r in df.where("label % 2 = 0").collect()}
    assert all(v in ok for (_, _, v, _) in got)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "label" in plan.split(
        "PushedFilters: ["
    )[1][:200]

    # append with matching carry set keeps the index filterable; a
    # schema check on the reader side still sees one label column
    extra = _vecs(10)
    extra["vec_id"] = extra["vec_id"] + 1000
    extra["label"] = [0] * 10
    SIM.ivf_index_append(
        spark, idx, spark.createDataFrame(extra), cents,
        carry_cols=("label",),
    )
    again = SIM.ivf_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, nprobe=2,
        where="label % 2 = 0",
    )
    inline2 = SIM.ivf_topk(
        df.unionByName(spark.createDataFrame(extra)).where("label % 2 = 0"),
        queries, k=5, centroids=cents, nprobe=2,
    )
    assert key(again.collect()) == key(inline2.collect())


def test_ivf_indexed_arrow_disabled(spark, tmp_path):
    """Driver-environment regression (round-4 red rows ann_ivf_delta /
    ann_filtered): with Arrow pandas conversion DISABLED, createDataFrame
    falls through to _inferSchemaFromList, which cannot infer list-of-
    numpy-float64 cells. The probe table now ships plain-float lists AND
    an explicit schema, so ivf_topk_indexed must work identically in
    both conversion environments."""
    pdf = _vecs(60)
    pdf["label"] = [i % 3 for i in range(60)]
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=3
    )
    idx = str(tmp_path / "ivf_idx_noarrow")
    SIM.ivf_write_index(df, cents, idx, carry_cols=("label",))
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows
    )
    with_arrow = key(
        SIM.ivf_topk_indexed(
            spark, idx, queries, k=5, centroids=cents, nprobe=2
        ).collect()
    )
    with_arrow_f = key(
        SIM.ivf_topk_indexed(
            spark, idx, queries, k=5, centroids=cents, nprobe=2,
            where="label % 2 = 0",
        ).collect()
    )
    conf = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        no_arrow = key(
            SIM.ivf_topk_indexed(
                spark, idx, queries, k=5, centroids=cents, nprobe=2
            ).collect()
        )
        no_arrow_f = key(
            SIM.ivf_topk_indexed(
                spark, idx, queries, k=5, centroids=cents, nprobe=2,
                where="label % 2 = 0",
            ).collect()
        )
    finally:
        spark.conf.set(conf, prev)
    assert no_arrow == with_arrow and len(with_arrow) == 3 * 5
    assert no_arrow_f == with_arrow_f and len(with_arrow_f) > 0


def test_ivf_index_append_parity_and_churn(spark, tmp_path):
    """ivf_index_append: (a) the merged base+batch index answers queries
    exactly like a monolithic full-corpus build (same centroids/nprobe);
    (b) the append is churn-bounded — every pre-existing index file is
    byte-untouched and only bucket dirs present in the batch's
    assignment gain files."""
    import os

    pdf = _vecs(120)
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    base = df.where(F.col("vec_id") % 7 != 0)
    batch = df.where(F.col("vec_id") % 7 == 0)

    idx = str(tmp_path / "ivf_delta_idx")
    SIM.ivf_write_index(base, cents, idx)

    def snapshot(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
        return out

    before = snapshot(idx)
    SIM.ivf_index_append(spark, idx, batch, cents)
    after = snapshot(idx)

    # churn-bounded: no pre-existing file rewritten or removed
    assert set(before) <= set(after)
    assert all(after[p] == sz for p, sz in before.items())
    # new files land only in buckets the batch actually touches
    batch_buckets = {
        f"bucket={r.bucket}"
        for r in SIM.ivf_assign_batch(batch, cents).select("bucket").collect()
    }
    new_files = set(after) - set(before)
    assert new_files  # the batch is non-empty, so something was appended
    assert {p.split(os.sep)[0] for p in new_files} <= batch_buckets

    # parity: merged index == monolithic full-corpus index
    mono = str(tmp_path / "ivf_mono_idx")
    SIM.ivf_write_index(df, cents, mono)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows
    )
    merged = SIM.ivf_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, nprobe=2
    )
    monolithic = SIM.ivf_topk_indexed(
        spark, mono, queries, k=5, centroids=cents, nprobe=2
    )
    assert key(merged.collect()) == key(monolithic.collect())


def test_ivf_compact_index_parity_and_crash_recovery(spark, tmp_path, monkeypatch):
    """ivf_compact_index: fragmented buckets shrink to few files while
    row counts, query answers, and the streaming replay markers
    (batch=<id> dirs) survive; a crash mid-commit is completed by
    recover_ivf_compact with no row lost or duplicated."""
    import os

    pdf = _vecs(120)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    root = str(tmp_path / "ivf_frag_idx")

    def land_batch(i, lo, n):
        chunk = spark.createDataFrame(pdf.iloc[lo : lo + n])
        assigned = SIM.ivf_assign_batch(
            SIM._with_norm(chunk, "embedding", "_cn"), cents
        )
        assigned.write.partitionBy("bucket").parquet(
            os.path.join(root, f"batch={i}")
        )

    # 6 small batches -> every bucket holds many tiny files
    for i in range(6):
        land_batch(i, i * 20, 20)

    def files_per_bucket():
        out = {}
        for dirpath, _, files in os.walk(root):
            base = os.path.basename(dirpath)
            if base.startswith("bucket="):
                b = int(base.split("=")[1])
                out[b] = out.get(b, 0) + sum(
                    1 for f in files
                    if f.endswith(".parquet") and not f.startswith(("_", "."))
                )
        return out

    queries = spark.createDataFrame(pdf).where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.cos_u) for r in rows
    )
    before_rows = spark.read.parquet(root).count()
    before_topk = key(
        SIM.ivf_topk_indexed(
            spark, root, queries, k=5, centroids=cents, nprobe=2
        ).collect()
    )
    frag = files_per_bucket()
    assert max(frag.values()) > 2

    stats = SIM.ivf_compact_index(spark, root, max_files_per_bucket=2)
    assert stats  # something was fragmented enough to rewrite
    after = files_per_bucket()
    for b, st in stats.items():
        assert st["files_after"] < st["files_before"]
        assert after[b] <= 2 or after[b] == st["files_after"]
    # replay markers survive as (possibly drained) directories
    for i in range(6):
        assert os.path.isdir(os.path.join(root, f"batch={i}"))
    assert spark.read.parquet(root).count() == before_rows
    assert key(
        SIM.ivf_topk_indexed(
            spark, root, queries, k=5, centroids=cents, nprobe=2
        ).collect()
    ) == before_topk

    # -- crash mid-commit: first move lands, second raises ------------------
    for i in range(6, 12):
        land_batch(i, (i - 6) * 20, 20)
    real_move = SIM._compact_move
    calls = {"n": 0}

    def crashing_move(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash mid-compaction-commit")
        real_move(src, dst)

    monkeypatch.setattr(SIM, "_compact_move", crashing_move)
    try:
        SIM.ivf_compact_index(spark, root, max_files_per_bucket=2)
        raise AssertionError("injected crash did not fire")
    except OSError:
        pass
    monkeypatch.setattr(SIM, "_compact_move", real_move)
    assert os.path.exists(os.path.join(root, "._compact_commit.json"))
    assert SIM.recover_ivf_compact(root)
    assert not os.path.exists(os.path.join(root, "._compact_commit.json"))
    assert spark.read.parquet(root).count() == before_rows * 2
    assert key(
        SIM.ivf_topk_indexed(
            spark, root, queries, k=5, centroids=cents, nprobe=2
        ).collect()
    ) == key(
        SIM.ivf_topk(
            spark.createDataFrame(
                pd.concat([pdf, pdf], ignore_index=True)
            ).select("vec_id", "embedding"),
            queries,
            k=5,
            centroids=cents,
            nprobe=2,
        ).collect()
    )


def test_ivf_assign_batch_matches_expression(spark):
    """Arrow-batch assignment (index build) agrees with the dual-dialect
    expression assignment on well-separated vectors."""
    pdf = _vecs(100)
    df = spark.createDataFrame(pdf)
    cents = SIM.kmeans_fit(
        np.array([np.array(e) for e in pdf["embedding"]]), n_centroids=4
    )
    a = {
        r.vec_id: r.bucket
        for r in SIM.ivf_assign_batch(df, cents).select("vec_id", "bucket").collect()
    }
    b = {
        r.vec_id: r["_bucket"]
        for r in SIM.ivf_assign(df, cents).select("vec_id", "_bucket").collect()
    }
    assert a == b


def test_quantize_stats_match_numpy(spark):
    """Int8 quantization stats vs a direct numpy implementation of the
    same formula (floor(127 x / max|x|), bucket-center dequant, 1e-9 L1)."""
    rng = np.random.default_rng(3)
    vecs = [rng.normal(0, 1, 16).astype(np.float32) for _ in range(20)]
    vecs.append(np.zeros(8, dtype=np.float32))  # all-zero guard path
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    ex = SIM.quantize_stats_sqls("embedding", "spark")
    rows = {
        r.vec_id: (r.q_sum, r.q_min, r.q_max, r.err_u)
        for r in spark.createDataFrame(pdf)
        .select(
            "vec_id",
            F.expr(ex["q_sum"]).alias("q_sum"),
            F.expr(ex["q_min"]).alias("q_min"),
            F.expr(ex["q_max"]).alias("q_max"),
            F.expr(ex["err_u"]).alias("err_u"),
        )
        .collect()
    }
    for i, v in enumerate(vecs):
        x = v.astype(np.float64)
        mx = max(np.abs(x).max(), 1e-12)
        q = np.floor(127.0 * x / mx).astype(np.int64)
        err = np.floor(np.abs(x - (q + 0.5) * mx / 127.0) * 1e9).astype(np.int64)
        assert rows[i] == (int(q.sum()), int(q.min()), int(q.max()), int(err.sum()))
        assert -127 <= q.min() and q.max() <= 127


def test_stratified_sample_deterministic_and_proportional(spark):
    from gis_shapefile_spark.operators import splits as SP

    pdf = pd.DataFrame(
        {
            "k": np.arange(8000, dtype=np.int64),
            "cls": np.where(np.arange(8000) % 4 == 0, "rare", "common"),
        }
    )
    df = spark.createDataFrame(pdf)
    rates = {"rare": 1.0, "common": 0.1}
    a = {r.k for r in SP.stratified_sample(df, "k", "cls", rates).collect()}
    b = {r.k for r in SP.stratified_sample(df, "k", "cls", rates).collect()}
    assert a == b  # deterministic, repartition/scan-order free
    kept = pdf[pdf["k"].isin(a)]
    assert (kept["cls"] == "rare").sum() == 2000  # rate 1.0 keeps all
    n_common = (kept["cls"] == "common").sum()
    assert 450 <= n_common <= 750  # ~10% of 6000, md5-uniform
    # unlisted strata follow default_rate
    none_kept = SP.stratified_sample(
        df.withColumn("cls", F.lit("other")), "k", "cls", rates, default_rate=0.0
    ).count()
    assert none_kept == 0


def test_percentile_bins_track_exact_ntile(spark):
    """The scan-side approx-percentile binning (no global sort) must put
    near-equal counts in every bin and agree with exact ntile up to
    boundary ties at the documented accuracy."""
    from gis_shapefile_spark.operators import splits as SP

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(5000, dtype=np.int64),
            "q": np.floor(rng.normal(500000, 150000, 5000)).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf)
    binned = SP.percentile_bins(df, "q", n_bins=10)
    counts = {r.bin: r.n for r in binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(1, 11))
    assert all(400 <= c <= 600 for c in counts.values()), counts
    # agreement with exact ntile: mismatches only at bin boundaries
    exact = df.withColumn(
        "d", F.expr("ntile(10) OVER (ORDER BY q, doc_id)").cast("long")
    )
    joined = binned.join(exact.select("doc_id", "d"), "doc_id")
    mism = joined.where(F.expr("abs(bin - d) > 1")).count()
    assert mism == 0
    close = joined.where(F.col("bin") != F.col("d")).count()
    assert close <= 5000 * 0.05  # <= 5% rows sit on drifted boundaries


def test_stratified_sample_empty_rates_uses_default(spark):
    from gis_shapefile_spark.operators import splits as SP

    pdf = pd.DataFrame({"k": np.arange(4000, dtype=np.int64),
                        "cls": ["x"] * 4000})
    df = spark.createDataFrame(pdf)
    n = SP.stratified_sample(df, "k", "cls", {}, default_rate=0.25).count()
    assert 850 <= n <= 1150  # ~25%, md5-uniform


def test_percentile_bins_empty_input_raises(spark):
    from gis_shapefile_spark.operators import splits as SP

    df = spark.createDataFrame([], schema="q long")
    with pytest.raises(ValueError, match="no non-null values"):
        SP.percentile_bins(df, "q")


def test_hourly_gapfill_semantics(spark):
    """Gap hours exist in the output, carry the last hourly sum forward,
    and are marked n_events=0; bucket sums match a pandas oracle."""
    from gis_shapefile_spark.operators import resample as RS

    base = pd.Timestamp("2026-01-01 00:30:00")
    rows = [
        (1, base, 10.0),                         # hour 0
        (1, base + pd.Timedelta(minutes=10), 2.5),  # hour 0
        (1, base + pd.Timedelta(hours=3), 7.0),  # hour 3 (1-2 are gaps)
        (2, base + pd.Timedelta(hours=1), 4.0),  # single-hour user
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    )
    out = {
        (r.user_id, r.hour_epoch): (r.filled_cents, r.n_events)
        for r in RS.hourly_gapfill(df).collect()
    }
    h0 = int(pd.Timestamp("2026-01-01 00:00:00").timestamp())
    assert out[(1, h0)] == (1250, 2)            # 10.00 + 2.50
    assert out[(1, h0 + 3600)] == (1250, 0)     # gap: carried, marked
    assert out[(1, h0 + 2 * 3600)] == (1250, 0)
    assert out[(1, h0 + 3 * 3600)] == (700, 1)
    assert out[(2, h0 + 3600)] == (400, 1)
    assert len(out) == 5  # dense span for user 1 (4 hours) + user 2 (1)


def test_decontaminate_planted_overlap(spark):
    """Planted contamination: a training doc that embeds an eval doc's
    text is flagged with the exact shared-shingle count; disjoint docs
    are clean; a doc shorter than the shingle width survives with zero
    counts (explode_outer path)."""
    evalset = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words then the quick brown fox jumps over the lazy dog"),
            (11, "completely unrelated content about spark partitions here"),
            (12, "tiny doc"),  # < 3 tokens -> zero shingles
            (13, "the quick brown fox jumps over the lazy dog"),  # exact eval copy
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in DD.decontaminate(corpus, evalset, shingle_n=3).collect()
    }
    assert len(out) == 4
    # eval doc has 9 tokens -> 7 distinct 3-gram shingles
    assert out[13].n_shingles == 7 and out[13].n_hits == 7
    assert out[13].contaminated == 1
    # embedded copy: all 7 eval shingles present among its own
    assert out[10].n_hits == 7 and out[10].contaminated == 1
    assert out[10].n_shingles > 7
    assert out[11].n_hits == 0 and out[11].contaminated == 0
    assert out[12].n_shingles == 0 and out[12].n_hits == 0
    assert out[12].contaminated == 0


def test_key_skew_profile_finds_planted_hot_key(spark):
    """1000 rows on key 7, one row each on keys 0..99: the profiler must
    rank the hot key first with exact integer share/skew measures."""
    from gis_shapefile_spark.operators import profiling as PR

    rows = [(7,)] * 1000 + [(k,) for k in range(100)]
    df = spark.createDataFrame(rows, "key long")
    out = PR.key_skew_profile(df, ["key"], top_k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    top = out[0]
    assert top.key == 7 and top.n_rows == 1001
    # total = 1100, n_keys = 100
    assert top.share_ppm == (1001 * 1000000) // 1100
    assert top.skew_x100 == (1001 * 100 * 100) // 1100
    # ties among the singleton keys break by key ascending
    assert [r.key for r in out[1:]] == [0, 1, 2, 3]
    assert all(r.n_rows == 1 for r in out[1:])


def test_boilerplate_profile_planted_footer(spark):
    """A footer shared by >=1% of docs is flagged as boilerplate in every
    doc carrying it; unique text scores 0; a doc that is ONLY footer
    scores ~1e6 ppm."""
    from gis_shapefile_spark.operators import profiling as PR

    footer = "all rights reserved contact us at example"  # 7 tokens -> 5 shingles
    # body tokens all embed the doc id, so no body (or body->footer
    # stitch) shingle repeats across docs — only the footer is common
    rows = [(i, f"a{i}q b{i}r c{i}s d{i}t e{i}u " + footer) for i in range(20)]
    rows += [(100, "completely unrelated standalone text with no common parts")]
    rows += [(101, footer)]  # pure boilerplate doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 22 docs, footer shingles in 21 -> df*100 >= 22*50 needs min_df_pct=50
    out = {r.doc_id: r for r in
           PR.boilerplate_profile(df, shingle_n=3, min_df_pct=50).collect()}
    assert out[101].n_boiler == out[101].n_shingles == 5
    assert out[101].boiler_ppm == 1000000
    assert out[100].n_boiler == 0 and out[100].boiler_ppm == 0
    # footered docs: exactly the 5 footer shingles + the 2 stitch shingles
    # spanning body->footer are doc-specific (contain the unique id words)
    for i in range(20):
        assert out[i].n_boiler == 5
        assert 0 < out[i].boiler_ppm < 1000000


def test_mixture_sample_budget_and_cap(spark):
    """Token-budget mixing: a source smaller than its target is kept
    WHOLE (cap, no upsampling); a dominant source is downsampled toward
    its token target; unlisted sources are dropped; membership is stable
    across repartitioning."""
    from gis_shapefile_spark.operators import splits as SP

    rows = [(i, "big", "w " * 50) for i in range(400)]        # 20k tokens
    rows += [(1000 + i, "tiny", "t " * 10) for i in range(5)]  # 50 tokens
    rows += [(2000 + i, "other", "x y z") for i in range(50)]  # unlisted
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    kept = SP.mixture_sample(
        df, "doc_id", "source",
        {"big": 500000, "tiny": 500000}, budget_tokens=4000,
    )
    by_src = {r[0]: r[1] for r in kept.groupBy("source").count().collect()}
    assert "other" not in by_src
    assert by_src["tiny"] == 5  # target 2000 tokens >> 50 -> keep all
    # big: target 2000 of 20000 tokens -> ~10% keep rate (hash variance)
    assert 20 <= by_src["big"] <= 65

    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in SP.mixture_sample(
            df.repartition(13), "doc_id", "source",
            {"big": 500000, "tiny": 500000}, budget_tokens=4000,
        ).collect()
    }
    assert ids1 == ids2


def test_epoch_mixture_sample_upsamples_scarce_source(spark):
    """Repeat-epoch mixing: a source at half its token target appears
    exactly twice (1 full epoch + full-threshold partial); a source at
    4x its target downsamples to ~25% with epoch 0 only; expected token
    mass tracks the targets."""
    from gis_shapefile_spark.operators import splits as SP

    rows = [(i, "scarce", "s " * 10) for i in range(10)]   # 100 tokens
    rows += [(100 + i, "big", "b " * 10) for i in range(80)]  # 800 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = SP.epoch_mixture_sample(
        df, "doc_id", "source",
        {"scarce": 500000, "big": 500000}, budget_tokens=400,
    ).collect()
    # scarce: target 200 vs mass 100 -> _full=2, rem 0 -> epochs {0,1}, all docs
    sc = [r for r in kept if r.source == "scarce"]
    assert len(sc) == 20 and {r.epoch for r in sc} == {0, 1}
    assert all(sum(1 for r in sc if r.doc_id == i) == 2 for i in range(10))
    # big: target 200 vs mass 800 -> _full=0, thr 2500 -> ~25% in epoch 0
    bg = [r for r in kept if r.source == "big"]
    assert {r.epoch for r in bg} == {0}
    assert 8 <= len(bg) <= 35  # hash variance around 20


def test_crossmodal_alignment_planted_pairs(spark):
    """Integerized cross-modal cosine: an embedding equal to its caption's
    hashed-BoW vector scores ~+1e9, the negated embedding ~-1e9, an
    orthogonal one-hot (on an empty BoW bucket) scores 0."""
    from gis_shapefile_spark.operators import similarity as SIM

    dim = 8
    cap = "the cat sat on the mat"
    bow = [2.0, 0.0, 1.0, 1.0, 0.0, 2.0, 0.0, 0.0]  # verified vs duckdb
    ortho = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # hits only empty bucket
    df = spark.createDataFrame(
        [(0, cap, bow), (1, cap, [-v for v in bow]), (2, cap, ortho),
         (3, "   ", bow)],  # blank caption -> zero vector -> score 0
        "doc_id long, text string, embedding array<double>",
    )
    align = SIM.cosine_u_sql(
        SIM.dot_u_sql("embedding", "txtvec", "spark"),
        SIM.norm_u_sql("embedding", "spark"),
        SIM.norm_u_sql("txtvec", "spark"),
    )
    out = {
        r.doc_id: r.align_u
        for r in df.select(
            "doc_id",
            F.expr(TA.bow_vec_sql("text", dim, "spark")).alias("txtvec"),
            "embedding",
        ).select("doc_id", F.expr(align).alias("align_u")).collect()
    }
    assert abs(out[0] - 10**9) <= 2
    assert abs(out[1] + 10**9) <= 2
    assert out[2] == 0
    assert out[3] == 0  # blank caption must not score via a phantom token


def test_pii_scrub_redactions(spark):
    """Every PII class gets its typed tag, clean text is untouched, and
    precedence holds (SSN before phone, long digit runs before phone)."""
    rows = [
        (0, "mail a.b+c@x-y.co.uk please"),
        (1, "ssn 123-45-6789 on file"),
        (2, "from 10.0.255.1 today"),
        (3, "call +1 (555) 010-3456 now"),
        (4, "card 123456789012 on record"),
        (5, "a perfectly clean sentence with numbers 42 and 7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", TA.pii_scrub_col("text").alias("s")
        ).collect()
    }
    assert got[0] == "mail <EMAIL> please"
    assert got[1] == "ssn <SSN> on file"
    assert got[2] == "from <IP> today"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "card <ID> on record"
    assert got[5] == rows[5][1]


def test_seq_pack_boundary_semantics(spark):
    """Concat-and-chunk packing: a document belongs to the pack where its
    token stream STARTS; packs are per-source; a boundary-spanning doc
    overflows its pack but never splits."""
    from gis_shapefile_spark.operators import splits as SP

    # token counts: 4, 4, 4 -> with budget 10, doc2 starts at offset 8
    # (inside pack 0) and overflows it; doc3 starts at 12 -> pack 1
    rows = [
        (0, "a", "w w w w"),
        (1, "a", "x x x x"),
        (2, "a", "y y y y"),
        (3, "a", "z z"),
        (10, "b", "only doc in b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: r.pack_id
        for r in SP.seq_pack(df, budget_tokens=10).collect()
    }
    assert got[0] == 0          # starts at 0
    assert got[1] == 0          # starts at 4
    assert got[2] == 0          # starts at 8 (< 10): overflow stays in pack 0
    assert got[3] == 1          # starts at 12
    assert got[10] == 0         # independent per-source stream


def test_interleave_pack_semantics(spark):
    """Interleaved multimodal packing: a doc's cost is text tokens +
    tokens_per_image * n attached images; zero-image docs reduce exactly
    to seq_pack; assignments match a pandas prefix-sum oracle."""
    from gis_shapefile_spark.operators import splits as SP

    rows = [
        (0, "a", "w w w w"),   # 4 tok + 2 img*3 = 10
        (1, "a", "x x x x"),   # 4 tok + 0     = 4
        (2, "a", "y y y y"),   # 4 tok + 1 img*3 = 7
        (3, "a", "z z"),       # 2 tok
        (10, "b", "only doc in b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    image_docs = spark.createDataFrame(
        [(0,), (0,), (2,)], "doc_id long"
    )
    got = {
        r.doc_id: (r.n_img, r.pack_id)
        for r in SP.interleave_pack(
            docs, image_docs, tokens_per_image=3, budget_tokens=10
        ).collect()
    }
    # prefix sums in doc order for source a: 0, 10, 14, 21
    assert got[0] == (2, 0)    # starts at 0
    assert got[1] == (0, 1)    # starts at 10 -> pack 1
    assert got[2] == (1, 1)    # starts at 14 -> pack 1
    assert got[3] == (0, 2)    # starts at 21 -> pack 2
    assert got[10] == (0, 0)   # independent per-source stream

    # with no images at all, interleave_pack == seq_pack on every doc
    empty = spark.createDataFrame([], "doc_id long")
    a = {
        r.doc_id: r.pack_id
        for r in SP.interleave_pack(
            docs, empty, tokens_per_image=3, budget_tokens=10
        ).collect()
    }
    b = {
        r.doc_id: r.pack_id
        for r in SP.seq_pack(df=docs, budget_tokens=10).collect()
    }
    assert a == b


def test_paragraph_dedup_first_occurrence_semantics(spark):
    """Cross-corpus paragraph dedup: a repeated paragraph survives only
    in its first (doc_id, pos) occurrence; docs re-assemble in order;
    a doc whose every paragraph is a repeat still emits an empty row;
    whitespace-only paragraphs are dropped without deduping each other."""
    docs = [
        (1, "alpha\n\nshared one\n\nbeta"),
        (2, "shared one\n\ngamma\n\nshared two"),
        (3, "shared two\n\nshared one"),          # all repeats
        (4, "   \n\ndelta\n\n   "),               # whitespace paras
        (5, "alpha"),                             # repeat of doc 1 pos 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in DD.paragraph_dedup(df).collect()
    }
    assert out[1] == ("alpha\n\nshared one\n\nbeta", 3, 0)
    assert out[2] == ("gamma\n\nshared two", 2, 1)
    assert out[3] == ("", 0, 2)   # fully-deduped doc still present
    assert out[4] == ("delta", 1, 0)  # whitespace paras neither kept nor counted
    assert out[5] == ("", 0, 1)


def _greedy_pack_oracle(sizes, cap):
    """Pure-Python never-overflow greedy packing: item -> shard id."""
    out, cur, sid = [], 0, 0
    for s in sizes:
        if out and cur + s > cap:
            sid += 1
            cur = 0
        cur += s
        out.append(sid)
    return out


def test_shard_pack_matches_greedy_oracle(spark):
    from gis_shapefile_spark.operators import splits as SP

    rng = np.random.default_rng(5)
    rows = []
    for src in ("web", "books"):
        for i in range(400):
            rows.append(
                dict(
                    source=src,
                    image_id=f"{src}_{i:05d}",
                    n_bytes=int(rng.integers(1, 900)),
                )
            )
    # plant oversize items (> capacity): each must get its own shard
    rows[17]["n_bytes"] = 5000
    rows[450]["n_bytes"] = 7000
    pdf = pd.DataFrame(rows)
    cap = 2048
    out = (
        SP.shard_pack(
            spark.createDataFrame(pdf).repartition(7),
            "n_bytes", "image_id", "source", cap,
            block_budget=cap * 8,  # small blocks so multiple blocks exist
        )
        .toPandas()
        .sort_values(["source", "image_id"])
        .reset_index(drop=True)
    )
    assert len(out) == len(pdf)
    assert out.groupby("source")["pack_block"].nunique().min() > 1
    for (_, _), g in out.groupby(["source", "pack_block"]):
        g = g.sort_values("image_id")
        # exact greedy within the block, via the pure-Python oracle
        assert g["shard"].tolist() == _greedy_pack_oracle(
            g["n_bytes"].tolist(), cap
        )
        # hard-capacity invariant: no multi-item shard exceeds capacity
        per = g.groupby("shard")["n_bytes"].agg(["sum", "count"])
        assert ((per["sum"] <= cap) | (per["count"] == 1)).all()
        # tightness: shard s+1's first item cannot fit into shard s
        for sid in range(int(g["shard"].max())):
            fill = per.loc[sid, "sum"]
            nxt = g[g["shard"] == sid + 1].iloc[0]["n_bytes"]
            assert fill + nxt > cap
    # oversize items sit alone
    for iid in ("web_00017", "books_00050"):
        row = out[out.image_id == iid]
        if len(row):
            key = row.iloc[0]
            mates = out[
                (out.source == key.source)
                & (out.pack_block == key.pack_block)
                & (out.shard == key.shard)
            ]
            assert len(mates) == 1 or key.n_bytes <= cap


def test_shard_pack_deterministic_across_partitionings(spark):
    from gis_shapefile_spark.operators import splits as SP

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        dict(
            source=["s"] * 300,
            image_id=[f"i{i:04d}" for i in range(300)],
            n_bytes=rng.integers(1, 500, 300),
        )
    )
    outs = []
    for parts in (1, 13):
        df = spark.createDataFrame(pdf).repartition(parts)
        outs.append(
            SP.shard_pack(df, "n_bytes", "image_id", "source", 1000)
            .toPandas().sort_values("image_id")[["pack_block", "shard"]]
            .to_numpy().tolist()
        )
    assert outs[0] == outs[1]


def test_shard_pack_kernel_fuzz_vs_oracle():
    """The searchsorted greedy kernel vs the pure-Python oracle on
    adversarial size streams: zeros, exact-capacity hits, oversize runs,
    all-equal, alternating big/small — driver-side (the Spark plumbing is
    covered by the distributed tests above)."""
    import numpy as np
    from gis_shapefile_spark.operators.splits import greedy_shard_ids

    def kernel(sizes, cap):
        return greedy_shard_ids(sizes, cap).tolist()

    rng = np.random.default_rng(21)
    cases = [
        ([0, 0, 0, 5, 0], 5),
        ([5, 5, 5], 5),            # exact-capacity hits: one per shard? no — fits exactly
        ([3, 2, 5, 1, 4], 5),      # boundary-exact packing
        ([10, 10, 1], 5),          # oversize run then small
        ([1] * 50, 7),
        ([4, 4, 4, 4], 8),
    ]
    for _ in range(200):
        n = int(rng.integers(1, 60))
        cap = int(rng.integers(1, 40))
        sizes = rng.integers(0, 50, n).tolist()
        cases.append((sizes, cap))
    for sizes, cap in cases:
        assert kernel(sizes, cap) == _greedy_pack_oracle(sizes, cap), (sizes, cap)


# ---------------------------------------------------------------------------
# exact substring (duplicate-span) dedup
# ---------------------------------------------------------------------------

def _ssd_oracle(texts: list[tuple[int, str]], k: int) -> dict:
    """Sequential reference: first global occurrence (doc order, then
    position) of every k-gram keeps; every later occurrence's k tokens
    drop."""
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in texts}
    seen: set[str] = set()
    cov: dict[int, set] = {d: set() for d, _ in texts}
    for d in sorted(toks):
        tt = toks[d]
        for i in range(len(tt) - k + 1):
            g = " ".join(tt[i : i + k])
            if g in seen:
                cov[d].update(range(i, i + k))
            else:
                seen.add(g)
    out = {}
    for d in sorted(toks):
        kept = [t for i, t in enumerate(toks[d]) if i not in cov[d]]
        out[d] = (" ".join(kept), len(kept), len(toks[d]) - len(kept))
    return out


def _run_ssd(spark, texts, k):
    df = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    got = DD.substring_dedup(df, k=k).collect()
    return {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped) for r in got}


def test_substring_dedup_planted_spans(spark):
    tail = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = [
        (0, "unique words one " + tail),          # first occurrence keeps
        (1, "other prefix two three " + tail),    # loses exactly the tail
        (2, "totally unrelated text with no repeats at all here"),
        (3, tail),                                # fully duplicated doc
        (4, "short doc"),                         # < k tokens: untouched
    ]
    got = _run_ssd(spark, texts, k=8)
    assert got == _ssd_oracle(texts, 8)
    assert got[0][0].endswith(tail)          # first keeps the span
    assert got[1] == ("other prefix two three", 4, 8)
    assert got[3] == ("", 0, 8)              # row survives, text empty
    assert got[4] == ("short doc", 2, 0)


def test_substring_dedup_intra_doc_repetition(spark):
    span = "a1 b2 c3 d4 e5 f6 g7 h8"
    texts = [(0, span + " filler " + span)]
    got = _run_ssd(spark, texts, k=8)
    assert got == _ssd_oracle(texts, 8)
    # the second occurrence inside the SAME doc drops
    assert got[0][0] == span + " filler"


def test_substring_dedup_fuzz_matches_python_oracle(spark):
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab forces collisions
    texts = [
        (d, " ".join(rng.choice(vocab, size=int(rng.integers(3, 40)))))
        for d in range(60)
    ]
    for k in (2, 3, 5):
        assert _run_ssd(spark, texts, k=k) == _ssd_oracle(texts, k), k


def test_substring_dedup_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        DD.substring_dedup(None, k=1)


def test_pq_encode_and_adc_match_numpy_twin(spark):
    """PQ codes and ADC scores == the exact python twin (same
    left-to-right IEEE accumulation, same first-occurrence argmin, same
    floor-integerized LUT), and the top-k ranking follows (adc_u ASC,
    vec_id ASC)."""
    pdf = _vecs(150, dim=16)
    vmat = np.array([np.array(e, np.float64) for e in pdf["embedding"]])
    cbs = SIM.make_pq_codebooks(16, m=4, k=8, seed=5)
    df = spark.createDataFrame(pdf)
    codes = SIM.pq_encode(df, cbs).toPandas().sort_values("vec_id")
    assert list(codes.columns) == ["vec_id", "code0", "code1", "code2", "code3"]
    q = vmat[0]
    exp_codes, exp_adc = SIM.pq_numpy_twin(vmat, q, cbs)
    got_codes = codes[["code0", "code1", "code2", "code3"]].to_numpy()
    assert (got_codes == exp_codes).all()
    assert got_codes.min() >= 0 and got_codes.max() < 8

    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = (
        SIM.pq_adc_topk(SIM.pq_encode(df, cbs), queries, cbs, k=10)
        .toPandas().sort_values("rank")
    )
    order = np.lexsort((np.arange(len(exp_adc)), exp_adc))[:10]
    assert list(out["vec_id"]) == [int(i) for i in order]
    assert list(out["adc_u"]) == [int(exp_adc[i]) for i in order]
    assert list(out["rank"]) == list(range(1, 11))


def test_pq_trained_recall_beats_random_codebooks(spark):
    """pq_fit (per-subspace Lloyd on a sample) must yield usable ADC
    recall@10 vs exact L2 and beat untrained Gaussian codebooks
    (quantization quality is a MEASURED property, the ann_recall
    discipline). Corpus is a cluster mixture — on ISOTROPIC Gaussian
    data training provably cannot help (no subspace structure; measured
    0.3875 == 0.3875), so a structured corpus is the honest fixture.
    The random-codebook arm runs through the python twin (engine ==
    twin is pinned exactly by the parity test above)."""
    import pandas as pd

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 2
    assign = rng.randint(0, 8, 400)
    vmat = centers[assign] + rng.standard_normal((400, 16)) * 0.3
    pdf = pd.DataFrame({
        "vec_id": range(400), "embedding": [r.tolist() for r in vmat]
    })
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        qi: set(
            np.argsort(((vmat - vmat[qi]) ** 2).sum(axis=1), kind="stable")[:10]
        )
        for qi in range(8)
    }
    trained_cb = SIM.pq_fit(vmat, m=4, k=16)
    out = SIM.pq_adc_topk(
        SIM.pq_encode(df, trained_cb), queries, trained_cb, k=10
    ).toPandas()
    trained = sum(
        int(r.vec_id) in exact[int(r.query_id)] for r in out.itertuples()
    ) / (8 * 10)

    random_cb = SIM.make_pq_codebooks(16, m=4, k=16)
    hits = 0
    for qi in range(8):
        _, adc = SIM.pq_numpy_twin(vmat, vmat[qi], random_cb)
        order = np.lexsort((np.arange(len(adc)), adc))[:10]
        hits += len(set(order) & exact[qi])
    untrained = hits / (8 * 10)
    assert trained >= 0.3, trained  # measured 0.375
    assert trained > untrained, (trained, untrained)  # measured 0.2875


def test_pq_validation():
    with pytest.raises(ValueError):
        SIM.make_pq_codebooks(10, m=4)
    with pytest.raises(ValueError):
        SIM.pq_fit(np.zeros((10, 10)), m=4)


def test_pq_rerank_degenerate_equals_cosine_topk(spark):
    """Two-stage retrieval with shortlist >= corpus size must be
    BIT-EXACT cosine_topk: the ADC stage can only drop candidates, and
    the exact rescoring makes the survivors' ordering identical to
    brute force — with nothing dropped, the stages compose to the
    brute-force ranking (the rerank twin of ivfpq's nprobe == C
    degradation pin)."""
    pdf = _vecs(120, dim=16)
    df = spark.createDataFrame(pdf)
    cbs = SIM.make_pq_codebooks(16, m=4, k=8, seed=5)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = (
        SIM.pq_rerank_topk(df, SIM.pq_encode(df, cbs), queries, cbs,
                           shortlist=120, k=7)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    exp = (
        SIM.cosine_topk(df, queries, k=7)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got[["query_id", "rank", "vec_id", "cos_u"]].equals(
        exp[["query_id", "rank", "vec_id", "cos_u"]]
    )


def test_pq_rerank_is_exact_on_the_shortlist(spark):
    """With a tight shortlist: (a) every returned id came from the ADC
    shortlist (stage 2 fetches, never widens); (b) the returned ranking
    is EXACTLY the brute-force cosine ranking restricted to the
    shortlist ids (precision among survivors is never lost); (c) recall
    vs exact top-k is monotone in shortlist depth."""
    pdf = _vecs(200, dim=16, seed=9)
    df = spark.createDataFrame(pdf)
    cbs = SIM.make_pq_codebooks(16, m=4, k=8, seed=5)
    codes = SIM.pq_encode(df, cbs)
    queries = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    out = SIM.pq_rerank_topk(
        df, codes, queries, cbs, shortlist=25, k=k
    ).toPandas()
    shortl = SIM.pq_adc_topk(codes, queries, cbs, k=25).toPandas()
    brute = SIM.cosine_topk(df, queries, k=200).toPandas()
    recalls = {}
    for qi in range(5):
        cand = set(shortl[shortl.query_id == qi].vec_id)
        got = out[out.query_id == qi].sort_values("rank")
        assert set(got.vec_id) <= cand  # (a)
        bq = brute[brute.query_id == qi].sort_values("rank")
        restricted = bq[bq.vec_id.isin(cand)].head(k)
        assert list(got.vec_id) == list(restricted.vec_id)  # (b)
        assert list(got.cos_u) == list(restricted.cos_u)
        exact_k = set(bq.head(k).vec_id)
        recalls[qi] = len(set(got.vec_id) & exact_k) / k
    # (c) full-corpus shortlist has recall 1.0 >= any tight shortlist
    assert all(0.0 <= r <= 1.0 for r in recalls.values())
    mean_recall = sum(recalls.values()) / len(recalls)
    assert mean_recall >= 0.2, recalls  # ADC with K=8 codes still finds some


def test_ivfpq_index_matches_pq_brute_and_prunes(spark, tmp_path):
    """IVF-PQ composition: (a) the index stores CODES ONLY (no embedding
    column — the 64x point); (b) nprobe == n_centroids degrades exactly
    to pq_adc_topk over the full code table (the IVF layer only removes
    candidates, never rescores); (c) the probed read prunes partitions;
    (d) a carry-col `where` equals pre-filtered PQ brute."""
    import os

    pdf = _vecs(150)
    pdf["label"] = [i % 3 for i in range(150)]
    df = spark.createDataFrame(pdf)
    vmat = np.array([np.array(e) for e in pdf["embedding"]])
    cents = SIM.kmeans_fit(vmat, n_centroids=4)
    cbs = SIM.make_pq_codebooks(16, m=4, k=8, seed=5)
    idx = str(tmp_path / "ivfpq_idx")
    SIM.ivfpq_write_index(df, cents, cbs, idx, carry_cols=("label",))
    stored = spark.read.parquet(idx)
    assert "embedding" not in stored.columns
    assert {"vec_id", "label", "code0", "code1", "code2", "code3"} <= set(
        stored.columns
    )
    assert sum(
        1 for d in os.listdir(idx) if d.startswith("bucket=")
    ) >= 2

    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.adc_u) for r in rows
    )
    full_probe = SIM.ivfpq_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, codebooks=cbs, nprobe=4
    )
    brute = SIM.pq_adc_topk(SIM.pq_encode(df, cbs), queries, cbs, k=5)
    assert key(full_probe.collect()) == key(brute.collect())

    pruned = SIM.ivfpq_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, codebooks=cbs, nprobe=2
    )
    rows = pruned.collect()
    assert len(rows) == 4 * 5
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan

    filtered = SIM.ivfpq_topk_indexed(
        spark, idx, queries, k=5, centroids=cents, codebooks=cbs, nprobe=4,
        where="label = 1",
    )
    brute_f = SIM.pq_adc_topk(
        SIM.pq_encode(df.where("label = 1"), cbs), queries, cbs, k=5
    )
    assert key(filtered.collect()) == key(brute_f.collect())


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (functions/text_analysis.py::bm25_term_score_sql)
# ---------------------------------------------------------------------------

def test_bm25_idf_ln_parity_exhaustive(spark):
    """The ONE libm call in the BM25 tree (ln in the idf) pinned
    engine-vs-oracle over the ENTIRE df domain the corpora can produce:
    every df in 0..N for several N, crossed with representative
    (tf, dl, sum_dl) values, must floor-integerize identically in Spark
    (JVM Math.log) and DuckDB (std::log). Exhaustive over the actual
    input set, not a sample — if this passes, the gate's hash can never
    flip on an idf ulp."""
    import duckdb

    rows = []
    for n_docs, sum_dl in ((500, 24_000), (601, 90_017)):
        for df in range(0, n_docs + 1):
            for tf, dl in ((1, 7), (3, 40), (25, 553)):
                rows.append((tf, df, dl, n_docs, sum_dl))
    pdf = pd.DataFrame(
        rows, columns=["tf", "df", "dl", "n_docs", "sum_dl"]
    ).astype("int64")
    expr = TA.bm25_term_score_sql("tf", "df", "dl", "n_docs", "sum_dl")
    got = (
        spark.createDataFrame(pdf)
        .select("tf", "df", F.expr(expr).alias("s"))
        .toPandas()
        .sort_values(["df", "tf"])["s"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = (
        con.sql(f"SELECT tf, df, {expr} AS s FROM t ORDER BY df, tf")
        .df()["s"]
        .tolist()
    )
    assert got == exp


def test_bm25_rank_matches_python_twin_and_orders_sanely(spark):
    """End-to-end BM25 over a hand corpus == a python twin evaluating
    the same expression tree with math.log (exact integer equality),
    and the ranking behaves: term-stuffed short doc first, passing
    mention later, term-free docs score exactly 0 and sort by doc_id."""
    import math

    texts = {
        0: "spark spark spark join",                      # stuffed, short
        1: "the corpus has one spark mention " + "filler " * 20,
        2: "nothing relevant here at all " + "pad " * 10,
        3: "join window join window spark",               # all three terms
        4: "plain words only",
    }
    terms = ("spark", "join", "window")
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    docs = spark.createDataFrame(pdf)
    toks = TA.tokens_sql("text", "spark")
    per = docs.select(
        "doc_id",
        F.expr(TA._arr_len(toks, "spark")).alias("dl"),
        *[
            F.expr(TA.term_tf_sql(toks, t, "spark")).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    score = " + ".join(
        TA.bm25_term_score_sql(f"tf{i}", f"df{i}", "dl", "n_docs", "sum_dl")
        for i in range(len(terms))
    )
    got = {
        r.doc_id: r.score_u
        for r in per.crossJoin(F.broadcast(stats))
        .withColumn("score_u", F.expr(score))
        .collect()
    }

    # python twin: same tree, same evaluation order, floor per term
    tok = {d: t.strip().lower().split() for d, t in texts.items()}
    n = len(texts)
    dls = {d: len(ts) for d, ts in tok.items()}
    sum_dl = sum(dls.values())
    exp = {}
    for d, ts in tok.items():
        s = 0
        for t in terms:
            tf = ts.count(t)
            df = sum(1 for ts2 in tok.values() if t in ts2)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            sat = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / (sum_dl / n)))
            s += math.floor(1000000.0 * idf * sat)
        exp[d] = s
    assert got == exp
    order = sorted(got, key=lambda d: (-got[d], d))
    assert order[0] == 3 or order[0] == 0  # term-rich docs lead
    assert got[2] == 0 and got[4] == 0     # term-free docs score exactly 0
    assert got[0] > got[1]                 # stuffed short beats passing mention


def test_bm25_term_tf_rejects_unsafe_literals():
    with pytest.raises(ValueError):
        TA.term_tf_sql("toks", "o'brien")


def test_doc_logprob_matches_python_twin(spark):
    """Unigram-LM scoring == a math.log python twin evaluating the same
    integerized trees (floor@1e6 per token BEFORE the doc sum, final
    floored mean of two exact integers); ranking sanity: the doc made
    of corpus-common tokens scores a LOWER mean surprise than the doc
    of hapaxes."""
    import math

    texts = {
        0: "the the the cat sat",
        1: "the cat sat on the mat",
        2: "zyx qwv plk jhg",          # all hapaxes
        3: "the the the the",
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    docs = spark.createDataFrame(pdf)
    toks = TA.tokens_sql("text", "spark")
    ex = docs.select(
        "doc_id", F.explode(F.expr(toks)).alias("token")
    ).where(F.col("token") != "")
    vocab = ex.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    logp = ("CAST(floor(CAST(1000000 AS DOUBLE) * "
            "ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))) AS BIGINT)")
    model = vocab.crossJoin(F.broadcast(total)).selectExpr(
        "token", f"{logp} AS logp_u"
    )
    got = {
        r.doc_id: (r.n_tokens, r.sum_logp_u)
        for r in ex.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
             F.sum("logp_u").alias("sum_logp_u"))
        .collect()
    }

    tok = {d: t.split() for d, t in texts.items()}
    cnt: dict = {}
    for ts in tok.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    total_n = sum(cnt.values())
    lp = {t: math.floor(1000000.0 * math.log(c / total_n))
          for t, c in cnt.items()}
    exp = {d: (len(ts), sum(lp[t] for t in ts)) for d, ts in tok.items()}
    assert got == exp
    mean = {d: -s / n for d, (n, s) in got.items()}
    assert mean[3] < mean[0] < mean[2]  # common-only < mixed < hapax-only
