"""Driver-contract guards.

The driver's correctness gate enumerates only the first
``__spark_entry__.DRIVER_CAP`` (50) entries of ``queries()``.  Round 2
lost 18 flagship rows (including ``image_tiling``) to that cap, so the
ordering is now explicit and these tests pin it: every query that has
never had a driver-green artifact row, and every query that is the ONLY
oracle for a SURVEY §2 / LLM-pipeline row, must sit inside the cap;
everything past the cap must be named in the prior-green ledger below.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402
from tools.check_correctness import canon, dtype_mismatches  # noqa: E402

# Queries with a green row in CORRECTNESS_r01.json and/or r02.json that
# are safe past the cap (relational demos / redundant variants whose
# SURVEY row is also covered by an in-cap oracle).
PRIOR_GREEN = {
    "vector_stats", "cell_assign", "cell_hist", "knn3_ring", "set_ops",
    "dedup_simhash", "polygon_stats", "pricing_summary",
    "top_revenue_orders", "regional_volume", "priority_rollup",
    "priority_cube", "quiet_customers", "promo_revenue",
    "above_avg_orders", "median_balances", "distinct_users", "json_props",
    # displaced in round 3 to make room for pyramid_delta/pyramid_update/
    # wm_tiles/render_tiles: driver-green in BOTH r1+r2; token/quality SQL
    # builders stay in-cap via caption_curation, W1 argmax and the F1/F2
    # normalize+tokenize path via geocode_forward
    "token_count", "quality_score", "top1_per_group", "normalize",
}

# Rotated out in round 4: all seven have a green row in
# CORRECTNESS_r03.json (rows + schema + value hash). Their operator
# families stay driver-exercised in-cap: the pyramid delta/MERGE path via
# tile_pyramid + merge_upsert, web-mercator via render_tiles, the skew
# heavy-hitter profile via tile_bounds (+ bench skew evidence), gapfill's
# temporal family via sessionize/asof_join/interval_join/running_windows,
# and the splits SQL-builder family via mixture_sample/train_val_split/
# stratified_sample/quality_deciles/vocab_topk.
R3_GREEN = {
    "pyramid_delta", "pyramid_update", "wm_tiles", "cell_skew",
    "hourly_gapfill", "epoch_mix", "source_cap",
    # vacated its cap slot mid-round-4 for ann_ivf_delta; green in r03
    # and its splits SQL-builder family stays in-cap 4 ways
    "vocab_topk",
    # vacated their slots mid-round-4 for pii_scrub + seq_pack: both are
    # TRIPLE-green (r1+r2+r3) and the temporal family stays in-cap via
    # running_windows/events_window/sessionize
    "asof_join", "interval_join",
    # vacated its slot mid-round-4 for paragraph_dedup (r3-green; splits
    # family stays in-cap via train_val_split/quality_deciles/
    # mixture_sample/seq_pack)
    "stratified_sample",
    # vacated its slot late in round 4 for ar_bucket (r3-green; the
    # embedding family stays in-cap 5 ways via ann_topk/ann_ivf/
    # ann_ivf_delta/embedding_neardup/crossmodal_align)
    "embedding_quantize",
    # vacated its slot late in round 4 for mm_interleave_pack (r3-green;
    # the lang-ID builder stays driver-exercised in-cap via
    # corpus_curation's lang_pred filter)
    "lang_id",
    # vacated its slot late in round 4 for image_canon (r3-green; the
    # connected-components kernel stays driver-exercised in-cap THROUGH
    # image_canon, which composes the same operator)
    "dedup_components",
    # vacated its slot late in round 4 for image_takedown (TRIPLE-green
    # r1+r2+r3; the exact hash-group-by kernel stays driver-exercised
    # in-cap via paragraph_dedup's exact paragraph-hash grouping)
    "dedup_exact",
    # vacated its slot late in round 4 for ann_filtered (TRIPLE-green
    # r1+r2+r3; the rolling-hash fingerprint builder stays covered by
    # the cross-engine fuzz suite)
    "doc_fingerprint",
    # vacated its slot late in round 4 for hotspot_clusters (TRIPLE-green
    # r1+r2+r3; the temporal family stays in-cap via running_windows +
    # sessionize, and the tumbling-window builder is pytest-covered by
    # the streaming batch-parity suite)
    "events_window",
    # vacated its slot late in round 4 for wds_roundtrip (r2+r3-green;
    # the text-quality family stays in-cap via boilerplate +
    # caption_curation)
    "repetition",
    # vacated its slot late in round 4 for ann_recall (TRIPLE-green
    # r1+r2+r3; the brute cosine_topk kernel stays driver-exercised
    # in-cap THROUGH ann_recall's ground-truth arm)
    "ann_topk",
    # vacated its slot late in round 4 for joint_dedup (r1+r3-green; the
    # splits SQL-builder family stays in-cap via quality_deciles/
    # mixture_sample/seq_pack)
    "train_val_split",
}

# Never driver-verified before round 4 (the round-3 late additions plus
# the round-4 incremental-IVF addition): these MUST be driver-checked
# this round.
MUST_BE_IN_CAP = {
    "nearest_road", "nearest_road_big", "vector_outline", "trajectory",
    "zonal_stats", "map_match", "road_buffer", "ann_ivf_delta",
    "pii_scrub", "seq_pack", "paragraph_dedup", "ar_bucket",
    "mm_interleave_pack", "image_canon", "image_takedown", "ann_filtered",
    "hotspot_clusters", "wds_roundtrip", "ann_recall", "joint_dedup",
}


def test_registry_is_consistent():
    qs = E.queries()
    os_ = E.oracle_sql()
    # every query currently has a value-hash oracle; when a genuinely
    # non-SQL-expressible op is added, relax to <= AND list it here so
    # the weaker rows-only check is a documented decision, not a typo
    assert set(os_) == set(qs)
    # ordering helper raises on drift; reaching here means no drift
    assert len(qs) == len(set(qs))


def test_flagships_inside_driver_cap():
    names = list(E.queries())
    in_cap = set(names[: E.DRIVER_CAP])
    missing = MUST_BE_IN_CAP - in_cap
    assert not missing, f"flagship queries pushed past the driver cap: {missing}"


def test_overflow_only_prior_green():
    names = list(E.queries())
    overflow = set(names[E.DRIVER_CAP:])
    # Added past-cap late in round 4 with NO driver row yet: vouched by
    # the local oracle gate (check_correctness green vs the independent
    # all-shared-shingle brute-force SQL) + the == bruteforce pytest at
    # two thresholds. Rotate into the cap in round 5 for a driver row.
    local_gated_r4 = {
        "dedup_jaccard",
        # geodesic metric twins + KDE raster smoother: local gate +
        # numpy/known-distance pytest vouching (test_geodesic.py,
        # test_raster_smooth.py); round-5 rotation candidates
        "geo_nearest", "geo_within_km", "raster_smooth",
        # encode->decode->stats loop vs pure-integer-SQL pixel formula;
        # numpy-parity pytest in test_multimodal_tiling.py
        "image_quality",
        # ExactSubstr duplicate-span removal; pure-python oracle pytest
        # in test_pipeline_ops.py
        "substring_dedup",
        # isoband contours (smooth -> classify -> vectorize composition);
        # numpy-oracle pytest in test_raster_smooth.py
        "density_contours",
        # adaptive quadtree binning; disjoint-cover + python-recursion
        # oracle pytest in test_raster_smooth.py
        "adaptive_grid",
        # big-big self-join; == bruteforce pytest in test_spatial_joins.py
        "point_pairs",
        # geodesic trajectory twin; micro-oracle pytest in
        # test_trajectory.py
        "trajectory_geo",
        # radius-bounded kNN self-join; == bruteforce pytest in
        # test_spatial_joins.py
        "knn_self",
        # geodesic big-big self-join; == bruteforce pytest in
        # test_geodesic.py
        "geo_pairs",
        # scale-invariant image near-dup; identity-round-trip pytest in
        # test_multimodal_tiling.py
        "cross_scale_neardup",
        # geodesic kNN self-join; == bruteforce pytest in test_geodesic.py
        "geo_knn_self",
        # spherical polygon area; exact-quad + numpy-twin pytest in
        # test_geodesic.py
        "geo_polygon_area",
        # stay-point detection; micro-oracle pytest in test_trajectory.py
        "stay_points",
        # ANALYZE profile; oracle is a fully independent per-column
        # UNION ALL — no pytest needed beyond the contract suite
        "table_stats",
    }
    unvouched = overflow - PRIOR_GREEN - R3_GREEN - local_gated_r4
    assert not unvouched, (
        f"queries past the driver cap without a prior driver-green row: "
        f"{unvouched}"
    )


def test_docs_match_registry():
    """Doc-drift guard (round-3 verdict item 8): every oracle-query name
    COVERAGE.md cites must exist in ``queries()``, and the query counts
    README.md / COVERAGE.md advertise must equal the real registry size."""
    import re

    qs = set(E.queries())
    root = Path(__file__).resolve().parents[1]
    coverage = (root / "COVERAGE.md").read_text()
    readme = (root / "README.md").read_text()

    cited = set()
    for group in re.findall(r"oracles? ((?:`[a-z0-9_]+`(?:, ?)?)+)", coverage):
        cited.update(re.findall(r"`([a-z0-9_]+)`", group))
    assert cited, "COVERAGE.md oracle-name extraction regressed to empty"
    ghost = cited - qs
    assert not ghost, f"COVERAGE.md cites oracle queries not in queries(): {ghost}"

    n = len(qs)
    for doc, pattern in (
        ("COVERAGE.md", r"With (\d+) oracle-checked queries"),
        ("COVERAGE.md", r"All (\d+) remain runnable"),
        ("README.md", r"queries\(\)` \((\d+)"),
        ("README.md", r"ALL (\d+) with DuckDB value-hash oracles"),
    ):
        text = coverage if doc == "COVERAGE.md" else readme
        counts = re.findall(pattern, text)
        assert counts, f"{doc}: count pattern {pattern!r} no longer matches"
        for c in counts:
            assert int(c) == n, (
                f"{doc} claims {c} oracle queries; registry has {n}"
            )


def test_canon_catches_int_float_split():
    """The local mirror must fail on the round-2 running_windows class:
    identical rendered values but int64 on one engine, float64 on the
    other (DuckDB HUGEINT widening)."""
    a = pd.DataFrame({"k": [1, 2], "v": np.array([10, 20], dtype=np.int64)})
    b = pd.DataFrame({"k": [1, 2], "v": np.array([10.0, 20.0])})
    na, ca, ha, kla = canon(a)
    nb, cb, hb, klb = canon(b)
    assert (na, ca, ha) == (nb, cb, hb)  # the old mirror saw no difference
    assert dtype_mismatches(kla, klb) == ["v:int!=float"]


def test_canon_allows_nullable_int_promotion():
    """float64 *with NaN* may be a pandas nullable-int promotion on
    either engine — must stay compatible with int and with float."""
    a = pd.DataFrame({"v": np.array([1, 2], dtype=np.int64)})
    b = pd.DataFrame({"v": np.array([1.0, np.nan])})
    _, _, _, kla = canon(a)
    _, _, _, klb = canon(b)
    assert dtype_mismatches(kla, klb) == []
