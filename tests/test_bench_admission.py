"""Unit tests for bench.py's admission planner and reserve math.

Pure-Python (no SparkSession): the round-3 verdict's bench defects were
all planner-level (unenforced reserve, non-atomic ratio pairs, missing
cost coverage), so the planner invariants get their own fast guard.
"""

import time

import pytest

import bench

ALL_NAMES = [n for n, _, _, _ in bench.ENTRY_PLAN]
PRIO = {n: p for n, p, _, _ in bench.ENTRY_PLAN}


@pytest.fixture(autouse=True)
def _fresh_clock(monkeypatch):
    """plan_entries budgets against wall time since bench-module IMPORT
    (_T0); under pytest other suites may burn minutes between import and
    this module, which would make the planner believe the budget is
    already spent (observed: a clean-window admission test failing only
    when run after the Spark suites). Pin _T0 to now for each test."""
    monkeypatch.setattr(bench, "_T0", time.time())


def test_entry_plan_is_well_formed():
    assert len(set(ALL_NAMES)) == len(ALL_NAMES), "duplicate entry names"
    for name, prio, est, reps in bench.ENTRY_PLAN:
        assert prio in (0, 1, 2), name
        assert est > 0, name
        assert reps >= 1, name
    # every planned entry has a documented best-worst range so the
    # artifact can annotate within_calibrated_range for it
    missing = [n for n in ALL_NAMES if n not in bench.DOC_RANGES]
    assert not missing, f"DOC_RANGES missing: {missing}"
    for n, (lo, hi) in bench.DOC_RANGES.items():
        assert 0 < lo < hi, n


def test_bundles_reference_planned_entries():
    for a, b in bench.BUNDLES:
        assert a in ALL_NAMES and b in ALL_NAMES, (a, b)
        # the first leg must come earlier so its admission decides both
        assert ALL_NAMES.index(a) < ALL_NAMES.index(b), (a, b)


def test_priority0_always_admitted_even_when_degraded():
    admitted, reps_of = bench.plan_entries(degradation=50.0, scaling_pairs=2)
    for n in ALL_NAMES:
        if PRIO[n] == 0:
            assert n in admitted, n
            assert reps_of[n] >= 1
    # a 50x window must shed the sheddable tail
    assert any(PRIO[n] == 2 and n not in admitted for n in ALL_NAMES)


def test_bundles_admit_all_or_nothing():
    # sweep degradation so the budget boundary crosses every bundle's
    # cost at some point; the pair must never split
    for d in (1.0, 1.3, 1.7, 2.1, 2.6, 3.2, 4.5, 8.0, 20.0, 50.0):
        admitted, reps_of = bench.plan_entries(degradation=d, scaling_pairs=2)
        for a, b in bench.BUNDLES:
            assert (a in admitted) == (b in admitted), (d, a, b)
            if a in admitted:
                assert a in reps_of and b in reps_of
        # reps bookkeeping matches admission exactly
        assert set(reps_of) == admitted


def test_clean_window_admits_everything():
    admitted, _ = bench.plan_entries(degradation=1.0, scaling_pairs=2)
    assert admitted == set(ALL_NAMES)


def test_scaling_reserve_capped_at_half_budget():
    assert bench.scaling_reserve(1.0, 0) == 0.0
    r = bench.scaling_reserve(1.0, 3)
    assert 0 < r <= 0.5 * bench.BENCH_BUDGET
    # a degraded window cannot reserve the whole budget away
    assert bench.scaling_reserve(10.0, 3) <= 0.5 * bench.BENCH_BUDGET


def test_prio01_suite_est_monotone_in_degradation():
    assert bench.prio01_suite_est(2.0) >= bench.prio01_suite_est(1.0) > 0


def test_retry_mode_only_filter_and_no_prio0_auto_admit():
    """Second-chance pass semantics: only the shed names are considered,
    priority-0 auto-admission is off (a retry never re-runs a recorded
    headline), and bundles stay atomic inside the retry."""
    only = {"ann1m_brute", "ann1m_ivf", "pricing_summary"}
    admitted, reps_of = bench.plan_entries(
        degradation=1.0, scaling_pairs=0, only=only
    )
    assert admitted <= only
    # clean-window budget: everything in `only` fits
    assert admitted == only
    assert set(reps_of) == admitted

    # priority-0 names outside `only` are NOT admitted in retry mode
    admitted2, _ = bench.plan_entries(
        degradation=1.0, scaling_pairs=0, only={"pricing_summary"}
    )
    assert admitted2 == {"pricing_summary"}
    assert not any(bench.ENTRY_PLAN[i][0] in admitted2 for i in range(2)
                   if bench.ENTRY_PLAN[i][1] == 0)

    # bundle atomicity survives in retry mode under a hostile window:
    # at extreme degradation the pair either fully admits or fully sheds
    admitted3, _ = bench.plan_entries(
        degradation=200.0, scaling_pairs=0,
        only={"ann1m_brute", "ann1m_ivf"},
    )
    assert admitted3 in (set(), {"ann1m_brute", "ann1m_ivf"})
    assert admitted3 == set()  # nothing fits a 200x window


def test_realized_degradation_median_and_worst():
    """Split-window evidence (the D=18.6 validation run): the median
    prices the typical entry, the max guards the worst; both floored at
    1.0, and an empty suite falls back to (1.0, None) -> probe D."""
    # the actual D=18.6 run's realized multipliers
    med, worst = bench.realized_degradation(
        {"pip_join": 16.8, "tiling": 1.04, "sessionize": 3.3,
         "pricing_summary": 2.2}
    )
    assert med == pytest.approx(2.75)
    assert worst == pytest.approx(16.8)
    # sub-1.0 medians floor (a faster-than-best window cannot shrink
    # estimates below the best-window plan)
    med, worst = bench.realized_degradation({"a": 0.4, "b": 0.6, "c": 0.5})
    assert med == 1.0 and worst == 1.0
    assert bench.realized_degradation({}) == (1.0, None)


def test_second_chance_median_admits_more_than_global_d():
    """The defect the re-pricing fixes: with the probe's global D=18.6
    the second-chance admits almost nothing from a 195s window, while
    the realized median (2.75 in that window) admits the cheap tail."""
    shed = {"dedup_components", "dedup_minhash", "knn3", "ann_topk",
            "ann_ivf", "image_neardup", "pyramid_full", "pyramid_delta"}
    # simulate 225s already spent of the 420s budget
    bench._T0 = time.time() - (bench.BENCH_BUDGET - 195.0)
    with_global, _ = bench.plan_entries(18.6, 0, only=shed)
    with_median, _ = bench.plan_entries(2.75, 0, only=shed)
    assert len(with_median) > len(with_global)
    # every globally-admitted entry stays admitted under the median
    assert with_global <= with_median
