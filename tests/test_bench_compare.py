"""Policy unit tests for scripts/bench_compare.py — the mechanical
bench-regression line (per-query common-set ratios with an additive
jitter allowance; sub-second queries can swing 1.4-1.9x with zero code
change, so a bare ratio threshold misfires)."""

import sys

sys.path.insert(0, "scripts")

from bench_compare import JITTER, RATIO, compare


def test_subsecond_jitter_never_flags():
    old = {"a": 0.30, "b": 0.57, "c": 0.83}
    new = {"a": 0.57, "b": 0.93, "c": 1.17}  # the r11 judge-flag trio
    r = compare(old, new)
    assert r["flagged"] == {}


def test_real_regression_on_slow_query_flags():
    r = compare({"q": 10.0}, {"q": 21.0})
    assert "q" in r["flagged"]
    assert r["flagged"]["q"]["ratio"] == 2.1


def test_boundary_is_ratio_times_old_plus_jitter():
    old = {"q": 2.0}
    line = RATIO * 2.0 + JITTER
    assert compare(old, {"q": line - 0.01})["flagged"] == {}
    assert "q" in compare(old, {"q": line + 0.01})["flagged"]


def test_added_removed_never_flag_and_median():
    r = compare({"a": 1.0, "gone": 5.0}, {"a": 1.0, "new": 50.0})
    assert r["flagged"] == {}
    assert r["added"] == ["new"] and r["removed"] == ["gone"]
    assert r["n_common"] == 1 and r["median_ratio"] == 1.0


def test_improvement_reported_symmetrically():
    r = compare({"q": 10.0}, {"q": 4.0})
    assert "q" in r["improved"] and r["flagged"] == {}
