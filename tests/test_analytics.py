"""Tests for operators/analytics.py — profiler, funnel, CDC apply —
and graph.shortest_paths."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import analytics as an
from beis_orp_data_service_spark.operators import graph as g


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


# ---------------------------------------------------------------- profiler


def test_profile_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "id bigint, tag string",
    )
    out = {
        r["column_name"]: r
        for r in an.profile_table(df, ["id", "tag"]).collect()
    }
    assert out["id"]["n_nonnull"] == 3
    assert out["id"]["ndv"] == 3
    assert out["id"]["min_value"] == "1"
    assert out["id"]["max_value"] == "3"
    assert out["tag"]["n_nonnull"] == 3
    assert out["tag"]["ndv"] == 2
    assert out["tag"]["min_value"] == "a"
    assert out["tag"]["max_value"] == "b"


def test_profile_numeric_minmax_is_typed_not_lexicographic(spark):
    # "9" > "10" lexicographically — the profile must use numeric order
    df = spark.createDataFrame([(9,), (10,), (100,)], "v bigint")
    row = an.profile_table(df, ["v"]).collect()[0]
    assert row["min_value"] == "9"
    assert row["max_value"] == "100"


def test_profile_single_job(spark):
    # the whole profile is ONE aggregate plan (Expand for the multi-
    # distinct) — no per-column jobs, no second scan
    df = spark.createDataFrame([(1, "a")], "id bigint, tag string")
    plan = an.profile_table(df, ["id", "tag"])._jdf.queryExecution().toString()
    assert plan.count("Expand") >= 1


# ------------------------------------------------------------------ funnel


def test_funnel_ordering_and_break(spark):
    rows = [
        # u1 completes all three in order
        (1, "view", _ts(1)),
        (1, "click", _ts(2)),
        (1, "buy", _ts(3)),
        # u2 clicks BEFORE viewing: click doesn't count, funnel stops at 1
        (2, "click", _ts(1)),
        (2, "view", _ts(2)),
        # u3 never views: not in the output at all
        (3, "click", _ts(1)),
        (3, "buy", _ts(2)),
        # u4 view->click but buy precedes click: stops at 2
        (4, "view", _ts(1)),
        (4, "buy", _ts(2)),
        (4, "click", _ts(3)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    out = {
        r["user_id"]: r
        for r in an.funnel(df, ["view", "click", "buy"]).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["max_step"] == 3 and out[1]["ts_3"] == _ts(3)
    assert out[2]["max_step"] == 1 and out[2]["ts_2"] is None
    assert out[4]["max_step"] == 2 and out[4]["ts_3"] is None


def test_funnel_strictly_after_ties_break(spark):
    # same-timestamp next step does NOT count (strict >)
    rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    out = an.funnel(df, ["view", "click"]).collect()
    assert out[0]["max_step"] == 1


def test_funnel_uses_first_qualifying_occurrence(spark):
    rows = [
        (1, "view", _ts(5)),
        (1, "click", _ts(2)),   # before the view — ignored
        (1, "click", _ts(7)),   # first qualifying
        (1, "click", _ts(9)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    out = an.funnel(df, ["view", "click"]).collect()[0]
    assert out["ts_2"] == _ts(7)


# --------------------------------------------------------------- cdc_apply


def _cdc_frames(spark):
    snap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    )
    changes = spark.createDataFrame(
        [
            (2, 1, "U", 21),   # update existing
            (2, 2, "U", 22),   # later seq wins
            (3, 1, "D", 0),    # delete existing
            (4, 1, "U", 40),   # insert new
            (5, 1, "D", 0),    # delete of absent key: no-op
        ],
        "k bigint, seq bigint, op string, v bigint",
    )
    return snap, changes


def test_cdc_apply_merge_semantics(spark):
    snap, changes = _cdc_frames(spark)
    out = {
        r["k"]: r["v"]
        for r in an.cdc_apply(snap, changes, "k", "seq", "op", ["v"]).collect()
    }
    assert out == {1: 10, 2: 22, 4: 40}


def test_cdc_apply_delete_then_update_last_wins(spark):
    snap = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    changes = spark.createDataFrame(
        [(1, 1, "D", 0), (1, 2, "U", 99)], "k bigint, seq bigint, op string, v bigint"
    )
    out = an.cdc_apply(snap, changes, "k", "seq", "op", ["v"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, 99)]
    # and the reverse order deletes
    changes2 = spark.createDataFrame(
        [(1, 2, "D", 0), (1, 1, "U", 99)], "k bigint, seq bigint, op string, v bigint"
    )
    assert an.cdc_apply(snap, changes2, "k", "seq", "op", ["v"]).count() == 0


def test_cdc_apply_is_single_aggregate_plus_one_join(spark):
    # the batch reduces via max(struct) with map-side partial_max —
    # never a row_number window funnel
    snap, changes = _cdc_frames(spark)
    plan = (
        an.cdc_apply(snap, changes, "k", "seq", "op", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_max" in plan


# ----------------------------------------------------------- shortest paths


def test_shortest_paths_picks_cheaper_longer_path(spark):
    # a->b direct w=10; a->c->b total w=3: min dist to b is 3
    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("c", "b", 2)], "src string, dst string, w bigint"
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["dist"] for r in g.shortest_paths(edges, srcs, 3).collect()}
    assert out == {"a": 0, "b": 3, "c": 1}


def test_shortest_paths_hop_bound(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)], "src string, dst string, w bigint"
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["dist"] for r in g.shortest_paths(edges, srcs, 2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}  # d is 3 hops away — excluded


def test_shortest_paths_cycle_safe_multi_source(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("b", "c", 5), ("s2", "c", 1)],
        "src string, dst string, w bigint",
    )
    srcs = spark.createDataFrame([("a",), ("s2",)], "node string")
    out = {r["node"]: r["dist"] for r in g.shortest_paths(edges, srcs, 4).collect()}
    assert out["c"] == 1  # via the second source, not the a->b->c=6 path
    assert out["a"] == 0 and out["b"] == 1


# ---------------------------------------------------------------- retention


def test_retention_known_matrix(spark):
    rows = [
        # u1 first seen week of Jan 1 (Mon), active weeks 0 and 2
        (1, dt.datetime(2024, 1, 2, 10)),
        (1, dt.datetime(2024, 1, 16, 10)),
        # u2 first seen week 1, active weeks 1 and 2
        (2, dt.datetime(2024, 1, 9, 10)),
        (2, dt.datetime(2024, 1, 17, 10)),
        # duplicate activity in the same week counts once
        (2, dt.datetime(2024, 1, 18, 10)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    from beis_orp_data_service_spark.operators.analytics import retention_cohorts

    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    w0 = dt.datetime(2024, 1, 1)
    w1 = dt.datetime(2024, 1, 8)
    assert out == {(w0, 0): 1, (w0, 2): 1, (w1, 0): 1, (w1, 1): 1}


# -------------------------------------------------------------- transitions


def test_transition_counts_tiebreak_deterministic(spark):
    # two events at the SAME ts: event_id orders them
    rows = [
        (10, 1, "a", _ts(1)),
        (11, 1, "b", _ts(2)),
        (12, 1, "c", _ts(2)),  # same ts as b: id 11 < 12 => b then c
        (13, 2, "a", _ts(1)),
        (14, 2, "b", _ts(5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    from beis_orp_data_service_spark.operators.analytics import transition_counts

    out = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_counts(df).collect()
    }
    assert out == {("a", "b"): 2, ("b", "c"): 1}


# ---------------------------------------------------------------- histogram


def test_value_histogram_clamps_and_bins(spark):
    from beis_orp_data_service_spark.operators.analytics import value_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (99.0,), (200.0,), (None,)],
        "v double",
    )
    out = {r["bin"]: r["n"] for r in value_histogram(df, "v", 0.0, 100.0, 20).collect()}
    # bin width 5: -5 clamps to 0; 0,4.9 -> 0; 5.0 -> 1; 99 -> 19; 200 clamps to 19
    assert out == {0: 3, 1: 1, 19: 2}


# ------------------------------------------------------------------ skyline


def _brute_skyline(points):
    out = []
    for i, p in enumerate(points):
        dominated = any(
            all(q[d] >= p[d] for d in range(len(p)))
            and any(q[d] > p[d] for d in range(len(p)))
            for j, q in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return set(out)


def test_skyline_matches_bruteforce_random(spark):
    import random

    from beis_orp_data_service_spark.operators.analytics import skyline

    rng = random.Random(7)
    pts = [(rng.uniform(0, 1), rng.uniform(0, 1), rng.uniform(0, 1)) for _ in range(200)]
    rows = [(i, *p) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double, z double").repartition(7)
    got = {r["id"] for r in skyline(df, ["x", "y", "z"], "id").collect()}
    assert got == _brute_skyline(pts)


def test_skyline_keeps_duplicate_maxima(spark):
    from beis_orp_data_service_spark.operators.analytics import skyline

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 1.0), (3, 0.5, 0.5)], "id bigint, x double, y double"
    )
    got = {r["id"] for r in skyline(df, ["x", "y"], "id").collect()}
    assert got == {1, 2}  # identical points don't dominate each other


# ------------------------------------------------------------- standardize


def test_standardize_known_values(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 5.0)], "grp string, v double"
    )
    out = {
        (r["grp"], r["v"]): r["z_micro"]
        for r in an.standardize_by_group(df, "grp", "v").collect()
    }
    # mean 2, pop std sqrt(2/3): z(1) = -1.224744..., micro -1224745
    assert out[("g", 2.0)] == 0
    assert out[("g", 1.0)] == -1224745
    assert out[("g", 3.0)] == 1224745
    # degenerate single-row group: std 0 -> NULL
    assert out[("h", 5.0)] is None


def test_standardize_passthrough_columns(spark):
    df = spark.createDataFrame([("g", 1, 10.0), ("g", 2, 20.0)], "grp string, id bigint, v double")
    cols = an.standardize_by_group(df, "grp", "v").columns
    assert cols == ["grp", "id", "v", "z_micro"]


# ------------------------------------------------------------- corr_matrix


def test_corr_matrix_known_values(spark):
    rows = [(1.0, 2.0, 5.0), (2.0, 4.0, 1.0), (3.0, 6.0, 3.0), (4.0, 8.0, 3.0)]
    df = spark.createDataFrame(rows, "x double, y double, w double")
    out = {
        (r["col_x"], r["col_y"]): r["corr_micro"]
        for r in an.corr_matrix(df, ["x", "y", "w"]).collect()
    }
    assert out[("x", "y")] == 1_000_000  # y = 2x exactly
    import numpy as np

    xs = np.array([r[0] for r in rows]); ws = np.array([r[2] for r in rows])
    want = np.corrcoef(xs, ws)[0, 1]
    assert abs(out[("x", "w")] / 1e6 - want) < 1e-4
    assert len(out) == 3  # unordered pairs only


def test_corr_matrix_zero_variance_is_null(spark):
    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], "x double, c double")
    out = an.corr_matrix(df, ["x", "c"]).collect()
    assert out[0]["corr_micro"] is None


# --------------------------------------------- review-fix regression tests


def test_value_histogram_huge_and_nan_values_survive_ansi(spark):
    # pre-fix: floor(raw).cast('int') raised CAST_OVERFLOW for 1.2e10
    # under ANSI mode; NaN has no bin and is excluded
    df = spark.createDataFrame(
        [(1.2e10,), (-1.2e10,), (float("inf"),), (float("-inf"),),
         (float("nan"),), (50.0,)],
        "v double",
    )
    out = {r["bin"]: r["n"] for r in an.value_histogram(df, "v", 0.0, 100.0, 20).collect()}
    assert out == {19: 2, 0: 2, 10: 1}  # NaN dropped, infs/huge clamped


def test_standardize_fractional_values_match_duckdb_twin(spark):
    # pre-fix: Spark's decimal(28,8) product truncated to scale 6,
    # diverging from DuckDB at the 7th fractional digit
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {"grp": ["g"] * 4, "v": [0.1234567, 0.7654321, 0.9999999, 1e-7]}
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["v"]: r["z_micro"]
        for r in an.standardize_by_group(df, "grp", "v").collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: r[1]
        for r in con.execute(
            an.standardize_by_group_oracle_sql("t", "grp", "v", ["grp", "v"])
            .replace("SELECT d.grp, d.v", "SELECT d.v")
        ).fetchall()
    }
    assert got == want


def test_corr_matrix_fractional_values_match_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "x": [0.1234567, 0.7654321, 0.9999999, 0.0000001],
            "y": [0.9876543, 0.1111111, 0.5555555, 0.3333333],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["col_x"], r["col_y"]): r["corr_micro"]
        for r in an.corr_matrix(df, ["x", "y"]).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(an.corr_matrix_oracle_sql("t", ["x", "y"])).fetchall()
    }
    assert got == want


def test_funnel_rejects_short_step_list(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "view", _ts(1))], "user_id bigint, event_type string, ts timestamp")
    with _pytest.raises(ValueError):
        an.funnel(df, ["view"])


# ----------------------------------------------------------------- chi2


def test_chi_square_known_2x2(spark):
    # classic 2x2: perfect association
    rows = [("x", "p")] * 30 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    out = {
        (r["a"], r["b"]): r
        for r in an.chi_square_contingency(df, "a", "b").collect()
    }
    r = out[("x", "p")]
    # expected = 30*30/40 = 22.5 -> 22500000 micro
    assert r["observed"] == 30 and r["expected_micro"] == 22_500_000
    # chi2 term = (30-22.5)^2/22.5 = 2.5
    assert r["chi2_term_micro"] == 2_500_000
    # total statistic over cells = N * phi^2 = 40 for perfect association
    total = sum(r["chi2_term_micro"] for r in out.values())
    assert total == 40_000_000


def test_chi_square_independent_columns_zero(spark):
    rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = an.chi_square_contingency(df, "a", "b").collect()
    assert all(r["chi2_term_micro"] == 0 for r in out)


# ------------------------------------------------------------------ linreg


def test_linreg_known_line(spark):
    # y = 2x + 3 exactly: slope 2, intercept 3, r2 = 1
    rows = [("g", float(x), float(2 * x + 3)) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    r = an.linreg_by_group(df, "grp", "x", "y").collect()[0]
    assert r["slope_micro"] == 2_000_000
    assert r["intercept_micro"] == 3_000_000
    assert r["r2_micro"] == 1_000_000


def test_linreg_zero_variance_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 5.0), ("g", 1.0, 9.0)], "grp string, x double, y double"
    )
    r = an.linreg_by_group(df, "grp", "x", "y").collect()[0]
    assert r["slope_micro"] is None and r["r2_micro"] is None


def test_linreg_numpy_crosscheck(spark):
    import numpy as np

    rows = [("g", float(i), float((i * 37) % 11 + i * 0.5)) for i in range(20)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    r = an.linreg_by_group(df, "grp", "x", "y").collect()[0]
    xs = np.array([t[1] for t in rows]); ys = np.array([t[2] for t in rows])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(r["slope_micro"] / 1e6 - slope) < 1e-4
    assert abs(r["intercept_micro"] / 1e6 - intercept) < 1e-4


def test_dq_report_counts_each_violation_kind(spark):
    from beis_orp_data_service_spark.operators import analytics as an

    rows = [
        (1, 10, 5.0),
        (2, None, 6.0),     # null key
        (2, 11, 7.0),       # duplicate id 2
        (3, 12, -2.0),      # out of range
        (4, 999, 8.0),      # orphan fk
    ]
    df = spark.createDataFrame(rows, "id bigint, fk bigint, v double")
    dim = spark.createDataFrame([(10,), (11,), (12,)], "pk bigint")
    got = {
        r.check_name: r.n_violations
        for r in an.dq_report(
            df,
            not_null=["fk"],
            unique=["id"],
            ranges={"v": (0.0, 100.0)},
            fk=(dim, "fk", "pk"),
        ).collect()
    }
    assert got == {
        "not_null(fk)": 1,
        "unique(id)": 1,
        "range(v)": 1,
        "fk(fk)": 1,
    }


def test_dq_report_requires_checks(spark):
    from beis_orp_data_service_spark.operators import analytics as an

    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        an.dq_report(df)


class TestMadOutliers:
    def test_flags_planted_outliers_only(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [("a", i, 100 + (i % 5)) for i in range(20)]
        rows += [("a", 100, 10_000), ("a", 101, -10_000)]   # planted
        rows += [("b", i, 50) for i in range(200, 210)]      # MAD=0 group
        rows += [("b", 300, 51)]                             # any dev > 0 flags
        df = spark.createDataFrame(rows, "g string, id long, v long")
        out = an.mad_outliers(df, "g", "v", "id", n_mads=3).collect()
        flagged = {(r["grp"], r["id"]) for r in out}
        assert flagged == {("a", 100), ("a", 101), ("b", 300)}
        by_id = {r["id"]: r for r in out}
        assert by_id[100]["med"] == 102 and by_id[100]["dev"] == 9898
        assert by_id[300]["mad"] == 0

    def test_median_rank_convention_even_group(self, spark):
        # even n: rank ceil(n/2) -> the LOWER middle value, matching
        # group_quantiles' (n*50+99) div 100
        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame(
            [("g", 1, 10), ("g", 2, 20), ("g", 3, 30), ("g", 4, 1000)],
            "g string, id long, v long",
        )
        out = an.mad_outliers(df, "g", "v", "id", n_mads=3).collect()
        assert all(r["med"] == 20 for r in out)
        assert {r["id"] for r in out} == {4}

    def test_bad_params(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([("g", 1, 1)], "g string, id long, v long")
        with pytest.raises(ValueError, match="n_mads"):
            an.mad_outliers(df, "g", "v", "id", n_mads=0)


class TestWinsorize:
    def test_clamps_to_exact_band(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        # group of 100 values 1..100: p5 -> rank 5 (value 5), p95 -> rank 95
        rows = [("g", i, i) for i in range(1, 101)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        out = {r["id"]: r for r in an.winsorize(df, "g", "v", "id", 5, 95).collect()}
        assert len(out) == 100
        assert out[1]["lo"] == 5 and out[1]["hi"] == 95
        assert out[1]["clipped"] == 5          # below band
        assert out[100]["clipped"] == 95       # above band
        assert out[50]["clipped"] == 50        # inside untouched

    def test_bad_band(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([("g", 1, 1)], "g string, id long, v long")
        with pytest.raises(ValueError, match="lo_pct"):
            an.winsorize(df, "g", "v", "id", 95, 5)


class TestBootstrapMeans:
    def test_replicates_cluster_around_true_mean(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i, float(100 + (i % 21) - 10)) for i in range(2000)]  # mean 100
        df = spark.createDataFrame(rows, "id long, v double")
        out = an.bootstrap_means(df, "v", "id", n_replicates=16).collect()
        assert len(out) == 16
        means = [r["mean_micro"] / 1e6 for r in out]
        # Poisson bootstrap: replicate means scatter ~ sd/sqrt(n) around
        # the sample mean; sd ~ 6, n ~ 2000 -> sigma ~ 0.14
        assert all(abs(m - 100) < 1.0 for m in means)
        assert len(set(r["mean_micro"] for r in out)) > 1  # replicates differ
        # effective n per replicate ~ Poisson-thinned full n
        for r in out:
            assert 1700 < r["n_eff"] < 2300

    def test_deterministic_and_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i, float(i % 7)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, v double")
        a = sorted(map(tuple, an.bootstrap_means(df.repartition(3), "v", "id", 8).collect()))
        b = sorted(map(tuple, an.bootstrap_means(df.repartition(11), "v", "id", 8).collect()))
        assert a == b

    def test_bad_replicates(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([(1, 1.0)], "id long, v double")
        with pytest.raises(ValueError, match="n_replicates"):
            an.bootstrap_means(df, "v", "id", 0)


class TestKsStatistic:
    def test_identical_distributions_zero(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i, "a", i % 10) for i in range(100)] + [
            (i + 100, "b", i % 10) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        r = an.ks_statistic(df, "g", "v", "id", "a", "b").collect()[0]
        assert r["d_num"] == 0 and r["d_milli"] == 0
        assert r["n_a"] == 100 and r["n_b"] == 100

    def test_disjoint_distributions_one(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i, "a", i % 5) for i in range(50)] + [
            (i + 50, "b", 100 + i % 5) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        r = an.ks_statistic(df, "g", "v", "id", "a", "b").collect()[0]
        assert r["d_num"] == r["d_den"]  # D = 1 exactly
        assert r["d_milli"] == 1000

    def test_matches_scipy_style_reference(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        import random

        rnd = random.Random(9)
        a = [rnd.randint(0, 50) for _ in range(300)]
        b = [rnd.randint(10, 60) for _ in range(200)]
        rows = [(i, "a", v) for i, v in enumerate(a)] + [
            (1000 + i, "b", v) for i, v in enumerate(b)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        r = an.ks_statistic(df, "g", "v", "id", "a", "b").collect()[0]
        # pure-python exact D
        vals = sorted(set(a) | set(b))
        best = 0
        ca = cb = 0
        from collections import Counter

        fa, fb = Counter(a), Counter(b)
        for x in vals:
            ca += fa.get(x, 0)
            cb += fb.get(x, 0)
            best = max(best, abs(ca * len(b) - cb * len(a)))
        assert r["d_num"] == best and r["d_den"] == len(a) * len(b)

    def test_same_group_raises(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([(1, "a", 1)], "id long, g string, v long")
        with pytest.raises(ValueError, match="differ"):
            an.ks_statistic(df, "g", "v", "id", "a", "a")


class TestMannWhitneyU:
    def test_matches_pairwise_reference_with_ties(self, spark):
        import random

        from beis_orp_data_service_spark.operators import analytics as an

        rnd = random.Random(31)
        a = [rnd.randint(0, 20) for _ in range(150)]
        b = [rnd.randint(5, 25) for _ in range(120)]
        rows = [(i, "a", v) for i, v in enumerate(a)] + [
            (1000 + i, "b", v) for i, v in enumerate(b)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        r = an.mannwhitney_u(df, "g", "v", "id", "a", "b").collect()[0]
        greater = sum(1 for x in a for y in b if x > y)
        ties = sum(1 for x in a for y in b if x == y)
        assert r["u2x_a"] == 2 * greater + ties
        assert r["u2x_a"] + r["u2x_b"] == 2 * len(a) * len(b)
        assert r["auc_milli"] == (2 * greater + ties) * 1000 // (2 * len(a) * len(b))

    def test_stochastic_dominance_extremes(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i, "a", 100 + i) for i in range(20)] + [
            (100 + i, "b", i) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        r = an.mannwhitney_u(df, "g", "v", "id", "a", "b").collect()[0]
        assert r["u2x_a"] == 2 * 20 * 20 and r["auc_milli"] == 1000

    def test_same_group_raises(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([(1, "a", 1)], "id long, g string, v long")
        with pytest.raises(ValueError, match="differ"):
            an.mannwhitney_u(df, "g", "v", "id", "a", "a")


class TestCuped:
    def test_variance_reduction_on_correlated_units(self, spark):
        import random

        from beis_orp_data_service_spark.operators import analytics as an

        # y strongly tracks x (user base rate); tiny variant lift on B
        rnd = random.Random(41)
        rows = []
        for u in range(2000):
            base = rnd.randint(0, 200)
            lift = 5 if u % 2 else 0
            rows.append((u % 2, base, base + rnd.randint(-10, 10) + lift))
        df = spark.createDataFrame(rows, "variant int, x long, y long")
        out = {r["variant"]: r for r in an.cuped_adjust(df, "variant", "x", "y").collect()}
        assert set(out) == {0, 1}
        # theta ~ 1 for y = x + noise
        for r in out.values():
            assert 0.8e6 < r["theta_micro"] < 1.2e6
            assert r["var_reduction_milli"] > 900  # rho^2 >> 0.9
        # adjusted difference still shows the lift (~5e6 micro)
        diff = out[1]["mean_adj_micro"] - out[0]["mean_adj_micro"]
        assert 3e6 < diff < 7e6

    def test_no_covariance_leaves_means_alone(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i % 2, 7, 10 + (i % 3)) for i in range(60)]  # x constant
        df = spark.createDataFrame(rows, "variant int, x long, y long")
        out = an.cuped_adjust(df, "variant", "x", "y").collect()
        for r in out:
            assert r["mean_adj_micro"] is None  # zero x-variance -> NULL
            assert r["mean_y_micro"] is not None


class TestSrmCheck:
    def test_balanced_split_near_zero_chi2(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(i % 2,) for i in range(1000)]
        df = spark.createDataFrame(rows, "variant int")
        out = {r["variant"]: r for r in an.srm_check(df, "variant", {0: 500, 1: 500}).collect()}
        for r in out.values():
            assert r["chi2_term_micro"] == 0
            assert r["n_expected_milli"] == 1000 * 500

    def test_mismatch_blows_up_chi2(self, spark):
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(0,)] * 700 + [(1,)] * 300
        df = spark.createDataFrame(rows, "variant int")
        out = {r["variant"]: r for r in an.srm_check(df, "variant", {0: 500, 1: 500}).collect()}
        # (700-500)^2/500 = 80 per side
        assert out[0]["chi2_term_micro"] == 80_000_000
        assert out[1]["chi2_term_micro"] == 80_000_000

    def test_bad_split(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame([(0,)], "variant int")
        with pytest.raises(ValueError, match="sum to 1000"):
            an.srm_check(df, "variant", {0: 400, 1: 500})

    def test_zero_traffic_designed_variant_emits_full_term(self, spark):
        """A designed arm with NO observed traffic is the most extreme
        SRM; it must emit n_observed=0 and its full (0-E)^2/E term
        rather than silently vanish (round-5 ADVICE fix)."""
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(0,)] * 500 + [(1,)] * 500  # variant 2 gets nothing
        df = spark.createDataFrame(rows, "variant int")
        out = {
            r["variant"]: r
            for r in an.srm_check(
                df, "variant", {0: 400, 1: 400, 2: 200}
            ).collect()
        }
        assert set(out) == {0, 1, 2}
        assert out[2]["n_observed"] == 0
        assert out[2]["n_expected_milli"] == 1000 * 200
        # (0*1000 - 1000*200)^2 / (1000*1000*200) = 200 -> 200e6 micro
        assert out[2]["chi2_term_micro"] == 200_000_000

    def test_undesigned_observed_variant_surfaces_with_null_term(self, spark):
        """Traffic routed to an arm absent from the design is the
        complementary bug: the row is kept with NULL expectation/term
        instead of being dropped by the designed-side join."""
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [(0,)] * 400 + [(1,)] * 400 + [(9,)] * 200
        df = spark.createDataFrame(rows, "variant int")
        out = {
            r["variant"]: r
            for r in an.srm_check(df, "variant", {0: 500, 1: 500}).collect()
        }
        assert set(out) == {0, 1, 9}
        assert out[9]["n_observed"] == 200
        assert out[9]["n_expected_milli"] is None
        assert out[9]["chi2_term_micro"] is None


# ---------------------------------------------------------------- psi_drift


def test_psi_identical_slices_is_zero(spark):
    rows = [("m", v, flag) for v in range(20) for flag in (True, False)]
    df = spark.createDataFrame(rows, "grp string, v bigint, is_ref boolean")
    out = an.psi_drift(df, "grp", "v", F.col("is_ref"), n_bins=5).collect()
    assert len(out) == 1
    assert out[0].psi_nano == 0
    assert out[0].n_ref == 20 and out[0].n_cur == 20


def test_psi_disjoint_slices_is_loud(spark):
    # reference mass in [0,9], current mass in [90,99]: current clamps
    # into the top reference bin -> near-total mass shift, PSI >> 0.25
    rows = [("m", v, True) for v in range(10)] + [
        ("m", v, False) for v in range(90, 100)
    ]
    df = spark.createDataFrame(rows, "grp string, v bigint, is_ref boolean")
    out = an.psi_drift(df, "grp", "v", F.col("is_ref"), n_bins=5).collect()
    assert out[0].psi_nano > 250_000_000  # PSI > 0.25


def test_psi_group_without_reference_drops(spark):
    df = spark.createDataFrame(
        [("a", 1, True), ("a", 2, False), ("b", 5, False)],
        "grp string, v bigint, is_ref boolean",
    )
    got = {r.grp for r in an.psi_drift(df, "grp", "v", F.col("is_ref")).collect()}
    assert got == {"a"}  # group b has no bin edges


def test_psi_vanished_current_slice(spark):
    # reference-only group: every q falls to eps -> PSI is large, not 0
    df = spark.createDataFrame(
        [("a", v, True) for v in range(10)], "grp string, v bigint, is_ref boolean"
    )
    out = an.psi_drift(df, "grp", "v", F.col("is_ref"), n_bins=2).collect()
    assert out[0].n_cur == 0
    assert out[0].psi_nano > 250_000_000


class TestKAnonymize:
    def test_cascade_and_suppression(self, spark):
        """Hand-built hierarchy: type 'a' has 3 events on one day
        (day-level k=3 holds), type 'b' 1/day across 3 days of one
        week (only week holds), type 'c' 1/week across 3 weeks of one
        month (only month holds), type 'd' a single event (suppressed
        even at month)."""
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [
            (1, "2024-01-02T10:00:00", "a"),
            (2, "2024-01-02T11:00:00", "a"),
            (3, "2024-01-02T12:00:00", "a"),
            (4, "2024-01-02T10:00:00", "b"),
            (5, "2024-01-03T10:00:00", "b"),
            (6, "2024-01-04T10:00:00", "b"),
            (7, "2024-01-02T10:00:00", "c"),
            (8, "2024-01-10T10:00:00", "c"),
            (9, "2024-01-18T10:00:00", "c"),
            (10, "2024-01-02T10:00:00", "d"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r.event_id: (r.level, r.released)
            for r in an.k_anonymize_buckets(ev, k=3).collect()
        }
        assert got[1] == ("day", "2024-01-02")
        assert got[4] == ("week", "2024-01-01")  # ISO week starts Mon
        assert got[7] == ("month", "2024-01-01")
        assert got[10] == ("suppressed", "suppressed")
        assert len(got) == 10

    def test_residue_class_demoted(self, spark):
        """Week group of 4 where 3 share one day: the 3 release at day
        level; the 1 leftover's week-level residue CLASS has size 1 < k
        and must be suppressed, NOT released at week (the cascade-only
        spelling leaked it — a subtract-the-day-release attack isolates
        that row)."""
        from beis_orp_data_service_spark.operators import analytics as an

        rows = [
            (1, "2024-01-02T10:00:00", "r"),
            (2, "2024-01-02T11:00:00", "r"),
            (3, "2024-01-02T12:00:00", "r"),
            (4, "2024-01-03T10:00:00", "r"),  # week residue of 1
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r.event_id: (r.level, r.released)
            for r in an.k_anonymize_buckets(ev, k=3).collect()
        }
        assert got[1] == ("day", "2024-01-02")
        assert got[4] == ("suppressed", "suppressed")

    def test_released_classes_all_hold_k(self, spark):
        """Privacy invariant over real data: every non-suppressed
        (qi, level, released) equivalence class in the output holds
        >= k rows."""
        from tests.conftest import SF_CORRECT

        from beis_orp_data_service_spark.operators import analytics as an

        ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        out = an.k_anonymize_buckets(ev, k=10)
        bad = (
            out.where(F.col("level") != "suppressed")
            .groupBy("qi", "level", "released")
            .count()
            .where(F.col("count") < 10)
            .count()
        )
        assert bad == 0
