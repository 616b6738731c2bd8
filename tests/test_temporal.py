"""Temporal join tests: as-of (window form ≡ merge_asof form ≡ known
answers incl. ties and no-match), range join ≡ naive theta join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.catalog import load_table
from beis_orp_data_service_spark.operators import temporal as t
from tests.conftest import SF_SMOKE


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_known_answers(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00")),
            (2, "u", _ts("2024-01-01 12:00")),
            (3, "u", _ts("2024-01-01 09:00")),  # before any right row
            (4, "v", _ts("2024-01-01 10:30")),  # tie with right
        ],
        "event_id bigint, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:30")),
            ("u", _ts("2024-01-01 11:00")),
            ("v", _ts("2024-01-01 10:30")),
        ],
        "user_id string, ts timestamp",
    )
    got = {r.event_id: r.asof_ts for r in t.asof_join(left, right, "user_id").collect()}
    assert got[1] == _ts("2024-01-01 09:30")
    assert got[2] == _ts("2024-01-01 11:00")
    assert got[3] is None
    assert got[4] == _ts("2024-01-01 10:30")  # <= semantics: tie matches


def test_asof_window_equals_pandas_form(spark):
    events = load_table(spark, SF_SMOKE, "events")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    a = {r.event_id: r.asof_ts for r in t.asof_join(left, right, "user_id").collect()}
    b = {r.event_id: r.asof_ts for r in t.asof_join_pandas(left, right, "user_id").collect()}
    assert a == b


def test_range_join_equals_naive(spark):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    bands = spark.range(10).select(
        (F.col("id") * 50).alias("low"), ((F.col("id") + 1) * 50).alias("high")
    )
    naive = (
        events.join(
            bands,
            (F.col("value") >= F.col("low")) & (F.col("value") < F.col("high")),
        )
        .groupBy("low")
        .count()
    )
    bucketized = (
        t.range_join_bucketized(events, bands, "value").groupBy("low").count()
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, bucketized.collect()))


def test_range_join_wide_bands_explode(spark):
    # a band spanning 3 buckets still matches (explode path)
    fact = spark.createDataFrame([(1, 149.0), (2, 250.0)], "id bigint, value double")
    bands = spark.createDataFrame([(100.0, 300.0)], "low double, high double")
    out = t.range_join_bucketized(fact, bands, "value", bucket_width=100)
    assert {r.id for r in out.collect()} == {1, 2}


class TestIncrementalRollup:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id bigint, day string, event_type string, value double"
        )

    def test_merge_equals_recompute(self, spark):
        from beis_orp_data_service_spark.operators import temporal as t

        rows = [
            (i, f"d{i % 3}", "ab"[i % 2], float(i) * 0.25 + 0.01) for i in range(60)
        ]
        all_ev = self._ev(spark, rows)
        a = self._ev(spark, rows[:40])
        b = self._ev(spark, rows[40:])
        from pyspark.sql import functions as F

        day = F.col("day")
        merged = t.rollup_merge(
            t.rollup_partials(a, day, ["event_type"], "value"),
            t.rollup_partials(b, day, ["event_type"], "value"),
        )
        direct = t.rollup_partials(all_ev, day, ["event_type"], "value")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_merge_associative_and_bucket_bounded(self, spark):
        from pyspark.sql import functions as F

        from beis_orp_data_service_spark.operators import temporal as t

        rows = [(i, f"d{i % 4}", "x", 1.5) for i in range(40)]
        day = F.col("day")
        p = [
            t.rollup_partials(self._ev(spark, rows[i::3]), day, ["event_type"], "value")
            for i in range(3)
        ]
        left = t.rollup_merge(t.rollup_merge(p[0], p[1]), p[2])
        right = t.rollup_merge(p[0], t.rollup_merge(p[1], p[2]))
        assert sorted(map(tuple, left.collect())) == sorted(
            map(tuple, right.collect())
        )
        assert left.count() == 4  # |buckets x groups|, not |events|

    def test_finalize_avg(self, spark):
        from pyspark.sql import functions as F

        from beis_orp_data_service_spark.operators import temporal as t

        ev = self._ev(spark, [(1, "d", "x", 2.0), (2, "d", "x", 4.0)])
        out = t.rollup_finalize(
            t.rollup_partials(ev, F.col("day"), ["event_type"], "value")
        ).collect()
        assert len(out) == 1
        assert out[0].avg_value == 3.0 and out[0].sum_value_d == 6.0


# ----------------------------------------------------------- resample_ffill


def test_resample_ffill_fills_gaps(spark):
    import datetime as dt

    from beis_orp_data_service_spark.operators.temporal import resample_ffill

    rows = [
        # key "a": obs at t=0 and t=25 with step 10 -> ticks 0,10,20
        ("a", dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 0, 25), 5.0),
        # key "b": single obs -> one tick, no fill
        ("b", dt.datetime(2024, 1, 1, 0, 0, 13), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r["k"], r["tick"]): (r["value"], r["filled"])
        for r in resample_ffill(df, "k", "ts", "v", 10).collect()
    }
    base = dt.datetime(2024, 1, 1).timestamp()
    assert out[("a", int(base))] == (1.0, False)
    assert out[("a", int(base) + 10)] == (1.0, True)   # forward-filled
    assert out[("a", int(base) + 20)] == (5.0, False)
    assert out[("b", int(base) + 10)] == (9.0, False)
    assert len(out) == 4


def test_resample_ffill_last_obs_in_tick_wins(spark):
    import datetime as dt

    from beis_orp_data_service_spark.operators.temporal import resample_ffill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, 1), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 0, 9), 3.0),  # later in same tick
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", "v", 10).collect()
    assert len(out) == 1 and out[0]["value"] == 3.0


# --------------------------------------------------------------- join_delta


def test_join_delta_equals_recompute(spark):
    from beis_orp_data_service_spark.operators.temporal import join_delta

    a_old = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, av string")
    a_new = spark.createDataFrame([(2, "z"), (3, "w")], "k bigint, av string")
    b_old = spark.createDataFrame([(1, 10), (3, 30)], "k bigint, bv bigint")
    b_new = spark.createDataFrame([(2, 20), (3, 31)], "k bigint, bv bigint")

    j_old = a_old.join(b_old, "k")
    maintained = j_old.unionByName(join_delta(a_old, a_new, b_old, b_new, "k"))
    recomputed = a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k")

    key = lambda r: (r["k"], r["av"], r["bv"])
    assert sorted(map(key, maintained.collect())) == sorted(
        map(key, recomputed.collect())
    )
    # multiset: k=3 matches twice on the b side — both present
    assert maintained.filter("k = 3").count() == 2


# ------------------------------------------------------------ merge_intervals


def test_merge_intervals_overlap_gap_and_contained(spark):
    from beis_orp_data_service_spark.operators.temporal import merge_intervals

    rows = [
        # key a: [0,10] overlaps [5,20]; [20,25] adjacent (start == max end,
        # not > end+0) merges too; [40,50] separate island
        ("a", 0, 10),
        ("a", 5, 20),
        ("a", 20, 25),
        ("a", 40, 50),
        # contained interval extends nothing but joins the island
        ("a", 6, 8),
        # key b independent
        ("b", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s bigint, e bigint")
    out = {
        (r["k"], r["start"]): (r["end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert out == {("a", 0): (25, 4), ("a", 40): (50, 1), ("b", 0): (1, 1)}


def test_merge_intervals_max_gap_bridges(spark):
    from beis_orp_data_service_spark.operators.temporal import merge_intervals

    rows = [("a", 0, 10), ("a", 13, 20)]
    df = spark.createDataFrame(rows, "k string, s bigint, e bigint")
    assert merge_intervals(df, "k", "s", "e", max_gap=2).count() == 2
    assert merge_intervals(df, "k", "s", "e", max_gap=3).count() == 1


def test_merge_intervals_out_of_order_input(spark):
    from beis_orp_data_service_spark.operators.temporal import merge_intervals

    rows = [("a", 40, 50), ("a", 5, 20), ("a", 0, 10)]
    df = spark.createDataFrame(rows, "k string, s bigint, e bigint").repartition(3)
    out = sorted(
        (r["start"], r["end"]) for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert out == [(0, 20), (40, 50)]


def test_asof_forward_earliest_following_and_tie(spark):
    import datetime as dt

    from beis_orp_data_service_spark.operators.temporal import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, "a", t(10)), (2, "a", t(30)), (3, "b", t(5))],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(10)), ("a", t(20)), ("a", t(25))], "k string, ts timestamp"
    )
    out = {
        r["id"]: r["asof_ts"]
        for r in asof_join(left, right, "k", "ts", direction_backward=False).collect()
    }
    assert out[1] == t(10)   # exact tie matches (>= semantics)
    assert out[2] is None    # nothing follows t30
    assert out[3] is None    # no right rows for key b


def test_agg_delta_merge_equals_recompute(spark):
    from beis_orp_data_service_spark.operators import temporal as tmp

    base = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 10) for i in range(60)],
        "id bigint, k string, v bigint",
    )
    old = base.where("id % 4 != 0")
    delta = base.where("id % 4 = 0")
    old_agg = old.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    got = sorted(
        map(tuple, tmp.agg_delta(old_agg, delta, ["k"], "n", ["v"]).collect())
    )
    want = sorted(
        map(
            tuple,
            base.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
            .collect(),
        )
    )
    assert got == want


def test_agg_delta_new_keys_and_empty_delta(spark):
    from beis_orp_data_service_spark.operators import temporal as tmp

    old = spark.createDataFrame([(5, "x", 50)], "id bigint, k string, v bigint")
    old_agg = old.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    # delta introduces a brand-new key
    delta = spark.createDataFrame([(6, "y", 7)], "id bigint, k string, v bigint")
    got = {r.k: (r.n, r.sum_v) for r in tmp.agg_delta(old_agg, delta, ["k"], "n", ["v"]).collect()}
    assert got == {"x": (1, 50), "y": (1, 7)}
    # empty delta is the identity
    empty = delta.where("1 = 0")
    got2 = {r.k: (r.n, r.sum_v) for r in tmp.agg_delta(old_agg, empty, ["k"], "n", ["v"]).collect()}
    assert got2 == {"x": (1, 50)}
