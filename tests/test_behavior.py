"""Behavioral analytics operator semantics (operators/behavior.py):
crafted micro-fixtures pin exactly the edges the oracle parity at
sf0.01 exercises only statistically — step ORDER enforcement, the
anchor-relative window bound, attribution tie-breaks, epoch-anchored
cohort periods."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import behavior as bh


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d}T{h:02d}:00:00", u, t, v)
            for i, (d, h, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestFunnel:
    def test_order_is_enforced(self, spark):
        # u1 does view->click->purchase (complete); u2 has the
        # purchase BEFORE the click: must stop at depth 2
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (2, 0, 1, "click", 0.0),
                (3, 0, 1, "purchase", 9.0),
                (1, 0, 2, "view", 0.0),
                (2, 0, 2, "purchase", 9.0),
                (3, 0, 2, "click", 0.0),
            ],
        )
        got = {
            r.user_id: r.steps_completed
            for r in bh.funnel_users(ev, ["view", "click", "purchase"]).collect()
        }
        assert got == {1: 3, 2: 2}

    def test_window_is_anchored_at_first_step(self, spark):
        # u1's click lands 8 days after the FIRST view — outside the
        # 7-day anchor window even though a second view is closer
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (5, 0, 1, "view", 0.0),
                (9, 0, 1, "click", 0.0),
                (1, 0, 2, "view", 0.0),
                (6, 0, 2, "click", 0.0),
            ],
        )
        got = {
            r.user_id: r.steps_completed
            for r in bh.funnel_users(ev, ["view", "click"], "7 days").collect()
        }
        assert got == {1: 1, 2: 2}

    def test_counts_aggregate_users(self, spark):
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (1, 1, 1, "click", 0.0),
                (1, 0, 2, "view", 0.0),
                (1, 0, 3, "click", 0.0),  # no view: not in funnel
            ],
        )
        got = {
            (r.step_idx, r.step): r.n_users
            for r in bh.funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {(0, "view"): 2, (1, "click"): 1}

    def test_same_timestamp_tie_is_not_progress(self, spark):
        """Round-7 verdict ask #6: STRICTLY-after rule. u1's click
        shares the view's exact timestamp -> not progress (depth 1);
        u2's click one hour later -> depth 2. Expected rows
        hand-computed, anchors included."""
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (1, 0, 1, "click", 0.0),  # tie with the anchor: excluded
                (1, 0, 2, "view", 0.0),
                (1, 1, 2, "click", 0.0),
            ],
        )
        rows = {
            r.user_id: (
                r.steps_completed,
                str(r.anchor_ts),
                str(r.last_step_ts),
            )
            for r in bh.funnel_users(ev, ["view", "click"]).collect()
        }
        assert rows == {
            1: (1, "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
            2: (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        }
        counts = {
            r.step: r.n_users
            for r in bh.funnel_counts(ev, ["view", "click"]).collect()
        }
        assert counts == {"view": 2, "click": 1}

    def test_multiple_anchors_earliest_wins(self, spark):
        """Round-7 verdict ask #6: a user with multiple steps[0] events
        anchors at the EARLIEST one — a later view cannot re-open the
        window, and anchor_ts must report the first event even when
        only a later view is followed by a click (within the window of
        the first)."""
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (3, 0, 1, "view", 0.0),
                (4, 0, 1, "click", 0.0),  # within 7d of day 1: counts
                (1, 0, 2, "view", 0.0),
                (6, 0, 2, "view", 0.0),
                (9, 0, 2, "click", 0.0),  # 8d after the FIRST view: out
            ],
        )
        rows = {
            r.user_id: (
                r.steps_completed,
                str(r.anchor_ts),
                str(r.last_step_ts),
            )
            for r in bh.funnel_users(ev, ["view", "click"]).collect()
        }
        assert rows == {
            1: (2, "2024-01-01 00:00:00", "2024-01-04 00:00:00"),
            2: (1, "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
        }

    def test_within_boundary_is_inclusive(self, spark):
        """Round-7 verdict ask #6: an event landing EXACTLY at
        anchor + within qualifies (<=, pinned); one second later —
        approximated here by the next hour — does not."""
        ev = _events(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (8, 0, 1, "click", 0.0),  # exactly anchor + 7 days
                (1, 0, 2, "view", 0.0),
                (8, 1, 2, "click", 0.0),  # anchor + 7 days + 1 hour
            ],
        )
        rows = {
            r.user_id: r.steps_completed
            for r in bh.funnel_users(ev, ["view", "click"]).collect()
        }
        assert rows == {1: 2, 2: 1}
        counts = {
            r.step: r.n_users
            for r in bh.funnel_counts(ev, ["view", "click"]).collect()
        }
        assert counts == {"view": 2, "click": 1}

    def test_single_step_rejected(self, spark):
        with pytest.raises(ValueError):
            bh.funnel_counts(_events(spark, [(1, 0, 1, "view", 0.0)]), ["view"])


class TestCohortRetention:
    def test_offsets_and_sizes(self, spark):
        # epoch-anchored 7-day periods: 2024-01-04 starts a new period
        # (1970-01-01 anchor); u1 signs up then returns two periods
        # later, u2 signs up and never returns
        ev = _events(
            spark,
            [
                (4, 0, 1, "signup", 0.0),
                (18, 0, 1, "view", 0.0),
                (4, 1, 2, "signup", 0.0),
            ],
        )
        got = {
            (r.period_offset): r.n_users
            for r in bh.cohort_retention(ev, "signup", 7, 8).collect()
        }
        assert got == {0: 2, 2: 1}

    def test_max_periods_bounds_output(self, spark):
        ev = _events(
            spark,
            [(1, 0, 1, "signup", 0.0), (30, 0, 1, "view", 0.0)],
        )
        offs = {
            r.period_offset
            for r in bh.cohort_retention(ev, "signup", 7, max_periods=2).collect()
        }
        assert offs == {0}  # the day-30 activity (offset 4) is cut


class TestAttribution:
    def test_latest_touch_wins_with_id_tiebreak(self, spark):
        ev = _events(
            spark,
            [
                (1, 0, 1, "click", 0.0),   # event_id 0
                (1, 0, 1, "click", 0.0),   # event_id 1, SAME ts: tie
                (2, 0, 1, "click", 0.0),   # event_id 2, later ts
                (3, 0, 1, "purchase", 5.0),
            ],
        )
        rows = bh.attribution_last_touch(ev, "click", "purchase", "7 days").collect()
        assert len(rows) == 1
        assert rows[0].touch_id == 2  # latest ts beats the tie pair
        assert rows[0].lag_s == 86400
        # remove the later click: the tie breaks on HIGHER touch id
        rows2 = bh.attribution_last_touch(
            _events(
                spark,
                [
                    (1, 0, 1, "click", 0.0),
                    (1, 0, 1, "click", 0.0),
                    (3, 0, 1, "purchase", 5.0),
                ],
            ),
            "click",
            "purchase",
            "7 days",
        ).collect()
        assert rows2[0].touch_id == 1

    def test_lookback_excludes_stale_touches(self, spark):
        ev = _events(
            spark,
            [
                (1, 0, 1, "click", 0.0),
                (20, 0, 1, "purchase", 5.0),  # 19 days later
            ],
        )
        assert (
            bh.attribution_last_touch(ev, "click", "purchase", "7 days").count() == 0
        )

    def test_touch_at_conversion_instant_counts(self, spark):
        ev = _events(
            spark,
            [(2, 0, 1, "click", 0.0), (2, 0, 1, "purchase", 5.0)],
        )
        rows = bh.attribution_last_touch(ev, "click", "purchase", "7 days").collect()
        assert len(rows) == 1 and rows[0].lag_s == 0


class TestSessionPaths:
    def test_paths_and_truncation(self, spark):
        # u1: two sessions (61-min gap): [view,click,purchase] and [view]
        # u2: one 7-event session -> truncated to first 5
        rows = [
            (1, 10, 1, "view", 0.0),
            (1, 10, 1, "click", 0.0),   # same hour, later event_id
            (1, 10, 1, "purchase", 0.0),
            (1, 12, 1, "view", 0.0),    # 2h later: new session
        ] + [(2, 9, 2, t, 0.0) for t in
             ["view", "click", "view", "click", "view", "click", "view"]]
        ev = _events(spark, rows)
        got = {
            r["path"]: r["n_sessions"]
            for r in bh.session_paths(ev, gap_minutes=60, max_len=5).collect()
        }
        assert got == {
            "view>click>purchase": 1,
            "view": 1,
            "view>click>view>click>view": 1,
        }

    def test_top_k_and_tiebreak(self, spark):
        # 3 distinct single-event paths, each once: top_k=2 keeps the 2
        # lexicographically-smallest (count ties break on path ASC)
        rows = [(1, 9, u, t, 0.0) for u, t in
                [(1, "view"), (2, "click"), (3, "error")]]
        ev = _events(spark, rows)
        got = [r["path"] for r in
               bh.session_paths(ev, top_k=2).collect()]
        assert got == ["click", "error"]

    def test_event_id_breaks_timestamp_ties(self, spark):
        # two events at the SAME timestamp: order is by event_id
        ev = spark.createDataFrame(
            [(2, "2024-01-01T09:00:00", 1, "b", 0.0),
             (1, "2024-01-01T09:00:00", 1, "a", 0.0)],
            "event_id long, ts string, user_id long, event_type string,"
            " value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = bh.session_paths(ev).collect()
        assert got[0]["path"] == "a>b"


class TestRecencyScores:
    def test_hand_computed_decay(self, spark):
        """Two events for u1: at the table max (age 0, term 1e9) and
        exactly one τ older (term round(e⁻¹·1e9)); u2 only the old
        one. Exact BIGINT expectations."""
        import math

        ev = spark.createDataFrame(
            [
                (1, "2024-01-08T00:00:00", 1),
                (2, "2024-01-01T00:00:00", 1),
                (3, "2024-01-01T00:00:00", 2),
            ],
            "event_id long, ts string, user_id long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r.user_id: (r.n_events, r.recency_q)
            for r in bh.recency_scores(ev, tau_seconds=7 * 86400).collect()
        }
        e1 = round(math.exp(-1.0) * bh.RECENCY_SCALE)
        assert got == {
            1: (2, bh.RECENCY_SCALE + e1),
            2: (1, e1),
        }

    def test_empty_input_raises(self, spark):
        ev = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long"
        )
        with pytest.raises(ValueError, match="empty input"):
            bh.recency_scores(ev)


class TestRfmScores:
    def test_hand_computed_quintiles(self, spark):
        """5 users, user u has u events with latest at day u and value
        u each: user 5 is best on every axis (scores 5,5,5), user 1
        worst (1,1,1); with n_tiles=5 each user owns a quintile."""
        rows = []
        for u in range(1, 6):
            for j in range(u):
                rows.append((u * 10 + j, f"2024-01-{u:02d}T00:00:00", u, "x", float(u)))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r.user_id: (r.r_days, r.f_n, r.m_cents, r.r_score, r.f_score, r.m_score, r.rfm)
            for r in bh.rfm_scores(ev).collect()
        }
        for u in range(1, 6):
            assert got[u] == (5 - u, u, u * u * 100, u, u, u, u * 111)

    def test_empty_raises(self, spark):
        ev = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        with pytest.raises(ValueError, match="empty input"):
            bh.rfm_scores(ev)

    def test_two_pass_equals_ntile_at_sf001(self, spark):
        """The scale-safe two-pass spelling (range
        partitions + offset pull + per-partition row_number, NO
        unpartitioned window) must equal the ntile spelling row for
        row on real data at sf0.01."""
        from beis_orp_data_service_spark.catalog import load_table
        from tests.conftest import SF_CORRECT

        ev = load_table(spark, SF_CORRECT, "events")
        a = sorted(map(tuple, bh.rfm_scores(ev, method="ntile").collect()))
        b = sorted(
            map(
                tuple,
                bh.rfm_scores(ev, method="two_pass", n_parts=7).collect(),
            )
        )
        assert a == b

    def test_bad_method_raises(self, spark):
        ev = spark.createDataFrame(
            [(1, "2024-01-01T00:00:00", 1, "x", 1.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(ValueError, match="unknown method"):
            bh.rfm_scores(ev, method="percentile")
