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
