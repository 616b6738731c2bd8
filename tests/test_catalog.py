from __future__ import annotations

from pyspark.sql import types as T

from beis_orp_data_service_spark.catalog import TABLES, load_table, load_tables
from tests.conftest import SF_SMOKE


def test_load_all_tables(spark):
    tables = load_tables(spark, SF_SMOKE)
    assert set(tables) == set(TABLES)
    for name, df in tables.items():
        assert df.limit(1).count() >= 0, name


def test_events_ts_is_timestamp(spark):
    events = load_table(spark, SF_SMOKE, "events")
    assert isinstance(events.schema["ts"].dataType, T.TimestampType)
    row = events.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo.year >= 2000 and row.hi.year <= 2100


def test_table_rows_footer_metadata_matches_scan(spark):
    from beis_orp_data_service_spark.catalog import load_table, table_rows
    from tests.conftest import SF_SMOKE

    for name in ("documents", "embeddings", "region"):
        meta = table_rows(SF_SMOKE, name)
        assert meta == load_table(spark, SF_SMOKE, name).count()
    assert table_rows("/nonexistent", "x") is None
