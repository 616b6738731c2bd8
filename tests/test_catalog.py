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


class TestScanJsonl:
    def test_corrupt_rows_captured_not_fatal(self, spark, tmp_path):
        from beis_orp_data_service_spark.sources import readers

        p = tmp_path / "in.jsonl"
        p.write_text(
            '{"doc_id": 1, "lang": "en"}\n'
            "this is not json at all\n"
            '{"doc_id": 2, "lang": "fr"}\n'
            '{"doc_id": "notanumber", "lang": "de"}\n'
        )
        out = readers.scan_jsonl(spark, str(p), "doc_id bigint, lang string")
        rows = out.collect()
        good = {r.doc_id: r.lang for r in rows if r._corrupt_record is None}
        bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
        assert good == {1: "en", 2: "fr"}
        assert len(bad) == 2
        assert "not json" in bad[0] or "not json" in bad[1]

    def test_explicit_corrupt_column_respected(self, spark, tmp_path):
        from pyspark.sql import types as T

        from beis_orp_data_service_spark.sources import readers

        p = tmp_path / "in.jsonl"
        p.write_text('{"a": 1}\n')
        st = T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        out = readers.scan_jsonl(spark, str(p), st)
        assert [f.name for f in out.schema.fields].count("_corrupt_record") == 1


def test_scan_parquet_evolving_merges_added_column(spark, tmp_path):
    from beis_orp_data_service_spark.sources.readers import scan_parquet_evolving

    root = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, a string").write.parquet(
        root + "/v1"
    )
    spark.createDataFrame(
        [(2, "b", 99)], "id bigint, a string, b bigint"
    ).write.parquet(root + "/v2")
    # read both generations through one scan
    out = scan_parquet_evolving(spark, root + "/*")
    assert set(out.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 99)}


def test_scan_parquet_evolving_pushdown_survives_merge(spark, tmp_path):
    from beis_orp_data_service_spark.sources.readers import scan_parquet_evolving

    root = str(tmp_path / "evolving2")
    spark.createDataFrame([(1, "a")], "id bigint, a string").write.parquet(
        root + "/v1"
    )
    spark.createDataFrame(
        [(2, "b", 99)], "id bigint, a string, b bigint"
    ).write.parquet(root + "/v2")
    df = scan_parquet_evolving(spark, root + "/*").filter("id = 2").select("id", "b")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:120]
    assert out_schema_is_pruned(plan)


def out_schema_is_pruned(plan: str) -> bool:
    # ReadSchema must carry only the projected columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    return "a:string" not in rs
