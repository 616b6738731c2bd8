"""Sink semantics: partitioned overwrite idempotency (the KV-upsert
contract), ORPML text sink, graph-store round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from beis_orp_data_service_spark.sources import sinks


def test_kv_upsert_overwrites_only_delivered_keys(spark, tmp_path):
    path = str(tmp_path / "kv")
    first = spark.createDataFrame(
        [("act1", 2000), ("act2", 2001)], "title string, year bigint"
    )
    sinks.kv_upsert(spark, first, path, "title")
    # redeliver act1 with a newer year; act2 untouched
    second = spark.createDataFrame([("act1", 2005)], "title string, year bigint")
    sinks.kv_upsert(spark, second, path, "title")
    got = {r.title: r.year for r in sinks.read_kv(spark, path).collect()}
    assert got == {"act1": 2005, "act2": 2001}
    # replay is a no-op (idempotent)
    sinks.kv_upsert(spark, second, path, "title")
    assert {r.title: r.year for r in sinks.read_kv(spark, path).collect()} == got


def test_orpml_text_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orpml")
    df = spark.createDataFrame([("<orpml>a</orpml>",), ("<orpml>b</orpml>",)], "x string")
    sinks.write_orpml_text(df, "x", path)
    back = spark.read.text(path)
    assert {r.value for r in back.collect()} == {"<orpml>a</orpml>", "<orpml>b</orpml>"}


def test_graph_sink_roundtrip(spark, tmp_path):
    base = str(tmp_path / "graph")
    entities = spark.createDataFrame(
        [("n1", "regulatoryDocument"), ("n2", "regulator")],
        "node_id string, entity_type string",
    )
    edges = spark.createDataFrame(
        [("e1", "publication", "n1", "n2")],
        "edge_id string, rel_type string, issued string, issuedBy string",
    )
    sinks.write_graph(entities, edges, base)
    assert spark.read.parquet(f"{base}/entities").count() == 2
    assert spark.read.parquet(f"{base}/edges").count() == 1


def test_partitioned_parquet_sink(spark, tmp_path):
    path = str(tmp_path / "bydate")
    df = spark.createDataFrame(
        [("2021-01", 1), ("2021-01", 2), ("2021-02", 3)], "dt string, v bigint"
    )
    sinks.write_parquet(df, path, partition_by=["dt"])
    # partition pruning: a dt filter reads one directory
    pruned = spark.read.parquet(path).filter(F.col("dt") == "2021-02")
    assert pruned.count() == 1
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(dt" in plan
