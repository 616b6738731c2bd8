from __future__ import annotations

from pyspark.sql import functions as F

from beis_orp_data_service_spark.sources import warc


def _roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, uri string, text string")
    recs = df.select(
        F.lit(0).alias("g"),
        "doc_id",
        warc.warc_serialize("doc_id", "uri", "text").alias("rec"),
    )
    blobs = warc.warc_concat(recs, "g", "doc_id", "rec")
    return warc.warc_parse(blobs).collect()


def test_roundtrip_lossless(spark):
    rows = [
        (1, "https://a.example/x", "hello world"),
        (2, "https://a.example/y", "second doc with more words"),
    ]
    got = sorted(
        (r.record_id, r.target_uri, r.content_length, r.payload, r.warc_type)
        for r in _roundtrip(spark, rows)
    )
    assert got == [
        ("urn:uuid:doc-1", "https://a.example/x", 11, "hello world", "conversion"),
        (
            "urn:uuid:doc-2",
            "https://a.example/y",
            26,
            "second doc with more words",
            "conversion",
        ),
    ]


def test_payload_containing_warc_magic_parses(spark):
    # the Content-Length framing must carry the parser PAST an embedded
    # "WARC/1.0\r\n..." inside a payload — a delimiter-split parser fails
    evil = "embedded WARC/1.0\r\nWARC-Type: fake\r\n\r\nstill the same payload"
    rows = [(1, "u1", evil), (2, "u2", "tail record proves scan continued")]
    got = {r.record_id: r.payload for r in _roundtrip(spark, rows)}
    assert got == {
        "urn:uuid:doc-1": evil,
        "urn:uuid:doc-2": "tail record proves scan continued",
    }


def test_multibyte_payload_octet_length(spark):
    # Content-Length counts OCTETS: 'naïve café' is 10 chars, 12 bytes
    rows = [(7, "u", "naïve café"), (8, "u", "after")]
    got = {r.record_id: (r.content_length, r.payload) for r in _roundtrip(spark, rows)}
    assert got["urn:uuid:doc-7"] == (12, "naïve café")
    assert got["urn:uuid:doc-8"] == (5, "after")


def test_truncated_blob_stops_cleanly(spark):
    df = spark.createDataFrame(
        [(1, "u", "full payload here")], "doc_id bigint, uri string, text string"
    )
    rec = df.select(
        warc.warc_serialize("doc_id", "uri", "text").alias("rec")
    ).collect()[0].rec
    cases = [
        rec[:-10],               # payload cut short
        rec.replace("WARC/1.0", "HTTP/1.1", 1),  # wrong magic
        rec[:-4],                # missing record terminator
        rec + rec[: len(rec) // 2],  # good record then truncated second
    ]
    blobs = spark.createDataFrame([(b,) for b in cases], "blob string")
    got = warc.warc_parse(blobs).collect()
    # only the intact leading record of case 4 survives
    assert [(r.record_id, r.payload) for r in got] == [
        ("urn:uuid:doc-1", "full payload here")
    ]


def test_blob_order_deterministic_across_partitioning(spark):
    rows = [(i, f"u{i}", f"text {i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, "doc_id bigint, uri string, text string")
    out = []
    for parts in (1, 16):
        recs = df1.repartition(parts).select(
            (F.col("doc_id") % 4).alias("g"),
            "doc_id",
            warc.warc_serialize("doc_id", "uri", "text").alias("rec"),
        )
        blobs = {r.g: r.blob for r in warc.warc_concat(recs, "g", "doc_id", "rec").collect()}
        out.append(blobs)
    assert out[0] == out[1]


def test_negative_content_length_stops_scan(spark):
    # a crafted 'Content-Length: -4' must not walk the scan backwards
    # into emitting a garbage record
    blob = (
        "WARC/1.0\r\nWARC-Record-ID: <urn:uuid:doc-1>\r\n"
        "Content-Length: -4\r\n\r\n\r\n\r\n"
    )
    blobs = spark.createDataFrame([(blob,)], "blob string")
    assert warc.warc_parse(blobs).collect() == []
