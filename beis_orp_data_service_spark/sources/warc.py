"""WARC/WET container support — the Common Crawl ingestion format an
LLM-training-data pipeline reads at the very front (ISO 28500; WET =
extracted-text "conversion" records). Engine extension: the reference
ingests from S3 objects + SQS (SURVEY §2 S1/S8); web-scale corpora
arrive as WARC instead, so the engine owns serialize + parse.

Same posture as the ORPML pair in readers.py (orpml_serialize /
orpml_parse_xml): the WRITER is a pure concat projection (JVM-side,
codegen — a sink stays expression-only), and the READER is a real
Arrow-batched kernel that honors the format's framing rules:
Content-Length-driven octet scanning, NOT delimiter splitting — a
payload containing the literal bytes "WARC/1.0" must parse correctly,
which any split-on-magic parser gets wrong.

Scale notes (100 TB): parsing is mapInPandas over blob rows — records
within a blob parse sequentially (the format is sequential by design;
real WARC.gz members gzip-frame each record), blobs parallelize
freely; one blob per input row, no shuffle. Serialization is map-only;
the per-group concatenation is one map-side-combined aggregate whose
group column (shard/file id) bounds blob size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"

WARC_PARSED_SCHEMA = (
    "record_id string, target_uri string, content_length bigint, "
    "payload string, warc_type string"
)


def warc_serialize(
    id_col: str = "doc_id",
    uri_col: str = "uri",
    body_col: str = "text",
    warc_type: str = "conversion",
) -> Column:
    """One WET-style record as a string column: version line, headers,
    blank line, payload, record terminator. Content-Length is the
    OCTET length of the payload (octet_length, not char length — the
    framing rule readers rely on)."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit(f"WARC-Type: {warc_type}" + CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:doc-"),
        F.col(id_col).cast("string"),
        F.lit(">" + CRLF),
        F.lit("WARC-Target-URI: "),
        F.coalesce(F.col(uri_col).cast("string"), F.lit("")),
        F.lit(CRLF),
        F.lit("Content-Type: text/plain" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(F.coalesce(F.col(body_col).cast("string"), F.lit(""))).cast(
            "string"
        ),
        F.lit(CRLF + CRLF),
        F.coalesce(F.col(body_col).cast("string"), F.lit("")),
        F.lit(CRLF + CRLF),
    )


def warc_concat(
    df: DataFrame, group_col: str, order_col: str, record_col: str
) -> DataFrame:
    """Concatenate records into one blob per ``group_col`` (the
    shard/file unit), in deterministic ``order_col`` order —
    collect_list alone is partitioning-order-dependent, so records ride
    inside sorted structs. Returns (group_col, blob)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col), F.col(record_col)))
            ).alias("_recs")
        )
        .select(
            group_col,
            F.array_join(
                F.transform(F.col("_recs"), lambda s: s[record_col]), ""
            ).alias("blob"),
        )
    )


def warc_parse(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL WARC parser (mapInPandas): scan each blob sequentially —
    version line, header lines to the first blank line, then EXACTLY
    Content-Length payload octets, then the CRLF CRLF record
    terminator. Malformed framing (bad magic, missing/short payload,
    absent terminator) stops that blob's scan rather than emitting
    garbage records — per-row tolerance, the converter posture.

    Returns one row per record: (record_id, target_uri,
    content_length, payload, warc_type).
    """
    import pandas as pd

    def _records(blob: str):
        data = blob.encode("utf-8")
        magic = b"WARC/1.0" + b"\r\n"
        pos = 0
        while pos < len(data):
            if not data.startswith(magic, pos):
                return  # framing lost: stop, do not resync heuristically
            pos += len(magic)
            headers = {}
            while True:
                nl = data.find(b"\r\n", pos)
                if nl < 0:
                    return
                line = data[pos:nl]
                pos = nl + 2
                if line == b"":
                    break
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers[b"content-length"])
            except (KeyError, ValueError):
                return
            if clen < 0:
                return  # crafted negative length: framing lost, stop
            payload = data[pos : pos + clen]
            if len(payload) < clen:
                return  # truncated record
            pos += clen
            if data[pos : pos + 4] != b"\r\n\r\n":
                return  # missing record terminator
            pos += 4
            rid = headers.get(b"warc-record-id", b"").decode("utf-8")
            yield (
                rid.strip("<>"),
                headers.get(b"warc-target-uri", b"").decode("utf-8"),
                clen,
                payload.decode("utf-8"),
                headers.get(b"warc-type", b"").decode("utf-8"),
            )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_id", "target_uri", "content_length", "payload", "warc_type"]
        for pdf in it:
            rows = [r for blob in pdf[blob_col] if blob for r in _records(blob)]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_batches, WARC_PARSED_SCHEMA)
