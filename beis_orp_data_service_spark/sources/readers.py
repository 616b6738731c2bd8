"""Sources & sinks (SURVEY §2.1).

- S1/S3 binary scan + listing: the reference's per-document S3 fetch
  (pdf_to_orpml.py:60-74) and bucket listing with extension-derived
  format (glue_bulk_enrichment.ipynb cell 5) become ONE distributed
  ``binaryFile`` scan — path, length, bytes, and a derived format
  column; no per-object API calls.
- S4/S5 parquet & CSV scans with explicit schemas (no inference in
  production paths).
- S9/E6 ORPML sink: the interchange XML envelope
  (pdf_to_orpml.py:142-216) as a Catalyst string expression —
  serialization is a projection, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scan_binary(spark: SparkSession, path_glob: str) -> DataFrame:
    """S1 — distributed binary scan: one row per object with
    (path, basename, length, content). At scale, tune
    spark.sql.files.maxPartitionBytes; small files coalesce
    automatically."""
    df = spark.read.format("binaryFile").load(path_glob)
    return df.select(
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("basename"),
        F.col("length"),
        F.col("content"),
    )


def derive_format(basename_col: Column | str) -> Column:
    """S3 — extension → document_format (notebook cell 5
    `raw_uri.split('.')[-1]` + doc_format_map, cell 3)."""
    c = F.col(basename_col) if isinstance(basename_col, str) else basename_col
    ext = F.lower(F.element_at(F.split(c, r"\."), -1))
    return (
        F.when(ext == "pdf", "PDF")
        .when(ext.isin("docx", "doc"), "DOCX")
        .when(ext.isin("odt", "odf", "odp"), "ODF")
        .when(ext.isin("html", "htm"), "HTML")
        .when(ext == "orpml", "ORPML")
        .otherwise(F.upper(ext))
    )


def scan_listing(spark: SparkSession, path_glob: str) -> DataFrame:
    """S3 — object listing with derived format (no content read:
    Catalyst prunes the content column away if unused)."""
    return scan_binary(spark, path_glob).select(
        "path", "basename", "length", derive_format("basename").alias("document_format")
    )


def scan_with_metadata(
    spark: SparkSession,
    path_glob: str,
    metadata: DataFrame,
    on: str = "basename",
) -> DataFrame:
    """S2 — object listing + object-metadata sidecar join. The reference
    fetches S3 object metadata per key while processing each document
    (pdf_to_orpml.py:60-74 `s3_client.head_object` pattern); here the
    metadata table (an inventory/sidecar extract) is ONE broadcast join
    onto the distributed listing — zero per-object API calls, and the
    listing side never shuffles. Unmatched objects keep null metadata
    (left join), mirroring the reference's tolerate-missing posture."""
    return scan_listing(spark, path_glob).join(F.broadcast(metadata), on, "left")


def scan_csv(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S5 — CSV with explicit schema (legislation_table_update.py:76-77;
    inferSchema is a two-pass scan, never in production)."""
    return spark.read.csv(path, header=True, schema=schema)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4 — columnar scan; pushdown/pruning come free."""
    return spark.read.parquet(path)


def scan_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """JSON-lines scan with explicit schema and PERMISSIVE corrupt-row
    capture (engine extension next to S5: the wire format queue/export
    pipelines actually ship). Schema is explicit — like scan_csv, an
    inferSchema pass over a 100 TB lake is a full extra scan. Rows that
    fail to parse land intact in ``_corrupt_record`` instead of
    poisoning the job (the converter family's per-row tolerance
    posture); count them with ``_corrupt_record IS NOT NULL`` and route
    to a quarantine sink."""
    st = T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    if "_corrupt_record" not in [f.name for f in st.fields]:
        st = st.add(T.StructField("_corrupt_record", T.StringType()))
    return (
        spark.read.schema(st)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def _xml_escape(c: Column) -> Column:
    for raw, esc in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def orpml_serialize(
    uid_col: str = "document_uid",
    title_col: str = "title",
    regulator_col: str = "regulator_id",
    date_col: str = "date_published",
    body_col: str = "text",
) -> Column:
    """S9/E6 — serialize a document row to the ORPML envelope
    (header namespaces dublinCore/dcat/orp + html body,
    pdf_to_orpml.py:145-162, finalise_orpml.py:47-94) as a pure concat
    projection — the sink stays JVM-side."""
    return F.concat(
        F.lit('<orpml xmlns="http://www.beis.gov.uk/namespaces/orpml"><metadata>'),
        F.lit("<dublinCore><identifier>"),
        _xml_escape(F.col(uid_col).cast("string")),
        F.lit("</identifier><title>"),
        _xml_escape(F.coalesce(F.col(title_col).cast("string"), F.lit(""))),
        F.lit("</title></dublinCore><dcat><publisher>"),
        _xml_escape(F.coalesce(F.col(regulator_col).cast("string"), F.lit(""))),
        F.lit("</publisher></dcat><orp><datePublished>"),
        F.coalesce(F.date_format(date_col, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("")),
        F.lit("</datePublished></orp></metadata><documentContent><html><body>"),
        _xml_escape(F.coalesce(F.col(body_col).cast("string"), F.lit(""))),
        F.lit("</body></html></documentContent></orpml>"),
    )


def orpml_parse(xml_col: Column | str) -> dict[str, Column]:
    """E6 parse-back (finalise_orpml.py:47-70): header fields via
    regexp_extract — enough for round-trip tests; a full XML parser
    would be a mapInPandas kernel."""
    c = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    return {
        "document_uid": F.regexp_extract(c, "<identifier>(.*?)</identifier>", 1),
        "title": F.regexp_extract(c, "<title>(.*?)</title>", 1),
        "regulator_id": F.regexp_extract(c, "<publisher>(.*?)</publisher>", 1),
        "body": F.regexp_extract(c, "<body>(.*?)</body>", 1),
    }


ORPML_PARSED_SCHEMA = (
    "document_uid string, title string, regulator_id string, "
    "date_published string, body string"
)


def orpml_parse_xml(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """E6 parse-back, REAL kernel (finalise_orpml.py:47-70 semantics):
    a mapInPandas ElementTree parse of the ORPML envelope under its
    namespace — entity unescaping and nesting handled properly, unlike
    the regexp projection twin :func:`orpml_parse` (kept as the
    no-Python oracle-friendly form, which leaves entities escaped).
    Malformed envelopes yield null rows (per-row tolerance, the
    converter posture)."""
    import xml.etree.ElementTree as ET
    from collections.abc import Iterator

    import pandas as pd

    ns = "{http://www.beis.gov.uk/namespaces/orpml}"
    fields = ("document_uid", "title", "regulator_id", "date_published", "body")

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for x in pdf[xml_col]:
                try:
                    root = ET.fromstring(x)

                    def text(leaf: str) -> str | None:
                        el = root.find(f".//{ns}{leaf}")
                        return el.text if el is not None else None

                    rows.append(
                        {
                            "document_uid": text("identifier"),
                            "title": text("title"),
                            "regulator_id": text("publisher"),
                            "date_published": text("datePublished"),
                            "body": text("body"),
                        }
                    )
                except ET.ParseError:
                    rows.append(dict.fromkeys(fields))
            yield pd.DataFrame(rows, columns=list(fields))

    return df.select(xml_col).mapInPandas(_batch, ORPML_PARSED_SCHEMA)


def scan_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with SCHEMA EVOLUTION (engine extension next to S4):
    a long-lived lake table accumulates files written under successive
    schema versions — columns added over time. ``mergeSchema`` unions
    the footers (names matched case-sensitively, added columns NULL for
    older files); column pruning and filter pushdown still apply
    per-file against each file's own physical schema.

    Cost note for 100 TB: schema merging reads every file footer at
    planning time. That is exactly the driver-side listing cost class
    the compaction operator (operators/maintenance.py) keeps bounded —
    merge-on-read is for the ingest edge; compact + rewrite settles the
    schema for the steady state. Type WIDENING conflicts (int32 file vs
    int64 file) raise at read — resolve by rewriting the narrow files,
    not by silent casts."""
    return spark.read.option("mergeSchema", "true").parquet(path)
