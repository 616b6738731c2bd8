"""Fixed StructType schemas for the engine's domain tables.

Mirrors the reference's data model (SURVEY.md §1.2):

- ``documents``: the enriched regulatory-document row — the graph
  metadata document built at
  reference lambdas/finalise_orpml/finalise_orpml.py:197-228 plus the
  enrichment outputs.
- ``legislation``: the DynamoDB legislation lookup table
  (lambdas/legislation_table_update/legislation_table_update.py:66-112).
- ``entities`` / ``edges``: the TypeDB graph
  (misc/bulk_enrichment/bulk_migration/schema/orp-pbeta-gdb-schema.tql)
  flattened into joinable DataFrames.

Schemas are fixed and externally declared, exactly like the reference's
TQL schema file — the engine equivalent of
bulk_migration/schema/tql_2_json.py's runtime introspection is this
module.
"""

from __future__ import annotations

from pyspark.sql import types as T

LEGISLATIVE_ORIGIN = T.StructType(
    [
        # reference lambdas/legislative_origin_extraction/legislative_origin_extraction.py:143-150
        T.StructField("href", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("number", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("division", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("document_uid", T.StringType(), False),
        T.StructField("node_id", T.StringType()),
        T.StructField("regulator_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("raw_uri", T.StringType()),
        T.StructField("document_type", T.StringType()),
        T.StructField("document_format", T.StringType()),
        T.StructField("regulatory_topic", T.ArrayType(T.StringType())),
        T.StructField("assigned_orp_topic", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("subject_keywords", T.ArrayType(T.StringType())),
        T.StructField("date_published", T.TimestampType()),
        T.StructField("date_uploaded", T.TimestampType()),
        T.StructField("date_modified", T.TimestampType()),
        T.StructField("version", T.IntegerType()),
        # 256 uint64 MinHash values; the reference serializes as '_'-joined
        # string (lambdas/check_duplicate/check_duplicate.py:266)
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("legislative_origins", T.ArrayType(LEGISLATIVE_ORIGIN)),
        T.StructField("text", T.StringType()),
    ]
)

LEGISLATION = T.StructType(
    [
        # reference lambdas/legislation_table_update/legislation_table_update.py:66-112
        T.StructField("candidate_titles", T.StringType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("href", T.StringType()),
        T.StructField("number", T.LongType()),
        T.StructField("legType", T.StringType()),
        T.StructField("legDivision", T.StringType()),
        T.StructField("divAbbv", T.StringType()),
    ]
)

ENTITIES = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

EDGES = T.StructType(
    [
        # relation `publication` (schema.tql:59-64) + `partOf` (66-70)
        T.StructField("edge_id", T.StringType(), False),
        T.StructField("rel_type", T.StringType()),
        T.StructField("issued", T.StringType()),
        T.StructField("issuedBy", T.StringType()),
        T.StructField("issuedFor", T.StringType()),
        T.StructField("uploader", T.StringType()),
        T.StructField("date_modified", T.TimestampType()),
    ]
)

# Upload-event message shape for the streaming pipeline — the SQS message
# of reference lambdas/typedb_ingestion/typedb_ingestion.py:16-25.
UPLOAD_EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType()),
        T.StructField("document_uid", T.StringType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)
