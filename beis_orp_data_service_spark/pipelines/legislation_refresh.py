"""Legislation dimension refresh — the weekly legislation_table_update
pipeline (SURVEY §2.6, §2.1 S6) as one idempotent batch job.

Reference: a SPARQL query against legislation.gov.uk pulls rows updated
in the last 14 days (self-healing overlap window,
legislation_table_update.py:119-121), derives columns, builds
candidate-title arrays, joins the leg-division CSV, explodes one row
per candidate title, and PutItems into DynamoDB keyed on
candidate_titles (66-112).

Engine: the fetch is a driver-side source (small dimension) →
createDataFrame; everything downstream is the L1-L4 operator chain; the
sink is an idempotent overwrite keyed on candidate_titles — re-running
any window converges to the same table (the reference's self-healing
property, made explicit).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators.dimension import (
    derive_split_field,
    explode_dedupe,
    left_join_dim,
    non_null_array,
)
from beis_orp_data_service_spark.sources.readers import scan_csv

RAW_SCHEMA = (
    "ref string, title string, shorttitle string, citation string, "
    "acronymcitation string, year string, number long, legType string, "
    "legDivision string"
)


SPARQL_ENDPOINT = "https://www.legislation.gov.uk/sparql"

# The weekly job pulls the last 14 days so a missed run self-heals on the
# next one (legislation_table_update.py:119-121).
WATERMARK_DAYS = 14

_CURSOR_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$")


def watermark_cursor(now: datetime, days: int = WATERMARK_DAYS) -> str:
    """Incremental-watermark cursor: ``now - days`` formatted as the
    second-precision ISO string the endpoint's ``str(?actTime)``
    comparison expects (legislation_table_update.py:119-121)."""
    return (now - timedelta(days=days)).strftime("%Y-%m-%dT%H:%M:%S")


def build_sparql_query(date_cursor: str) -> str:
    """S6 — the legislation.gov.uk SPARQL query with the incremental
    watermark FILTER (legislation_table_update.py:28-63: additions
    provenance graph → leg:Legislation triples with optional
    citation/shortTitle/acronymCitation/number, restricted to activity
    end-times after the cursor).

    The cursor is validated against the exact second-precision ISO shape
    before interpolation — a malformed cursor would otherwise inject
    into the query string."""
    if not _CURSOR_RE.match(date_cursor):
        raise ValueError(f"bad date cursor (want YYYY-MM-DDTHH:MM:SS): {date_cursor!r}")
    return (
        "prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
        "prefix xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "prefix void: <http://rdfs.org/ns/void#>\n"
        "prefix sd: <http://www.w3.org/ns/sparql-service-description#>\n"
        "prefix prov: <http://www.w3.org/ns/prov#>\n"
        "prefix leg: <http://www.legislation.gov.uk/def/legislation/>\n"
        "select distinct ?ref ?title ?href ?shorttitle ?citation"
        " ?acronymcitation ?year ?number\n"
        "where {\n"
        "  ?activity prov:endedAtTime ?actTime .\n"
        "  ?graph prov:wasInfluencedBy ?activity .\n"
        "  ?activity rdf:type"
        " <http://www.legislation.gov.uk/def/provenance/Addition> .\n"
        "  ?dataUnitDataSet sd:namedGraph ?graph .\n"
        "  <http://www.legislation.gov.uk/id/dataset/topic/core>"
        " void:subset ?dataUnitDataSet .\n"
        "  graph ?graph {\n"
        "    ?ref a leg:Legislation ;\n"
        "         leg:title ?title ;\n"
        "         leg:year ?year ;\n"
        "         leg:interpretation ?href .\n"
        "    OPTIONAL { ?ref leg:citation ?citation } .\n"
        "    OPTIONAL { ?ref leg:acronymCitation ?acronymcitation } .\n"
        "    OPTIONAL { ?href leg:shortTitle ?shorttitle } .\n"
        "    OPTIONAL { ?ref leg:number ?number } .\n"
        "  }\n"
        f"  FILTER(str(?actTime) > '{date_cursor}')\n"
        "}\n"
    )


def fetch_updated_acts(
    spark: SparkSession,
    rows: list[tuple] | None = None,
    query: str | None = None,
    executor: Callable[[str], list[tuple]] | None = None,
) -> DataFrame:
    """S6 — the SPARQL federated source. The live HTTP fetch is out of
    engine scope (and this container): pass ``executor`` (query string →
    result rows; a real deployment wires SPARQLWrapper against
    :data:`SPARQL_ENDPOINT` there) or inject ``rows`` directly (tests).
    When an executor is given, ``query`` defaults to the engine-owned
    watermark query over the last :data:`WATERMARK_DAYS` days."""
    if executor is not None:
        q = query or build_sparql_query(watermark_cursor(datetime.now()))
        rows = executor(q)
    return spark.createDataFrame(rows or [], RAW_SCHEMA)


def refresh(
    spark: SparkSession,
    raw: DataFrame,
    division_csv_path: str,
    existing: DataFrame | None = None,
) -> DataFrame:
    """L1-L4 + idempotent merge: one row per candidate title.

    Overlap windows redeliver rows; dedupe on candidate_titles keeps the
    newest (max year, then ref) so replays converge — the explicit form
    of the reference's PutItem-overwrite semantics."""
    derived = raw.withColumn("divAbbv", derive_split_field("ref", "/", 4))  # L1
    arrayed = derived.withColumn(  # L2
        "candidates",
        non_null_array(
            F.col("title"), F.col("shorttitle"), F.col("citation"), F.col("acronymcitation")
        ),
    )
    divisions = scan_csv(
        spark, division_csv_path, "legDivision string, legType string, divAbbv string"
    )
    joined = left_join_dim(  # L3
        arrayed.drop("legDivision"),
        divisions,
        ["legType", "divAbbv"],
    )
    merged = joined if existing is None else existing.unionByName(joined, allowMissingColumns=True)
    exploded = merged.withColumn("candidate_titles", F.explode("candidates"))  # L4
    keep = exploded.groupBy("candidate_titles").agg(
        F.max(F.struct(F.col("year"), F.col("ref"))).alias("_latest")
    )
    return (
        exploded.join(
            keep,
            (exploded.candidate_titles == keep.candidate_titles)
            & (F.struct(F.col("year"), F.col("ref")) == F.col("_latest")),
        )
        .select(exploded["*"])
        .dropDuplicates(["candidate_titles"])
        .drop("candidates")
    )
