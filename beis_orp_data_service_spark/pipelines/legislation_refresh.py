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


def fetch_updated_acts(
    spark: SparkSession, rows: list[tuple] | None = None
) -> DataFrame:
    """S6 — the SPARQL federated source. Network fetch is out of engine
    scope (and this container); callers inject rows (tests) or wire the
    real endpoint here. The incremental watermark lives in the caller's
    query (last-14-days FILTER, legislation_table_update.py:120)."""
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
