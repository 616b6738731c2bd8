"""Sinks (SURVEY §2.1 S9-S13).

The reference writes through four side-effecting channels — S3 ORPML
objects, a results parquet bucket, an SQS queue, DynamoDB PutItems, and
threaded TypeDB insert batches. The engine's sinks are all DataFrame
writes with explicit idempotency semantics:

- S9  ORPML object sink  → one text file per document (serialized
      envelope column), or a single text dataset
- S10 parquet sink       → overwrite / partitioned-overwrite
- S12 KV upsert sink     → dynamic partition overwrite keyed on the
      table key: re-delivering a window replaces exactly those keys
      (the PutItem-overwrite semantics, legislation_table_update.py:100-112)
- S13 graph sink         → entities/edges parquet; Spark write
      parallelism replaces the migrator's ThreadPool(4)×500-batch loop
      (typedb_helpers.py:71-86)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S10 — bulk results sink (notebook cell 8)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orpml_text(df: DataFrame, orpml_col: str, path: str) -> None:
    """S9 — ORPML objects as a text dataset (one serialized envelope per
    line; per-object files are a repartition decision, not a loop)."""
    df.select(F.col(orpml_col).alias("value")).write.mode("overwrite").text(path)


def kv_upsert(
    spark: SparkSession, updates: DataFrame, path: str, key_col: str
) -> None:
    """S12 — idempotent key-partitioned upsert: each key lives in its own
    partition directory; dynamic partition overwrite replaces only the
    delivered keys. Replaying a delivery window converges (the
    reference's weekly refresh overlap, legislation_table_update.py:119-121).

    The overwrite mode is passed per-write (DataFrameWriter option), not
    set on the shared session conf — a session-level
    partitionOverwriteMode=dynamic would silently turn every later
    partitioned overwrite into touched-partitions-only.
    """
    updates.withColumn("_k", F.col(key_col)).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_k").parquet(path)


def read_kv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_k")


def write_graph(
    entities: DataFrame, edges: DataFrame, base_path: str
) -> None:
    """S13 — graph store as two parquet tables. The bulk migrator's
    4-thread × 500-queries/commit loop (typedb_helpers.py:71-86)
    becomes ordinary write parallelism — one task per partition."""
    entities.write.mode("overwrite").parquet(f"{base_path}/entities")
    edges.write.mode("overwrite").parquet(f"{base_path}/edges")
