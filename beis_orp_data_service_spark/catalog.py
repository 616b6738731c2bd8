"""Parquet catalog over the driver's test tables.

The engine's storage layer is columnar Parquet (the reference's bulk
pipeline already writes Parquet — glue_bulk_enrichment.ipynb cell 8);
here we expose the driver-generated star schema plus the document /
embedding tables as DataFrames and temp views.

At 100 TB these reads are partitioned scans; everything downstream is
declared against the DataFrame API so partition pruning / predicate
pushdown reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, normalizing timestamp physical types.

    The driver has shipped ``events.ts`` in two physical forms across
    rounds: parquet TIMESTAMP(NANOS) — which the vectorized Spark reader
    rejects (SPARK-40819), so we read nanos as long and truncate to
    micros — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
    reads as TimestampNTZ. Both are normalized to a plain TimestampType:
    the session timezone is pinned UTC, so an NTZ→TZ cast is value-
    preserving and yields the same instant DuckDB's reader produces.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp semantics are UTC throughout the engine (ISO-8601/UTC in the
    # reference; UTC-naive in the DuckDB oracle) — pin it even when the
    # caller supplies its own session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer DIV, not float division: nanos exceed 2^53, so a
            # double round-trip loses the last microsecond.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def table_rows(sf_dir: str, name: str) -> int | None:
    """Row count from parquet FOOTER metadata — no Spark job, no data
    scan. This is the catalog-statistics stand-in the auto-sizing paths
    (√N IVF cells, auto LSH bits) should consume: at 100 TB a row count
    must come from table metadata, not a counting scan. Returns None if
    the path isn't local-readable parquet (caller falls back to
    ``df.count()``)."""
    try:
        import pyarrow.dataset as pads

        ds = pads.dataset(table_path(sf_dir, name), format="parquet")
        return sum(
            frag.metadata.num_rows for frag in ds.get_fragments()
        )
    except Exception:  # noqa: BLE001 - remote FS / non-parquet: caller counts
        return None


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load every driver table present under ``sf_dir``.

    With ``register_views=True`` each table is also registered as a temp
    view so operators can be expressed in Spark SQL.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
