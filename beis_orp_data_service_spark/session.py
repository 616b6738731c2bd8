"""SparkSession factory tuned for the engine.

Local test/bench runs are single-JVM ``local[N]``; production is a large
cluster — every config here is chosen to be correct for both:

- AQE on: runtime coalescing + skew-join handling replace hand-tuned
  partition counts at 100 TB.
- shuffle.partitions defaults to the local core count; on a real cluster
  AQE's coalescing makes the initial number much less sensitive.
- session timezone pinned to UTC so timestamp semantics match the
  reference's ISO-8601/UTC handling (and the DuckDB oracle, which is
  UTC-naive).
- Arrow enabled for pandas_udf / toPandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "beis-orp-data-service-spark"


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or all cores).
    On a real cluster, pass ``master=None`` and let spark-submit supply it.
    """
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = f"local[{par}]"
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
