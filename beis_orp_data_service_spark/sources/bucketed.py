"""Bucketed-table layout — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Spark's bucketing (`bucketBy` at write time) pre-partitions and
optionally pre-sorts each table by the join key into a fixed number of
buckets recorded in the catalog; a join of two tables bucketed by the
same key into the same bucket count compiles to a zip of bucket pairs —
``SortMergeJoin`` with NO ``Exchange`` on either side (verified by
``tests/test_plans.py::test_bucketed_join_has_no_shuffle``).

Operational notes for the big cluster:
- bucket count is a layout contract: pick once per subject area
  (e.g. 4096 for the documents fact family) and reuse it everywhere a
  co-located join is wanted; mismatched counts fall back to a shuffle
  of ONE side (Spark rescales the smaller).
- ``sortBy`` the join key too: the merge phase then streams each bucket
  without an in-memory sort.
- bucketing only pays when the table is joined repeatedly on that key
  (ingest once, join many) — exactly the enrichment/dedup join pattern
  of this engine's document stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Bucketing metadata lives in the session catalog — plain
    ``spark.read.parquet`` of the files would NOT see it; read back via
    ``spark.table(table)``.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table, format="parquet")


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketing layout info."""
    return spark.table(table)
