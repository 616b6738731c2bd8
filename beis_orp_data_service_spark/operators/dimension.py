"""Dimension-table maintenance — the legislation_table_update pipeline.

The reference refreshes a DynamoDB lookup table of UK legislation weekly
(lambdas/legislation_table_update/legislation_table_update.py:66-112):
derive columns, build candidate-title arrays, left-join the
leg-division CSV, explode one row per candidate title, dedupe. Here the
same pipeline is a DataFrame chain producing an idempotent
overwrite-partition write — at scale the dimension stays small enough
to broadcast into every enrichment join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _keep_first(
    df: DataFrame, key_col: str, order_col: str, tiebreak: Sequence[str]
) -> DataFrame:
    """Exactly-one-row-per-key dedupe: row_number() == 1 over
    (partitionBy key, orderBy order_col + tiebreak). Ties on the order
    column alone would keep BOTH rows under a groupBy-min + join-back —
    row_number preserves the pandas drop_duplicates invariant (one
    survivor per key) even for non-unique order columns."""
    # Window scale: per-key dedupe; rows per task = duplicate arrivals
    # for one key (bounded).
    w = Window.partitionBy(key_col).orderBy(order_col, *tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def derive_split_field(col: Column | str, delim: str, index: int) -> Column:
    """L1 — `divAbbv = ref.split('/')[4]` (legislation_table_update.py:68)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, delim).getItem(index)


def non_null_array(*cols: Column) -> Column:
    """L2 — candidate_titles = [title, shorttitle, citation, acronym]
    minus NaN (legislation_table_update.py:69-73)."""
    return F.filter(F.array(*cols), lambda x: x.isNotNull())


def left_join_dim(fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """L3 — left join onto a small dimension; always broadcast
    (legislation_table_update.py:75-78 joins a 30-row CSV)."""
    return fact.join(F.broadcast(dim), on, "left")


def explode_dedupe(
    df: DataFrame,
    array_col: str,
    out_col: str,
    keep_min_of: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """L4 — one row per candidate title + drop_duplicates
    (legislation_table_update.py:80-81).

    pandas drop_duplicates keeps the first row in frame order; a
    distributed engine has no frame order, so the engine makes the
    choice explicit and deterministic: per exploded value, keep the
    single row that sorts first on (``keep_min_of``, *tiebreak*).
    Exactly one survivor per value even when ``keep_min_of`` ties.
    """
    exploded = df.withColumn(out_col, F.explode(array_col))
    return _keep_first(exploded, out_col, keep_min_of, tiebreak)


def preprocess(
    df: DataFrame,
    not_null_col: str,
    dedupe_key: Column | str,
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """L5 — the bulk-migration preprocess chain
    (bulk_migration/data_preprocess.py:107-117): filter non-null uri,
    dedupe by raw_uri (deterministically: the row sorting first on
    (``order_col``, *tiebreak*) wins — exactly one survivor per key),
    ready for node/link hashing downstream.
    """
    key = F.col(dedupe_key) if isinstance(dedupe_key, str) else dedupe_key
    filtered = df.filter(F.col(not_null_col).isNotNull()).withColumn("_k", key)
    return _keep_first(filtered, "_k", order_col, tiebreak).drop("_k")
