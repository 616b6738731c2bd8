"""Skew-resistant aggregation & join helpers (100 TB tooling).

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these operators are the explicit forms for planned skew —
hot keys known in advance (a boilerplate document shared by millions of
rows, a null-heavy join key).

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over N reducers, final agg merges.
  Result-identical to a direct groupBy for the supported agg shapes
  (sum/count/min/max — the decomposable aggregates).
- ``replicated_salt_join``: fact side salted deterministically, small
  side exploded ×N so every salted fact row still finds its match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, tuple[str, str]],
    salt_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``agg_exprs``: out_name -> (fn, col) with fn ∈ {sum, count, min, max}.
    ``salt_col`` must be deterministic (e.g. a row id mod N) so the
    result is reproducible; phase 1 groups by (keys, salt), phase 2
    merges partials (count merges via sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("_salt", salt_col % n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{out}")
            for out, (fn, col) in agg_exprs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{out}").alias(out)
            for out, (fn, col) in agg_exprs.items()
        ]
    )


def replicated_salt_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a deterministic salt, the dim
    is replicated ×n_salts, and the join key becomes (on, salt) — a hot
    fact key now lands on n_salts reducers instead of one."""
    salted_fact = fact.withColumn("_salt", salt_col % n_salts)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(replicated_dim, [on, "_salt"])
    return out.drop("_salt")
