"""Warehouse analytics operators — dataset profiling, event funnels,
CDC merge-apply (engine extensions; the operational queries a lake
team runs beside the reference's search/enrichment surface).

- ``profile_table``: single-pass per-column profile (non-null count,
  exact NDV, min/max) — the stats page every ingestion dashboard needs
  and the input to size-based planning decisions (broadcast thresholds,
  bucket counts). One aggregate job: Catalyst plans the multiple
  COUNT(DISTINCT) via Expand (rows × profiled-column fan-out, partially
  aggregated map-side) — the same single-scan shape as the classic
  unpivot-then-group profile but with TYPED min/max (string-cast AFTER
  the typed extrema, so numeric ordering is numeric, not lexicographic).
- ``funnel``: ordered-step conversion funnel over an event log
  (reference's ingest produces exactly this event shape on SQS;
  `lambdas/*` emit per-document pipeline-stage events). Per step one
  equi-join + map-side-combined MIN aggregate, all keyed on the user —
  k-step funnel is k small shuffles on the same key, no window over the
  full log, no per-user pandas.
- ``cdc_apply``: MERGE INTO semantics for a CDC batch (upserts +
  deletes with a sequence column): last-wins-per-key reduction of the
  batch (max-struct, map-side combinable — NOT a window funnel), then
  one full-outer join against the snapshot. The batch reduction means
  snapshot rows shuffle once regardless of how many times a key churns
  within the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile in ONE scan: ``(column_name, n_nonnull, ndv,
    min_value, max_value)``, one row per profiled column.

    All aggregates run in a single job (multi-distinct planned as
    Expand + partial aggregation); the 1-row result is unpivoted with
    ``stack`` — no second pass, no driver-side loop over columns.
    min/max are computed on the COLUMN'S OWN TYPE and cast to string
    only for the uniform report schema."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__ndv`, `{c}__min`, `{c}__max`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, ndv, min_value, max_value)"
        )
    )


def profile_table_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: one UNION ALL branch per column (the relational
    spelling of the same profile; DuckDB fuses the scans)."""
    parts = [
        f"SELECT '{c}' AS column_name, COUNT({c}) AS n_nonnull, "
        f"COUNT(DISTINCT {c}) AS ndv, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered first-occurrence funnel: a user reaches step i
    at the EARLIEST event of type ``steps[i-1]`` that is strictly
    after their step-(i-1) timestamp. Output one row per user who
    completed step 1: ``(user, ts_1..ts_k, max_step)``; ``ts_i`` is
    null once the chain breaks (and stays null after — each step joins
    on the previous step's reach set).

    Per step: filter (pushed to the scan) + equi-join on the user key +
    map-side-combined MIN — the log is never windowed globally, and
    step i's join input is only the users still in the funnel."""
    assert len(steps) >= 2, "a funnel needs at least 2 steps"
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("ts_1"))
    )
    out = reached
    for i in range(2, len(steps) + 1):
        nxt = (
            events.filter(F.col(type_col) == steps[i - 1])
            .join(reached.select(user_col, f"ts_{i - 1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"ts_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"ts_{i}"))
        )
        out = out.join(nxt, user_col, "left")
        reached = nxt
    max_step = F.lit(1)
    for i in range(2, len(steps) + 1):
        max_step = max_step + F.col(f"ts_{i}").isNotNull().cast("int")
    return out.select(
        F.col(user_col),
        *[F.col(f"ts_{i}") for i in range(1, len(steps) + 1)],
        max_step.cast("bigint").alias("max_step"),
    )


def funnel_oracle_sql(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`funnel`: chained per-step MIN CTEs."""
    k = len(steps)
    ctes = [
        f"s1 AS (SELECT {user_col}, MIN({ts_col}) AS ts_1 FROM {table} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})"
    ]
    for i in range(2, k + 1):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, MIN(e.{ts_col}) AS ts_{i} "
            f"FROM {table} e JOIN s{i - 1} ON e.{user_col} = s{i - 1}.{user_col} "
            f"WHERE e.{type_col} = '{steps[i - 1]}' "
            f"AND e.{ts_col} > s{i - 1}.ts_{i - 1} GROUP BY e.{user_col})"
        )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s1.{user_col} = s{i}.{user_col}" for i in range(2, k + 1)
    )
    max_step = " + ".join(
        ["1"] + [f"CAST(ts_{i} IS NOT NULL AS INT)" for i in range(2, k + 1)]
    )
    ts_cols = ", ".join(f"ts_{i}" for i in range(1, k + 1))
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT s1.{user_col} AS {user_col}, {ts_cols}, "
        f"CAST({max_step} AS BIGINT) AS max_step FROM s1 {joins}"
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply a CDC batch to a snapshot — MERGE INTO semantics:
    the batch's last change per key wins (highest ``seq_col``; ties
    broken by the full ordered struct, so the reduction is
    deterministic even on seq collisions), ``op='D'`` deletes the key,
    any other op upserts the payload. Keys untouched by the batch pass
    through. Output schema: ``(key, *payload_cols)``.

    Batch reduction is ``max(struct(seq, op, payload...))`` — an
    ordinary aggregate with map-side combine, so a key that churned
    10 000 times in the batch still contributes ONE row to the join;
    then a single full-outer equi-join applies it to the snapshot.
    At lake scale this composes with the bucket-partitioned SCD store
    (streaming/pipeline.py::ParquetScdSink) for O(touched-buckets)
    rewrites; here it is the pure relational kernel."""
    ordered = F.struct(
        F.col(seq_col).alias("_seq"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    latest = changes.groupBy(key_col).agg(F.max(ordered).alias("_c"))
    joined = snapshot.alias("s").join(
        latest.alias("c"), on=key_col, how="full_outer"
    )
    alive = joined.filter(
        F.col("c._c").isNull() | (F.col("c._c._op") != F.lit("D"))
    )
    return alive.select(
        F.col(key_col),
        *[
            F.when(F.col("c._c").isNotNull(), F.col(f"c._c.{c}"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in payload_cols
        ],
    )


def cdc_apply_oracle_sql(
    snapshot_sql: str,
    changes_sql: str,
    key_col: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> str:
    """DuckDB twin: row_number() last-wins (ordered by the same fields
    as the max-struct, descending) + FULL OUTER JOIN + COALESCE-style
    pick. ``snapshot_sql``/``changes_sql`` are subqueries."""
    order = ", ".join(
        [f"{seq_col} DESC", f"{op_col} DESC"]
        + [f"{c} DESC" for c in payload_cols]
    )
    pick = ", ".join(
        f"CASE WHEN c.{key_col} IS NOT NULL THEN c.{c} ELSE s.{c} END AS {c}"
        for c in payload_cols
    )
    return (
        f"WITH latest AS (SELECT * FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {key_col} ORDER BY {order}) AS _rn "
        f"FROM ({changes_sql})) WHERE _rn = 1) "
        f"SELECT COALESCE(s.{key_col}, c.{key_col}) AS {key_col}, {pick} "
        f"FROM ({snapshot_sql}) s FULL OUTER JOIN latest c "
        f"ON s.{key_col} = c.{key_col} "
        f"WHERE c.{op_col} IS NULL OR c.{op_col} <> 'D'"
    )
