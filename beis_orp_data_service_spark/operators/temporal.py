"""Temporal join operators — as-of join, range join, time rollups
(engine extensions; Spark has no native as-of/range join, so these are
the composition patterns the 100 TB path needs).

- ``asof_join``: for each left row, the latest right row with
  right.ts <= left.ts per key. Implemented WITHOUT merge_asof: tag the
  two sides, union, and run a single ordered window per key carrying
  the last-seen right timestamp forward. One shuffle on the key, no
  per-group pandas, scales to any key cardinality. An
  ``applyInPandas``/merge_asof variant exists for comparison
  (``asof_join_pandas``) and tests assert equality.
- ``range_join_bucketized``: value-range join rewritten as an equi-join
  on a bucket key (+ residual filter) — turns O(n·m) nested-loop into a
  hash join when bands are uniform.
- rollup/cube come free from Catalyst; declared queries expose them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    direction_backward: bool = True,
) -> DataFrame:
    """As-of join via tagged union + running last_value.

    Backward (default): latest right row with right.ts <= left.ts.
    Forward (``direction_backward=False``): EARLIEST right row with
    right.ts >= left.ts — the same single window pass traversed in
    descending time order. Either way right rows sort before left rows
    at equal timestamps, so an exact tie matches (<=/>= semantics,
    like DuckDB ASOF and pd.merge_asof direction='forward').
    Returns ``left`` columns + ``asof_ts`` (nullable).
    """
    l_tagged = left.select(
        F.col(key_col), F.col(ts_col), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = right.select(
        F.col(key_col), F.col(ts_col), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    ts_order = F.col(ts_col) if direction_backward else F.col(ts_col).desc()
    w = (
        # Window scale: partition key is the join key; per-task rows =
        # one key's tagged stream (bounded per key).
        Window.partitionBy(key_col)
        .orderBy(ts_order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "asof_ts",
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(F.col("_l.*"), F.col("asof_ts"))


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """merge_asof-per-key via applyInPandas — the grouped-kernel form;
    result-identical to ``asof_join`` (tested). Prefer the window form:
    no Python, and no per-group materialization."""
    l_cols = left.columns
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in left.schema)
    out_schema += f", asof_ts timestamp"

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(key_col, ts_col).withColumn("_side", F.lit(0))

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf._side == 1].sort_values(ts_col, kind="mergesort")
        rp = pdf[pdf._side == 0].sort_values(ts_col, kind="mergesort")
        if lp.empty:
            return pd.DataFrame(columns=list(lp.columns) + ["asof_ts"])[
                l_cols + ["asof_ts"]
            ]
        merged = pd.merge_asof(
            lp, rp[[ts_col]].rename(columns={ts_col: "asof_ts"}),
            left_on=ts_col, right_on="asof_ts", direction="backward",
        )
        return merged[l_cols + ["asof_ts"]]

    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    return both.groupBy(key_col).applyInPandas(_merge, out_schema)


def range_join_bucketized(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
    bucket_width: int | None = None,
) -> DataFrame:
    """Range join fact.value ∈ [band.low, band.high) as a bucketized
    equi-join: both sides key on floor(value/width); bands spanning
    multiple buckets are exploded. Residual filter keeps exactness.
    With uniform bands, each fact row meets ~1 band instead of all of
    them."""
    if bucket_width is None:
        first = bands.select((F.col(high_col) - F.col(low_col)).alias("w")).first()
        bucket_width = int(first.w)
    f = fact.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("bigint")
    )
    b = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(low_col) / bucket_width).cast("bigint"),
                F.floor((F.col(high_col) - F.lit(1e-9)) / bucket_width).cast("bigint"),
            )
        ),
    )
    return (
        f.join(F.broadcast(b), "_bucket")
        .filter((F.col(value_col) >= F.col(low_col)) & (F.col(value_col) < F.col(high_col)))
        .drop("_bucket")
    )


def rollup_partials(
    events: DataFrame,
    bucket_col,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Continuous-aggregate building block (the TimescaleDB/materialized
    -view maintenance pattern, engine extension): reduce raw events to
    MERGEABLE per-bucket partial aggregates — (bucket, groups, n,
    sum_value DECIMAL(18,6), min_value, max_value). Count/sum/min/max
    are the classic commutative-monoid partials: merging shards is the
    SAME aggregation over partial rows, so a stored rollup absorbs an
    out-of-order/late batch with work proportional to the BATCH's
    touched buckets, never a full recompute. Sum rides DECIMAL so
    merge order can't drift a float (the money-exactness convention).

    One map-side-combined groupBy; output rows = |buckets x groups|.
    """
    return events.groupBy(bucket_col.alias("bucket"), *group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def rollup_merge(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge partial-aggregate tables (same schema): per-key n-sum,
    value-sum, min-of-min, max-of-max. merge(partials(A), partials(B))
    == partials(A ∪ B) EXACTLY — the property the declared query's
    oracle states (it aggregates the union directly)."""
    keys = [c for c in existing.columns if c not in ("n", "sum_value", "min_value", "max_value")]
    return (
        existing.unionByName(batch)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_finalize(partials: DataFrame) -> DataFrame:
    """Finalize serving columns from partials: avg = sum/n (double; a
    single IEEE division of exact inputs — engine-portable), sum cast
    back to double for the API surface."""
    return partials.select(
        *[c for c in partials.columns if c not in ("sum_value",)],
        F.col("sum_value").cast("double").alias("sum_value_d"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Regular-grid resampling with forward fill, per key: emit one row
    per ``step_seconds`` tick between each key's first and last
    observation; ticks with no observation carry the latest prior
    value (``filled = true``). Output ``(key, tick, value, filled)``
    with ``tick`` in epoch seconds (BIGINT — integer grid arithmetic
    is bit-identical cross-engine; callers re-cast to timestamp at the
    edge).

    Shape: one per-key MIN/MAX aggregate sizes the grid, ``sequence``
    + ``explode`` fans it out (rows ∝ key's time span / step — never a
    cross join against a global calendar), one per-(key, tick)
    last-observation reduction (max-struct: deterministic on ties, by
    value), a left join grid←observations on (key, tick), and a
    per-key ordered LAST(ignorenulls) window for the fill. Every
    shuffle is on the key (or key+tick) — a key's grid never
    co-resides with another's, so state is bounded per key."""
    epoch = F.unix_timestamp(F.col(ts_col))
    tick_of = (F.floor(epoch / step_seconds) * step_seconds).cast("bigint")
    span = df.groupBy(key_col).agg(
        F.min(tick_of).alias("_lo"), F.max(tick_of).alias("_hi")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence("_lo", "_hi", F.lit(int(step_seconds)))
        ).alias("tick"),
    )
    obs = (
        df.select(
            F.col(key_col),
            tick_of.alias("tick"),
            F.struct(epoch.alias("_e"), F.col(value_col).alias("_v")).alias("_o"),
        )
        .groupBy(key_col, "tick")
        .agg(F.max("_o")["_v"].alias("_obs"))
    )
    w = (
        # Window scale: partition key is the series key; per-task rows =
        # one key's tick grid (bounded by the resample span).
        Window.partitionBy(key_col)
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(obs, [key_col, "tick"], "left")
    return joined.select(
        F.col(key_col),
        F.col("tick"),
        F.last("_obs", ignorenulls=True).over(w).alias("value"),
        F.col("_obs").isNull().alias("filled"),
    )


def resample_ffill_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> str:
    """DuckDB twin of :func:`resample_ffill` — generate_series grid,
    row_number last-observation pick (ts DESC, value DESC — the same
    order the max-struct reduces by), IGNORE NULLS window fill."""
    s = int(step_seconds)
    return f"""
    WITH ticked AS (
      SELECT {key_col},
             CAST(FLOOR(epoch({ts_col}) / {s}) * {s} AS BIGINT) AS tick,
             epoch({ts_col}) AS _e, {value_col} AS _v
      FROM {table}
    ), span AS (
      SELECT {key_col}, MIN(tick) AS _lo, MAX(tick) AS _hi
      FROM ticked GROUP BY {key_col}
    ), grid AS (
      SELECT {key_col}, UNNEST(generate_series(_lo, _hi, {s})) AS tick
      FROM span
    ), obs AS (
      SELECT {key_col}, tick, _v AS _obs FROM (
        SELECT {key_col}, tick, _v,
               row_number() OVER (PARTITION BY {key_col}, tick
                                  ORDER BY _e DESC, _v DESC) AS _rn
        FROM ticked) WHERE _rn = 1
    )
    SELECT g.{key_col} AS {key_col}, g.tick,
           last_value(o._obs IGNORE NULLS) OVER (
             PARTITION BY g.{key_col} ORDER BY g.tick
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           o._obs IS NULL AS filled
    FROM grid g LEFT JOIN obs o
      ON g.{key_col} = o.{key_col} AND g.tick = o.tick
    """


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: str,
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join under
    insert-only deltas — the classic delta rule:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    Returns exactly the NEW join rows; the maintained view is
    ``J_old ∪ join_delta(...)`` and equals ``(A_old ∪ ΔA) ⋈ (B_old ∪
    ΔB)`` EXACTLY (multiset semantics — no dedup is applied, matching
    the recomputed join). The whole point at lake scale: the three
    delta joins are each bounded by a delta side, so maintenance cost
    is O(|Δ| · fanout), never a rescan of the stored view; with both
    stores bucketed on the key (sources/bucketed.py) the B_old/A_old
    probes are shuffle-free on the big side."""
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def agg_delta(
    old_agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental view maintenance for a grouped COUNT/SUM aggregate
    under insert-only deltas — the aggregate sibling of
    :func:`join_delta`:

        V_new = merge_by_key(V_old, γ(Δ))

    ``old_agg`` is the maintained view ``(keys..., count_col,
    sum_<c>...)``; ``delta`` is the RAW new rows. The delta is
    aggregated alone (map-side combined, O(|Δ|)), unioned with the old
    state, and merged with one groupBy SUM — the old view is combined
    state, never re-derived from base rows, so maintenance cost is
    O(|Δ| + |touched keys|), not a base-table rescan. COUNT and SUM are
    the self-mergeable algebra (AVG = merged SUM/COUNT downstream;
    MIN/MAX also merge; quantiles/distincts need sketches —
    corpus.hll_registers / cms_sketch are the engine's mergeable forms).
    """
    sum_cols = sum_cols or []
    d = delta.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    merged_cols = [count_col] + [f"sum_{c}" for c in sum_cols]
    return (
        old_agg.select(*keys, *merged_cols)
        .unionByName(d.select(*keys, *merged_cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in merged_cols])
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    max_gap: int = 0,
) -> DataFrame:
    """Coalesce overlapping / near-adjacent intervals per key — the
    gaps-and-islands kernel as a standalone operator (outage windows,
    span merging, coverage stitching; the repeated-passages operator
    inlines the same move). Intervals are INTEGER bounds (epoch
    seconds, token offsets — integer compare is bit-identical
    cross-engine); two intervals merge when the next start is within
    ``max_gap`` of the running max end. Output ``(key, start, end,
    n_merged)`` per island.

    One window pass partitioned by the key (running max of prior ends
    → island flag → running island id) + one aggregate — state bounded
    per key, no self-join, no driver iteration."""
    # Window scale: partition key is the interval key; per-task rows =
    # one key's intervals (state bounded per key, as documented).
    w = Window.partitionBy(key_col).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(int(max_gap))),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.select(
        F.col(key_col),
        F.col(start_col),
        F.col(end_col),
        is_new.alias("_new"),
    )
    island = F.sum("_new").over(
        Window.partitionBy(key_col)
        .orderBy(F.col(start_col), F.col(end_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("_island", island)
        .groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(key_col, "start", "end", "n_merged")
    )


def merge_intervals_oracle_sql(
    rel_sql: str, key_col: str, start_col: str, end_col: str, max_gap: int = 0
) -> str:
    """DuckDB twin — identical running-max / island-sum windows.
    ``rel_sql`` yields (key, start, end) with integer bounds."""
    return f"""
    WITH flagged AS (
      SELECT {key_col}, {start_col}, {end_col},
             CASE WHEN MAX({end_col}) OVER (
                    PARTITION BY {key_col}
                    ORDER BY {start_col}, {end_col}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR {start_col} > MAX({end_col}) OVER (
                    PARTITION BY {key_col}
                    ORDER BY {start_col}, {end_col}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     + {int(max_gap)}
                  THEN 1 ELSE 0 END AS _new
      FROM ({rel_sql})
    ), islands AS (
      SELECT {key_col}, {start_col}, {end_col},
             SUM(_new) OVER (PARTITION BY {key_col}
                             ORDER BY {start_col}, {end_col}
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _island
      FROM flagged
    )
    SELECT {key_col}, MIN({start_col}) AS start, MAX({end_col}) AS "end",
           COUNT(*) AS n_merged
    FROM islands GROUP BY {key_col}, _island
    """
