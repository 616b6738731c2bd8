"""Data-layout optimization — Z-order (Morton) clustering, the
lakehouse ``OPTIMIZE ZORDER BY`` primitive (Morton 1966; Delta Lake /
Iceberg expose the same idea). Engine extension: at 100 TB the scan
cost of every multi-predicate query is set by FILE SKIPPING — parquet
footer min/max per file prune whole files, but only if rows near each
other in (a, b, ...) value space land in the same files. A single-key
sort clusters only its leading column; the Z-curve interleaves the
key columns' bits so every participating column gets locality, and
min/max pruning works for predicates on ANY of them.

All pure integer bit arithmetic — codegen-friendly, engine-portable,
hash-oracle-checkable. The layout step is one range repartition (the
one shuffle a rewrite needs anyway) + a within-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each (non-negative
    integer) column into one bigint sort key: bit b of column i lands
    at position ``b * n_cols + i``. Columns must already be rank/range
    encoded into [0, 2^bits) — the caller picks the binning (modulo for
    synthetic keys, width_bucket-style range binning for real values);
    keeping the encoding outside makes the interleave itself exact and
    portable.

    n_cols * bits must stay <= 62 (signed int64 headroom).
    """
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows int64")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = []
    for i, c in enumerate(cs):
        v = c.cast("bigint")
        for b in range(bits):
            # ((v >> b) & 1) << (b * n + i)
            terms.append(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — identical shift/mask terms."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, cols: list[Column | str], bits: int = 16, n_files: int = 32
) -> DataFrame:
    """Rewrite shape for ``OPTIMIZE ZORDER BY``: compute the Morton key,
    range-repartition on it (one shuffle — contiguous key ranges become
    files, which is exactly what makes footer min/max tight), and sort
    within partitions so row groups inside each file are clustered too.
    Write the result with ``.write.parquet`` to materialize the layout.
    """
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    return keyed.repartitionByRange(n_files, "_zkey").sortWithinPartitions("_zkey")


def file_skipping_stats(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Per-partition (≈ per output file) min/max of each value column —
    the footer statistics a reader would prune on. One row per
    partition; the relative tightness of (max-min) across layouts is
    the file-skipping win measure (asserted in tests: a Z-ordered
    layout bounds BOTH columns' spans, a single-key sort only its
    leading column's)."""
    aggs = []
    for c in value_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
    )
