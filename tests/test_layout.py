from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import layout


def _py_morton(vals, bits):
    out = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_matches_pure_python_morton(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = {
        r.id: r.zkey
        for r in df.select(
            "id", layout.zorder_key(["x", "y"], bits=8).alias("zkey")
        ).collect()
    }
    want = {i: _py_morton((x, y), 8) for i, x, y in rows}
    assert got == want


def test_locality_beats_single_key_sort(spark):
    # 64x64 grid of points; 16 output files. A single-key sort bounds x
    # tightly per file but leaves y spanning the whole domain; Z-order
    # bounds BOTH dimensions' per-file spans.
    rows = [(x * 64 + y, x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")

    z = layout.zorder_layout(df, ["x", "y"], bits=6, n_files=16)
    zstats = layout.file_skipping_stats(z, ["x", "y"]).collect()
    zy_spans = [r["max_y"] - r["min_y"] for r in zstats]

    s = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    sstats = layout.file_skipping_stats(s, ["x", "y"]).collect()
    sy_spans = [r["max_y"] - r["min_y"] for r in sstats]

    # single-key layout: every file spans (almost) all of y
    assert min(sy_spans) >= 60
    # z-order: every file's y span is a fraction of the domain
    assert max(zy_spans) <= 31


def test_three_columns_and_overflow_guard():
    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 62
    with pytest.raises(ValueError):
        layout.zorder_key([], bits=8)


def test_interleave_orders_close_points_together(spark):
    # the defining property: quadrant prefix — points sharing high bits
    # of both coords share the zkey's high bits
    df = spark.createDataFrame(
        [(0, 0, 0), (1, 1, 1), (2, 255, 255)], "id bigint, x bigint, y bigint"
    )
    got = {
        r.id: r.zkey
        for r in df.select(
            "id", layout.zorder_key(["x", "y"], bits=8).alias("zkey")
        ).collect()
    }
    assert got[0] == 0
    assert got[1] == 3                # bits interleave: 1,1 -> 0b11
    assert got[2] == (1 << 16) - 1    # 255,255 -> all 16 bits set


def test_zorder_physical_footer_skipping_beats_linear(spark, tmp_path):
    """The measurable claim: after a REAL write, the parquet footer
    min/max statistics of the z-ordered files let a predicate on the
    non-leading column skip most files, while the single-key-sorted
    layout can skip none. Footers read with pyarrow — the exact
    metadata a Spark scan prunes row groups/files on."""
    import glob

    import pyarrow.parquet as pq

    # x = low digits, y = high digits: independent, so a single-key
    # sort on x gives y no locality at all
    df = spark.range(0, 20_000).select(
        (F.col("id") % 128).alias("x"),
        ((F.col("id") / 128).cast("bigint") % 128).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    layout.zorder_layout(df, ["x", "y"], bits=7, n_files=16).write.mode(
        "overwrite"
    ).parquet(zpath)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_scanned_for_y(path, y):
        scanned = total = 0
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.read_metadata(f)
            col_idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }["y"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            total += 1
            if min(mins) <= y <= max(maxs):
                scanned += 1
        return scanned, total

    z_scan, z_total = files_scanned_for_y(zpath, 7)
    l_scan, l_total = files_scanned_for_y(lpath, 7)
    assert z_total >= 8 and l_total >= 8
    # linear layout: y is uniform within every x range -> no skipping
    assert l_scan == l_total
    # z-order: most files' y range excludes 7 entirely
    assert z_scan <= z_total // 2, (z_scan, z_total)
