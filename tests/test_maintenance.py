"""Small-file compaction: inventory, snapshot commit, pointer swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import maintenance as mt


def _fragmented(spark, path, n_files=24):
    df = spark.range(0, 3000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), F.sha2(F.col("id").cast("string"), 256).alias("payload")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    root = str(tmp_path / "table")
    _fragmented(spark, src, n_files=24)
    before = mt.list_data_files(spark, src)
    assert len(before) == 24

    stats = mt.compact_small_files(spark, src, root, target_bytes=1 << 30)
    assert stats.files_before == 24 and stats.files_target == 1
    after = mt.list_data_files(spark, stats.snapshot)
    assert len(after) == 1

    got = mt.read_current(spark, root)
    assert got.count() == 3000
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(3000))


def test_target_bytes_controls_file_count(spark, tmp_path):
    src = str(tmp_path / "frag")
    root = str(tmp_path / "table")
    _fragmented(spark, src, n_files=16)
    total = sum(sz for _, sz in mt.list_data_files(spark, src))
    stats = mt.compact_small_files(spark, src, root, target_bytes=total // 4 + 1)
    assert stats.files_target == 4
    assert len(mt.list_data_files(spark, stats.snapshot)) == 4


def test_recompaction_commits_new_snapshot_atomically(spark, tmp_path):
    src = str(tmp_path / "frag")
    root = str(tmp_path / "table")
    _fragmented(spark, src, n_files=8)
    s1 = mt.compact_small_files(spark, src, root, target_bytes=1 << 30)
    s2 = mt.compact_small_files(spark, src, root, target_bytes=1 << 30)
    assert s1.snapshot != s2.snapshot
    with open(os.path.join(root, mt.CURRENT)) as f:
        assert f.read().strip() == os.path.basename(s2.snapshot)
    # previous snapshot retained for in-flight readers
    assert os.path.isdir(s1.snapshot)
    assert mt.read_current(spark, root).count() == 3000
