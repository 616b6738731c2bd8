"""sources/hadoop_fs — the shared Hadoop FileSystem helpers and the
versioned single-artifact store (manifests, sidecars)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from beis_orp_data_service_spark.sources import hadoop_fs as hfs


def test_bytes_roundtrip_and_exists(spark, tmp_path):
    p = str(tmp_path / "artifact.bin")
    assert not hfs.exists(spark, p)
    hfs.write_bytes_rename(spark, p, b"\x00payload\xff")
    assert hfs.exists(spark, p)
    assert hfs.read_bytes(spark, p) == b"\x00payload\xff"
    # no stray temp file left behind (dotfiles = Hadoop local-FS
    # checksum sidecars, invisible to FileSystem listings)
    visible = [n for n in os.listdir(tmp_path) if not n.startswith(".")]
    assert visible == ["artifact.bin"]


def test_versioned_store_commit_read_gc(spark, tmp_path):
    d = str(tmp_path / "store")
    assert hfs.latest_version(spark, d, "m-", ".json") == -1
    assert hfs.read_latest_versioned(spark, d, "m-", ".json") == (-1, None)
    for v in range(15):
        hfs.write_new_versioned(spark, d, "m-", ".json", v, f"v{v}".encode(), keep=10)
    ver, data = hfs.read_latest_versioned(spark, d, "m-", ".json")
    assert ver == 14 and data == b"v14"
    names = [n for n in os.listdir(d) if n.startswith("m-")]
    # GC bounds retained versions to `keep`
    assert len(names) == 10
    assert hfs.latest_version(spark, d, "m-", ".json") == 14
    # oldest retained is 5 (15 commits, keep 10)
    assert min(names) == f"m-{5:020d}.json"


def test_versioned_store_ignores_foreign_files(spark, tmp_path):
    d = str(tmp_path / "store2")
    hfs.write_new_versioned(spark, d, "m-", ".json", 3, b"x")
    hfs.write_bytes_rename(spark, f"{d}/m-notanumber.json", b"junk")
    hfs.write_bytes_rename(spark, f"{d}/other.txt", b"junk")
    assert hfs.latest_version(spark, d, "m-", ".json") == 3


def test_list_names_missing_dir(spark, tmp_path):
    assert hfs.list_names(spark, str(tmp_path / "nope")) == []


def test_scd_manifest_count_bounded_across_many_batches(spark, tmp_path):
    """One manifest per micro-batch must NOT accumulate forever — after
    15 single-row batches only the newest 10 manifests remain and the
    store still reads correctly."""
    from pyspark.sql import functions as F

    from beis_orp_data_service_spark.streaming import pipeline as st

    store = str(tmp_path / "scd")
    sink = st.ParquetScdSink(spark, store, "user_id", "ts", "event_id")
    for i in range(15):
        batch = spark.createDataFrame(
            [(1000 + i, "2024-01-01T00:00:00", i % 3, "click", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sink(batch, epoch_id=i)
    manifests = [
        n for n in os.listdir(os.path.join(store, "_manifest"))
        if n.startswith("manifest-")
    ]
    assert len(manifests) == 10
    out = st.read_scd_store(spark, store).toPandas()
    assert len(out) == 15  # every batch applied exactly once


def test_read_scd_store_missing_raises_typed(spark, tmp_path):
    from beis_orp_data_service_spark.streaming import pipeline as st

    with pytest.raises(FileNotFoundError):
        st.read_scd_store(spark, str(tmp_path / "never_written"))


def test_versioned_store_rejects_keep_zero(spark, tmp_path):
    with pytest.raises(ValueError):
        hfs.write_new_versioned(spark, str(tmp_path / "s"), "m-", ".json", 0, b"x", keep=0)


def test_ann_index_legacy_sidecar_fallbacks(spark, tmp_path):
    """Indexes persisted by earlier releases (single _centroids.json,
    or the original _centroids.npy) must stay readable."""
    import io
    import json

    import numpy as np

    from beis_orp_data_service_spark.operators import similarity as sim

    cents = [[1.0, 2.0], [3.0, 4.5]]
    p1 = str(tmp_path / "idx_json")
    os.makedirs(p1)
    with open(os.path.join(p1, "_centroids.json"), "w") as f:
        json.dump(cents, f)
    assert sim.ann_index_centroids(spark, p1).tolist() == cents

    p2 = str(tmp_path / "idx_npy")
    os.makedirs(p2)
    np.save(os.path.join(p2, "_centroids.npy"), np.array(cents))
    assert sim.ann_index_centroids(spark, p2).tolist() == cents

    with pytest.raises(FileNotFoundError):
        sim.ann_index_centroids(spark, str(tmp_path / "idx_missing"))
