"""Table-maintenance operators — small-file compaction with
snapshot-isolated commits.

A 100 TB table accumulates small files from streaming micro-batches and
over-parallel writes; scans then pay per-file open cost and lose
row-group locality. Compaction rewrites the data into ~target-size
files. The commit uses an immutable-snapshot + atomic pointer pattern
(Delta/Iceberg's manifest idea): readers mid-compaction keep a
consistent view, and a failed compaction leaves the live snapshot
untouched. (``streaming.pipeline.ParquetScdSink`` instead bounds
per-batch I/O with bucket-partitioned dynamic overwrite — the two
commit disciplines trade atomicity scope against rewrite volume.)

File inventory goes through the Hadoop FileSystem API (not ``os``), so
the same code paths work against HDFS / S3A / local on a real cluster.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_CURRENT"


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path``, recursively,
    skipping _metadata/_SUCCESS/hidden files. Hadoop FS API — works on
    any supported filesystem, not just local."""
    from beis_orp_data_service_spark.sources.hadoop_fs import fs_for

    _, hpath, fs = fs_for(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((status.getPath().toString(), status.getLen()))
    return out


def current_snapshot(root: str) -> str | None:
    pointer = os.path.join(root, CURRENT)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        return os.path.join(root, f.read().strip())


def commit_snapshot(df: DataFrame, root: str, n_files: int) -> str:
    """Write ``df`` as the next immutable snapshot of ``root`` and
    atomically swap the ``_CURRENT`` pointer to it. Executors write the
    data directly; the driver touches only the tiny pointer file."""
    cur = current_snapshot(root)
    nxt = 0 if cur is None else int(os.path.basename(cur).lstrip("v")) + 1
    snap = f"v{nxt:09d}"
    df.repartition(n_files).write.mode("overwrite").parquet(
        os.path.join(root, snap)
    )
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "._current.tmp")
    with open(tmp, "w") as f:
        f.write(snap)
    os.replace(tmp, os.path.join(root, CURRENT))
    return os.path.join(root, snap)


@dataclass
class CompactionStats:
    files_before: int
    bytes_before: int
    files_target: int
    snapshot: str


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_root: str,
    target_bytes: int = 128 << 20,
) -> CompactionStats:
    """Rewrite ``in_path`` into ≈``target_bytes`` files under a new
    snapshot of ``out_root`` (pointer-committed).

    Output file count = ceil(total_bytes / target_bytes) — one shuffle
    (round-robin repartition) sized by the actual data volume, so the
    write parallelism and the resulting file sizes stay right at any
    scale. 128 MiB default matches the usual parquet row-group /
    HDFS-block sweet spot.
    """
    files = list_data_files(spark, in_path)
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_bytes))
    snap = commit_snapshot(spark.read.parquet(in_path), out_root, n_out)
    return CompactionStats(
        files_before=len(files),
        bytes_before=total,
        files_target=n_out,
        snapshot=snap,
    )


def read_current(spark: SparkSession, root: str) -> DataFrame:
    """Read the live snapshot of a pointer-committed table."""
    cur = current_snapshot(root)
    if cur is None:
        raise FileNotFoundError(f"no {CURRENT} pointer under {root}")
    return spark.read.parquet(cur)
