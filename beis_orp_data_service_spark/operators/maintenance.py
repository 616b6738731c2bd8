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

import json
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


# ---------------------------------------------------------------------------
# Compaction for the engine's two long-running bucketed stores
#: streaming appends accumulate one file per
# micro-batch per partition; both compactors below restore ~target-size
# files WITHOUT changing the store layout, so every reader's partition
# pruning keeps working unchanged.
# ---------------------------------------------------------------------------


@dataclass
class PartitionCompactionStats:
    partitions_seen: int
    partitions_compacted: int
    files_before: int
    files_after: int


def recover_lsh_compaction(spark: SparkSession, path: str) -> int:
    """Crash recovery for :func:`compact_lsh_index`'s per-band swap: a
    band whose live directory is missing while its ``_pre_compact``
    copy survives is restored. Runs automatically at the start of
    every compaction; returns the number of bands restored."""
    from beis_orp_data_service_spark.sources import hadoop_fs as hfs

    pre_root = f"{path.rstrip('/')}/_pre_compact"
    if not hfs.exists(spark, pre_root):
        return 0
    restored = 0
    for name in hfs.list_names(spark, pre_root):
        if not name.startswith("band="):
            continue
        live = f"{path.rstrip('/')}/{name}"
        if not hfs.exists(spark, live):
            hfs.rename(spark, f"{pre_root}/{name}", live)
            restored += 1
    hfs.delete(spark, pre_root, recursive=True)
    return restored


def compact_lsh_index(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    min_files: int = 4,
    dedupe: bool = True,
) -> PartitionCompactionStats:
    """Compact a band-partitioned LSH index
    (``operators.dedup.lsh_index_write`` layout: ``band=N`` dirs that
    streaming admission appends one file per micro-batch to).

    Per band with more than ``min_files`` files: read that band's
    directory only, drop the duplicate (band_key, id) rows that
    at-least-once replays appended (probe's ``distinct`` tolerates
    them, but they cost scan bytes forever), coalesce to
    ceil(bytes/target) files, write to an underscore-prefixed staging
    dir (invisible to Spark's file index — readers never see partial
    output), then swap the band directory in two renames. The crash
    window between the renames is ONE band wide and self-healing:
    :func:`recover_lsh_compaction` (run first) restores any band whose
    swap died halfway. Bands below the threshold are untouched — I/O
    is proportional to the fragmented fraction, not the index size.
    Partition layout (``band=N``) is preserved exactly, so probe-side
    partition pruning and ``mode="append"`` ingest are unaffected.
    Single-writer assumption: run in the maintenance window, not
    concurrently with ingest appends (Delta/Iceberg get concurrency
    from manifest logs; this is the plain-parquet discipline)."""
    from beis_orp_data_service_spark.sources import hadoop_fs as hfs

    recover_lsh_compaction(spark, path)
    root = path.rstrip("/")
    stats = PartitionCompactionStats(0, 0, 0, 0)
    for name in sorted(hfs.list_names(spark, root)):
        if not name.startswith("band="):
            continue
        stats.partitions_seen += 1
        band_dir = f"{root}/{name}"
        files = list_data_files(spark, band_dir)
        stats.files_before += len(files)
        if len(files) <= min_files:
            stats.files_after += len(files)
            continue
        total = sum(sz for _, sz in files)
        n_out = max(1, math.ceil(total / target_bytes))
        df = spark.read.parquet(band_dir)
        if dedupe:
            df = df.dropDuplicates()
        staged = f"{root}/_compacting/{name}"
        hfs.delete(spark, staged, recursive=True)
        df.coalesce(n_out).write.mode("overwrite").parquet(staged)
        pre = f"{root}/_pre_compact/{name}"
        hfs.mkdirs(spark, f"{root}/_pre_compact")
        hfs.rename(spark, band_dir, pre)
        hfs.rename(spark, staged, band_dir)
        hfs.delete(spark, pre, recursive=True)
        stats.partitions_compacted += 1
        stats.files_after += len(list_data_files(spark, band_dir))
    hfs.delete(spark, f"{root}/_compacting", recursive=True)
    hfs.delete(spark, f"{root}/_pre_compact", recursive=True)
    return stats


def compact_scd_store(
    spark: SparkSession,
    path: str,
    files_per_bucket: int = 1,
    retain_history: bool = False,
) -> PartitionCompactionStats:
    """Compact a ``streaming.pipeline.ParquetScdSink`` store: its
    manifest protocol already IS a snapshot commit, so compaction is
    just one more transaction — read the live buckets (manifest-pruned,
    exactly like any reader), rewrite them into a SINGLE new epoch
    directory with ``files_per_bucket`` files per bucket, commit a
    manifest pointing every bucket at it, then GC. A crash before the
    manifest rename leaves the old state fully live (the sink's own
    atomicity argument, verbatim); a crash during GC leaves
    unreferenced garbage only. Readers keep static (epoch, bucket)
    partition pruning; the stream keeps appending epochs after
    compaction with no special casing — commit ids are shared, so the
    next micro-batch just becomes the next epoch.

    GC honours the store's history mode (a delete-everything GC
    would break the manifest invariant — superseded
    manifests stayed readable while the epoch dirs they referenced
    were deleted, and ``read_scd_store_asof`` would die with a raw
    parquet path error):

    - ``retain_history=False`` (default sink): every superseded
      MANIFEST is deleted along with every superseded epoch directory,
      so no readable pointer can reference deleted data — time travel
      on a non-retain store fails with the typed FileNotFoundError,
      never a dangling read.
    - ``retain_history=True`` (time-travel store): all manifests are
      kept and only (epoch, bucket) directories referenced by NO
      manifest are deleted — every committed ``VERSION AS OF`` stays
      exactly readable across the compaction boundary. Compaction then
      speeds up the LIVE read path (one epoch, few files); history
      storage is reclaimed separately and explicitly by
      ``streaming.pipeline.scd_vacuum_history``.

    Concurrency (same contract as ``compact_lsh_index``): compaction
    assumes NO concurrent ingest — the manifest protocol is
    single-writer, and a micro-batch committing between this
    function's manifest read and its own commit would collide on the
    same commit id. As defense-in-depth for the GC half specifically,
    epoch directories NEWER than the compaction's own commit id are
    never deleted (an in-flight batch that has written its epoch data
    but not yet committed its manifest looks exactly like a crash
    orphan — it is left for the writer to commit or overwrite), but
    the manifest race itself is not resolved: run compaction in a
    maintenance window.
    """
    from beis_orp_data_service_spark.sources import hadoop_fs as hfs
    from beis_orp_data_service_spark.streaming.pipeline import ParquetScdSink
    from pyspark.sql import functions as F

    sink = ParquetScdSink(
        spark, path, key_col="", order_col="", id_col="",
        retain_history=retain_history,
    )
    prev_id, mapping = sink._current_manifest()
    if not mapping:
        raise FileNotFoundError(f"no committed SCD store at {path}")
    files_before = len(list_data_files(spark, sink._data_root))
    store = sink._store_df(mapping)
    commit_id = prev_id + 1
    (
        store.repartition(
            max(1, len(mapping) * files_per_bucket), F.col(ParquetScdSink.BUCKET)
        )
        .write.mode("overwrite")
        .partitionBy(ParquetScdSink.BUCKET)
        .parquet(f"{sink._data_root}/epoch={commit_id}")
    )
    sink._commit_manifest(commit_id, {b: commit_id for b in mapping})
    mdir = f"{path.rstrip('/')}/_manifest"
    if not retain_history:
        # drop superseded manifests FIRST (pointer disappears before its
        # data — the vacuum ordering), then superseded epoch dirs
        for name in hfs.list_names(spark, mdir):
            if (
                name.startswith("manifest-")
                and name.endswith(".json")
                and name != f"manifest-{commit_id:020d}.json"
            ):
                hfs.delete(spark, f"{mdir}/{name}")
        for name in hfs.list_names(spark, sink._data_root):
            if (
                name.startswith("epoch=")
                and int(name.split("=", 1)[1]) < commit_id
            ):
                hfs.delete(spark, f"{sink._data_root}/{name}", recursive=True)
    else:
        # delete only (epoch, bucket) dirs no surviving manifest
        # references — orphans from crashed writes; every committed
        # snapshot stays reconstructible
        referenced: set[tuple[int, int]] = set()
        for name in hfs.list_names(spark, mdir):
            if not (name.startswith("manifest-") and name.endswith(".json")):
                continue
            data = hfs.read_bytes(spark, f"{mdir}/{name}")
            for b, e in json.loads(data.decode()).items():
                referenced.add((int(e), int(b)))
        for epoch_name in hfs.list_names(spark, sink._data_root):
            if not epoch_name.startswith("epoch="):
                continue
            e = int(epoch_name.split("=", 1)[1])
            if e > commit_id:
                # possibly an in-flight concurrent write (data landed,
                # manifest not yet committed) — never GC it
                continue
            for bname in hfs.list_names(spark, f"{sink._data_root}/{epoch_name}"):
                if not bname.startswith(f"{ParquetScdSink.BUCKET}="):
                    continue
                b = int(bname.split("=", 1)[1])
                if (e, b) not in referenced:
                    hfs.delete(
                        spark,
                        f"{sink._data_root}/{epoch_name}/{bname}",
                        recursive=True,
                    )
    return PartitionCompactionStats(
        partitions_seen=len(mapping),
        partitions_compacted=len(mapping),
        files_before=files_before,
        files_after=len(list_data_files(spark, sink._data_root)),
    )
