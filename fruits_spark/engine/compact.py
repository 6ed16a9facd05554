"""Small-file compaction for the tiered store (maintenance op).

Incremental runs accrue files: every :func:`lineage.commit_cells` batch
appends parquet files to ``tier=<t>/run=<id>``, so a run resumed in many
slices — or a streaming maintainer committing per micro-batch — leaves a
directory of files far smaller than the scan-efficient size.  At corpus
scale that is the classic small-file problem: a 1000-executor scan of a
tier pays an open + footer read per file, and the namenode/listing cost
grows with file count, not data size.

This module is the parquet-branch analogue of Iceberg's
``rewrite_data_files`` maintenance procedure (the catalog branch of
:mod:`fruits_spark.engine.io` would issue
``CALL <catalog>.system.rewrite_data_files(table => …)`` instead — no
Iceberg runtime in this sandbox, same seam as io.py).

Protocol (crash-safe, same shape as the lineage retire swap):

1. measure the live directory; if already at or below the bin-packed
   target file count, do nothing (idempotent, cheap to schedule);
2. read + ``coalesce(target)`` + write to ``<dir>__compacting``
   (coalesce, not repartition: bin-packing must not shuffle — it only
   narrows the write parallelism of a scan);
3. two renames: live -> ``<dir>__old``, staged -> live; remove old.

A crash between the renames is healed by :func:`recover_dir` (promote a
fully-staged copy, else roll back to old), called at the top of
:func:`compact_dir` and cheap enough for readers to call defensively.
Concurrent compactions of the same directory serialize through an
advisory ``flock`` on ``<dir>__compact.lock``.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 << 20


def count_data_files(path: str) -> int:
    """Number of data files under ``path`` (recursive; ignores Spark's
    ``_SUCCESS``/``.crc`` bookkeeping)."""
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(
            1 for f in files if not f.startswith(("_", "."))
        )
    return n


def dir_data_bytes(path: str) -> int:
    """Total bytes of data files under ``path``."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def recover_dir(path: str) -> None:
    """Heal a compaction swap interrupted between its two renames.
    No-op in the healthy state; tolerates losing the race to another
    recoverer."""
    staged, old = path + "__compacting", path + "__old"
    if not os.path.exists(path):
        try:
            if os.path.exists(staged) and os.path.exists(old):
                # crashed after live -> old: the staged copy is complete
                # (it is fully written before the first rename)
                os.rename(staged, path)
            elif os.path.exists(old):
                os.rename(old, path)
        except OSError:
            pass


def _compact_lock(path: str):
    from contextlib import contextmanager

    @contextmanager
    def _lock():
        import fcntl

        fd = os.open(path + "__compact.lock", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    return _lock()


def compact_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_cols: tuple[str, ...] = (),
) -> dict:
    """Bin-pack one parquet directory to ~``target_file_bytes`` files.

    ``partition_cols`` must name the directory's hive-style partition
    layout (e.g. ``("source",)`` for io.write_tier outputs) so the
    rewrite reproduces it; partition pruning on those columns keeps
    working after compaction.  Returns
    ``{files_before, files_after, bytes, skipped}``."""
    import shutil

    recover_dir(path)
    if not os.path.isdir(path):
        return {"files_before": 0, "files_after": 0, "bytes": 0,
                "skipped": True}
    with _compact_lock(path):
        recover_dir(path)
        before = count_data_files(path)
        nbytes = dir_data_bytes(path)
        # per-partition-dir floor: coalesce packs within each hive
        # partition independently, so the best reachable count is one
        # file per leaf partition directory
        target = max(1, math.ceil(nbytes / target_file_bytes))
        if before <= target or before <= 1:
            return {"files_before": before, "files_after": before,
                    "bytes": nbytes, "skipped": True}
        df = spark.read.parquet(path)
        staged, old = path + "__compacting", path + "__old"
        for p in (staged, old):
            if os.path.exists(p):
                shutil.rmtree(p)
        w = df.coalesce(target).write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(staged)
        os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old)
        return {"files_before": before, "files_after": count_data_files(path),
                "bytes": nbytes, "skipped": False}


def compact_run(
    spark: SparkSession,
    base: str,
    tiers: list[str],
    run_id: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    codec_partition_cols: tuple[str, ...] = ("source",),
) -> dict:
    """Compact one run's on-disk state across tiers: the lineage-
    committed cell data (``tier=<t>/run=<id>``, unpartitioned) and the
    codec blob tables (``codec_<t>/run=<id>``, hive-partitioned by
    source).  Safe to schedule after every commit — already-packed
    directories are skipped without a Spark job."""
    stats: dict = {}
    for t in tiers:
        stats[t] = compact_dir(
            spark,
            os.path.join(base, f"tier={t}", f"run={run_id}"),
            target_file_bytes,
        )
        stats[f"codec_{t}"] = compact_dir(
            spark,
            os.path.join(base, f"codec_{t}", f"run={run_id}"),
            target_file_bytes,
            partition_cols=codec_partition_cols,
        )
    return stats
