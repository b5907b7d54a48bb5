"""Small-file compaction for parquet datasets.

Streaming/incremental ingestion (and per-batch NDJSON parity sinks) leave
many small files; at 100 TB that means millions of file handles, slow
listings, and under-filled scan tasks. Compaction rewrites a dataset into
~``target_bytes`` files sized from the dataset's *actual* on-disk bytes,
preserving partition directories when asked.

The rewrite is crash-safe at the directory level: write to a
``_compact_tmp`` sibling, then swap (same temp-write+rename discipline as
the reference's checkpoint store, ``common.py:46-52``). The swap is two
renames, not one atomic op, so :func:`compact_parquet` first RECOVERS any
generation stranded by a crash between them (dataset missing at ``path``,
fully-written copy in ``_compact_old``/``_compact_tmp``) before starting a
new rewrite. ``Path.rename`` limits this module to a local / POSIX-rename
filesystem; on object storage, swap via a metastore table-location flip or
a format with commit semantics (Delta/Iceberg) instead.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession

from ..sinks.report import summarize_directory

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_file_count(total_bytes: int, target_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    """Number of output files for the observed dataset size (min 1)."""
    return max(1, -(-total_bytes // max(1, target_bytes)))


def recover_interrupted_compaction(root: Path) -> str | None:
    """Restore a dataset stranded by a crash mid-swap.

    Crash windows: (a) after ``root -> _compact_old`` but before
    ``_compact_tmp -> root`` — the new generation is complete in tmp, so
    promote it; (b) same window but tmp missing/partial — fall back to the
    old generation. Returns which source was restored, or None if the
    dataset was already live (leftover siblings are just cleaned up).
    """
    old = root.with_name(root.name + "_compact_old")
    tmp = root.with_name(root.name + "_compact_tmp")
    if root.exists():
        return None
    if tmp.exists() and (tmp / "_SUCCESS").exists():
        tmp.rename(root)
        if old.exists():
            shutil.rmtree(old)
        return "tmp"
    if old.exists():
        old.rename(root)
        if tmp.exists():
            shutil.rmtree(tmp)
        return "old"
    return None


def compact_parquet(
    spark: SparkSession,
    path: str | Path,
    *,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: tuple[str, ...] = (),
) -> dict:
    """Rewrite the parquet dataset at ``path`` into ~target-sized files.

    Returns ``{"files_before", "files_after", "bytes"}``. With
    ``partition_by`` the directory layout is preserved and Spark writes
    one file set per partition value; without it the whole dataset is
    coalesced to the planned count (coalesce, not repartition: compaction
    must not pay a shuffle just to merge files).
    """
    root = Path(path)
    recover_interrupted_compaction(root)
    before = summarize_directory(root, patterns=("*.parquet",))
    n_files = plan_file_count(before.total_bytes, target_bytes)

    df = spark.read.parquet(str(root))
    tmp = root.with_name(root.name + "_compact_tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = df.coalesce(n_files).write.mode("overwrite")
    if partition_by:
        # partitionBy implies per-partition file groups; coalesce above
        # still bounds the task count feeding the writer.
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))

    old = root.with_name(root.name + "_compact_old")
    if old.exists():
        shutil.rmtree(old)
    root.rename(old)
    tmp.rename(root)
    shutil.rmtree(old)

    after = summarize_directory(root, patterns=("*.parquet",))
    return {
        "files_before": before.file_count,
        "files_after": after.file_count,
        "bytes": after.total_bytes,
    }
