"""Small-file compaction for parquet datasets.

Streaming/incremental ingestion (and per-batch NDJSON parity sinks) leave
many small files; at 100 TB that means millions of file handles, slow
listings, and under-filled scan tasks. Compaction rewrites a dataset into
~``target_bytes`` files sized from the dataset's *actual* on-disk bytes,
preserving partition directories when asked.

The rewrite is atomic-by-rename at the directory level: write to a
``_compact_tmp`` sibling, then swap — a crash leaves either the old or the
new layout, never a mix (same temp-write+rename discipline as the
reference's checkpoint store, ``common.py:46-52``).
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
