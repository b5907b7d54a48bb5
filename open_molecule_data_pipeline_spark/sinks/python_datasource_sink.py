"""Spark 4 Python Data Source WRITER: gzip-NDJSON batch sink (r10).

The reference's output format is gzip NDJSON batches (reference
``pipeline/io.py``: ``write_ndjson_batches``); this repo's primary sink
expresses that through ``DataFrameWriter`` (``sinks/ndjson.py``). This
module closes the remaining API-surface gap by exposing the SAME sink as
a first-class ``df.write.format("omdp_ndjson")`` target via the Spark 4
Python Data Source writer API (``pyspark.sql.datasource``):

- each task serializes its partition to one ``part-<pid>-<uuid>``
  ``.ndjson[.gz]`` file (write-side parallelism = data parallelism, no
  driver funnel), streaming row-by-row — no partition-sized buffering;
- tasks stage under a hidden ``_staging`` directory and report the file
  in a ``WriterCommitMessage``; ``commit`` on the driver atomically
  renames staged files into place and writes a ``_SUCCESS`` manifest
  with per-file row counts (the two-phase protocol that makes task
  retries/speculation safe — an aborted attempt's staging file is
  simply never promoted, and ``abort`` sweeps the staging dir);
- ``compress`` option toggles gzip (default on, like the reference);
- ``mode("overwrite")`` sweeps pre-existing part files not in the new
  manifest at commit time (append leaves them), so the directory's
  data files always equal the ``_SUCCESS`` accounting.

At scale this is the object-store-safe commit pattern in miniature:
data moves in parallel, only cheap renames serialize on the driver.
"""

from __future__ import annotations

import gzip
import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

SINK_FORMAT_NAME = "omdp_ndjson"


@dataclass
class _FileCommit(WriterCommitMessage):
    staged: str
    final: str
    rows: int


class NdjsonDataSource(DataSource):
    """``df.write.format("omdp_ndjson").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return SINK_FORMAT_NAME

    def writer(self, schema, overwrite: bool) -> "NdjsonWriter":
        return NdjsonWriter(self.options, schema, overwrite)


class NdjsonWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("omdp_ndjson sink requires a 'path' option")
        self.compress = str(options.get("compress", "true")).lower() == "true"
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        ext = ".ndjson.gz" if self.compress else ".ndjson"
        base = f"part-{pid:05d}-{uuid.uuid4().hex}{ext}"
        staged = os.path.join(staging, base)
        opener = gzip.open if self.compress else open
        n = 0
        with opener(staged, "wt", encoding="utf-8") as fh:
            for row in rows:
                fh.write(
                    json.dumps(
                        dict(zip(self.fields, row)), sort_keys=True,
                        default=str,
                    )
                )
                fh.write("\n")
                n += 1
        return _FileCommit(staged, os.path.join(self.path, base), n)

    def commit(self, messages) -> None:
        import glob as _glob
        import shutil

        manifest = {}
        for m in messages:
            os.replace(m.staged, m.final)
            manifest[os.path.basename(m.final)] = m.rows
        if self.overwrite:
            # mode("overwrite") contract (ADVICE r10, wording tightened
            # per ADVICE r11): AFTER commit returns, the directory's data
            # files are exactly this write's manifest — including the
            # empty-DataFrame case, which commits an empty manifest and
            # clears every existing part file (intended: overwrite-with-
            # empty means truncate). New files carry fresh UUID names and
            # are promoted first, THEN stale files are swept, so a glob
            # reader racing the commit may transiently see old+new files
            # together; the guarantee is post-commit only. (Sweeping
            # first would instead expose a zero-file window — strictly
            # worse for readers that treat "no parts" as "empty table".)
            for pattern in ("*.ndjson", "*.ndjson.gz"):
                for stale in _glob.glob(os.path.join(self.path, pattern)):
                    if os.path.basename(stale) not in manifest:
                        os.remove(stale)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(manifest, fh, sort_keys=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


def register_ndjson_sink(spark) -> None:
    """Idempotent registration (same late-binding caveat as the reader:
    executors must import this module from the repo's PYTHONPATH)."""
    spark.dataSource.register(NdjsonDataSource)
