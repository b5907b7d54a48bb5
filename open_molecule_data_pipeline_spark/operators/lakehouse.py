"""Lakehouse table-maintenance features: positional deletion vectors
(merge-on-read) and small-file compaction.

- ``cdc_deletion_vectors``: Delta/Iceberg-style DVs — deletes are a tiny
  side file of (file_id, position) pairs, applied at read time with an
  anti join, so a delete never rewrites a data file (merge-on-read; the
  copy-on-write alternative is the compaction path below). Layout is the
  same deterministic 16-file split as ``layout_zonemap_pruning``; the
  stored rows carry their in-file position explicitly (the deterministic
  stand-in for the row ordinal a real reader gets from the scan), the DV
  side is broadcast, and the output reports per-file live/deleted
  bookkeeping — exactly what a table-format manifest tracks.

- ``layout_compaction_binpack``: the real ``plans/compact.py`` rewrite
  (observed-bytes-sized bin packing, tmp-write + swap, crash recovery)
  run over a deliberately fragmented 64-file copy of events, proven
  lossless by aggregating the compacted dataset against the oracle on the
  original. File-count math and crash-window recovery stay covered by
  ``tests/test_layout.py``-style unit tests; this query puts the rewrite
  path itself under the driver's value-hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

_N_FILES = 16

_DV_ORACLE = f"""
WITH base AS (
  SELECT event_id, cast(round(value * 100) AS BIGINT) AS v FROM events
),
laid AS (
  SELECT event_id, v,
         row_number() OVER (ORDER BY v, event_id) - 1 AS pg,
         ((row_number() OVER (ORDER BY v, event_id) - 1) * {_N_FILES})
           // (SELECT count(*) FROM base) AS fid
  FROM base
),
pos AS (
  SELECT l.event_id, l.v, l.fid,
         l.pg - min(l.pg) OVER (PARTITION BY l.fid) AS pos
  FROM laid l
),
dv AS (SELECT fid, pos FROM pos WHERE v % 7 = 0)
SELECT p.fid,
       cast(count(*) AS BIGINT) AS n_rows,
       cast(sum(CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deleted,
       cast(sum(CASE WHEN d.pos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_live,
       cast(sum(CASE WHEN d.pos IS NULL THEN p.v ELSE 0 END) AS BIGINT)
         AS sum_live
FROM pos p LEFT JOIN dv d ON d.fid = p.fid AND d.pos = p.pos
GROUP BY p.fid
"""


@register(
    "cdc_deletion_vectors",
    oracle=_DV_ORACLE,
    tags=("cdc", "formats"),
    # headline-benched since r7 (VERDICT r6 #8): lakehouse maintenance is
    # heavier than half the prior headline set and needs round-over-round
    # tracking
    bench=True,
)
def cdc_deletion_vectors(spark, sf_dir):
    from .file_formats import _scratch

    e = table(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    n = e.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    laid = (
        two_pass_global_window(e, ["v", "event_id"], out_col="rn")
        .crossJoin(F.broadcast(n))
        .select(
            "event_id",
            "v",
            (F.col("rn") - 1).alias("pg"),
            F.expr(f"((rn - 1) * {_N_FILES}) div __n").alias("fid"),
        )
    )
    starts = laid.groupBy("fid").agg(F.min("pg").alias("fid_start"))
    pos = laid.join(F.broadcast(starts), "fid").select(
        "event_id", "v", "fid", (F.col("pg") - F.col("fid_start")).alias("pos")
    )
    out = _scratch("dvbase", sf_dir)
    pos.write.mode("overwrite").partitionBy("fid").parquet(str(out))
    stored = spark.read.parquet(str(out)).select(
        "v", "pos", F.col("fid").cast("long").alias("fid")
    )
    # the deletion vector: tiny, persisted next to the table in a real
    # format; broadcast at read time
    dv = stored.filter(F.col("v") % 7 == 0).select(
        "fid", "pos", F.lit(1).alias("__del")
    )
    # deletion vectors grow with delete volume: unhinted, they broadcast
    # while small and fall back to a (fid,pos) shuffle join when not
    merged = stored.join(dv, ["fid", "pos"], "left")
    return merged.groupBy("fid").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce("__del", F.lit(0))).alias("n_deleted"),
        F.sum((F.col("__del").isNull()).cast("long")).alias("n_live"),
        F.sum(
            F.when(F.col("__del").isNull(), F.col("v")).otherwise(F.lit(0))
        ).alias("sum_live"),
    )


_COMPACT_ORACLE = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


@register("layout_compaction_binpack", oracle=_COMPACT_ORACLE, tags=("formats", "layout"))
def layout_compaction_binpack(spark, sf_dir):
    from ..plans.compact import compact_parquet
    from .file_formats import _scratch

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "user_id",
    )
    frag = _scratch("compact", sf_dir)
    # deliberately fragmented: 64 small files for a table this size
    e.repartition(64).write.mode("overwrite").parquet(str(frag))
    compact_parquet(spark, str(frag), target_bytes=4 * 1024 * 1024)
    back = spark.read.parquet(str(frag))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Dynamic partition overwrite (r12) — the backfill idiom: INSERT OVERWRITE
# that replaces ONLY the partitions the incoming data touches, leaving
# every other partition's files untouched (Spark's
# ``partitionOverwriteMode=dynamic`` write option; STATIC mode — the
# default — would truncate the whole table). The fixture stages a bad
# first load (one event_type's hourly rollup computed with a corrupted
# filter), then backfills just that type's partition with corrected rows
# through a dynamic-mode overwrite; the driver-hashed result is the final
# table state, which must equal the clean rollup — possible only if the
# backfill replaced the bad partition AND spared the good ones.
# tests/test_round12_ops.py additionally pins the file-level semantics:
# untouched partitions keep byte-identical files across the backfill.
# At 100 TB this is the difference between rewriting one day/source
# directory and rewriting the table.
# --------------------------------------------------------------------------

_DYN_OVERWRITE_ORACLE = """
SELECT event_type,
       epoch_us(ts) // 3600000000 AS h,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""


def _hourly_rollup(ev):
    return ev.groupBy(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "sum_cents"
        ),
    )


@register(
    "format_dynamic_partition_overwrite",
    oracle=_DYN_OVERWRITE_ORACLE,
    tags=("formats", "cdc"),
)
def format_dynamic_partition_overwrite(spark, sf_dir):
    from ..catalog import table
    from .file_formats import _scratch

    ev = table(spark, sf_dir, "events")
    out = _scratch("dynow", sf_dir)
    # bad first load: the 'click' partition's rollup drops sub-dollar rows
    bad = _hourly_rollup(
        ev.filter(
            (F.col("event_type") != "click") | (F.col("value") >= 1.0)
        )
    )
    bad.write.mode("overwrite").partitionBy("event_type").parquet(str(out))
    # backfill: recompute ONLY the click partition, overwrite dynamically
    fix = _hourly_rollup(ev.filter(F.col("event_type") == "click"))
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(str(out))
    )
    return spark.read.parquet(str(out)).select(
        "event_type", "h", "n", "sum_cents"
    )
