"""Data-skipping engine features: zone-map file pruning + Bloom runtime filter.

Two patterns every lakehouse engine ships and a 100 TB Spark deployment
leans on daily:

- **Zone maps / min-max file skipping** (Iceberg manifests, Delta
  ``stats``, parquet row-group indexes): lay the table out sorted into
  equal-size files, record per-file min/max of the sort key at build time,
  and answer range queries by consulting the (tiny) zone-map table first —
  the scan only ever opens files whose [min,max] interval overlaps the
  predicate. Here the surviving-file set is joined back as a broadcast so
  Spark's dynamic partition pruning physically skips the dead files
  (same DPP shape as ``sim_ivf_persisted``); the oracle recomputes the
  layout + zone maps analytically, so a scan that read (or lost) the wrong
  files breaks the hash.

- **Bloom-filter runtime semi-join reduction** (Spark's
  ``spark.sql.optimizer.runtime.bloomFilter``, Trino dynamic filters): a
  compact one-sided-error digest of the dim-side join keys is broadcast and
  applied to the fact side *before* the shuffle, so only candidate rows
  (true matches + a measured false-positive tail) pay join cost. The Bloom
  here is explicit — k=2 positions in a 16-bit space from md5 prefixes,
  the same deterministic construction as ``text_bloom_decontaminate`` — so
  both engines agree bit-for-bit on candidates, and the result reports the
  false-positive overhead the runtime filter would carry to the shuffle.

Reference parity note: the reference engine has no data-skipping layer
(its scans are whole-file, ``src/open_molecule_data_pipeline/ingestion/``);
these are engine capabilities the Spark build adds for warehouse-scale
queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

_N_FILES = 16
_LO, _HI = 12000, 18000  # cents; ~12% of the [1, 49002] value range

_ZONEMAP_ORACLE = f"""
WITH base AS (
  SELECT event_id, cast(round(value * 100) AS BIGINT) AS v FROM events
),
laid AS (
  SELECT v,
         ((row_number() OVER (ORDER BY v, event_id) - 1) * {_N_FILES})
           // (SELECT count(*) FROM base) AS fid
  FROM base
),
zm AS (
  SELECT fid, min(v) AS min_v, max(v) AS max_v,
         cast(count(*) AS BIGINT) AS n_rows
  FROM laid GROUP BY fid
)
SELECT zm.fid, zm.min_v, zm.max_v, zm.n_rows,
       cast(count(l.v) AS BIGINT) AS n_match,
       cast(coalesce(sum(l.v), 0) AS BIGINT) AS sum_cents
FROM zm
LEFT JOIN laid l
  ON l.fid = zm.fid AND l.v BETWEEN {_LO} AND {_HI}
WHERE zm.max_v >= {_LO} AND zm.min_v <= {_HI}
GROUP BY zm.fid, zm.min_v, zm.max_v, zm.n_rows
"""


@register("layout_zonemap_pruning", oracle=_ZONEMAP_ORACLE, tags=("formats", "layout"))
def layout_zonemap_pruning(spark, sf_dir):
    """Build a sorted 16-file layout + zone maps; range-query via file skipping.

    Build phase (the one-time index cost): global sort order by the skip key
    via the scale-safe two-pass row_number, file id = equal-size slice of
    the order, data written partitioned by file id, zone maps = per-file
    min/max/count. Query phase: the zone-map table (16 rows) is filtered to
    files overlapping [lo, hi] and broadcast-joined to the stored scan —
    dynamic partition pruning turns the surviving-fid set into a
    PartitionFilters entry, so non-overlapping files are never opened. One
    output row per SURVIVING file (n_match may be 0: zone overlap is
    necessary, not sufficient) proves the pruning decision set exactly.
    """
    from .file_formats import _scratch

    e = table(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    n = e.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    laid = (
        two_pass_global_window(e, ["v", "event_id"], out_col="rn")
        .crossJoin(F.broadcast(n))
        .select(
            "v",
            F.expr(f"((rn - 1) * {_N_FILES}) div __n").alias("fid"),
        )
    )
    out = _scratch("zonemap", sf_dir)
    laid.write.mode("overwrite").partitionBy("fid").parquet(str(out))
    stored = spark.read.parquet(str(out)).select(
        "v", F.col("fid").cast("long").alias("fid")
    )
    zm = stored.groupBy("fid").agg(
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    surviving = zm.filter((F.col("max_v") >= _LO) & (F.col("min_v") <= _HI))
    matches = (
        stored.filter(F.col("v").between(_LO, _HI))
        .join(F.broadcast(surviving.select("fid")), "fid")
        .groupBy("fid")
        .agg(F.count(F.lit(1)).alias("n_match"), F.sum("v").alias("sum_cents"))
    )
    return surviving.join(matches, "fid", "left").select(
        "fid",
        "min_v",
        "max_v",
        "n_rows",
        F.coalesce("n_match", F.lit(0)).alias("n_match"),
        F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
    )


_SEG = "AUTOMOBILE"

_BLOOM_JOIN_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = '{_SEG}'
),
bits AS (
  SELECT DISTINCT p FROM (
    SELECT substr(md5(cast(k AS VARCHAR) || '|0'), 1, 4) AS p FROM dim
    UNION ALL
    SELECT substr(md5(cast(k AS VARCHAR) || '|1'), 1, 4) AS p FROM dim
  ) u
),
fact AS (
  SELECT o_orderpriority,
         o_custkey,
         substr(md5(cast(o_custkey AS VARCHAR) || '|0'), 1, 4) AS p0,
         substr(md5(cast(o_custkey AS VARCHAR) || '|1'), 1, 4) AS p1
  FROM orders
),
probe AS (
  SELECT o_orderpriority,
         CASE WHEN p0 IN (SELECT p FROM bits)
               AND p1 IN (SELECT p FROM bits) THEN 1 ELSE 0 END AS bloom_hit,
         CASE WHEN o_custkey IN (SELECT k FROM dim) THEN 1 ELSE 0 END AS exact_hit
  FROM fact
)
SELECT o_orderpriority,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(sum(bloom_hit) AS BIGINT) AS bloom_candidates,
       cast(sum(exact_hit) AS BIGINT) AS exact_matches,
       cast(sum(bloom_hit) - sum(exact_hit) AS BIGINT) AS false_positives
FROM probe
GROUP BY o_orderpriority
"""


@register("join_bloom_semijoin", oracle=_BLOOM_JOIN_ORACLE, tags=("join", "semi"))
def join_bloom_semijoin(spark, sf_dir):
    """Runtime Bloom filter on the fact side of a semi join, with FP audit.

    The dim side (one market segment of customers) digests its keys into a
    Bloom bitset (k=2 md5-prefix positions, 16-bit space) that is broadcast
    and applied to orders BEFORE any shuffle — the production shape where
    the fact table is 1000× the dim and the shuffle is the cost. Exact
    membership runs next to it so the output prices the one-sided error:
    bloom_candidates >= exact_matches per priority, difference =
    false positives that would have paid (and been dropped by) the join.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == _SEG).select(
        F.col("c_custkey").alias("k")
    )

    def pos(col, salt):
        return F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 4)

    bits = (
        dim.select(pos(F.col("k"), "|0").alias("p"))
        .union(dim.select(pos(F.col("k"), "|1").alias("p")))
        .distinct()
    )
    fact = o.select(
        "o_orderpriority",
        "o_custkey",
        pos(F.col("o_custkey"), "|0").alias("p0"),
        pos(F.col("o_custkey"), "|1").alias("p1"),
    )
    b0 = bits.select(F.col("p").alias("p0"), F.lit(1).alias("h0"))
    b1 = bits.select(F.col("p").alias("p1"), F.lit(1).alias("h1"))
    dimflag = dim.select(F.col("k").alias("o_custkey"), F.lit(1).alias("hx"))
    probe = (
        fact.join(F.broadcast(b0), "p0", "left")
        .join(F.broadcast(b1), "p1", "left")
        # the exact-membership audit joins the full dim side — SF-scaling, so
        # unhinted (the Bloom bit tables above stay broadcast: distinct
        # 16-bit positions, <= 65536 rows by construction)
        .join(dimflag, "o_custkey", "left")
        .select(
            "o_orderpriority",
            (F.coalesce("h0", F.lit(0)) * F.coalesce("h1", F.lit(0))).alias(
                "bloom_hit"
            ),
            F.coalesce("hx", F.lit(0)).alias("exact_hit"),
        )
    )
    return probe.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("bloom_hit").alias("bloom_candidates"),
        F.sum("exact_hit").alias("exact_matches"),
        (F.sum("bloom_hit") - F.sum("exact_hit")).alias("false_positives"),
    )


# --------------------------------------------------------------------------
# Clustering depth (r10) — the Iceberg/Delta re-clustering trigger metric:
# for each file's zone [min,max], how many files' zones overlap it
# (including itself). avg_depth == 1 means perfectly clustered (every
# range query opens one file); avg_depth == n_files means the layout is
# useless for skipping. Computed for BOTH layouts side by side — the
# value-sorted layout (two-pass rank slice, same build as
# layout_zonemap_pruning) and a hash layout (event_id % N) — so the
# output IS the re-cluster decision: the depth gap is what a sort/Z-order
# rewrite would buy. Relational end to end: the zonemap tables are
# N_FILES-row aggregates, the overlap self-join runs on the broadcast of
# a bounded aggregate, and no files are written (the metric concerns the
# zone geometry, not the bytes).
# --------------------------------------------------------------------------

_DEPTH_ORACLE = f"""
WITH base AS (
  SELECT event_id, cast(round(value * 100) AS BIGINT) AS v FROM events
),
laid AS (
  SELECT 'sorted' AS layout, v,
         ((row_number() OVER (ORDER BY v, event_id) - 1) * {_N_FILES})
           // (SELECT count(*) FROM base) AS fid
  FROM base
  UNION ALL
  SELECT 'hashed' AS layout, v, event_id % {_N_FILES} AS fid FROM base
),
zm AS (
  SELECT layout, fid, min(v) AS min_v, max(v) AS max_v
  FROM laid GROUP BY layout, fid
),
depth AS (
  SELECT a.layout, a.fid, cast(count(*) AS BIGINT) AS d
  FROM zm a JOIN zm b
    ON a.layout = b.layout AND a.min_v <= b.max_v AND b.min_v <= a.max_v
  GROUP BY a.layout, a.fid
)
SELECT layout,
       cast(count(*) AS BIGINT) AS n_files,
       round(cast(sum(d) AS DOUBLE) / cast(count(*) AS DOUBLE), 6)
         AS avg_depth,
       cast(max(d) AS BIGINT) AS max_depth,
       cast(min(d) AS BIGINT) AS min_depth
FROM depth GROUP BY layout
"""


@register(
    "layout_clustering_depth",
    oracle=_DEPTH_ORACLE,
    tags=("formats", "layout", "profile"),
)
def layout_clustering_depth(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    n = e.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    srt = (
        two_pass_global_window(e, ["v", "event_id"], out_col="rn")
        .crossJoin(F.broadcast(n))
        .select(
            F.lit("sorted").alias("layout"),
            "v",
            F.expr(f"((rn - 1) * {_N_FILES}) div __n").alias("fid"),
        )
    )
    hsh = e.select(
        F.lit("hashed").alias("layout"),
        "v",
        (F.col("event_id") % _N_FILES).alias("fid"),
    )
    zm = (
        srt.unionByName(hsh)
        .groupBy("layout", "fid")
        .agg(F.min("v").alias("min_v"), F.max("v").alias("max_v"))
    )
    a = zm.alias("a")
    b = zm.alias("b")
    depth = (
        a.join(
            F.broadcast(b),
            (F.col("a.layout") == F.col("b.layout"))
            & (F.col("a.min_v") <= F.col("b.max_v"))
            & (F.col("b.min_v") <= F.col("a.max_v")),
        )
        .groupBy(F.col("a.layout").alias("layout"), F.col("a.fid").alias("fid"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return depth.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.round(
            F.sum("d").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_depth"),
        F.max("d").cast("long").alias("max_depth"),
        F.min("d").cast("long").alias("min_depth"),
    )
