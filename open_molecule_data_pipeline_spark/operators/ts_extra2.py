"""Interval algebra + deterministic systematic sampling.

- ``ts_interval_union_coverage``: classic interval-union ("how many
  seconds was each user active, counting overlaps once") — every event
  opens a 300 s activity interval; overlapping/adjacent intervals merge
  into islands via the running-max-of-end trick (one window partitioned
  by user — never global), then coverage = Σ(island end − island start).
  The same shape computes SLA uptime, ad-exposure, and sessionized
  dwell-time at any scale because all state is per-user.

- ``sample_systematic_stride``: systematic (every k-th) sampling in a
  deterministic pseudo-random order — rows ranked by md5(event_id) (both
  engines sort hex digests identically), the global rank from the
  scale-safe two-pass row_number, keep rank % 97 == 1. Equivalent to a
  1/97 rate with *guaranteed* spacing (no clumping, unlike Bernoulli),
  the property stratified evaluation sets care about; per-type counts in
  the output show the stratification balance.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

_SPAN = 300  # seconds each event keeps the user "active"

_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         cast(floor(epoch(ts)) AS BIGINT) AS s,
         cast(floor(epoch(ts)) AS BIGINT) + {_SPAN} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island,
         min(s) AS island_start, max(e) AS island_end
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_islands,
       cast(sum(island_end - island_start) AS BIGINT) AS coverage_s
FROM merged GROUP BY user_id
"""


@register(
    "ts_interval_union_coverage",
    oracle=_COVERAGE_ORACLE,
    tags=("timeseries", "window"),
    bench=True,
)
def ts_interval_union_coverage(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_timestamp(F.col("ts").cast("timestamp")) + _SPAN).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        (
            F.col("s")
            > F.coalesce(prev_max_end, F.lit(-(2**63)))
        ).cast("long"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("coverage_s"),
    )


_STRIDE = 97

_SYSTEMATIC_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         cast(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY md5(cast(event_id AS VARCHAR)), event_id)
           AS rn
  FROM events
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_sampled,
       cast(sum(cents) AS BIGINT) AS sum_cents
FROM ranked
WHERE rn % {_STRIDE} = 1
GROUP BY event_type
"""


@register("sample_systematic_stride", oracle=_SYSTEMATIC_ORACLE, tags=("sample",))
def sample_systematic_stride(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.md5(F.col("event_id").cast("string")).alias("h"),
        "event_id",
    )
    ranked = two_pass_global_window(ev, ["h", "event_id"], out_col="rn")
    return (
        ranked.filter(F.col("rn") % _STRIDE == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("cents").alias("sum_cents"),
        )
    )
