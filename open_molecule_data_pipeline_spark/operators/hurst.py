"""Hurst exponent by rescaled-range (R/S) analysis (r13): the classic
long-memory estimator (Hurst 1951; Mandelbrot-Wallis) — does a series
trend-persist (H > 0.5), mean-revert (H < 0.5), or walk randomly
(H = 0.5)? The number drives how far ahead a telemetry series is worth
forecasting at all.

Protocol, exact-int until the last shared expression:
- per series, the hourly-mean sequence in truncated cents (dtw.py rule);
- for each window size W in {8, 16, 32, 64}: consecutive non-overlapping
  chunks of exactly W values (remainder dropped). Per chunk, the
  rescaled range R/S = W-scaled-range / sqrt(W*Q - S^2): the cumulative
  deviation cumdev_k * W = W*prefix_k - k*S is EXACT int64 (no float
  mean), its max-min is the W-scaled range, and the denominator
  identity (std*W = sqrt(W*Q - S^2)) cancels the scaling, leaving ONE
  sqrt + ONE division of exact ints — bit-identical across engines;
- per-chunk R/S quantized to micro units BEFORE the per-(series, W)
  mean (the lsum playbook), which is then an exact integer division;
- H = the OLS slope of ln(mean R/S) on ln(W) over the four sizes,
  written as an EXPLICIT 4-term closed form over the pivoted quantized
  means (no SQL SUM over doubles -> no ordering dependence), rounded 6.

Zero-variance chunks (constant W-run) have undefined R/S and are
excluded by the shared exact predicate W*Q - S^2 > 0.

Scale shape: one corpus pass builds the bucket table; everything after
is bounded by series-count x time-range (chunk tables, the 4-row pivot)
— the acf.py/theil-sen boundedness argument. Per-series sequence
numbering partitions by the series key (fixed key domain, group size
bounded by the time range).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_SIZES = (8, 16, 32, 64)

_HURST_SLOPE = """
  round(
    (4.0 * (ln(8.0)  * ln(w8  / 1000000.0)
          + ln(16.0) * ln(w16 / 1000000.0)
          + ln(32.0) * ln(w32 / 1000000.0)
          + ln(64.0) * ln(w64 / 1000000.0))
     - (ln(8.0) + ln(16.0) + ln(32.0) + ln(64.0))
       * (ln(w8 / 1000000.0) + ln(w16 / 1000000.0)
          + ln(w32 / 1000000.0) + ln(w64 / 1000000.0)))
    / (4.0 * (ln(8.0) * ln(8.0) + ln(16.0) * ln(16.0)
            + ln(32.0) * ln(32.0) + ln(64.0) * ln(64.0))
       - (ln(8.0) + ln(16.0) + ln(32.0) + ln(64.0))
         * (ln(8.0) + ln(16.0) + ln(32.0) + ln(64.0))), 6)
"""

_HURST_ORACLE = f"""
WITH b AS (
  SELECT event_type AS g, epoch_us(ts) // 3600000000 AS h,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
v AS (
  SELECT g, h, CASE WHEN s < 0 THEN -((-s) // c) ELSE s // c END AS v,
         row_number() OVER (PARTITION BY g ORDER BY h) - 1 AS rn
  FROM b
),
sized AS (
  SELECT g, v, rn, w.w, rn // w.w AS chunk, rn % w.w AS pos
  FROM v, (SELECT unnest([{", ".join(str(w) for w in _SIZES)}]) AS w) w
),
pref AS (
  SELECT g, w, chunk, pos, v,
         sum(v) OVER (PARTITION BY g, w, chunk ORDER BY pos) AS p
  FROM sized
),
ctot AS (
  SELECT g, w, chunk, cast(sum(v) AS BIGINT) AS s,
         cast(sum(v * v) AS BIGINT) AS q,
         cast(count(*) AS BIGINT) AS cnt
  FROM pref GROUP BY g, w, chunk
),
cdev AS (
  SELECT p.g, p.w, p.chunk,
         cast(max(p.w * p.p - (p.pos + 1) * t.s) AS BIGINT) AS mx,
         cast(min(p.w * p.p - (p.pos + 1) * t.s) AS BIGINT) AS mn,
         any_value(t.s) AS s, any_value(t.q) AS q
  FROM pref p JOIN ctot t
    ON t.g = p.g AND t.w = p.w AND t.chunk = p.chunk AND t.cnt = p.w
  GROUP BY p.g, p.w, p.chunk
),
rs AS (
  SELECT g, w,
         cast(round(cast(mx - mn AS DOUBLE)
                    / sqrt(cast(w * q - s * s AS DOUBLE)) * 1000000)
              AS BIGINT) AS rs6
  FROM cdev WHERE w * q - s * s > 0
),
mean_rs AS (
  SELECT g, w, cast(count(*) AS BIGINT) AS n_chunks,
         cast(sum(rs6) // count(*) AS BIGINT) AS mean_rs_micro
  FROM rs GROUP BY g, w
),
piv AS (
  SELECT g,
         max(CASE WHEN w = 8 THEN mean_rs_micro END) AS w8,
         max(CASE WHEN w = 16 THEN mean_rs_micro END) AS w16,
         max(CASE WHEN w = 32 THEN mean_rs_micro END) AS w32,
         max(CASE WHEN w = 64 THEN mean_rs_micro END) AS w64
  FROM mean_rs GROUP BY g
)
SELECT m.g AS event_type, m.w, m.n_chunks, m.mean_rs_micro,
       {_HURST_SLOPE} AS hurst
FROM mean_rs m JOIN piv ON piv.g = m.g
"""


@register(
    "ts_hurst_rescaled_range",
    oracle=_HURST_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_hurst_rescaled_range(spark, sf_dir):
    """Per-series mean rescaled range at W = 8/16/32/64 plus the Hurst
    exponent (OLS slope of ln R/S on ln W), exact-int protocol."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    v = b.select(
        "g",
        "h",
        F.expr("s div c").alias("v"),
        (F.row_number().over(W.partitionBy("g").orderBy("h")) - 1).alias("rn"),
    )
    sized = v.select(
        "g",
        "v",
        "rn",
        F.explode(F.array(*[F.lit(w) for w in _SIZES])).alias("w"),
    ).select(
        "g",
        "v",
        "w",
        F.expr("rn div w").alias("chunk"),
        (F.col("rn") % F.col("w")).alias("pos"),
    )
    wp = W.partitionBy("g", "w", "chunk").orderBy("pos")
    pref = sized.withColumn("p", F.sum("v").over(wp))
    ctot = pref.groupBy("g", "w", "chunk").agg(
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    dev = F.col("w") * F.col("p") - (F.col("pos") + 1) * F.col("s")
    cdev = (
        pref.join(ctot, ["g", "w", "chunk"])
        .filter(F.col("cnt") == F.col("w"))
        .groupBy("g", "w", "chunk")
        .agg(
            F.max(dev).cast("long").alias("mx"),
            F.min(dev).cast("long").alias("mn"),
            F.first("s").alias("s"),
            F.first("q").alias("q"),
        )
    )
    rs = cdev.filter(
        F.col("w") * F.col("q") - F.col("s") * F.col("s") > 0
    ).select(
        "g",
        "w",
        F.round(
            (F.col("mx") - F.col("mn")).cast("double")
            / F.sqrt((F.col("w") * F.col("q") - F.col("s") * F.col("s")).cast("double"))
            * 1_000_000
        )
        .cast("long")
        .alias("rs6"),
    )
    mean_rs = rs.groupBy("g", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.expr("sum(rs6) div count(1)").cast("long").alias("mean_rs_micro"),
    )
    piv = mean_rs.groupBy("g").agg(
        *[
            F.max(
                F.when(F.col("w") == w, F.col("mean_rs_micro"))
            ).alias(f"w{w}")
            for w in _SIZES
        ]
    )
    return (
        mean_rs.join(F.broadcast(piv), "g")
        .select(
            F.col("g").alias("event_type"),
            "w",
            "n_chunks",
            "mean_rs_micro",
            F.expr(_HURST_SLOPE.strip()).alias("hurst"),
        )
    )
