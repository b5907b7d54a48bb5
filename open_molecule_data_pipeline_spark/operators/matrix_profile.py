"""Matrix profile over event series (r13): exact top motif + top
discord per series — the two headline products of the matrix-profile
family (Yeh et al., ICDM 2016), computed exactly on the HOURLY mean
series.

The matrix profile is the per-window nearest-neighbor distance vector
under a non-overlap exclusion zone; its argmin pair is the series' best
MOTIF (most-repeated shape) and its argmax window the best DISCORD (the
subsequence least like anything else — the classic anomaly detector).

Scale design (the DTW/Theil-Sen boundedness argument): windows live on
the hourly bucket table, so the candidate-pair stream is O(H^2) in the
TIME RANGE in hours (~720 here -> ~260k pairs/series), independent of
corpus row count — more rows only sharpen the bucket means. The pair
stream is generated-then-aggregated in one stage (self-join on the
series key + theta non-overlap filter, map-side combinable NN
aggregation); per-series windows/rankings partition by the series key,
whose group sizes are bounded by the time range (the GBT/Spearman
fixed-key-domain note). Everything is exact int64: bucket means in
truncated cents (the dtw.py div mirror), distances as sums of squared
cent diffs (|diff| <= 2e5 -> sum <= 1.6e11, far inside int64).

Window length m = 4 hours; windows require a DENSE hour run (the MASE
lag-validity rule): lead(h, 3) == h + 3, so a missing bucket honestly
invalidates the windows that would span it instead of comparing
non-adjacent hours.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_M = 4  # window length in hours

_MP_ORACLE = f"""
WITH b AS (
  SELECT event_type AS g, epoch_us(ts) // 3600000000 AS h,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
v AS (
  SELECT g, h, CASE WHEN s < 0 THEN -((-s) // c) ELSE s // c END AS v
  FROM b
),
w AS (
  SELECT g, h,
         v AS v0,
         lead(v, 1) OVER wo AS v1,
         lead(v, 2) OVER wo AS v2,
         lead(v, 3) OVER wo AS v3,
         lead(h, 3) OVER wo AS h3
  FROM v WINDOW wo AS (PARTITION BY g ORDER BY h)
),
wd AS (
  SELECT g, h, v0, v1, v2, v3 FROM w WHERE h3 = h + 3
),
pairs AS (
  SELECT a.g, a.h AS ha, bb.h AS hb,
         (a.v0 - bb.v0) * (a.v0 - bb.v0)
         + (a.v1 - bb.v1) * (a.v1 - bb.v1)
         + (a.v2 - bb.v2) * (a.v2 - bb.v2)
         + (a.v3 - bb.v3) * (a.v3 - bb.v3) AS d
  FROM wd a JOIN wd bb ON a.g = bb.g AND bb.h >= a.h + {_M}
),
motif AS (
  SELECT g, ha, hb, d FROM (
    SELECT g, ha, hb, d,
           row_number() OVER (PARTITION BY g ORDER BY d, ha, hb) AS rn
    FROM pairs
  ) t WHERE rn = 1
),
nn AS (
  SELECT g, i, cast(min(d) AS BIGINT) AS nnd FROM (
    SELECT g, ha AS i, d FROM pairs
    UNION ALL
    SELECT g, hb AS i, d FROM pairs
  ) u GROUP BY g, i
),
discord AS (
  SELECT g, i, nnd FROM (
    SELECT g, i, nnd,
           row_number() OVER (PARTITION BY g ORDER BY nnd DESC, i) AS rn
    FROM nn
  ) t WHERE rn = 1
)
SELECT m.g AS event_type,
       m.ha AS motif_a_hour, m.hb AS motif_b_hour,
       cast(m.d AS BIGINT) AS motif_sqdist,
       d.i AS discord_hour, d.nnd AS discord_nn_sqdist
FROM motif m JOIN discord d ON d.g = m.g
"""


@register(
    "ts_matrix_profile_motif",
    oracle=_MP_ORACLE,
    tags=("timeseries", "similarity"),
)
def ts_matrix_profile_motif(spark, sf_dir):
    """Exact matrix-profile motif (argmin NN pair) and discord (argmax
    NN window) per hourly-mean event series, m = 4, non-overlap
    exclusion zone."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    v = b.select("g", "h", F.expr("s div c").alias("v"))
    wo = W.partitionBy("g").orderBy("h")
    w = v.select(
        "g",
        "h",
        F.col("v").alias("v0"),
        F.lead("v", 1).over(wo).alias("v1"),
        F.lead("v", 2).over(wo).alias("v2"),
        F.lead("v", 3).over(wo).alias("v3"),
        F.lead("h", 3).over(wo).alias("h3"),
    ).filter(F.col("h3") == F.col("h") + 3)
    a = w.alias("a")
    bb = w.alias("b")
    d = sum(
        (F.col(f"a.v{k}") - F.col(f"b.v{k}"))
        * (F.col(f"a.v{k}") - F.col(f"b.v{k}"))
        for k in range(_M)
    )
    pairs = a.join(
        bb,
        (F.col("a.g") == F.col("b.g")) & (F.col("b.h") >= F.col("a.h") + _M),
    ).select(
        F.col("a.g").alias("g"),
        F.col("a.h").alias("ha"),
        F.col("b.h").alias("hb"),
        d.cast("long").alias("d"),
    )
    wm = W.partitionBy("g").orderBy("d", "ha", "hb")
    motif = (
        pairs.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("g", "ha", "hb", "d")
    )
    nn = (
        pairs.select("g", F.col("ha").alias("i"), "d")
        .unionByName(pairs.select("g", F.col("hb").alias("i"), "d"))
        .groupBy("g", "i")
        .agg(F.min("d").cast("long").alias("nnd"))
    )
    wd_ = W.partitionBy("g").orderBy(F.desc("nnd"), "i")
    discord = (
        nn.withColumn("rn", F.row_number().over(wd_))
        .filter(F.col("rn") == 1)
        .select("g", F.col("i").alias("discord_hour"),
                F.col("nnd").alias("discord_nn_sqdist"))
    )
    return motif.join(discord, "g").select(
        F.col("g").alias("event_type"),
        F.col("ha").alias("motif_a_hour"),
        F.col("hb").alias("motif_b_hour"),
        F.col("d").alias("motif_sqdist"),
        "discord_hour",
        "discord_nn_sqdist",
    )
