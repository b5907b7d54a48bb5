"""Second window-function batch: ratio-to-report and gaps-and-islands.

- Ratio-to-report is the unordered partition-total window (share of the
  group sum without a self-join back). The partition total uses the
  scaled-integer window sum so the share division is bit-identical.
- Gaps-and-islands finds consecutive-hour activity streaks per user with
  the classic ``bucket - row_number`` trick — pure integer/interval
  arithmetic, one window, one aggregate; no iterative logic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# Ratio-to-report: each order's share of its priority class's total price
# (one month of orders). sum() OVER (PARTITION BY ...) with no ORDER BY is
# the whole-partition frame in both engines.
# --------------------------------------------------------------------------

_SHARE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       round(o_totalprice /
             (cast(sum(cast(round(o_totalprice * 100) AS BIGINT))
                     OVER (PARTITION BY o_orderpriority) AS DOUBLE)
              / cast(100 AS DOUBLE)), 6) AS price_share
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
"""


@register("window_ratio_to_report", oracle=_SHARE_ORACLE, tags=("window", "ratio"))
def window_ratio_to_report(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    w = Window.partitionBy("o_orderpriority")
    total = (
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(w).cast("double")
        / F.lit(100.0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.col("o_totalprice") / total, 6).alias("price_share"),
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: consecutive-hour activity streaks per user. The island
# key (hour - rn * 1h) is constant within a run of consecutive hours;
# row_number is tie-safe because (user_id, hr) is distinct by construction.
# --------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH hrs AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM events
), keyed AS (
  SELECT user_id, hr,
         hr - row_number() OVER (PARTITION BY user_id ORDER BY hr) * INTERVAL 1 HOUR AS island_key
  FROM hrs
)
SELECT user_id, min(hr) AS streak_start, cast(count(*) AS BIGINT) AS streak_hours
FROM keyed
GROUP BY user_id, island_key
"""


@register("window_gaps_islands", oracle=_ISLANDS_ORACLE, tags=("window", "islands"))
def window_gaps_islands(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hrs = e.select(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    keyed = hrs.withColumn(
        "island_key",
        F.col("hr") - F.row_number().over(w) * F.expr("INTERVAL '1' HOUR"),
    )
    return (
        keyed.groupBy("user_id", "island_key")
        .agg(
            F.min("hr").alias("streak_start"),
            F.count(F.lit(1)).alias("streak_hours"),
        )
        .select("user_id", "streak_start", "streak_hours")
    )


# --------------------------------------------------------------------------
# Row-pattern detection (SQL:2016 MATCH_RECOGNIZE shape, expressed with
# window lags): find V-shaped price patterns per part in shipdate order —
# two strict declines followed by two strict rises across 5 consecutive
# shipments (DOWN DOWN UP UP). Neither engine ships MATCH_RECOGNIZE;
# the portable rewrite binds the pattern's fixed-width window to 4 lag()
# columns and evaluates the predicate row-wise — one keyed window, no
# joins, no state machine. Prices compare as exact int64 cents; the
# ordering key (shipdate, orderkey, linenumber) is a total order so lag
# chains are deterministic. Variable-width patterns (DOWN+ UP+) compile
# to the gaps-and-islands template instead (window_gaps_islands).
# At 100 TB: one hash exchange on part, per-part sorted windows.
# --------------------------------------------------------------------------

_VSHAPE_ORACLE = """
WITH seq AS (
  SELECT l_partkey,
         cast(round(l_extendedprice * 100) AS BIGINT) AS p,
         lag(cast(round(l_extendedprice * 100) AS BIGINT), 1) OVER w AS p1,
         lag(cast(round(l_extendedprice * 100) AS BIGINT), 2) OVER w AS p2,
         lag(cast(round(l_extendedprice * 100) AS BIGINT), 3) OVER w AS p3,
         lag(cast(round(l_extendedprice * 100) AS BIGINT), 4) OVER w AS p4
  FROM lineitem
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber)
),
flags AS (
  SELECT l_partkey,
         CASE WHEN p4 > p3 AND p3 > p2 AND p2 < p1 AND p1 < p
              THEN 1 ELSE 0 END AS v
  FROM seq WHERE p4 IS NOT NULL
),
per_part AS (
  SELECT l_partkey, cast(count(*) AS BIGINT) AS n_windows,
         cast(sum(v) AS BIGINT) AS n_vshapes
  FROM flags GROUP BY l_partkey
)
SELECT l_partkey, n_windows, n_vshapes
FROM per_part
ORDER BY n_vshapes DESC, l_partkey LIMIT 10
"""


@register("window_pattern_vshape", oracle=_VSHAPE_ORACLE, tags=("window", "pattern"))
def window_pattern_vshape(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    seq = li.select(
        "l_partkey",
        p.alias("p"),
        F.lag(p, 1).over(w).alias("p1"),
        F.lag(p, 2).over(w).alias("p2"),
        F.lag(p, 3).over(w).alias("p3"),
        F.lag(p, 4).over(w).alias("p4"),
    )
    flags = seq.filter(F.col("p4").isNotNull()).select(
        "l_partkey",
        F.when(
            (F.col("p4") > F.col("p3"))
            & (F.col("p3") > F.col("p2"))
            & (F.col("p2") < F.col("p1"))
            & (F.col("p1") < F.col("p")),
            1,
        )
        .otherwise(0)
        .alias("v"),
    )
    return (
        flags.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("v").cast("long").alias("n_vshapes"),
        )
        .orderBy(F.desc("n_vshapes"), "l_partkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Sliding-window MEDIAN (robust rolling statistic): exact median of the
# trailing 7 hourly counts per event type. Spark has no median window
# function; the portable exact form collects the bounded frame into an
# array and takes the middle of its sorted copy — correct because the
# frame is FIXED-WIDTH (7), so per-row state is O(frame), never O(series).
# DuckDB evaluates its native median() over the same frame. Integer
# inputs make the even-frame average of two middles exact in both engines
# (sum is int, one division by 2).
# --------------------------------------------------------------------------

_ROLLMED_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hr, n,
       round(median(n) OVER (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
FROM hourly
"""


@register(
    "window_sliding_median", oracle=_ROLLMED_ORACLE, tags=("window", "stats")
)
def window_sliding_median(spark, sf_dir):
    li = table(spark, sf_dir, "events")
    hourly = li.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(F.collect_list("n").over(w))
    sz = F.size(frame)
    lo = F.element_at(frame, ((sz + 1) / 2).cast("int"))
    hi = F.element_at(frame, (sz / 2 + 1).cast("int"))
    med = (lo + hi) / 2.0
    return hourly.select(
        "event_type", "hr", "n", F.round(med, 6).alias("med7")
    )


# --------------------------------------------------------------------------
# Hampel filter (r13): the production robust outlier detector on top of
# the rolling median above — flag x when |x - med| > 3 * MAD over the
# trailing 7-hour frame (median absolute deviation, the estimator that
# survives the very outliers a rolling z-score is poisoned by). ALL
# arithmetic stays integer by scale-doubling: med2 = lo + hi (2x the
# median of the sorted frame), dev2 = |2x - med2|, mad4 = lo' + hi' over
# the sorted dev2s (4x the MAD), and the decision |x - med| > 3 * MAD
# is exactly 2 * dev2_self > 3 * mad4 — no halves, no doubles, no
# rounding anywhere. Frames are FIXED-WIDTH (7) so per-row state is
# O(frame); rows before a full frame are not judged (honest warm-up,
# same rule as the MASE lag validity).
# --------------------------------------------------------------------------

_HAMPEL_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
v AS (
  SELECT event_type, h,
         CASE WHEN s < 0 THEN -((-s) // c) ELSE s // c END AS v
  FROM hourly
),
framed AS (
  SELECT event_type, h, v,
         list_sort(list(v) OVER (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr
  FROM v
),
med AS (
  SELECT event_type, h, v,
         fr[(len(fr) + 1) // 2] + fr[len(fr) // 2 + 1] AS med2,
         list_sort(list_transform(fr, x ->
           abs(2 * x - (fr[(len(fr) + 1) // 2] + fr[len(fr) // 2 + 1]))))
           AS dv,
         len(fr) AS sz
  FROM framed
)
SELECT event_type, h, v, med2,
       dv[(sz + 1) // 2] + dv[sz // 2 + 1] AS mad4,
       cast(CASE WHEN 2 * abs(2 * v - med2)
                      > 3 * (dv[(sz + 1) // 2] + dv[sz // 2 + 1])
                 THEN 1 ELSE 0 END AS INTEGER) AS outlier
FROM med WHERE sz = 7
"""


@register(
    "window_hampel_outliers", oracle=_HAMPEL_ORACLE, tags=("window", "stats")
)
def window_hampel_outliers(spark, sf_dir):
    """Hampel filter over hourly mean cents: flag |x - med| > 3 MAD on
    the trailing 7-hour frame, scale-doubled exact-int arithmetic."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type"),
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    v = hourly.select("event_type", "h", F.expr("s div c").alias("v"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-6, 0)
    fr = F.array_sort(F.collect_list("v").over(w))
    framed = v.select("event_type", "h", "v", fr.alias("fr"))
    sz = F.size("fr")
    med2 = F.element_at("fr", ((sz + 1) / 2).cast("int")) + F.element_at(
        "fr", (sz / 2 + 1).cast("int")
    )
    med = framed.select(
        "event_type",
        "h",
        "v",
        med2.alias("med2"),
        F.array_sort(
            F.transform(
                "fr",
                lambda x: F.abs(2 * x - med2),
            )
        ).alias("dv"),
        sz.alias("sz"),
    )
    mad4 = F.element_at("dv", ((F.col("sz") + 1) / 2).cast("int")) + F.element_at(
        "dv", (F.col("sz") / 2 + 1).cast("int")
    )
    return med.filter(F.col("sz") == 7).select(
        "event_type",
        "h",
        "v",
        "med2",
        mad4.alias("mad4"),
        (2 * F.abs(2 * F.col("v") - F.col("med2")) > 3 * mad4)
        .cast("int")
        .alias("outlier"),
    )
