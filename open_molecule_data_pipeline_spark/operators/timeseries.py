"""Event-time operators over the events table: tumbling/sliding windows,
sessionization, as-of enrichment.

These are the batch twins of the streaming jobs in ``streaming/`` — the same
``F.window`` expressions run under ``readStream`` with a watermark. The
reference's closest analog is its checkpointed page batching (SURVEY.md §2A
B1/B2); true event-time semantics are new surface.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lsum, s_lsum
from .asof import asof_join

# --------------------------------------------------------------------------
# Tumbling window: F.window == time_bucket. Map-side partial aggregation
# means each hour bucket ships one row per partition to the shuffle.
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n,
       {s_lsum('value', 100)} AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
"""


# bench r16: demoted for graph_louvain_singleton (cap-34 swap) — the
# tumbling-hour agg shape is subsumed by headline ts_vwap_hourly
@register("ts_tumbling_hour", oracle=_TUMBLING_ORACLE, tags=("timeseries", "window"))
def ts_tumbling_hour(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), lsum("value", 100).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Sliding window (1h window, 30m slide): each event lands in 2 windows.
# The oracle expands the window membership explicitly via unnest.
# --------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT window_start, count(*) AS n, {s_lsum('value', 100)} AS sum_value
FROM (
  SELECT unnest([
           time_bucket(INTERVAL '30 minutes', ts),
           time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
         ]) AS window_start,
         value
  FROM events
) t
GROUP BY window_start
"""


@register("ts_sliding_halfhour", oracle=_SLIDING_ORACLE, tags=("timeseries", "window"))
def ts_sliding_halfhour(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), lsum("value", 100).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


# --------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session. Interval arithmetic
# (timestamp - timestamp) is exact microseconds in both engines — epoch
# seconds would truncate sub-second gaps differently.
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
SELECT user_id,
       cast(sum(new_s) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
) t
GROUP BY user_id
"""


@register("ts_sessionization", oracle=_SESSION_ORACLE, tags=("timeseries", "session"), bench=True)
def ts_sessionization(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        e.select("user_id", new_s.alias("new_s"))
        .groupBy("user_id")
        .agg(
            F.sum("new_s").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# As-of join: enrich each event with the customer's latest order at event
# time. Spark side uses the union+window construction (operators/asof.py);
# the oracle is a correlated LATERAL lookup with identical tie-breaking.
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       s.o_orderkey AS last_orderkey,
       round(s.o_totalprice, 2) AS last_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
  LIMIT 1
) s ON true
"""


@register("ts_asof_latest_order", oracle=_ASOF_ORACLE, tags=("timeseries", "asof"), bench=True)
def ts_asof_latest_order(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        # orders use ms timestamps, events use ns->us NTZ; align types for
        # the union inside asof_join.
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        left=e,
        right=o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_totalprice"),
    )


# --------------------------------------------------------------------------
# Funnel analysis: per-user stage timestamps via conditional aggregation,
# conversion = ordered stage progression. One pass, one shuffle on user_id.
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
SELECT user_id,
       (t_signup IS NOT NULL) AS has_signup,
       (t_purchase IS NOT NULL) AS has_purchase,
       (t_signup IS NOT NULL AND t_purchase IS NOT NULL
        AND t_signup < t_purchase) AS converted
FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
) t
"""


@register("ts_funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("timeseries", "funnel"))
def ts_funnel_conversion(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    t_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    t_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    staged = e.groupBy("user_id").agg(
        t_signup.alias("t_signup"), t_purchase.alias("t_purchase")
    )
    return staged.select(
        "user_id",
        F.col("t_signup").isNotNull().alias("has_signup"),
        F.col("t_purchase").isNotNull().alias("has_purchase"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_signup") < F.col("t_purchase"))
        ).alias("converted"),
    )


# --------------------------------------------------------------------------
# Rate-anomaly scoring: hourly event counts z-scored against the trailing
# 6-hour window (excluding the current hour). Counts are exact ints; the
# trailing mean/std accumulate over an identically-ordered 6-row frame in
# both engines, and the z-score is rounded to 6 digits to absorb last-ulp
# accumulation differences. At 100 TB this is one keyed shuffle (the
# hourly pre-aggregate) + one ordered window per key.
# --------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), scored AS (
  SELECT event_type, hr, n,
         avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sigma,
         count(*) OVER w AS n_window
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hr, n,
       round(CASE WHEN n_window >= 3 AND sigma > 0
                  THEN (n - mu) / sigma END, 6) AS zscore
FROM scored
"""


@register("ts_rate_anomaly", oracle=_ANOMALY_ORACLE, tags=("timeseries", "window"))
def ts_rate_anomaly(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("hr").rowsBetween(-6, -1)
    mu = F.avg("n").over(w)
    sigma = F.stddev_samp("n").over(w)
    n_window = F.count(F.lit(1)).over(w)
    z = F.when((n_window >= 3) & (sigma > 0), (F.col("n") - mu) / sigma)
    return hourly.select(
        "event_type", "hr", "n", F.round(z, 6).alias("zscore")
    )


# --------------------------------------------------------------------------
# EWMA smoothing with halflife = 1 event (decay 1/2 per step), truncated at
# 8 taps. Written as ONE SQL text that runs verbatim on both engines: the
# numerator is a fixed left-associated chain of value/2^k terms (each term
# is an exact exponent shift of a 2-decimal double, each add correctly
# rounded in the same order on both sides -> bit-identical), the
# normalizer counts the taps actually present, and the single division is
# rounded once. Truncated-tap EWMA is the scale-correct form: a full-
# history recursion would serialize each key's timeline; 8 lags are one
# partitioned window pass.
# --------------------------------------------------------------------------

_EWMA_TAPS = 8

def _ewma_sql() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w, 0) / {1 << k}"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE 1 END) / {1 << k}"
        for k in range(_EWMA_TAPS)
    )
    return f"""
WITH sm AS (
  SELECT user_id, ts, event_id,
         round(({num}) / ({den}), 6) AS ewma,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rd,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, cast(n_events AS BIGINT) AS n_events, ewma AS ewma_last
FROM sm WHERE rd = 1
"""


@register("ts_ewma_smoothed", oracle=_ewma_sql(), tags=("timeseries", "window"))
def ts_ewma_smoothed(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ewma_sql())


# --------------------------------------------------------------------------
# Gap-fill + linear interpolation: regularize an irregular event stream
# onto a dense per-(event_type, hour) grid, filling missing cells by
# interpolating between the nearest observed neighbors (leading/trailing
# gaps clamp to the nearest observation). The dense spine is generated,
# not stored: one global (min, max) bound row broadcast against the
# distinct type set, exploded into hour indices — so spine cost is
# O(types x hours) rows, never a scan of the raw stream. Neighbor lookup
# is last/first-ignorenulls over a window partitioned by event_type
# (bounded per-partition width = the spine, not the event count). Cell
# means use the scaled-int64 playbook; the interpolation expression is
# written identically in both engines so the doubles agree bit-for-bit.
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM events
),
cells AS (
  SELECT event_type,
         datediff('hour', b.t0, date_trunc('hour', ts)) AS idx,
         {s_lsum('value', 100)} / count(*) AS mean_v
  FROM events, bounds b
  GROUP BY event_type, datediff('hour', b.t0, date_trunc('hour', ts))
),
spine AS (
  SELECT t.event_type, h.idx
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(0, (SELECT datediff('hour', t0, t1) FROM bounds))) AS idx
  ) h
),
grid AS (
  SELECT s.event_type, s.idx, c.mean_v,
         last_value(c.mean_v IGNORE NULLS) OVER w_prev AS prev_v,
         last_value(CASE WHEN c.mean_v IS NOT NULL THEN s.idx END IGNORE NULLS) OVER w_prev AS prev_i,
         first_value(c.mean_v IGNORE NULLS) OVER w_next AS next_v,
         first_value(CASE WHEN c.mean_v IS NOT NULL THEN s.idx END IGNORE NULLS) OVER w_next AS next_i
  FROM spine s LEFT JOIN cells c USING (event_type, idx)
  WINDOW
    w_prev AS (PARTITION BY s.event_type ORDER BY s.idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY s.event_type ORDER BY s.idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
filled AS (
  SELECT event_type, idx, mean_v,
         CASE
           WHEN mean_v IS NOT NULL THEN mean_v
           WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
             prev_v + (next_v - prev_v) * (idx - prev_i)
                      / cast(next_i - prev_i AS DOUBLE)
           ELSE coalesce(prev_v, next_v)
         END AS v
  FROM grid
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_hours,
       cast(sum(CASE WHEN mean_v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
       cast(sum(CASE WHEN mean_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       cast(sum(cast(round(v * 1000000) AS BIGINT)) AS BIGINT) AS checksum
FROM filled
GROUP BY event_type
"""


@register(
    "ts_gap_fill_interpolate",
    oracle=_GAPFILL_ORACLE,
    tags=("timeseries", "window"),
)
def ts_gap_fill_interpolate(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    idx = (
        (
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            - F.unix_timestamp("t0")
        )
        / 3600
    ).cast("long")
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", idx.alias("idx"))
        .agg((lsum("value", 100) / F.count(F.lit(1))).alias("mean_v"))
    )
    n_hours = (
        (F.unix_timestamp("t1") - F.unix_timestamp("t0")) / 3600
    ).cast("long")
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds.select(n_hours.alias("n"))))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n"))).alias(
                "idx"
            ),
        )
    )
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_i = F.when(F.col("mean_v").isNotNull(), F.col("idx"))
    grid = (
        spine.join(cells, ["event_type", "idx"], "left")
        .withColumn("prev_v", F.last("mean_v", ignorenulls=True).over(w_prev))
        .withColumn("prev_i", F.last(obs_i, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("mean_v", ignorenulls=True).over(w_next))
        .withColumn("next_i", F.first(obs_i, ignorenulls=True).over(w_next))
    )
    v = (
        F.when(F.col("mean_v").isNotNull(), F.col("mean_v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("idx") - F.col("prev_i"))
            / (F.col("next_i") - F.col("prev_i")).cast("double"),
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    return (
        grid.select("event_type", "mean_v", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.col("mean_v").isNotNull().cast("long")).alias("n_observed"),
            F.sum(F.col("mean_v").isNull().cast("long")).alias("n_filled"),
            F.sum(F.round(F.col("v") * 1000000).cast("long")).alias("checksum"),
        )
    )


# --------------------------------------------------------------------------
# Range (interval) join via bin bucketing: count the click events landing
# inside each error event's 10-minute impact window. A naive range join is
# a BroadcastNestedLoopJoin — O(|errors| x |clicks|), dead at scale. The
# standard rewrite buckets both sides into fixed 10-minute bins, joins on
# bin equality (each window spans <= 2 bins, so the interval side explodes
# to 2 rows), and re-applies the exact range predicate as a post-filter —
# the same trick behind Databricks' range-join hints and KDB window joins.
# Cost: one equi-join shuffle on a high-cardinality key, fanout 2.
# --------------------------------------------------------------------------

_BIN_SECS = 600

_RANGE_BINNED_ORACLE = f"""
SELECT e.event_id,
       cast(count(c.ts) AS BIGINT) AS n_clicks
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
  ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL '{_BIN_SECS} seconds'
GROUP BY e.event_id
"""


@register(
    "join_range_binned",
    oracle=_RANGE_BINNED_ORACLE,
    tags=("join", "timeseries"),
)
def join_range_binned(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    bin_of = lambda col: (F.unix_micros(F.col(col).cast("timestamp")) / (
        _BIN_SECS * 1_000_000
    )).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        F.col("ts").alias("e_ts"),
        F.explode(
            F.array(bin_of("ts"), bin_of("ts") + 1)
        ).alias("bin"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), bin_of("ts").alias("bin")
    )
    in_window = (F.col("c_ts") >= F.col("e_ts")) & (
        F.unix_micros(F.col("c_ts").cast("timestamp"))
        < F.unix_micros(F.col("e_ts").cast("timestamp")) + _BIN_SECS * 1_000_000
    )
    hits = errors.join(clicks, "bin").filter(in_window)
    per_error = hits.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    base = ev.filter(F.col("event_type") == "error").select("event_id")
    return base.join(per_error, "event_id", "left").select(
        "event_id", F.coalesce("n_clicks", F.lit(0)).alias("n_clicks")
    )


# --------------------------------------------------------------------------
# Seasonal decomposition (additive, fixed period): hourly series split into
# trend (period-centered mean), seasonal (hour-of-day offset), and
# residual — the classical STL-lite screen for "is this metric's movement
# just the daily cycle". Exact protocol: counts are ints; the two grouped
# means divide exact int sums once each; the residual subtracts them in a
# fixed order and is rounded at 6. One shuffle for the hourly rollup, two
# tiny grouped means (24 rows + per-day rows) broadcast back — at 100 TB
# the series pre-aggregate dominates and is map-side combinable.
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('day', ts) AS d,
         cast(extract(hour FROM ts) AS INTEGER) AS hod,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
season AS (
  SELECT hod,
         cast(sum(n) AS BIGINT) AS sn, cast(count(*) AS BIGINT) AS sc
  FROM hourly GROUP BY hod
),
trend AS (
  SELECT d, cast(sum(n) AS BIGINT) AS tn, cast(count(*) AS BIGINT) AS tc
  FROM hourly GROUP BY d
),
tot AS (SELECT cast(sum(n) AS BIGINT) AS gn, cast(count(*) AS BIGINT) AS gc
        FROM hourly)
SELECT h.d, h.hod, h.n,
       round(t.tn / cast(t.tc AS DOUBLE), 6) AS trend_mean,
       round(s.sn / cast(s.sc AS DOUBLE)
             - o.gn / cast(o.gc AS DOUBLE), 6) AS seasonal_offset,
       round(h.n - t.tn / cast(t.tc AS DOUBLE)
             - (s.sn / cast(s.sc AS DOUBLE) - o.gn / cast(o.gc AS DOUBLE)),
             6) AS residual
FROM hourly h
JOIN season s ON h.hod = s.hod
JOIN trend t ON h.d = t.d
CROSS JOIN tot o
"""


@register(
    "ts_seasonal_decompose", oracle=_SEASONAL_ORACLE, tags=("timeseries", "stats")
)
def ts_seasonal_decompose(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("day", "ts").alias("d"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    season = hourly.groupBy("hod").agg(
        F.sum("n").cast("long").alias("sn"), F.count(F.lit(1)).alias("sc")
    )
    trend = hourly.groupBy("d").agg(
        F.sum("n").cast("long").alias("tn"), F.count(F.lit(1)).alias("tc")
    )
    tot = hourly.agg(
        F.sum("n").cast("long").alias("gn"), F.count(F.lit(1)).alias("gc")
    )
    t_mean = F.col("tn") / F.col("tc").cast("double")
    s_off = F.col("sn") / F.col("sc").cast("double") - F.col("gn") / F.col(
        "gc"
    ).cast("double")
    return (
        hourly.join(F.broadcast(season), "hod")
        .join(F.broadcast(trend), "d")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "hod",
            "n",
            F.round(t_mean, 6).alias("trend_mean"),
            F.round(s_off, 6).alias("seasonal_offset"),
            F.round(F.col("n") - t_mean - s_off, 6).alias("residual"),
        )
    )


# --------------------------------------------------------------------------
# Last-touch attribution: every purchase event is credited to the user's
# most recent preceding non-purchase touch within a 1-hour lookback — the
# marketing-analytics shape of the as-of join, expressed as ONE window
# pass instead of a range join: interleave touches and purchases per user
# in time order, forward-fill the latest touch (max_by over the preceding
# frame), then age-filter. Exact protocol: timestamps compare directly;
# the only float is the purchase value, rounded at 2 as stored. At 100 TB
# this is one hash exchange on user_id + one ordered window per user —
# strictly cheaper than the O(touch x purchase) theta join it replaces.
# Ties (same ts) break by event_id, matching the oracle's packed ordering.
# --------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH stream AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS is_touch
  FROM events
),
filled AS (
  SELECT user_id, ts, event_id, event_type,
         max(CASE WHEN is_touch = 1
                  THEN epoch_us(ts) * 1000 + event_id % 1000 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS touch_pack
  FROM stream
),
attributed AS (
  SELECT user_id,
         epoch_us(ts) - cast(touch_pack // 1000 AS BIGINT) AS age_us
  FROM filled WHERE event_type = 'purchase'
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_purchases,
       cast(sum(CASE WHEN age_us IS NOT NULL AND age_us <= 3600000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
FROM attributed
GROUP BY user_id
"""


@register(
    "ts_attribution_last_touch",
    oracle=_ATTRIB_ORACLE,
    tags=("timeseries", "asof", "window"),
)
def ts_attribution_last_touch(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    stream = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("is_touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # pack (epoch_us, event_id mod 1e3) into one int64 so ONE window max
    # carries both the touch time and its identity (the max_by-over-frame
    # trick; epoch dominates the ordering, id breaks exact-ts ties; x1000
    # keeps 2024-era micros inside int64 — x1e5 overflowed)
    pack = F.when(
        F.col("is_touch") == 1,
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        + (F.col("event_id") % 1000),
    )
    filled = stream.withColumn("touch_pack", F.max(pack).over(w))
    attributed = filled.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.floor(F.col("touch_pack") / 1000).cast("long")
        ).alias("age_us"),
    )
    return attributed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(
            F.when(
                F.col("age_us").isNotNull() & (F.col("age_us") <= 3600000000),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_attributed"),
    )


# --------------------------------------------------------------------------
# CUSUM drift detection (no-reset form): cumulative sum of deviations of
# the hourly event rate from its global mean, flagged where |S_t| crosses
# h = 5 standard-ish units. The classic production-monitoring screen for
# slow drifts that per-point z-scores (ts_rate_anomaly) never trip. The
# no-reset form is chosen deliberately: the resetting CUSUM's
# max(0, S+x-k) recursion is order-dependent state (a fold, not a
# window); the no-reset cumulative sum is a running-total window over
# exact integer deviations (n*denominator - numerator scaled), so both
# engines agree bit-for-bit. Per-key ordered window after one hourly
# pre-aggregate — same scale shape as every other series op here.
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, cast(sum(n) AS BIGINT) AS tot,
         cast(count(*) AS BIGINT) AS k
  FROM hourly GROUP BY event_type
),
dev AS (
  SELECT h.event_type, h.hr,
         h.n * s.k - s.tot AS dev_k,  -- (n - mean) * k, exact int
         s.k
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
),
cusum AS (
  SELECT event_type, hr, dev_k, k,
         cast(sum(dev_k) OVER (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS s_k
  FROM dev
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_hours,
       round(max(abs(s_k) / cast(k AS DOUBLE)), 6) AS max_abs_cusum,
       cast(sum(CASE WHEN abs(s_k) > 5 * k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_drift_hours
FROM cusum GROUP BY event_type
"""


@register("ts_cusum_drift", oracle=_CUSUM_ORACLE, tags=("timeseries", "window", "stats"))
def ts_cusum_drift(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("tot"), F.count(F.lit(1)).alias("k")
    )
    dev = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hr",
        (F.col("n") * F.col("k") - F.col("tot")).alias("dev_k"),
        "k",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cusum = dev.withColumn("s_k", F.sum("dev_k").over(w).cast("long"))
    return cusum.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.max(F.abs(F.col("s_k")) / F.col("k").cast("double")), 6).alias(
            "max_abs_cusum"
        ),
        F.sum(F.when(F.abs(F.col("s_k")) > 5 * F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("n_drift_hours"),
    )


# --------------------------------------------------------------------------
# NATIVE session windows in batch mode: F.session_window(ts, gap) is
# Spark's built-in dynamic-gap operator (one partial+final aggregation
# with in-operator session merging — no lag window, no running sum). The
# oracle rebuilds the identical sessions with the classic SQL islands
# construction (lag -> new-session flag -> running sum -> group), proving
# the built-in against first principles. Boundary pinned EMPIRICALLY
# (tests/test_round9_ops.py, constructed exact-gap rows — the synthetic
# tables never produce one, so parity alone can't distinguish > from >=):
# an event exactly `gap` after its predecessor MERGES into the session —
# Spark's merge boundary is inclusive — so the islands flag is `> gap`,
# matching ts_sessionization's convention, and the reported window end is
# last_ts + gap.
# --------------------------------------------------------------------------

_SESSION_NATIVE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       cast(count(*) AS BIGINT) AS n_events,
       {s_lsum('value', 100)} AS sum_value
FROM sess
GROUP BY user_id, sid
"""


@register(
    "ts_session_window_native",
    oracle=_SESSION_NATIVE_ORACLE,
    tags=("timeseries", "session"),
)
def ts_session_window_native(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            lsum("value", 100).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# As-of join with TOLERANCE (r9): point-in-time enrichment where a match
# older than the window is too stale to use — the bounded-staleness
# variant sensor fusion / feature stores need (pandas merge_asof's
# `tolerance=`). Shape here: every CLICK gets the user's latest PURCHASE
# within the previous 30 minutes (clicks with no recent purchase stay
# null — the discriminating case; both event types live on the same
# clock, so the bound actually bites, unlike a cross-table demo against
# 1990s TPC-H order dates). Construction: run the unbounded as-of
# carrying the matched right TIME in the value struct, then null out
# values where the match falls outside the window. Latest-overall-if-
# within == latest-within (if the newest match is stale, every older one
# is staler), so one window pass suffices — no extra join, and no range
# filter before the union that would break the "latest" semantics. The
# oracle bounds the LATERAL lookup directly; the two forms are the same
# query.
# --------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
SELECT c.event_id, c.user_id, c.ts,
       s.event_id AS purchase_id_30m,
       round(s.value, 2) AS purchase_value_30m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN LATERAL (
  SELECT event_id, value
  FROM events p
  WHERE p.event_type = 'purchase'
    AND p.user_id = c.user_id
    AND p.ts <= c.ts
    AND p.ts >= c.ts - INTERVAL 30 MINUTE
  ORDER BY p.ts DESC, p.event_id DESC
  LIMIT 1
) s ON true
"""


@register(
    "ts_asof_tolerance_30m",
    oracle=_ASOF_TOL_ORACLE,
    tags=("timeseries", "asof"),
)
def ts_asof_tolerance_30m(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        left=clicks,
        right=purchases,
        left_on="user_id",
        right_on="p_user",
        left_time="ts",
        right_time="p_ts",
        value_cols=["p_id", "p_value", "p_ts"],
        right_tiebreak="p_id",
    )
    fresh = F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("p_id")).alias("purchase_id_30m"),
        F.when(fresh, F.round("p_value", 2)).alias("purchase_value_30m"),
    )
