"""Financial-style event analytics (r10): VWAP bars, time-weighted
averages, max drawdown.

Three shapes every metrics/trading pipeline needs, each expressed so the
plan survives 100 TB:

- ``ts_vwap_hourly``: volume-weighted average price per hour — one
  partial+final aggregation over the raw scan (zero joins, zero windows);
  the "volume" rides in the ``props`` JSON column, so this is also the
  JSON-path-extraction-in-the-hot-path demo (JVM ``get_json_object``,
  never Python). Money math follows the house ``lsum`` rule: per-row
  value*volume rounded at scale 100 into an exact int64 turnover, one
  double division at the end.

- ``ts_time_weighted_avg``: last-observation-carried-forward integral
  per (user, day) — each event's value holds until the next event; TWA =
  sum(value_i * dur_i) / sum(dur_i) with durations in exact microseconds
  from a lead() window PARTITIONED by (user, day). The int64 numerator is
  bounded by day_span_us * max_scaled_value ~ 8.6e10 * ~1e4 ≈ 8.6e14 per
  group REGARDLESS of event count (durations within a day sum to the day
  span), so no DECIMAL accumulator is needed — documented bound, not
  hope.

- ``window_max_drawdown``: running peak-minus-equity per user over the
  cumulative value series — the classic risk metric, and the canonical
  "two stacked windows" pattern (cumulative sum, then running max), both
  partitioned by user_id. State per partition is O(1); no global window.

All three run fully in whole-stage codegen; oracles mirror the exact
integer arithmetic so cross-engine hashes are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# VWAP per hour
# --------------------------------------------------------------------------

_VWAP_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket,
       cast(sum(cast(round(value * cast(json_extract(props, '$.k') AS BIGINT)
                           * 100) AS BIGINT)) AS BIGINT) AS turnover_e2,
       cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS volume,
       round(cast(sum(cast(round(value * cast(json_extract(props, '$.k')
                                              AS BIGINT) * 100) AS BIGINT))
                  AS DOUBLE)
             / cast(100 AS DOUBLE)
             / cast(nullif(sum(cast(json_extract(props, '$.k') AS BIGINT)), 0)
                    AS DOUBLE), 6) AS vwap
FROM events
GROUP BY date_trunc('hour', ts)
"""


@register(
    "ts_vwap_hourly",
    oracle=_VWAP_ORACLE,
    tags=("timeseries", "agg", "json"),
    bench=True,  # r10 promotion: the JSON-extraction-in-hot-path headline
)
def ts_vwap_hourly(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    vol = F.get_json_object("props", "$.k").cast("long")
    turnover_e2 = F.sum(F.round(F.col("value") * vol * 100).cast("long"))
    volume = F.sum(vol)
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            turnover_e2.alias("turnover_e2"),
            volume.alias("volume"),
        )
        .select(
            "bucket",
            "turnover_e2",
            "volume",
            # nullif guard: an hour whose entire volume is 0 (possible in
            # any real feed — and present at sf0.001) has no defined VWAP;
            # under ANSI mode a bare division would ERROR the whole job.
            F.round(
                F.col("turnover_e2").cast("double")
                / F.lit(100).cast("double")
                / F.nullif(F.col("volume"), F.lit(0)).cast("double"),
                6,
            ).alias("vwap"),
        )
    )


# --------------------------------------------------------------------------
# Time-weighted average (LOCF integral) per user-day
# --------------------------------------------------------------------------

_TWA_ORACLE = """
WITH x AS (
  SELECT user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
         epoch_us(ts) AS t,
         cast(round(value * 100) AS BIGINT) AS v_e2
  FROM events
),
seg AS (
  SELECT user_id, d, v_e2,
         lead(t) OVER (PARTITION BY user_id, d ORDER BY t) - t AS dur_us
  FROM x
)
SELECT user_id, d,
       cast(count(*) AS BIGINT) AS n_segments,
       cast(sum(dur_us) AS BIGINT) AS span_us,
       round(cast(sum(v_e2 * dur_us) AS DOUBLE)
             / cast(sum(dur_us) AS DOUBLE)
             / cast(100 AS DOUBLE), 6) AS twa
FROM seg
WHERE dur_us IS NOT NULL
GROUP BY user_id, d
HAVING sum(dur_us) > 0
"""


@register(
    "ts_time_weighted_avg",
    oracle=_TWA_ORACLE,
    tags=("timeseries", "window", "agg"),
)
def ts_time_weighted_avg(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias("d"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("v_e2"),
    )
    # events.ts has microsecond precision and ties are absent in the
    # testdata; ordering by t alone matches the oracle (a tie would make
    # dur_us = 0 and contribute nothing to either sum anyway).
    w = W.partitionBy("user_id", "d").orderBy("t")
    seg = e.withColumn("dur_us", F.lead("t").over(w) - F.col("t")).filter(
        F.col("dur_us").isNotNull()
    )
    return (
        seg.groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_us").alias("span_us"),
            F.sum(F.col("v_e2") * F.col("dur_us")).alias("num_e2us"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "d",
            "n_segments",
            "span_us",
            F.round(
                F.col("num_e2us").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100).cast("double"),
                6,
            ).alias("twa"),
        )
    )


# --------------------------------------------------------------------------
# Max drawdown per user
# --------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH eq AS (
  SELECT user_id, event_id, ts,
         sum(cast(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS equity_e2
  FROM events
),
pk AS (
  SELECT user_id, equity_e2,
         max(equity_e2) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS peak_e2
  FROM eq
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_events,
       cast(max(peak_e2 - equity_e2) AS BIGINT) AS max_drawdown_e2,
       cast(max(equity_e2) AS BIGINT) AS peak_equity_e2
FROM pk
GROUP BY user_id
"""


@register(
    "window_max_drawdown",
    oracle=_DRAWDOWN_ORACLE,
    tags=("window", "timeseries", "frame"),
)
def window_max_drawdown(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("v_e2"),
    )
    cum = W.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    eq = e.withColumn("equity_e2", F.sum("v_e2").over(cum)).withColumn(
        "peak_e2", F.max("equity_e2").over(cum)
    )
    return eq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col("peak_e2") - F.col("equity_e2")).alias("max_drawdown_e2"),
        F.max("equity_e2").alias("peak_equity_e2"),
    )


# --------------------------------------------------------------------------
# Robust anomaly flags via median absolute deviation (r10): the
# stddev-based ts_rate_anomaly breaks down when the contamination itself
# inflates sigma; MAD is the 50%-breakdown robust scale. Two aggregation
# passes (median, then median of |v - med|), each a bounded per-type
# aggregate broadcast back onto the fact — no window, no sort of the raw
# stream, so the plan is two shuffles of (type, value) pairs at any
# scale. The outlier predicate |v - med| > 3 * 1.4826 * mad runs the
# identical IEEE ops on both engines (inputs are the same 2-dp doubles),
# so the comparison can never disagree cross-engine.
# --------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       round(m.med, 6) AS med,
       round(d.mad, 6) AS mad,
       cast(count(*) AS BIGINT) AS n_total,
       cast(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(cast(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * d.mad
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / cast(count(*) AS DOUBLE), 6) AS outlier_rate
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY e.event_type, m.med, d.mad
"""


@register(
    "ts_anomaly_robust_mad",
    oracle=_MAD_ORACLE,
    tags=("timeseries", "agg", "stats"),
)
def ts_anomaly_robust_mad(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = (
        F.abs(F.col("value") - F.col("med"))
        > F.lit(3) * F.lit(1.4826) * F.col("mad")
    ).cast("long")
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(is_out).alias("n_outliers"),
    ).select(
        "event_type",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_total",
        "n_outliers",
        F.round(
            F.col("n_outliers").cast("double") / F.col("n_total").cast("double"),
            6,
        ).alias("outlier_rate"),
    )


# --------------------------------------------------------------------------
# RFM segmentation (r10): recency / frequency / monetary per user with
# quartile scores — the classic CRM / engagement-tier operator. Raw R/F/M
# are exact integers (days since last event at the corpus watermark,
# event count, centi-value sum). Scores come from THREE BROADCAST
# THRESHOLDS per dimension (exact interpolated p25/p50/p75 over the
# per-user aggregate — ONE extra aggregation, not a global window; at
# 100 TB the per-user table still aggregates map-side and the threshold
# row is 9 numbers). Spark `percentile` and DuckDB `quantile_cont` share
# interpolation semantics (func_percentile_segment pins it), and raw
# values are integers, so the CASE comparisons are bit-stable.
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH mx AS (SELECT max(ts) AS m FROM events),
u AS (
  SELECT user_id,
         cast(date_diff('day', max(ts), (SELECT m FROM mx)) AS BIGINT) AS r_days,
         cast(count(*) AS BIGINT) AS f_events,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
  FROM events GROUP BY user_id
),
th AS (
  SELECT quantile_cont(r_days, 0.25) AS r25, quantile_cont(r_days, 0.5) AS r50,
         quantile_cont(r_days, 0.75) AS r75,
         quantile_cont(f_events, 0.25) AS f25, quantile_cont(f_events, 0.5) AS f50,
         quantile_cont(f_events, 0.75) AS f75,
         quantile_cont(m_cents, 0.25) AS m25, quantile_cont(m_cents, 0.5) AS m50,
         quantile_cont(m_cents, 0.75) AS m75
  FROM u
)
SELECT user_id, r_days, f_events, m_cents,
       cast(CASE WHEN r_days <= r25 THEN 4 WHEN r_days <= r50 THEN 3
                 WHEN r_days <= r75 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
       cast(CASE WHEN f_events <= f25 THEN 1 WHEN f_events <= f50 THEN 2
                 WHEN f_events <= f75 THEN 3 ELSE 4 END AS BIGINT) AS f_score,
       cast(CASE WHEN m_cents <= m25 THEN 1 WHEN m_cents <= m50 THEN 2
                 WHEN m_cents <= m75 THEN 3 ELSE 4 END AS BIGINT) AS m_score
FROM u, th
"""


@register(
    "ts_rfm_scores",
    oracle=_RFM_ORACLE,
    tags=("timeseries", "agg", "stats"),
)
def ts_rfm_scores(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    mx = e.groupBy().agg(F.max("ts").alias("m"))
    u = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("m"), F.max("ts")).cast("long").alias("r_days"),
            F.count(F.lit(1)).alias("f_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("m_cents"),
        )
    )
    th = u.groupBy().agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{int(q*100)}")
            for c in ("r_days", "f_events", "m_cents")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    scored = u.crossJoin(F.broadcast(th))
    r = F.when(F.col("r_days") <= F.col("r25"), 4).when(
        F.col("r_days") <= F.col("r50"), 3
    ).when(F.col("r_days") <= F.col("r75"), 2).otherwise(1)
    f_ = F.when(F.col("f_events") <= F.col("f25"), 1).when(
        F.col("f_events") <= F.col("f50"), 2
    ).when(F.col("f_events") <= F.col("f75"), 3).otherwise(4)
    m_ = F.when(F.col("m_cents") <= F.col("m25"), 1).when(
        F.col("m_cents") <= F.col("m50"), 2
    ).when(F.col("m_cents") <= F.col("m75"), 3).otherwise(4)
    return scored.select(
        "user_id",
        "r_days",
        "f_events",
        "m_cents",
        r.cast("long").alias("r_score"),
        f_.cast("long").alias("f_score"),
        m_.cast("long").alias("m_score"),
    )


# --------------------------------------------------------------------------
# Interval-overlap JOIN (r10): sessions x incident windows — the
# interval-interval flavor the point-in-range rewrites (join_range_binned)
# don't cover. Sessions are the standard 30-min-gap islands per user
# (closed spans [first_ts, last_ts] in exact epoch-micros); incident
# windows are hours with >= _INCIDENT_MIN error events (half-open
# [h, h+1h)). The quadratic overlap predicate becomes an EQUI-join by
# binning: each session explodes to the hour buckets its span covers
# (JVM sequence+explode; bucket fan-out is bounded by session duration,
# which the 30-min-gap rule ties to user activity, never to corpus
# size), each window keys by its own hour — and because an hour bucket
# h intersects a closed span exactly when h is between the span's first
# and last buckets, the equi-join IS the overlap join: no residual
# post-filter is needed (proven by the brute-force inequality-join
# oracle). Output: per incident window, the session/user exposure.
# --------------------------------------------------------------------------

_INCIDENT_MIN = 5
_HOUR_US = 3_600_000_000

_INTERVAL_OVERLAP_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
),
flagged AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   > 1800000000 OR
                   lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
sess AS (
  SELECT user_id, srank, min(t) AS ss, max(t) AS se
  FROM (
    SELECT user_id, t,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS srank
    FROM flagged
  ) x GROUP BY user_id, srank
),
win AS (
  SELECT (t // {_HOUR_US}) * {_HOUR_US} AS ws,
         cast(count(*) AS BIGINT) AS n_errors
  FROM e WHERE event_type = 'error'
  GROUP BY t // {_HOUR_US}
  HAVING count(*) >= {_INCIDENT_MIN}
)
SELECT cast(w.ws AS BIGINT) AS window_start_us,
       w.n_errors,
       cast(count(*) AS BIGINT) AS n_sessions,
       cast(count(DISTINCT s.user_id) AS BIGINT) AS n_users
FROM win w
JOIN sess s ON s.ss < w.ws + {_HOUR_US} AND w.ws <= s.se
GROUP BY w.ws, w.n_errors
"""


@register(
    "join_interval_overlap",
    oracle=_INTERVAL_OVERLAP_ORACLE,
    tags=("join", "timeseries", "session"),
)
def join_interval_overlap(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    w_ord = W.partitionBy("user_id").orderBy("t", "event_id")
    new_s = F.when(
        F.lag("t").over(w_ord).isNull()
        | ((F.col("t") - F.lag("t").over(w_ord)) > 1_800_000_000),
        1,
    ).otherwise(0)
    srank = F.sum(new_s).over(
        W.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    sess = (
        e.select("user_id", "t", srank.alias("srank"))
        .groupBy("user_id", "srank")
        .agg(F.min("t").alias("ss"), F.max("t").alias("se"))
    )
    win = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.expr(f"t div {_HOUR_US}").alias("hb"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= _INCIDENT_MIN)
        .select(
            (F.col("hb") * _HOUR_US).alias("ws"), "hb", "n_errors"
        )
    )
    covered = sess.withColumn(
        "hb",
        F.explode(
            F.sequence(
                F.expr(f"ss div {_HOUR_US}"),
                F.expr(f"se div {_HOUR_US}"),
            )
        ),
    )
    return (
        covered.join(win, "hb")
        .groupBy("ws", "n_errors")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("ws").alias("window_start_us"),
            "n_errors",
            "n_sessions",
            "n_users",
        )
    )
