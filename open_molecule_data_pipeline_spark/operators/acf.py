"""Autocorrelation function (r10): ACF at lags 1..3 per event series.

``ts_acf_lags`` is the first panel of every time-series workup (is the
series mean-reverting? is there short-range structure worth a model?).
The textbook estimator r_L = Σ(v_k − m)(v_{k+L} − m) / Σ(v − m)² is
computed WITHOUT ever materializing the mean-centered series: expand the
numerator to raw moments p − m(c₁+c₂) + cnt·m², where

  p   = Σ v_k·v_{k+L}     (exact int64: |v_e2| ≤ 1e5 ⇒ products ≤ 1e10)
  c₁  = Σ v_k, c₂ = Σ v_{k+L}, cnt = n − L   (exact int64)

and m, the denominator, come from the per-series totals (n, S, Q). One
window pass (PARTITION BY series) emits all three lead columns, a bounded
3-element explode fans them into (lag, v, v_lead) rows, and everything
downstream is a groupBy plus a broadcast join of the series-count-sized
totals. Doubles appear only in the final shared expression over exact
ints — bit-identical across engines.

Per-series windows shard by the series key (real telemetry: series count
>> cores); a single monster series would take the two-pass range form,
same note as changepoint.py.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

MAX_LAG = 3

_ACF_ORACLE = f"""
WITH x AS (
  SELECT event_type AS et, ts, event_id,
         cast(round(value * 100) AS BIGINT) AS v
  FROM events
), led AS (
  SELECT et, v,
         lead(v, 1) OVER w AS v1,
         lead(v, 2) OVER w AS v2,
         lead(v, 3) OVER w AS v3
  FROM x
  WINDOW w AS (PARTITION BY et ORDER BY ts, event_id)
), pairs AS (
  SELECT et, 1 AS lag, v, v1 AS vl FROM led WHERE v1 IS NOT NULL
  UNION ALL
  SELECT et, 2 AS lag, v, v2 AS vl FROM led WHERE v2 IS NOT NULL
  UNION ALL
  SELECT et, 3 AS lag, v, v3 AS vl FROM led WHERE v3 IS NOT NULL
), g AS (
  SELECT et, lag,
         cast(count(*) AS BIGINT) AS cnt,
         cast(sum(v * vl) AS BIGINT) AS p,
         cast(sum(v) AS BIGINT) AS c1,
         cast(sum(vl) AS BIGINT) AS c2
  FROM pairs GROUP BY et, lag
), tot AS (
  SELECT et, cast(count(*) AS BIGINT) AS n,
         cast(sum(v) AS BIGINT) AS s,
         cast(sum(v * v) AS BIGINT) AS q
  FROM x GROUP BY et
)
SELECT g.et AS event_type, g.lag, g.cnt AS n_pairs,
       round((cast(g.p AS DOUBLE)
              - (cast(tot.s AS DOUBLE) / cast(tot.n AS DOUBLE))
                * cast(g.c1 + g.c2 AS DOUBLE)
              + cast(g.cnt AS DOUBLE)
                * (cast(tot.s AS DOUBLE) / cast(tot.n AS DOUBLE))
                * (cast(tot.s AS DOUBLE) / cast(tot.n AS DOUBLE)))
             / (cast(tot.q AS DOUBLE)
                - cast(tot.s AS DOUBLE) * cast(tot.s AS DOUBLE)
                  / cast(tot.n AS DOUBLE)), 6) AS acf
FROM g JOIN tot ON g.et = tot.et
"""


@register(
    "ts_acf_lags",
    oracle=_ACF_ORACLE,
    tags=("timeseries", "stats", "window"),
)
def ts_acf_lags(spark, sf_dir):
    x = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = W.partitionBy("et").orderBy("ts", "event_id")
    led = x.select(
        "et",
        "v",
        *[F.lead("v", lag).over(w).alias(f"v{lag}") for lag in range(1, MAX_LAG + 1)],
    )
    lag_structs = F.array(
        *[
            F.struct(F.lit(lag).alias("lag"), F.col(f"v{lag}").alias("vl"))
            for lag in range(1, MAX_LAG + 1)
        ]
    )
    pairs = (
        led.select("et", "v", F.explode(lag_structs).alias("p"))
        .select("et", "v", "p.lag", "p.vl")
        .where(F.col("vl").isNotNull())
    )
    g = pairs.groupBy("et", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("v") * F.col("vl")).cast("long").alias("p"),
        F.sum("v").cast("long").alias("c1"),
        F.sum("vl").cast("long").alias("c2"),
    )
    tot = x.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m = d("s") / d("n")
    num = d("p") - m * (F.col("c1") + F.col("c2")).cast("double") + d("cnt") * m * m
    den = d("q") - d("s") * d("s") / d("n")
    return (
        g.join(F.broadcast(tot), "et")
        .select(
            F.col("et").alias("event_type"),
            "lag",
            F.col("cnt").alias("n_pairs"),
            F.round(num / den, 6).alias("acf"),
        )
    )


# --------------------------------------------------------------------------
# Seasonal-naive forecast error / MASE (r10): the baseline every forecast
# model must beat. Per series, the hourly-mean sequence is "forecast" by
# its own value 24 hours earlier (seasonal naive, period = 24) and by the
# previous hour (naive-1, the MASE scaling denominator); MASE =
# MAE_seasonal / MAE_naive1 < 1 means daily seasonality carries real
# signal. Works entirely on the per-(series, hour) AGGREGATE table (rows
# bounded by series x time span), with per-bucket means kept as exact
# (sum_e2, count) int pairs; each absolute error is one deterministic
# double from those ints, quantized to e6 int64 before the per-series
# sum. Lags come from lag() over the bucket table keyed by a DENSE hour
# index (epoch_us div 3600e6), so a missing hour breaks the lag chain
# honestly (no forecast row) instead of silently comparing non-adjacent
# hours.
# --------------------------------------------------------------------------

_MASE_ORACLE = """
WITH b AS (
  SELECT event_type AS et, epoch_us(ts) // 3600000000 AS h,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT et, h, s, n,
         lag(s, 1) OVER w AS s1, lag(n, 1) OVER w AS n1,
         lag(h, 1) OVER w AS h1,
         lag(s, 24) OVER w AS s24, lag(n, 24) OVER w AS n24,
         lag(h, 24) OVER w AS h24
  FROM b WINDOW w AS (PARTITION BY et ORDER BY h)
), err AS (
  SELECT et,
         CASE WHEN h1 = h - 1 THEN
           cast(round(abs(cast(s AS DOUBLE) / cast(n AS DOUBLE)
                          - cast(s1 AS DOUBLE) / cast(n1 AS DOUBLE))
                      * 10000) AS BIGINT) END AS e1,
         CASE WHEN h24 = h - 24 THEN
           cast(round(abs(cast(s AS DOUBLE) / cast(n AS DOUBLE)
                          - cast(s24 AS DOUBLE) / cast(n24 AS DOUBLE))
                      * 10000) AS BIGINT) END AS e24
  FROM lagged
)
SELECT et AS event_type,
       cast(count(e24) AS BIGINT) AS n_seasonal,
       cast(count(e1) AS BIGINT) AS n_naive,
       round(cast(sum(e24) AS DOUBLE) / cast(count(e24) AS DOUBLE)
             / cast(1000000 AS DOUBLE), 6) AS mae_seasonal,
       round(cast(sum(e1) AS DOUBLE) / cast(count(e1) AS DOUBLE)
             / cast(1000000 AS DOUBLE), 6) AS mae_naive1,
       round((cast(sum(e24) AS DOUBLE) / cast(count(e24) AS DOUBLE))
             / (cast(sum(e1) AS DOUBLE) / cast(count(e1) AS DOUBLE)), 6)
         AS mase
FROM err GROUP BY et
"""


@register(
    "ts_seasonal_naive_mase",
    oracle=_MASE_ORACLE,
    tags=("timeseries", "eval", "window"),
)
def ts_seasonal_naive_mase(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    b = (
        e.select(
            F.col("event_type").alias("et"),
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("et", "h")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = W.partitionBy("et").orderBy("h")
    lagged = b.select(
        "et",
        "h",
        "s",
        "n",
        F.lag("s", 1).over(w).alias("s1"),
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("h", 1).over(w).alias("h1"),
        F.lag("s", 24).over(w).alias("s24"),
        F.lag("n", 24).over(w).alias("n24"),
        F.lag("h", 24).over(w).alias("h24"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_now = d("s") / d("n")
    e1 = F.when(
        F.col("h1") == F.col("h") - 1,
        F.round(F.abs(mean_now - d("s1") / d("n1")) * 10000).cast("long"),
    )
    e24 = F.when(
        F.col("h24") == F.col("h") - 24,
        F.round(F.abs(mean_now - d("s24") / d("n24")) * 10000).cast("long"),
    )
    err = lagged.select("et", e1.alias("e1"), e24.alias("e24"))
    mae_s = F.sum("e24").cast("double") / F.count("e24").cast("double")
    mae_1 = F.sum("e1").cast("double") / F.count("e1").cast("double")
    return err.groupBy(F.col("et").alias("event_type")).agg(
        F.count("e24").cast("long").alias("n_seasonal"),
        F.count("e1").cast("long").alias("n_naive"),
        F.round(mae_s / F.lit(1000000).cast("double"), 6).alias("mae_seasonal"),
        F.round(mae_1 / F.lit(1000000).cast("double"), 6).alias("mae_naive1"),
        F.round(mae_s / mae_1, 6).alias("mase"),
    )


# --------------------------------------------------------------------------
# Cross-correlation between two event series (r10): Pearson r between the
# hourly-mean series of two event types at lags −3..+3 hours — does one
# stream lead the other? Alignment uses the dense hour index (epoch_us
# div 3600e6), pairs come from an EQUI-join on the shifted hour (a
# bounded 7-element lag explode on the x side — never a theta join), and
# the moments are exact int64 over per-bucket means quantized to
# hundredth-cents (m4 = round(s·100/n): bounded by 5e6, so Σx·y ≤
# ~2.5e13·buckets stays int64 at any scale factor — bucket count grows
# with the time span, not rows). Pearson is one shared double expression
# per lag at the end.
# --------------------------------------------------------------------------

_XCORR_A = "click"
_XCORR_B = "purchase"
_XCORR_MAX_LAG = 3

_XCORR_ORACLE = f"""
WITH b AS (
  SELECT event_type AS et, epoch_us(ts) // 3600000000 AS h,
         cast(round(cast(sum(cast(round(value * 100) AS BIGINT)) AS DOUBLE)
                    * 100 / cast(count(*) AS DOUBLE)) AS BIGINT) AS m4
  FROM events WHERE event_type IN ('{_XCORR_A}', '{_XCORR_B}')
  GROUP BY 1, 2
), x AS (SELECT h, m4 FROM b WHERE et = '{_XCORR_A}'),
y AS (SELECT h, m4 FROM b WHERE et = '{_XCORR_B}'),
lags AS (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1})) AS lag),
pairs AS (
  SELECT lags.lag, x.m4 AS xv, y.m4 AS yv
  FROM x, lags
  JOIN y ON y.h = x.h + lags.lag
), g AS (
  SELECT lag,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(xv) AS BIGINT) AS sx,
         cast(sum(yv) AS BIGINT) AS sy,
         cast(sum(xv * yv) AS BIGINT) AS sxy,
         cast(sum(xv * xv) AS BIGINT) AS sxx,
         cast(sum(yv * yv) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT lag, n AS n_pairs,
       round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
              - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
             / sqrt((cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                     - cast(sx AS DOUBLE) * cast(sx AS DOUBLE))
                    * (cast(n AS DOUBLE) * cast(syy AS DOUBLE)
                       - cast(sy AS DOUBLE) * cast(sy AS DOUBLE))), 6)
         AS xcorr
FROM g
"""


@register(
    "ts_cross_correlation",
    oracle=_XCORR_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_cross_correlation(spark, sf_dir):
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_XCORR_A, _XCORR_B)
    )
    b = (
        e.select(
            F.col("event_type").alias("et"),
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("et", "h")
        .agg(
            F.round(
                F.sum("v").cast("double") * 100 / F.count(F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("m4")
        )
    )
    x = b.where(F.col("et") == _XCORR_A).select("h", F.col("m4").alias("xv"))
    y = b.where(F.col("et") == _XCORR_B).select(
        F.col("h").alias("yh"), F.col("m4").alias("yv")
    )
    lags = F.sequence(
        F.lit(-_XCORR_MAX_LAG), F.lit(_XCORR_MAX_LAG)
    )
    xl = x.select("h", "xv", F.explode(lags).alias("lag")).select(
        "lag", "xv", (F.col("h") + F.col("lag")).alias("yh")
    )
    pairs = xl.join(y, "yh")
    g = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return g.select(
        "lag", F.col("n").alias("n_pairs"), F.round(num / den, 6).alias("xcorr")
    )


# --------------------------------------------------------------------------
# Partial autocorrelation (r12) — the second panel of the Box-Jenkins
# workup next to ``ts_acf_lags``: PACF at lag L is the correlation left
# at lag L after removing what shorter lags explain, the plot an AR-order
# choice is read from. Durbin-Levinson unrolled to lag 3 over the ACF
# values (phi11 = r1; phi22 = (r2 - r1^2)/(1 - r1^2); phi33 from the
# order-2 coefficients). The ACF inputs are the 6-dp ROUNDED values of
# the proven ACF query — both engines share those exact rounded doubles,
# so the closed-form PACF arithmetic is bit-identical (same textual
# formula, nullif-guarded denominators for degenerate series). Corpus
# cost = the ACF pass itself; everything after runs on one row per
# series.
# --------------------------------------------------------------------------

_PACF_FORMULAS = """
  r1 AS phi11,
  round((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0), 6) AS phi22,
  round(
    (r3
     - (r1 * (1 - (r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0))) * r2
     - ((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0)) * r1)
    / nullif(
        1
        - (r1 * (1 - (r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0))) * r1
        - ((r2 - r1 * r1) / nullif(1 - r1 * r1, 0.0)) * r2, 0.0), 6
  ) AS phi33
"""

_PACF_ORACLE = f"""
WITH acf AS ({_ACF_ORACLE}),
piv AS (
  SELECT event_type,
         max(CASE WHEN lag = 1 THEN acf END) AS r1,
         max(CASE WHEN lag = 2 THEN acf END) AS r2,
         max(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acf GROUP BY event_type
)
SELECT event_type, {_PACF_FORMULAS}
FROM piv
"""


@register(
    "ts_pacf_durbin_levinson",
    oracle=_PACF_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_pacf_durbin_levinson(spark, sf_dir):
    acf = ts_acf_lags(spark, sf_dir)
    piv = acf.groupBy("event_type").agg(
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    return piv.selectExpr("event_type", *[
        e.strip() for e in _PACF_FORMULAS.split(",\n") if e.strip()
    ])


# --------------------------------------------------------------------------
# Granger-causality screen (r12) — the causal sibling of the lagged
# cross-correlation above: does series A's PAST improve the prediction of
# B beyond B's own past? For every ordered (cause, effect) pair of hourly
# mean series: restricted OLS (b_t ~ 1 + b_{t-1}) vs full OLS
# (b_t ~ 1 + b_{t-1} + a_{t-1}), compared by the standard F statistic
# F = (SSE_r - SSE_f) / (SSE_f / (n - 3)).
#
# One aggregation pass per pair collects the ten exact moments
# (DECIMAL(38,0) sums of cents-quantized bucket means; the hour chain
# must be dense on BOTH series — the MASE lag-validity rule); both models
# then solve in closed form (3x3 Cramer for the full model — the
# ml_ols_normal_equations text — and the 2x2 for the restricted), with
# SSE from the normal-equations identity SSE = Syy - beta'X'y. Every
# double expression is textually shared across engines. Rows per pair are
# bounded by the time range in hours, so the screen's cost is the hourly
# bucket build however large the corpus.
# --------------------------------------------------------------------------

_GRANGER_EXPRS = """
  cast(n AS BIGINT) AS n,
  round(
    (nd * (Sx11 * Sx2y - Sx12 * Sx1y) - Sx1 * (Sx1 * Sx2y - Sx1y * Sx2)
     + Sy * (Sx1 * Sx12 - Sx11 * Sx2))
    / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
             - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
             + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0), 6) AS gamma,
  round(
    ((Syy - ((Sy * Sx11 - Sx1 * Sx1y) / nullif(nd * Sx11 - Sx1 * Sx1, 0.0))
            * Sy
          - ((nd * Sx1y - Sx1 * Sy) / nullif(nd * Sx11 - Sx1 * Sx1, 0.0))
            * Sx1y)
     - (Syy
        - ((Sy * (Sx11 * Sx22 - Sx12 * Sx12)
            - Sx1 * (Sx1y * Sx22 - Sx12 * Sx2y)
            + Sx2 * (Sx1y * Sx12 - Sx11 * Sx2y))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sy
        - ((nd * (Sx1y * Sx22 - Sx2y * Sx12) - Sy * (Sx1 * Sx22 - Sx12 * Sx2)
            + Sx2 * (Sx1 * Sx2y - Sx1y * Sx2))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sx1y
        - ((nd * (Sx11 * Sx2y - Sx12 * Sx1y) - Sx1 * (Sx1 * Sx2y - Sx1y * Sx2)
            + Sy * (Sx1 * Sx12 - Sx11 * Sx2))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sx2y))
    / nullif(
       (Syy
        - ((Sy * (Sx11 * Sx22 - Sx12 * Sx12)
            - Sx1 * (Sx1y * Sx22 - Sx12 * Sx2y)
            + Sx2 * (Sx1y * Sx12 - Sx11 * Sx2y))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sy
        - ((nd * (Sx1y * Sx22 - Sx2y * Sx12) - Sy * (Sx1 * Sx22 - Sx12 * Sx2)
            + Sx2 * (Sx1 * Sx2y - Sx1y * Sx2))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sx1y
        - ((nd * (Sx11 * Sx2y - Sx12 * Sx1y) - Sx1 * (Sx1 * Sx2y - Sx1y * Sx2)
            + Sy * (Sx1 * Sx12 - Sx11 * Sx2))
           / nullif(nd * (Sx11 * Sx22 - Sx12 * Sx12)
                    - Sx1 * (Sx1 * Sx22 - Sx12 * Sx2)
                    + Sx2 * (Sx1 * Sx12 - Sx11 * Sx2), 0.0)) * Sx2y)
       / (nd - 3), 0.0), 6) AS f_stat
"""

_GRANGER_ORACLE = f"""
WITH b AS (
  SELECT event_type AS et, epoch_us(ts) // 3600000000 AS h,
         -- hourly-mean cents: mirror Spark `div` truncation (DuckDB //
         -- floors; diverges on negative sums, ADVICE r12)
         (CASE WHEN sum(cast(round(value * 100) AS BIGINT)) < 0
               THEN -((-cast(sum(cast(round(value * 100) AS BIGINT))
                             AS BIGINT)) // cast(count(*) AS BIGINT))
               ELSE cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT)
                    // cast(count(*) AS BIGINT) END) AS v
  FROM events GROUP BY 1, 2
),
lagd AS (
  SELECT et, h, v, lag(v) OVER w AS v1, lag(h) OVER w AS h1
  FROM b WINDOW w AS (PARTITION BY et ORDER BY h)
),
valid AS (SELECT et, h, v, v1 FROM lagd WHERE h1 = h - 1),
rows_ AS (
  SELECT a.et AS cause, bb.et AS effect,
         bb.v AS y, bb.v1 AS x1, a.v1 AS x2
  FROM valid bb JOIN valid a ON a.h = bb.h AND a.et <> bb.et
),
m AS (
  SELECT cause, effect, cast(count(*) AS BIGINT) AS n,
         sum(cast(x1 AS DECIMAL(38,0))) AS mx1,
         sum(cast(x2 AS DECIMAL(38,0))) AS mx2,
         sum(cast(y AS DECIMAL(38,0))) AS my,
         sum(cast(x1 * x1 AS DECIMAL(38,0))) AS mx11,
         sum(cast(x2 * x2 AS DECIMAL(38,0))) AS mx22,
         sum(cast(x1 * x2 AS DECIMAL(38,0))) AS mx12,
         sum(cast(x1 * y AS DECIMAL(38,0))) AS mx1y,
         sum(cast(x2 * y AS DECIMAL(38,0))) AS mx2y,
         sum(cast(y * y AS DECIMAL(38,0))) AS myy
  FROM rows_ GROUP BY cause, effect
),
d AS (
  SELECT cause, effect, n, cast(n AS DOUBLE) AS nd,
         cast(mx1 AS DOUBLE) AS Sx1, cast(mx2 AS DOUBLE) AS Sx2,
         cast(my AS DOUBLE) AS Sy, cast(mx11 AS DOUBLE) AS Sx11,
         cast(mx22 AS DOUBLE) AS Sx22, cast(mx12 AS DOUBLE) AS Sx12,
         cast(mx1y AS DOUBLE) AS Sx1y, cast(mx2y AS DOUBLE) AS Sx2y,
         cast(myy AS DOUBLE) AS Syy
  FROM m WHERE n > 3
)
SELECT cause, effect, {_GRANGER_EXPRS}
FROM d
"""


@register(
    "ts_granger_screen",
    oracle=_GRANGER_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_granger_screen(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    b = (
        e.select(
            F.col("event_type").alias("et"),
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("et", "h")
        .agg(F.expr("sum(c) div count(*)").cast("long").alias("v"))
    )
    w = W.partitionBy("et").orderBy("h")
    valid = (
        b.select(
            "et", "h", "v",
            F.lag("v").over(w).alias("v1"),
            F.lag("h").over(w).alias("h1"),
        )
        .filter(F.col("h1") == F.col("h") - 1)
        .drop("h1")
    )
    bb = valid.select(
        F.col("et").alias("effect"), "h",
        F.col("v").alias("y"), F.col("v1").alias("x1"),
    )
    a = valid.select(F.col("et").alias("cause"), "h", F.col("v1").alias("x2"))
    rows = bb.join(a, "h").filter(F.col("cause") != F.col("effect"))
    dec = lambda expr: F.expr(f"sum(cast({expr} as decimal(38,0)))")  # noqa: E731
    m = rows.groupBy("cause", "effect").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dec("x1").alias("mx1"), dec("x2").alias("mx2"), dec("y").alias("my"),
        dec("x1 * x1").alias("mx11"), dec("x2 * x2").alias("mx22"),
        dec("x1 * x2").alias("mx12"), dec("x1 * y").alias("mx1y"),
        dec("x2 * y").alias("mx2y"), dec("y * y").alias("myy"),
    )
    d = m.filter(F.col("n") > 3).selectExpr(
        "cause", "effect", "n", "cast(n as double) as nd",
        "cast(mx1 as double) as Sx1", "cast(mx2 as double) as Sx2",
        "cast(my as double) as Sy", "cast(mx11 as double) as Sx11",
        "cast(mx22 as double) as Sx22", "cast(mx12 as double) as Sx12",
        "cast(mx1y as double) as Sx1y", "cast(mx2y as double) as Sx2y",
        "cast(myy as double) as Syy",
    )
    return d.selectExpr(
        "cause", "effect", "cast(n AS BIGINT) AS n", *_granger_projections()
    )


def _granger_projections():
    """The gamma and f_stat projections from _GRANGER_EXPRS as separate
    expression strings (the shared text minus the leading n column)."""
    body = _GRANGER_EXPRS
    i_gamma = body.index("round(")
    i_f = body.index("round(", body.index("AS gamma") )
    gamma = body[i_gamma:body.index("AS gamma")] + "AS gamma"
    f_stat = body[i_f:body.index("AS f_stat")] + "AS f_stat"
    return [gamma, f_stat]


# --------------------------------------------------------------------------
# Periodogram seasonality detector (r12) — which cycle dominates a
# series? DFT power P(p) = (sum w*cos(2*pi*h/p))^2 + (sum w*sin(...))^2
# at the candidate periods {6, 12, 24, 48, 168} hours, per event series;
# the argmax period is the seasonality a downstream model (or the
# seasonal-naive MASE above) should use. Exactness discipline:
# mean-centering is done WITHOUT division — w = n*v - S (every power
# scales by n^2 uniformly, argmax invariant); cos/sin take (h mod p) so
# both engines evaluate small identical angles, and each factor is
# quantized to milli-units before the int64 product-sum; the final power
# compare runs in DECIMAL(38) (A,B <= ~5e15 -> squares ~2.5e31). One
# bucket pass x 5 periods, rows bounded by range hours x periods.
# --------------------------------------------------------------------------

_PERIODS = (6, 12, 24, 48, 168)

_PGRAM_ORACLE = f"""
WITH b AS (
  SELECT event_type AS et, epoch_us(ts) // 3600000000 AS h,
         -- hourly-mean cents: mirror Spark `div` truncation (DuckDB //
         -- floors; diverges on negative sums, ADVICE r12)
         (CASE WHEN sum(cast(round(value * 100) AS BIGINT)) < 0
               THEN -((-cast(sum(cast(round(value * 100) AS BIGINT))
                             AS BIGINT)) // cast(count(*) AS BIGINT))
               ELSE cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT)
                    // cast(count(*) AS BIGINT) END) AS v
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT et, cast(count(*) AS BIGINT) AS n, cast(sum(v) AS BIGINT) AS s
  FROM b GROUP BY et
),
terms AS (
  SELECT b.et, p.p,
         (tot.n * b.v - tot.s) AS w,
         cast(round(cos(2 * pi() * (b.h % p.p) / p.p) * 1000) AS BIGINT)
           AS cq,
         cast(round(sin(2 * pi() * (b.h % p.p) / p.p) * 1000) AS BIGINT)
           AS sq
  FROM b
  JOIN tot ON tot.et = b.et
  CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _PERIODS)}]) AS p) p
),
ab AS (
  SELECT et, p,
         cast(sum(w * cq) AS BIGINT) AS a_milli,
         cast(sum(w * sq) AS BIGINT) AS b_milli
  FROM terms GROUP BY et, p
),
ranked AS (
  SELECT et, p, a_milli, b_milli,
         row_number() OVER (
           PARTITION BY et
           ORDER BY cast(a_milli AS HUGEINT) * a_milli
                    + cast(b_milli AS HUGEINT) * b_milli DESC, p) AS rn
  FROM ab
)
SELECT et AS event_type, cast(p AS INTEGER) AS period_hours,
       a_milli, b_milli
FROM ranked WHERE rn = 1
"""


@register(
    "ts_periodogram_top_period",
    oracle=_PGRAM_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_periodogram_top_period(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    b = (
        e.select(
            F.col("event_type").alias("et"),
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("et", "h")
        .agg(F.expr("sum(c) div count(*)").cast("long").alias("v"))
    )
    tot = b.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    periods = F.array(*[F.lit(p) for p in _PERIODS])
    terms = (
        b.join(F.broadcast(tot), "et")
        .select(
            "et",
            (F.col("n") * F.col("v") - F.col("s")).alias("w"),
            "h",
            F.explode(periods).alias("p"),
        )
        .select(
            "et",
            "p",
            "w",
            F.expr(
                "cast(round(cos(2 * pi() * (h % p) / p) * 1000) as bigint)"
            ).alias("cq"),
            F.expr(
                "cast(round(sin(2 * pi() * (h % p) / p) * 1000) as bigint)"
            ).alias("sq"),
        )
    )
    ab = terms.groupBy("et", "p").agg(
        F.sum(F.col("w") * F.col("cq")).cast("long").alias("a_milli"),
        F.sum(F.col("w") * F.col("sq")).cast("long").alias("b_milli"),
    )
    power = F.expr(
        "cast(a_milli as decimal(38,0)) * a_milli"
        " + cast(b_milli as decimal(38,0)) * b_milli"
    )
    rn = F.row_number().over(
        W.partitionBy("et").orderBy(power.desc(), "p")
    )
    return (
        ab.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            F.col("et").alias("event_type"),
            F.col("p").cast("int").alias("period_hours"),
            "a_milli",
            "b_milli",
        )
    )


# --------------------------------------------------------------------------
# Ljung-Box portmanteau test (r13) — the decision rule the ACF panel
# above feeds: is the series distinguishable from white noise at all?
# Q = n(n+2) * sum_{k=1..3} r_k^2 / (n - k), compared against the
# chi-square 95% critical value at 3 df (7.814728). Q is an O(1)
# composition over the ACF panel's per-series rows (bounded by the
# series-type count, not corpus size): like the PACF above, it consumes
# the QUANTIZED r_k (round 6), so every downstream double expression is
# textually shared and bit-identical across engines. n recovers from
# lag 1's pair count (n = n_pairs + 1).
# --------------------------------------------------------------------------

_LB_CRIT = "7.814728"  # chi2 inv-cdf at p=0.95, df=3

_LB_FORMULAS = f"""
  round(cast(n AS DOUBLE) * (n + 2)
        * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
           + r3 * r3 / nullif(n - 3, 0)), 6) AS lb_q,
  CASE WHEN round(cast(n AS DOUBLE) * (n + 2)
        * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
           + r3 * r3 / nullif(n - 3, 0)), 6) > {_LB_CRIT}
       THEN 1 ELSE 0 END AS reject_white_noise
"""

_LB_ORACLE = f"""
WITH acf AS ({_ACF_ORACLE}),
piv AS (
  SELECT event_type,
         max(CASE WHEN lag = 1 THEN n_pairs END) + 1 AS n,
         max(CASE WHEN lag = 1 THEN acf END) AS r1,
         max(CASE WHEN lag = 2 THEN acf END) AS r2,
         max(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acf GROUP BY event_type
)
SELECT event_type, n, r1, r2, r3, {_LB_FORMULAS}
FROM piv
"""


@register(
    "ts_ljung_box",
    oracle=_LB_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_ljung_box(spark, sf_dir):
    """Ljung-Box Q over ACF lags 1..3 per series with the 5%-level
    white-noise rejection flag; the statistic composes on the exact-int
    ACF machinery (`ts_acf_lags`)."""
    acf = ts_acf_lags(spark, sf_dir)
    piv = acf.groupBy("event_type").agg(
        (F.max(F.when(F.col("lag") == 1, F.col("n_pairs"))) + 1).alias("n"),
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    return piv.selectExpr(
        "event_type",
        "n",
        "r1",
        "r2",
        "r3",
        *[e.strip() for e in _LB_FORMULAS.split(",\n") if e.strip()],
    )
