"""Statistical aggregates + the Pandas grouped-map (UDAF-shaped) surface.

``agg_stats_moments`` covers stddev/variance/covariance/correlation.
``groupedmap_minmax_norm`` runs a real ``applyInPandas`` grouped-map — the
engine's custom-UDAF escape hatch — and is still oracle-checked because
min-max normalization has an exact SQL twin (window min/max). That makes it
a verified template for per-group Python logic (model scoring, curve
fitting) rather than a rows-only demo.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT c_mktsegment,
       round(stddev_samp(c_acctbal), 4) AS std_bal,
       round(var_samp(c_acctbal), 4) AS var_bal,
       round(covar_samp(c_acctbal, cast(c_nationkey AS DOUBLE)), 4) AS covar_bn,
       round(corr(c_acctbal, cast(c_nationkey AS DOUBLE)), 6) AS corr_bn
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_stats_moments", oracle=_STATS_ORACLE, tags=("agg", "stats"))
def agg_stats_moments(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    nk = F.col("c_nationkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        F.round(F.covar_samp(F.col("c_acctbal"), nk), 4).alias("covar_bn"),
        F.round(F.corr(F.col("c_acctbal"), nk), 6).alias("corr_bn"),
    )


# --------------------------------------------------------------------------
# applyInPandas grouped-map with an exact SQL oracle.
# --------------------------------------------------------------------------

_MINMAX_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(CASE WHEN mx = mn THEN 0.5
                  ELSE (o_totalprice - mn) / (mx - mn) END, 6) AS price_norm
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         min(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
         max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
  FROM orders
) t
"""


@register("groupedmap_minmax_norm", oracle=_MINMAX_ORACLE, tags=("udaf", "pandas"))
def groupedmap_minmax_norm(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        if mx == mn:
            pdf["price_norm"] = 0.5
        else:
            pdf["price_norm"] = ((pdf["o_totalprice"] - mn) / (mx - mn)).round(6)
        return pdf[["o_custkey", "o_orderkey", "price_norm"]]

    # r16 (guide §2.2/§4.1): pin the group exchange's width. AQE coalesces
    # this exchange by BYTES (150k 24-byte rows -> 2 partitions locally),
    # but the stage's real cost is one Python call per GROUP — opaque to
    # the byte heuristic — so 2 of N cores ran ~15k group calls (profile:
    # one 20.9 s 2-task stage; 1.5 s at full width). The explicit
    # repartition on the group key is reused by the groupBy (same key,
    # same width — no extra exchange) and scales with the cluster, not a
    # local constant.
    return (
        o.repartition(spark.sparkContext.defaultParallelism, "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(
            norm, schema="o_custkey long, o_orderkey long, price_norm double"
        )
    )


# --------------------------------------------------------------------------
# Table profiler — the ANALYZE-style metadata sweep every warehouse runs
# after ingest: per-column null count, exact distinct count, min/max. One
# wide aggregation pass (Spark expands once per distinct-counted column —
# the standard plan), unpivoted to long format with stack(). At 100 TB the
# same query runs with approx_count_distinct; the exact form here keeps
# the cross-engine oracle bit-stable.
# --------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name,
       cast(count(*) AS BIGINT) AS n_rows,
       cast(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       cast(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       cast(min({c}) AS DOUBLE) AS min_v,
       cast(max({c}) AS DOUBLE) AS max_v
FROM orders
"""
    for c in _PROFILE_COLS
)


@register("profile_column_stats", oracle=_PROFILE_ORACLE, tags=("stats", "profile"))
def profile_column_stats(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"max_{c}"),
        ]
    wide = o.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', null_{c}, nd_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stacked})"
        " AS (column_name, n_null, n_distinct, min_v, max_v)",
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")


# --------------------------------------------------------------------------
# Vectorized scalar pandas UDF — the sanctioned Python escape hatch for
# row-wise logic the built-ins can't express (here a logistic score, which
# SQL CAN express — that's what makes the exact oracle possible while the
# plan still exercises the ArrowEvalPython path end to end). Arrow ships
# columnar batches both ways: ~10-100x over row-at-a-time Python UDFs, the
# difference between "unusable at 100 TB" and "bounded overhead on the one
# column that needs Python".
# --------------------------------------------------------------------------


@register(
    "udf_pandas_logistic_score",
    oracle="""
SELECT l_orderkey,
       cast(count(*) AS BIGINT) AS n_items,
       round(sum(cast(round((1.0 / (1.0 + exp(-(0.05 * l_quantity - 8.0 * l_discount)))) * 1000000000) AS BIGINT)) / 1000000000, 6)
         AS sum_score
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
LIMIT 100
""",
    tags=("functions", "udf", "ml"),
)
def udf_pandas_logistic_score(spark, sf_dir):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def logistic_nanos(qty: pd.Series, disc: pd.Series) -> pd.Series:
        import numpy as np

        # quantize each score to an int64 of 1e-9 units (half-away-from-zero
        # via floor(x+0.5); scores are positive) so the cross-row SUM is
        # exact integer arithmetic on BOTH engines — the lsum/s_lsum
        # playbook. A 1-ulp libm exp() divergence can now shift the final
        # 6-digit sum only if the total sits within 1e-9 of a rounding
        # boundary, instead of any single element sitting on one.
        s = 1.0 / (1.0 + np.exp(-(0.05 * qty - 8.0 * disc)))
        return pd.Series(np.floor(s * 1e9 + 0.5).astype("int64"))

    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", logistic_nanos("l_quantity", "l_discount").alias("s")
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("s") / F.lit(1000000000).cast("double"), 6).alias(
                "sum_score"
            ),
        )
        .orderBy("l_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Winsorized (percentile-clipped) statistics — the outlier-robust feature
# scaling a training pipeline applies before normalization. Exact p05/p95
# thresholds at scale via the VALUE-HISTOGRAM two-phase form: aggregate to
# (group, value) counts first, then run the cumulative window over the
# histogram, not the raw rows — the window's input is bounded by the value
# domain (distinct cents), not the row count, so the per-group sort that
# makes exact percentiles "impossible" at 100 TB touches a few million
# histogram rows instead of trillions of raw ones. Rank positions are pure
# integer arithmetic (ceil(n/20) = (n+19)//20) — no 0.05 literal whose
# decimal-vs-double parse differs between engines. All sums are int64
# cents; one division at the end.
# --------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH hist AS (
  SELECT l_returnflag AS flag,
         cast(round(l_extendedprice * 100) AS BIGINT) AS cents,
         cast(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, cents, c,
         sum(c) OVER (PARTITION BY flag ORDER BY cents) AS cm,
         sum(c) OVER (PARTITION BY flag) AS n
  FROM hist
),
thr AS (
  SELECT flag,
         cast(min(CASE WHEN cm >= (n + 19) // 20 THEN cents END) AS BIGINT)
             AS lo,
         cast(min(CASE WHEN cm >= (19 * n + 19) // 20 THEN cents END)
              AS BIGINT) AS hi,
         cast(max(n) AS BIGINT) AS n
  FROM cum GROUP BY flag
)
SELECT h.flag,
       t.n AS n_rows,
       round(t.lo / 100.0, 2) AS p05,
       round(t.hi / 100.0, 2) AS p95,
       cast(sum(CASE WHEN h.cents < t.lo THEN h.c ELSE 0 END) AS BIGINT)
           AS n_clip_low,
       cast(sum(CASE WHEN h.cents > t.hi THEN h.c ELSE 0 END) AS BIGINT)
           AS n_clip_high,
       (cast(sum(least(greatest(h.cents, t.lo), t.hi) * h.c) AS BIGINT)
        / cast(100 AS DOUBLE)) AS win_sum
FROM hist h JOIN thr t ON h.flag = t.flag
GROUP BY h.flag, t.n, t.lo, t.hi
"""


@register("agg_winsorized_stats", oracle=_WINSOR_ORACLE, tags=("agg", "stats"))
def agg_winsorized_stats(spark, sf_dir):
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("flag", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = Window.partitionBy("flag").orderBy("cents")
    w_all = Window.partitionBy("flag")
    cum = hist.select(
        "flag",
        "cents",
        "c",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    pos_lo = F.floor((F.col("n") + 19) / 20)
    pos_hi = F.floor((19 * F.col("n") + 19) / 20)
    thr = cum.groupBy("flag").agg(
        F.min(F.when(F.col("cm") >= pos_lo, F.col("cents")))
        .cast("long")
        .alias("lo"),
        F.min(F.when(F.col("cm") >= pos_hi, F.col("cents")))
        .cast("long")
        .alias("hi"),
        F.max("n").cast("long").alias("n"),
    )
    clipped = hist.join(F.broadcast(thr), "flag").select(
        "flag",
        F.col("n").alias("n_rows"),
        "lo",
        "hi",
        "c",
        "cents",
        F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")).alias("cc"),
    )
    return clipped.groupBy("flag", "n_rows", "lo", "hi").agg(
        F.sum(F.when(F.col("cents") < F.col("lo"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_clip_low"),
        F.sum(F.when(F.col("cents") > F.col("hi"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_clip_high"),
        (F.sum(F.col("cc") * F.col("c")).cast("long") / F.lit(100.0)).alias(
            "win_sum"
        ),
    ).select(
        "flag",
        "n_rows",
        F.round(F.col("lo") / 100.0, 2).alias("p05"),
        F.round(F.col("hi") / 100.0, 2).alias("p95"),
        "n_clip_low",
        "n_clip_high",
        "win_sum",
    )


# --------------------------------------------------------------------------
# Shannon-entropy column profile — the information-theoretic complement to
# the null/distinct/min-max profiler: near-zero entropy flags constant or
# degenerate columns (a classic silent-ETL-bug symptom); entropy near
# ln(n_distinct) means uniform. H = ln(n) - sum(c*ln(c))/n over the value
# histogram, with per-value ln(c) quantized to round(x*1e6) int64 so the
# cross-row sum is exact integer arithmetic; the remaining float ops
# (one ln, one division, one subtraction, one round) are identical
# correctly-rounded IEEE on both engines. Cost: one histogram aggregation
# per profiled column — the same shape ANALYZE runs, linear and
# map-side-combinable at any scale.
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cols AS (
  SELECT 'lang' AS col, lang AS v FROM documents
  UNION ALL SELECT 'source', source FROM documents
  UNION ALL SELECT 'event_type', event_type FROM events
),
hist AS (
  SELECT col, v, cast(count(*) AS BIGINT) AS c FROM cols GROUP BY col, v
),
agg AS (
  SELECT col,
         cast(sum(c) AS BIGINT) AS n,
         cast(count(*) AS BIGINT) AS n_distinct,
         cast(sum(c * cast(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
             AS s6
  FROM hist GROUP BY col
)
SELECT col, n, n_distinct,
       round(ln(n) - s6 / (n * cast(1000000 AS DOUBLE)), 6) AS entropy_nats,
       round(ln(n_distinct), 6) AS max_entropy_nats
FROM agg
"""


@register("profile_entropy_columns", oracle=_ENTROPY_ORACLE, tags=("stats", "profile"))
def profile_entropy_columns(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "events")
    cols = (
        d.select(F.lit("lang").alias("col"), F.col("lang").alias("v"))
        .unionByName(
            d.select(F.lit("source").alias("col"), F.col("source").alias("v"))
        )
        .unionByName(
            e.select(
                F.lit("event_type").alias("col"), F.col("event_type").alias("v")
            )
        )
    )
    hist = cols.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    agg = hist.groupBy("col").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.round(F.log("c") * 1000000).cast("long"))
        .cast("long")
        .alias("s6"),
    )
    return agg.select(
        "col",
        "n",
        "n_distinct",
        F.round(
            F.log("n") - F.col("s6") / (F.col("n") * F.lit(1000000).cast("double")),
            6,
        ).alias("entropy_nats"),
        F.round(F.log("n_distinct"), 6).alias("max_entropy_nats"),
    )


# --------------------------------------------------------------------------
# Chi-square test of independence: is document language independent of
# source? The screening stat behind corpus-mix design (a skewed lang x
# source contingency means per-source language balancing is needed before
# training). Exact cross-engine protocol: observed counts are ints; each
# cell's expected value (row_total * col_total) / N is ONE int64 product
# and ONE correctly-rounded division; the (O-E)^2/E contribution is then
# quantized to int64 at 1e-9 before summation, so the chi2 total is exact
# integer arithmetic (the lsum playbook — no float-sum order dependence).
# Scale: one (lang, source) shuffle over the corpus; everything after is
# contingency-table-sized (n_lang * n_source rows) with broadcast joins.
# Row/col products R*C stay inside int64 for any corpus with < ~3e9 docs;
# beyond that, scale the protocol to DECIMAL(38) — noted, not needed here.
# --------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
  SELECT lang, source, cast(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
rows_ AS (SELECT lang, cast(sum(o) AS BIGINT) AS r FROM obs GROUP BY lang),
cols_ AS (SELECT source, cast(sum(o) AS BIGINT) AS c FROM obs GROUP BY source),
tot AS (SELECT cast(sum(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT o.lang, o.source, o.o,
         (r.r * c.c) / cast(t.n AS DOUBLE) AS e
  FROM obs o
  JOIN rows_ r ON o.lang = r.lang
  JOIN cols_ c ON o.source = c.source
  CROSS JOIN tot t
),
q AS (
  SELECT cast(round(((o - e) * (o - e) / e) * 1000000000) AS BIGINT) AS q9
  FROM cells
),
dims AS (
  SELECT (SELECT cast(count(*) AS BIGINT) FROM rows_) AS n_lang,
         (SELECT cast(count(*) AS BIGINT) FROM cols_) AS n_source,
         (SELECT n FROM tot) AS n
)
SELECT d.n, d.n_lang, d.n_source,
       (d.n_lang - 1) * (d.n_source - 1) AS dof,
       round(s.s / cast(1000000000 AS DOUBLE), 6) AS chi2,
       round(sqrt((s.s / cast(1000000000 AS DOUBLE))
                  / (d.n * least(d.n_lang - 1, d.n_source - 1))), 6)
           AS cramers_v
FROM (SELECT cast(sum(q9) AS BIGINT) AS s FROM q) s CROSS JOIN dims d
"""


@register(
    "profile_chi2_independence", oracle=_CHI2_ORACLE, tags=("stats", "profile")
)
def profile_chi2_independence(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cols = obs.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    e = (F.col("r") * F.col("c")) / F.col("n").cast("double")
    cells = (
        obs.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))
        .select(((F.col("o") - e) * (F.col("o") - e) / e).alias("contrib"))
    )
    s = cells.agg(
        F.sum(F.round(F.col("contrib") * 1000000000).cast("long")).alias("s")
    )
    dims = (
        rows.agg(F.count(F.lit(1)).alias("n_lang"))
        .crossJoin(F.broadcast(cols.agg(F.count(F.lit(1)).alias("n_source"))))
        .crossJoin(F.broadcast(tot))
    )
    chi2 = F.col("s") / F.lit(1000000000).cast("double")
    return s.crossJoin(F.broadcast(dims)).select(
        "n",
        "n_lang",
        "n_source",
        ((F.col("n_lang") - 1) * (F.col("n_source") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.col("n")
                    * F.least(F.col("n_lang") - 1, F.col("n_source") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval for a corpus mean — error bars on
# metrics at 100 TB. The classic resampling bootstrap needs n draws per
# replica from the whole dataset (impossible distributed); the Poisson
# bootstrap (Chamandy et al., Google 2012) gives each row an independent
# Poisson(1) weight per replica, so ALL B replicas accumulate in ONE scan
# as 2*B map-side-combinable sums. Weights are derandomized: replica b's
# weight for a row is inverse-CDF sampled from the row-key md5 nibble
# stream — a pure function of the data, so both engines derive identical
# replicas and the oracle check is EXACT (no tolerance band needed).
# Replica means use the scaled-int64 protocol (cents); the replica-spread
# SE quantizes each mean at 1e2 before the second-moment sum so the 32
# squares stay inside int64; the 2.5/97.5% CI bounds are order statistics
# of the 32 deterministic replica means.
# --------------------------------------------------------------------------

_BOOT_B = 32
# cumulative Poisson(1) CDF thresholds: P(X <= k) for k = 0..7; u above
# the last -> weight 8 (P ~ 1e-6). Literals parse to identical doubles.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
    "0.9999897508033253",
)


def _pois_weight_sql(u: str) -> str:
    """Inverse-CDF Poisson(1) draw from a uniform expression ``u``."""
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE {branches} ELSE 8 END)"


def _boot_sql(str_t: str, instr_fn: str, h32: str | None = None) -> str:
    """Shared bootstrap text over ``lineitem``; engine knobs: string type
    name, the hex-digit position function (instr vs strpos), and an
    optional override for the whole 8-nibble hash expression."""
    hexval = f"(cast({instr_fn}('0123456789abcdef', {{d}}) AS BIGINT) - 1)"
    h32 = h32 or " + ".join(
        hexval.format(d=f"substr(md5(rk || '_' || cast(b AS {str_t})), {i + 1}, 1)")
        + f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH rows_ AS (
  SELECT cast(l_orderkey AS {str_t}) || ':' || cast(l_linenumber AS {str_t})
             AS rk,
         cast(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
reps AS (
  SELECT rk, cents, cast(b AS BIGINT) AS b
  FROM rows_ CROSS JOIN (SELECT explode_or_unnest AS b) x
),
uni AS (
  SELECT b, cents, ({h32}) / 4294967296.0 AS u FROM reps
),
drawn AS (
  SELECT b, cents, {_pois_weight_sql("u")} AS w FROM uni
),
repl AS (
  SELECT b,
         cast(sum(w * cents) AS BIGINT) AS wsum,
         cast(sum(w) AS BIGINT) AS wn
  FROM drawn GROUP BY b
),
means AS (
  SELECT b, wsum / cast(wn AS DOUBLE) / 100 AS m,
         cast(round(wsum / cast(wn AS DOUBLE)) AS BIGINT) AS q
  FROM repl
),
ranked AS (
  SELECT m, q, row_number() OVER (ORDER BY m, b) AS rn FROM means
),
spread_ AS (
  SELECT cast(sum(q) AS BIGINT) AS sq, cast(sum(q * q) AS BIGINT) AS sqq,
         cast(count(*) AS BIGINT) AS nb
  FROM means
),
full_ AS (
  SELECT cast(count(*) AS BIGINT) AS n, cast(sum(cents) AS BIGINT) AS csum
  FROM rows_
)
SELECT f.n,
       round(f.csum / cast(f.n AS DOUBLE) / 100, 6) AS mean_full,
       round((SELECT m FROM ranked WHERE rn = 1), 6) AS boot_min,
       round((SELECT m FROM ranked WHERE rn = 2), 6) AS ci_lo,
       round((SELECT m FROM ranked WHERE rn = {_BOOT_B - 1}), 6) AS ci_hi,
       round((SELECT m FROM ranked WHERE rn = {_BOOT_B}), 6) AS boot_max,
       round(sqrt((s.sqq - cast(s.sq AS DOUBLE) * s.sq / s.nb)
                  / (s.nb - 1)) / 100, 6) AS se
FROM full_ f CROSS JOIN spread_ s
"""


_BOOT_ORACLE = _boot_sql("VARCHAR", "strpos").replace(
    "(SELECT explode_or_unnest AS b) x",
    f"(SELECT unnest(range({_BOOT_B})) AS b) x",
)

# Spark side: ONE conv(hex, 16, 10) of the first 8 md5 digits is the
# same integer as the 8-term nibble sum (digit i carries weight
# 16^(7-i)) without eight substr+instr scans per draw — r17 guide §1.2
# per-task work; the DuckDB oracle keeps the nibble-sum form and the
# values are identical by construction.
_BOOT_SPARK_SQL = _boot_sql(
    "STRING",
    "instr",
    h32="cast(conv(substr(md5(rk || '_' || cast(b AS STRING)), 1, 8),"
    " 16, 10) AS BIGINT)",
).replace(
    "(SELECT explode_or_unnest AS b) x",
    f"(SELECT explode(sequence(0, {_BOOT_B - 1})) AS b) x",
)


@register(
    "sample_poisson_bootstrap", oracle=_BOOT_ORACLE, tags=("sample", "stats")
)
def sample_poisson_bootstrap(spark, sf_dir):
    from ..catalog import table as _table
    from ._util import spread

    # the 32-replica md5 draw stream is the expensive map stage; spread()
    # keeps it off a single coarse input partition
    spread(_table(spark, sf_dir, "lineitem")).createOrReplaceTempView("lineitem")
    return spark.sql(_BOOT_SPARK_SQL)


# --------------------------------------------------------------------------
# Model calibration bins (reliability diagram): bucket a deterministic
# logistic score into 10 probability bins and compare each bin's mean
# predicted probability with its observed positive rate — the standard
# post-training eval for any classifier trained on the cluster (pairs
# with ml_logreg_irls). Exactness: per-row probabilities quantize to
# int64 at 1e9 before BOTH the binning floor and the bin-mean sum, so
# bucket membership and every aggregate are integer-exact; only the two
# final divisions are floats. One scan, one 10-key aggregation.
# --------------------------------------------------------------------------

_CALIB_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         cast(round(1 / (1 + exp(-(-0.7 + 0.002 * cast(round(l_discount * 100)
             AS BIGINT) - 0.0002 * cast(l_quantity AS BIGINT)))) * 1000000000)
             AS BIGINT) AS p9
  FROM lineitem
),
binned AS (
  SELECT cast(p9 * 10 // 1000000000 AS INTEGER) AS bin, y, p9 FROM scored
)
SELECT bin,
       cast(count(*) AS BIGINT) AS n,
       round(cast(sum(p9) AS BIGINT) / cast(count(*) AS DOUBLE)
             / 1000000000, 6) AS mean_predicted,
       round(cast(sum(y) AS BIGINT) / cast(count(*) AS DOUBLE), 6)
           AS observed_rate
FROM binned GROUP BY bin
"""


@register("ml_calibration_bins", oracle=_CALIB_ORACLE, tags=("ml", "stats"))
def ml_calibration_bins(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    eta = (
        F.lit(-0.7)
        + 0.002 * F.round(F.col("l_discount") * 100).cast("long")
        - 0.0002 * F.col("l_quantity").cast("long")
    )
    p9 = F.round((1 / (1 + F.exp(-eta))) * 1000000000).cast("long")
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        p9.alias("p9"),
    )
    binned = scored.select(
        F.expr("cast(p9 * 10 div 1000000000 as int)").alias("bin"),
        "y",
        "p9",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("p9").cast("long") / F.count(F.lit(1)).cast("double")
            / 1000000000,
            6,
        ).alias("mean_predicted"),
        F.round(
            F.sum("y").cast("long") / F.count(F.lit(1)).cast("double"), 6
        ).alias("observed_rate"),
    )


# --------------------------------------------------------------------------
# Exact ROC AUC via the rank-sum (Mann-Whitney U) identity — the third
# member of the distributed-ML-eval set (train: ml_logreg_irls;
# calibrate: ml_calibration_bins; discriminate: this). AUC equals
# (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) where R_pos is the sum of
# positive rows' ranks under the score ordering, ties taking AVERAGE
# rank. Everything is integer-exact: scores quantize to int64 at 1e9,
# tie groups aggregate (count, positives) per distinct score, average
# ranks come from cumulative counts as EXACT twice-scaled integers
# (2*avg_rank is an integer), and the final AUC is one division of two
# int64s. The rank pass is a two-level aggregation plus one ordered
# window over DISTINCT scores (cardinality ~ score resolution, not rows).
# --------------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         cast(round(1 / (1 + exp(-(-0.7 + 0.002 * cast(round(l_discount * 100)
             AS BIGINT) - 0.0002 * cast(l_quantity AS BIGINT)))) * 1000000000)
             AS BIGINT) AS p9
  FROM lineitem
),
groups_ AS (
  SELECT p9, cast(count(*) AS BIGINT) AS c, cast(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY p9
),
ranked AS (
  SELECT pos, c,
         coalesce(sum(c) OVER (ORDER BY p9
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM groups_
),
sums AS (
  SELECT cast(sum(pos * (2 * below + c + 1)) AS BIGINT) AS r2,
         cast(sum(pos) AS BIGINT) AS n_pos,
         cast(sum(c - pos) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       round((r2 - n_pos * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM sums
"""


@register("ml_auc_roc", oracle=_AUC_ORACLE, tags=("ml", "stats", "window"))
def ml_auc_roc(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    eta = (
        F.lit(-0.7)
        + 0.002 * F.round(F.col("l_discount") * 100).cast("long")
        - 0.0002 * F.col("l_quantity").cast("long")
    )
    p9 = F.round((1 / (1 + F.exp(-eta))) * 1000000000).cast("long")
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        p9.alias("p9"),
    )
    groups = scored.groupBy("p9").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").cast("long").alias("pos")
    )
    # global running count over distinct scores via the scale-safe
    # two-pass range-partition form (_util): even a billion distinct
    # scores never funnel through one task
    from ._util import two_pass_global_window

    ranked = two_pass_global_window(
        groups, ["p9"], value_col="c", out_col="run"
    ).select("pos", "c", (F.col("run") - F.col("c")).alias("below"))
    # r2 is a rank sum — O(n^2) in row count — and n_pos*(n_pos+1) is
    # O(n^2) too: both wrap int64 (ANSI: abort) in the billions of rows.
    # Accumulate in decimal(38,0) (exact to ~1e38, i.e. ~1e19 rows); the
    # single final division casts to double, where the 1-ulp relative
    # error is invisible at 6 rounded decimals.
    dec = "decimal(38,0)"
    sums = ranked.agg(
        F.sum(
            F.col("pos").cast(dec)
            * (2 * F.col("below") + F.col("c") + 1).cast(dec)
        ).alias("r2"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("c") - F.col("pos")).cast("long").alias("n_neg"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("r2")
                - F.col("n_pos").cast(dec) * (F.col("n_pos") + 1).cast(dec)
            ).cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (the UDAF flavor of the Python surface —
# scalar pandas UDF, grouped-map applyInPandas, stateful
# applyInPandasWithState and UDTF are covered elsewhere): a
# discount-weighted mean price per return flag. The UDF receives whole
# group columns as pandas Series via Arrow and returns ONE scalar.
# Cross-engine exactness uses the scaled-int64 playbook INSIDE the UDF:
# numerator and denominator are integer sums (cents x discount-bps), the
# division is the only float op. Note the scale trade-off vs built-ins:
# a grouped-agg pandas UDF materializes each group in executor memory
# (no partial aggregation), so groups must be bounded — built-in
# aggregates remain the 100 TB default and this surface is for logic
# that genuinely needs numpy/pandas.
# --------------------------------------------------------------------------

_WMEAN_ORACLE = """
SELECT l_returnflag,
       round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)
                      * cast(round(l_discount * 10000) AS BIGINT)) AS BIGINT)
             / cast(nullif(sum(cast(round(l_discount * 10000) AS BIGINT)), 0)
                    AS DOUBLE) / 100, 6) AS weighted_mean_price
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "udaf_pandas_weighted_mean", oracle=_WMEAN_ORACLE, tags=("udaf", "pandas", "agg")
)
def udaf_pandas_weighted_mean(spark, sf_dir):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, disc: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        bps = (disc * 10000).round().astype("int64")
        den = int(bps.sum())
        if den == 0:
            return None
        val = int((cents * bps).sum()) / float(den) / 100
        # half-UP at 6 digits (math.floor(x*1e6 + 0.5)) — Python's round()
        # is half-even, DuckDB/Spark round are half-away for positives
        import math

        return math.floor(val * 1000000 + 0.5) / 1000000

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wmean("l_extendedprice", "l_discount").alias("weighted_mean_price")
    )


# --------------------------------------------------------------------------
# Two-stage scale twin of the grouped-agg UDAF above (VERDICT r6 #6): the
# identical weighted mean computed with BUILT-IN integer sums, so partial
# aggregation applies — each map partition collapses its rows to one
# (numerator, denominator) pair per group before the exchange, instead of
# shipping every group's full column data through Arrow. Shares the UDAF's
# oracle verbatim: same scaled-int64 arithmetic, one float division, same
# half-up rounding (Spark ``round`` is HALF_UP for positives, as is the
# oracle's). The UDAF stays registered as the Python-surface API demo;
# this twin is the documented 100 TB default.
# --------------------------------------------------------------------------


@register(
    "agg_weighted_mean_twostage",
    oracle=_WMEAN_ORACLE,
    tags=("agg", "scale-twin"),
)
def agg_weighted_mean_twostage(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bps = F.round(F.col("l_discount") * 10000).cast("long")
    den = F.sum(bps).cast("long")
    # The per-row product reaches ~1e11 (cents ~1e7 x bps ~1e4), so an
    # int64 SUM wraps silently (non-ANSI) around ~1e8 rows per group —
    # well inside the 100 TB envelope this twin is advertised for, while
    # the UDAF it twins uses arbitrary-precision Python ints. Accumulate
    # the numerator as decimal(38,0): headroom ~1e27 rows per group, and
    # decimal SUM still partial-aggregates map-side (ADVICE r7).
    num = F.sum(cents.cast("decimal(38,0)") * bps)
    return li.groupBy("l_returnflag").agg(
        F.round(
            num / F.nullif(den, F.lit(0)).cast("double") / 100, 6
        ).alias("weighted_mean_price")
    )


# --------------------------------------------------------------------------
# Exponential (base-2) histogram quantiles (r10): the OpenTelemetry/HDR
# sketch shape — every admitted value (>= one cent after quantization;
# sub-cent rows are outside the domain) lands in bucket floor(log2(v)), so
# the whole distribution compresses to <= 64 mergeable counters per
# series and any quantile is answerable within a guaranteed 2x relative
# error (the bucket's upper bound). The log2 is EXACT integer arithmetic
# in both engines: bucket = length(binary-string(v_cents)) − 1 (Spark
# bin() / DuckDB printf('%b')) — no libm, no 1-ulp edge at powers of
# two. Cumulative counts run over the per-series BUCKET table (<= 64
# rows per series — aggregate-sized window input), and the exact median
# rides along from the same scan so the output itself exhibits the
# 2x-error contract the pytest pin asserts.
# --------------------------------------------------------------------------

_EXPHIST_ORACLE = """
WITH x AS (
  SELECT event_type AS et, cast(round(value * 100) AS BIGINT) AS v
  FROM events WHERE round(value * 100) >= 1
), b AS (
  SELECT et, length(printf('%b', v)) - 1 AS bucket,
         cast(count(*) AS BIGINT) AS n
  FROM x GROUP BY et, length(printf('%b', v)) - 1
), c AS (
  SELECT et, bucket, n,
         cast(sum(n) OVER (PARTITION BY et ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM b
), tot AS (
  SELECT et, cast(sum(n) AS BIGINT) AS nt,
         cast(count(*) AS BIGINT) AS n_buckets
  FROM b GROUP BY et
), med AS (
  SELECT et, cast(median(v) AS DOUBLE) AS p50_cents FROM x GROUP BY et
), pick AS (
  SELECT c.et,
         min(CASE WHEN c.cum >= (tot.nt + 1) // 2 THEN c.bucket END) AS b50,
         min(CASE WHEN c.cum >= (95 * tot.nt + 99) // 100 THEN c.bucket END)
           AS b95
  FROM c JOIN tot ON tot.et = c.et
  GROUP BY c.et
)
SELECT pick.et AS event_type, tot.nt AS n, tot.n_buckets,
       round((cast(2 AS DOUBLE) ** (pick.b50 + 1) - cast(1 AS DOUBLE))
             / cast(100 AS DOUBLE), 2) AS hist_p50_le,
       round((cast(2 AS DOUBLE) ** (pick.b95 + 1) - cast(1 AS DOUBLE))
             / cast(100 AS DOUBLE), 2) AS hist_p95_le,
       round(med.p50_cents / cast(100 AS DOUBLE), 3) AS exact_p50
FROM pick
JOIN tot ON tot.et = pick.et
JOIN med ON med.et = pick.et
"""


@register(
    "agg_exponential_histogram",
    oracle=_EXPHIST_ORACLE,
    tags=("agg", "sketch", "profile"),
)
def agg_exponential_histogram(spark, sf_dir):
    from pyspark.sql import Window as W

    # Admission gate is on the QUANTIZED value (ADVICE r10): 0 < value
    # < 0.005 rounds to v_cents = 0, whose bucket length(bin(0))-1 = 0
    # would collide with v = 1 and void the 2x-relative-error bound —
    # sub-cent rows are outside the sketch's domain, so exclude them in
    # both engines rather than silently mis-bucket them.
    x = (
        table(spark, sf_dir, "events")
        .where(F.round(F.col("value") * 100) >= 1)
        .select(
            F.col("event_type").alias("et"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    b = (
        x.select("et", (F.length(F.expr("bin(v)")) - 1).alias("bucket"))
        .groupBy("et", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        W.partitionBy("et")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = b.withColumn("cum", F.sum("n").over(w).cast("long"))
    tot = b.groupBy("et").agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    med = x.groupBy("et").agg(F.median("v").cast("double").alias("p50_cents"))
    joined = c.join(F.broadcast(tot), "et")
    pick = joined.groupBy("et").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(nt + 1) div 2"), F.col("bucket"))
        ).alias("b50"),
        F.min(
            F.when(F.col("cum") >= F.expr("(95 * nt + 99) div 100"), F.col("bucket"))
        ).alias("b95"),
    )
    two = F.lit(2.0)
    ub = lambda b_: (F.pow(two, F.col(b_) + 1) - 1.0) / F.lit(100.0)  # noqa: E731
    return (
        pick.join(F.broadcast(tot), "et")
        .join(F.broadcast(med), "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("nt").alias("n"),
            "n_buckets",
            F.round(ub("b50"), 2).alias("hist_p50_le"),
            F.round(ub("b95"), 2).alias("hist_p95_le"),
            F.round(F.col("p50_cents") / F.lit(100).cast("double"), 3).alias(
                "exact_p50"
            ),
        )
    )


# --------------------------------------------------------------------------
# Exponentially-decayed counts (r13): the recency-weighted popularity
# metric every ranking/telemetry stack keeps — each event contributes
# 2^(-(t_max - t)/halflife) with a 24 h half-life, so a week-old event
# counts ~1% of a fresh one. t_max is the CORPUS max (one 1-row agg
# broadcast back), making the metric a pure function of the data, not
# of wall-clock at query time — reproducible across engines and runs.
# Exactness: the per-event weight is ONE shared pow2 expression over
# exact microsecond ints, quantized to MICRO units (1e-6) BEFORE
# summation (the lsum playbook — no float-sum order dependence); the
# decayed count is an exact int64 sum of those quanta (headroom: 9e12
# rows per type before int64 saturates — the original nano quanta blew
# ANSI long overflow at the 10x datapoint, caught by bench_scale), and
# the value mass runs its sum in decimal(38,0) before scaling back to
# an int64 cents figure. One corpus pass, map-side combinable.
# --------------------------------------------------------------------------

_HALFLIFE_US = 24 * 3600 * 1_000_000

_DECAY_ORACLE = f"""
WITH mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
w AS (
  SELECT event_type,
         cast(round(pow(2.0, -cast(mx.tmax - epoch_us(ts) AS DOUBLE)
                           / {_HALFLIFE_US}) * 1000000) AS BIGINT) AS w6,
         cast(round(value * 100) AS BIGINT) AS v
  FROM events, mx
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_raw,
       cast(sum(w6) AS BIGINT) AS decayed_count_micro,
       cast(CASE WHEN sum(w6 * v) < 0
                 THEN -((-sum(w6 * v)) // 1000000)
                 ELSE sum(w6 * v) // 1000000 END AS BIGINT)
           AS decayed_value_cents,
       cast(sum(w6) // count(*) AS BIGINT) AS freshness_ppm
FROM w GROUP BY event_type
"""


@register(
    "agg_exponential_decay_counts",
    oracle=_DECAY_ORACLE,
    tags=("agg", "timeseries"),
)
def agg_exponential_decay_counts(spark, sf_dir):
    """Half-life-weighted event counts and value mass per type, anchored
    at the corpus max timestamp; weights quantized before summation."""
    e = table(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    mx = e.agg(F.max(us).alias("tmax"))
    w6 = F.round(
        F.pow(
            F.lit(2.0),
            -(F.col("tmax") - us).cast("double") / F.lit(_HALFLIFE_US),
        )
        * 1_000_000
    ).cast("long")
    w = e.crossJoin(F.broadcast(mx)).select(
        "event_type",
        w6.alias("w6"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("w6").cast("long").alias("decayed_count_micro"),
        # exact decimal sum, scaled back to int64 cents (value*weight
        # per row reaches 1e13; the decimal sum is exact to ~1e25)
        F.expr(
            "cast((sum(cast(w6 * v as decimal(38,0))) div 1000000) as long)"
        ).alias("decayed_value_cents"),
        F.expr("sum(w6) div count(1)").cast("long").alias("freshness_ppm"),
    )
