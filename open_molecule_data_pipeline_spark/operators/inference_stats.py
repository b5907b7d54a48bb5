"""Two-sample inference tests (r10): Welch's t and Kolmogorov–Smirnov.

The A/B-test pair every experimentation pipeline runs over an events
stream — does metric ``value`` differ between two event populations?

- ``profile_welch_ttest``: Welch's unequal-variance t statistic plus the
  Welch–Satterthwaite degrees of freedom between two event types. The
  whole query is ONE partial+final aggregation over the scan (conditional
  sums — no join, no shuffle beyond the 1-row agg): per-group n / Σv / Σv²
  accumulate as exact int64 on the scaled values (v_e2 = round(value·100);
  Σv² ≤ 1e10·n — int64-safe through sf1000), and every double op after
  that is a fixed scalar expression over those ints, bit-identical across
  engines (sqrt is IEEE-correctly-rounded; no libm transcendentals).

- ``profile_ks_twosample``: the exact KS distance D = max|F₁(x) − F₂(x)|.
  ECDF differences are kept in EXACT integers: at each distinct value,
  d = c₁·n₂ − c₂·n₁ (c_i = per-value counts), and the running sum of d is
  n₁n₂·(F₁−F₂). The running sum over distinct values is the scale hazard —
  a partitionless window — so it runs through the two-pass range-partition
  form (``_util.two_pass_global_window``), the same rewrite ntile and
  sequence packing use: at 100 TB the distinct-value table shards across
  the cluster and only the per-range offsets (≤ shuffle-partition rows)
  see a global window. One double division at the very end.

Reference parity: the reference engine has no stats layer (its analysis
packages are docstring-only scaffolds, cf. reference
``docs/system-plan.md``); these extend the engine-addition surface of
SURVEY.md §2B (aggregations/profiling).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

# The two compared populations. Chosen so both sides are large (~2k rows
# at sf0.01) and neither is a superset of the other.
_GROUP_A = "click"
_GROUP_B = "purchase"

_WELCH_ORACLE = f"""
WITH g AS (
  SELECT
    cast(count(CASE WHEN event_type = '{_GROUP_A}' THEN 1 END) AS BIGINT) AS n1,
    cast(sum(CASE WHEN event_type = '{_GROUP_A}'
                  THEN cast(round(value * 100) AS BIGINT) END) AS BIGINT) AS s1,
    cast(sum(CASE WHEN event_type = '{_GROUP_A}'
                  THEN cast(round(value * 100) AS BIGINT)
                       * cast(round(value * 100) AS BIGINT) END) AS BIGINT) AS q1,
    cast(count(CASE WHEN event_type = '{_GROUP_B}' THEN 1 END) AS BIGINT) AS n2,
    cast(sum(CASE WHEN event_type = '{_GROUP_B}'
                  THEN cast(round(value * 100) AS BIGINT) END) AS BIGINT) AS s2,
    cast(sum(CASE WHEN event_type = '{_GROUP_B}'
                  THEN cast(round(value * 100) AS BIGINT)
                       * cast(round(value * 100) AS BIGINT) END) AS BIGINT) AS q2
  FROM events
  WHERE event_type IN ('{_GROUP_A}', '{_GROUP_B}')
), d AS (
  SELECT n1, n2,
         cast(s1 AS DOUBLE) / cast(n1 AS DOUBLE) / cast(100 AS DOUBLE) AS m1,
         cast(s2 AS DOUBLE) / cast(n2 AS DOUBLE) / cast(100 AS DOUBLE) AS m2,
         (cast(q1 AS DOUBLE)
          - cast(s1 AS DOUBLE) * cast(s1 AS DOUBLE) / cast(n1 AS DOUBLE))
           / (cast(n1 AS DOUBLE) - cast(1 AS DOUBLE))
           / cast(10000 AS DOUBLE) AS var1,
         (cast(q2 AS DOUBLE)
          - cast(s2 AS DOUBLE) * cast(s2 AS DOUBLE) / cast(n2 AS DOUBLE))
           / (cast(n2 AS DOUBLE) - cast(1 AS DOUBLE))
           / cast(10000 AS DOUBLE) AS var2
  FROM g
), e AS (
  SELECT n1, n2, m1, m2, var1, var2,
         var1 / cast(n1 AS DOUBLE) AS se1,
         var2 / cast(n2 AS DOUBLE) AS se2
  FROM d
)
SELECT n1, n2,
       round(m1, 6) AS mean_a,
       round(m2, 6) AS mean_b,
       round(var1, 6) AS var_a,
       round(var2, 6) AS var_b,
       round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
       round((se1 + se2) * (se1 + se2)
             / (se1 * se1 / (cast(n1 AS DOUBLE) - cast(1 AS DOUBLE))
                + se2 * se2 / (cast(n2 AS DOUBLE) - cast(1 AS DOUBLE))),
             3) AS welch_df
FROM e
"""


@register(
    "profile_welch_ttest",
    oracle=_WELCH_ORACLE,
    tags=("profile", "stats", "agg"),
)
def profile_welch_ttest(spark, sf_dir):
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_GROUP_A, _GROUP_B)
    )
    v = F.round(F.col("value") * 100).cast("long")

    def moments(group: str, tag: str):
        cond = F.col("event_type") == group
        return [
            F.count(F.when(cond, F.lit(1))).cast("long").alias(f"n{tag}"),
            F.sum(F.when(cond, v)).cast("long").alias(f"s{tag}"),
            F.sum(F.when(cond, v * v)).cast("long").alias(f"q{tag}"),
        ]

    g = e.groupBy().agg(*moments(_GROUP_A, "1"), *moments(_GROUP_B, "2"))

    def mean(tag: str):
        return (
            F.col(f"s{tag}").cast("double")
            / F.col(f"n{tag}").cast("double")
            / F.lit(100).cast("double")
        )

    def var(tag: str):
        n_d = F.col(f"n{tag}").cast("double")
        s_d = F.col(f"s{tag}").cast("double")
        return (
            (F.col(f"q{tag}").cast("double") - s_d * s_d / n_d)
            / (n_d - F.lit(1).cast("double"))
            / F.lit(10000).cast("double")
        )

    d = g.select(
        "n1",
        "n2",
        mean("1").alias("m1"),
        mean("2").alias("m2"),
        var("1").alias("var1"),
        var("2").alias("var2"),
    ).select(
        "*",
        (F.col("var1") / F.col("n1").cast("double")).alias("se1"),
        (F.col("var2") / F.col("n2").cast("double")).alias("se2"),
    )
    se = F.col("se1") + F.col("se2")
    one = F.lit(1).cast("double")
    return d.select(
        "n1",
        "n2",
        F.round("m1", 6).alias("mean_a"),
        F.round("m2", 6).alias("mean_b"),
        F.round("var1", 6).alias("var_a"),
        F.round("var2", 6).alias("var_b"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se), 6).alias("t_stat"),
        F.round(
            se
            * se
            / (
                F.col("se1") * F.col("se1") / (F.col("n1").cast("double") - one)
                + F.col("se2") * F.col("se2") / (F.col("n2").cast("double") - one)
            ),
            3,
        ).alias("welch_df"),
    )


_KS_ORACLE = f"""
WITH base AS (
  SELECT event_type AS t, cast(round(value * 100) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('{_GROUP_A}', '{_GROUP_B}')
), cnt AS (
  SELECT v,
         cast(sum(CASE WHEN t = '{_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         cast(sum(CASE WHEN t = '{_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM base GROUP BY v
), tot AS (
  SELECT cast(sum(ca) AS BIGINT) AS na, cast(sum(cb) AS BIGINT) AS nb FROM cnt
), run AS (
  SELECT v,
         cast(sum(ca * tot.nb - cb * tot.na)
              OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS r
  FROM cnt, tot
), best AS (
  SELECT abs(r) AS ks_num, v FROM run ORDER BY abs(r) DESC, v ASC LIMIT 1
)
SELECT tot.na AS n_a, tot.nb AS n_b,
       best.ks_num AS ks_num,
       round(cast(best.ks_num AS DOUBLE)
             / (cast(tot.na AS DOUBLE) * cast(tot.nb AS DOUBLE)), 6) AS ks_stat,
       round(cast(best.v AS DOUBLE) / cast(100 AS DOUBLE), 2) AS ks_at_value
FROM best, tot
"""


@register(
    "profile_ks_twosample",
    oracle=_KS_ORACLE,
    tags=("profile", "stats", "window"),
)
def profile_ks_twosample(spark, sf_dir):
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_GROUP_A, _GROUP_B)
    )
    cnt = (
        e.select(
            F.col("event_type").alias("t"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("t") == _GROUP_A, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("t") == _GROUP_B, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    tot = cnt.groupBy().agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    # d = ca*nb - cb*na; its running sum over v-order equals
    # na*nb*(F1(v) - F2(v)) — exact int64 throughout (|d| <= 2*na*nb).
    diffs = cnt.crossJoin(F.broadcast(tot)).select(
        "v", "na", "nb", (F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("d")
    )
    run = two_pass_global_window(diffs, ["v"], value_col="d", out_col="r")
    # argmax of |r| with the SMALLEST v on ties: struct-max on
    # (|r|, -v) is deterministic and never funnels rows to one task.
    best = run.groupBy("na", "nb").agg(
        F.max(F.struct(F.abs(F.col("r")).alias("a"), (-F.col("v")).alias("nv"))).alias(
            "m"
        )
    )
    return best.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("m.a").alias("ks_num"),
        F.round(
            F.col("m.a").cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double")),
            6,
        ).alias("ks_stat"),
        F.round((-F.col("m.nv")).cast("double") / F.lit(100).cast("double"), 2).alias(
            "ks_at_value"
        ),
    )


# --------------------------------------------------------------------------
# One-way ANOVA across ALL event types (the k-group generalization of the
# Welch pair above — fixed-effects F test, classic equal-variance form).
# Same exactness scheme: per-group n/Σv/Σv² accumulate as int64 on the
# scaled values; the per-group between-term S_g²/n_g is computed in double
# from those ints and rounded to an int64 BEFORE the cross-group sum (5
# groups here, but the quantize-then-sum rule removes any order hazard at
# ANY group count); F, df, and eta² are scalar double ops at the end.
# Magnitude bound: S_g²/n_g <= (n_g·v̄_e2)²/n_g = n_g·v̄² ≈ 2e7·1e10 = 2e17
# at sf100 — inside int64.
# --------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(sum(cast(round(value * 100) AS BIGINT)
                  * cast(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY event_type
), terms AS (
  SELECT n, s, q,
         cast(round(cast(s AS DOUBLE) * cast(s AS DOUBLE)
                    / cast(n AS DOUBLE)) AS BIGINT) AS t
  FROM g
), agg AS (
  SELECT cast(count(*) AS BIGINT) AS k,
         cast(sum(n) AS BIGINT) AS nn,
         cast(sum(s) AS BIGINT) AS ss,
         cast(sum(q) AS BIGINT) AS qq,
         cast(sum(t) AS BIGINT) AS tt
  FROM terms
), d AS (
  SELECT k, nn,
         cast(tt AS DOUBLE)
           - cast(ss AS DOUBLE) * cast(ss AS DOUBLE) / cast(nn AS DOUBLE)
           AS ssb,
         cast(qq AS DOUBLE) - cast(tt AS DOUBLE) AS ssw,
         cast(qq AS DOUBLE)
           - cast(ss AS DOUBLE) * cast(ss AS DOUBLE) / cast(nn AS DOUBLE)
           AS sst
  FROM agg
)
SELECT k AS n_groups, nn AS n_total,
       k - 1 AS df_between, nn - k AS df_within,
       round((ssb / cast(k - 1 AS DOUBLE))
             / (ssw / cast(nn - k AS DOUBLE)), 6) AS f_stat,
       round(ssb / sst, 6) AS eta_sq,
       round(ssb / cast(10000 AS DOUBLE), 4) AS ss_between,
       round(ssw / cast(10000 AS DOUBLE), 4) AS ss_within
FROM d
"""


@register(
    "profile_anova_oneway",
    oracle=_ANOVA_ORACLE,
    tags=("profile", "stats", "agg"),
)
def profile_anova_oneway(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
        F.sum(v * v).cast("long").alias("q"),
    )
    term = F.round(
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n").cast("double")
    ).cast("long")
    agg = g.select("n", "s", "q", term.alias("t")).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("q").cast("long").alias("qq"),
        F.sum("t").cast("long").alias("tt"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    grand = dd("ss") * dd("ss") / dd("nn")
    d = agg.select(
        "k",
        "nn",
        (dd("tt") - grand).alias("ssb"),
        (dd("qq") - dd("tt")).alias("ssw"),
        (dd("qq") - grand).alias("sst"),
    )
    one4 = F.lit(10000).cast("double")
    return d.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        (F.col("k") - 1).alias("df_between"),
        (F.col("nn") - F.col("k")).alias("df_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1).cast("double"))
            / (F.col("ssw") / (F.col("nn") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb") / F.col("sst"), 6).alias("eta_sq"),
        F.round(F.col("ssb") / one4, 4).alias("ss_between"),
        F.round(F.col("ssw") / one4, 4).alias("ss_within"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (r10) — the rank-based (distribution-free) counterpart
# of the Welch test above, sharing its group pair. Average-rank tie
# handling stays EXACT by working in doubled-rank units: at each distinct
# value, avg_rank·2 = 2·(#pooled values strictly below) + (#ties) + 1 —
# all int64 from the grouped counts, with the strictly-below prefix from
# the same two-pass range-partition running sum the KS test uses. Then
# 2·R_A = Σ c_A·r2 and U_A·2 = 2·R_A − n_A(n_A+1), still exact ints (U is
# half-integral under ties, so the doubled form is the lossless one);
# AUC = U_A/(n_A·n_B) is the one double division at the end — the same
# Mann-Whitney/AUC identity ml_auc_roc exploits, here as the hypothesis-
# test view over the events pair.
# --------------------------------------------------------------------------

_MWU_ORACLE = f"""
WITH base AS (
  SELECT event_type AS t, cast(round(value * 100) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('{_GROUP_A}', '{_GROUP_B}')
), cnt AS (
  SELECT v,
         cast(sum(CASE WHEN t = '{_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         cast(sum(CASE WHEN t = '{_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM base GROUP BY v
), tot AS (
  SELECT cast(sum(ca) AS BIGINT) AS na, cast(sum(cb) AS BIGINT) AS nb FROM cnt
), run AS (
  SELECT v, ca, ca + cb AS c,
         cast(sum(ca + cb) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM cnt
), r AS (
  SELECT cast(sum(ca * (2 * (cum - c) + c + 1)) AS BIGINT) AS r2a FROM run
)
SELECT tot.na AS n_a, tot.nb AS n_b,
       r.r2a - tot.na * (tot.na + 1) AS u2_a,
       2 * tot.na * tot.nb - (r.r2a - tot.na * (tot.na + 1)) AS u2_b,
       round(cast(r.r2a - tot.na * (tot.na + 1) AS DOUBLE)
             / cast(2 AS DOUBLE), 1) AS u_a,
       round(cast(r.r2a - tot.na * (tot.na + 1) AS DOUBLE)
             / (cast(2 AS DOUBLE) * cast(tot.na AS DOUBLE)
                * cast(tot.nb AS DOUBLE)), 6) AS auc
FROM r, tot
"""


@register(
    "profile_mannwhitney_u",
    oracle=_MWU_ORACLE,
    tags=("profile", "stats", "window"),
)
def profile_mannwhitney_u(spark, sf_dir):
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_GROUP_A, _GROUP_B)
    )
    cnt = (
        e.select(
            F.col("event_type").alias("t"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("t") == _GROUP_A, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("t") == _GROUP_B, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    run = two_pass_global_window(
        cnt.withColumn("c", F.col("ca") + F.col("cb")),
        ["v"],
        value_col="c",
        out_col="cum",
    )
    # avg-rank*2 at v: 2*(pooled strictly below) + ties + 1, all exact ints
    r2 = 2 * (F.col("cum") - F.col("c")) + F.col("c") + 1
    agg = run.groupBy().agg(
        F.sum(F.col("ca") * r2).cast("long").alias("r2a"),
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    u2a = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        u2a.alias("u2_a"),
        (2 * F.col("na") * F.col("nb") - u2a).alias("u2_b"),
        F.round(u2a.cast("double") / F.lit(2).cast("double"), 1).alias("u_a"),
        F.round(
            u2a.cast("double")
            / (
                F.lit(2).cast("double")
                * F.col("na").cast("double")
                * F.col("nb").cast("double")
            ),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Levene's test, mean form (r10): homogeneity of variances across ALL
# event types — the diagnostic that decides whether the classic ANOVA
# above is trustworthy (its F assumes equal variances) or whether the
# Welch route is required. Levene = one-way ANOVA applied to the absolute
# deviations z = |v − mean(group)|. Two passes over the scan: group
# means from exact int64 (s, n); per-row deviations quantized to int64 at
# e4 BEFORE any cross-row sum (z4 ≤ 5e8); Σz² accumulates in
# DECIMAL(38,0) (z4² ≤ 2.5e17 per row — int64 would wrap past ~36 rows
# per group; the house decimal-accumulator rule from pq.py), then the
# same quantize-the-between-term ANOVA algebra as profile_anova_oneway.
# --------------------------------------------------------------------------

_LEVENE_ORACLE = """
WITH g AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY event_type
), z AS (
  SELECT e.event_type,
         cast(round(abs(cast(round(e.value * 100) AS BIGINT)
                        - cast(g.s AS DOUBLE) / cast(g.n AS DOUBLE))
                    * 100) AS BIGINT) AS z4
  FROM events e JOIN g ON g.event_type = e.event_type
), zg AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(z4) AS BIGINT) AS s,
         cast(cast(sum(z4 * z4) AS HUGEINT) AS DOUBLE) AS q
  FROM z GROUP BY event_type
), terms AS (
  SELECT n, s, q,
         cast(round(cast(s AS DOUBLE) * cast(s AS DOUBLE)
                    / cast(n AS DOUBLE)) AS BIGINT) AS t
  FROM zg
), agg AS (
  SELECT cast(count(*) AS BIGINT) AS k,
         cast(sum(n) AS BIGINT) AS nn,
         cast(sum(s) AS BIGINT) AS ss,
         sum(q) AS qq,
         cast(sum(t) AS BIGINT) AS tt
  FROM terms
)
SELECT k AS n_groups, nn AS n_total,
       k - 1 AS df_between, nn - k AS df_within,
       round(((cast(tt AS DOUBLE)
               - cast(ss AS DOUBLE) * cast(ss AS DOUBLE) / cast(nn AS DOUBLE))
              / cast(k - 1 AS DOUBLE))
             / ((qq - cast(tt AS DOUBLE)) / cast(nn - k AS DOUBLE)), 6)
         AS levene_w
FROM agg
"""


@register(
    "profile_levene_test",
    oracle=_LEVENE_ORACLE,
    tags=("profile", "stats", "agg"),
)
def profile_levene_test(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
    )
    z4 = F.round(
        F.abs(v - F.col("s").cast("double") / F.col("n").cast("double")) * 100
    ).cast("long")
    z = e.join(F.broadcast(g), "event_type").select(
        "event_type", z4.alias("z4")
    )
    zg = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z4").cast("long").alias("s"),
        # exact decimal accumulator: z4^2 <= 2.5e17 per row wraps int64
        F.sum((F.col("z4") * F.col("z4")).cast("decimal(38,0)"))
        .cast("double")
        .alias("q"),
    )
    term = F.round(
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n").cast("double")
    ).cast("long")
    agg = zg.select("n", "s", "q", term.alias("t")).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum("t").cast("long").alias("tt"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ssb = d("tt") - d("ss") * d("ss") / d("nn")
    ssw = F.col("qq") - d("tt")
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        (F.col("k") - 1).alias("df_between"),
        (F.col("nn") - F.col("k")).alias("df_within"),
        F.round(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("nn") - F.col("k")).cast("double")),
            6,
        ).alias("levene_w"),
    )


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test (r10): is a series random around its median,
# or does it trend/mean-revert? Per event series, each value becomes
# above(1)/below(0) its series median (exact lower-median from the
# ranked distinct-value counts — ties AT the median are dropped, the
# standard convention), a "run" starts wherever the flag changes
# (lag() over the per-series window), and the z statistic compares the
# observed run count with its null mean/variance — all from exact int64
# (n1, n0, runs); doubles only in the final shared expression. Trending
# series produce FEWER runs than chance (z << 0), oscillating series
# more (z >> 0).
# --------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH x AS (
  SELECT event_type AS et, ts, event_id,
         cast(round(value * 100) AS BIGINT) AS v
  FROM events
), med AS (
  SELECT et, cast(median(v) AS DOUBLE) AS md FROM x GROUP BY et
), flagged AS (
  SELECT x.et, x.ts, x.event_id,
         CASE WHEN cast(x.v AS DOUBLE) > med.md THEN 1 ELSE 0 END AS f
  FROM x JOIN med ON med.et = x.et
  WHERE cast(x.v AS DOUBLE) <> med.md
), runs AS (
  SELECT et, f,
         CASE WHEN lag(f) OVER (PARTITION BY et ORDER BY ts, event_id)
                   IS DISTINCT FROM f THEN 1 ELSE 0 END AS new_run
  FROM flagged
), g AS (
  SELECT et,
         cast(sum(f) AS BIGINT) AS n1,
         cast(count(*) - sum(f) AS BIGINT) AS n0,
         cast(sum(new_run) AS BIGINT) AS r
  FROM runs GROUP BY et
)
SELECT et AS event_type, n1 AS n_above, n0 AS n_below, r AS n_runs,
       round((cast(r AS DOUBLE)
              - (cast(2 AS DOUBLE) * cast(n1 AS DOUBLE) * cast(n0 AS DOUBLE)
                 / (cast(n1 AS DOUBLE) + cast(n0 AS DOUBLE))
                 + cast(1 AS DOUBLE)))
             / sqrt((cast(2 AS DOUBLE) * cast(n1 AS DOUBLE) * cast(n0 AS DOUBLE)
                     * (cast(2 AS DOUBLE) * cast(n1 AS DOUBLE)
                        * cast(n0 AS DOUBLE)
                        - cast(n1 AS DOUBLE) - cast(n0 AS DOUBLE)))
                    / ((cast(n1 AS DOUBLE) + cast(n0 AS DOUBLE))
                       * (cast(n1 AS DOUBLE) + cast(n0 AS DOUBLE))
                       * (cast(n1 AS DOUBLE) + cast(n0 AS DOUBLE)
                          - cast(1 AS DOUBLE)))), 6) AS z_stat
FROM g
"""


@register(
    "profile_runs_test",
    oracle=_RUNS_ORACLE,
    tags=("profile", "stats", "window"),
)
def profile_runs_test(spark, sf_dir):
    from pyspark.sql import Window as W

    x = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    med = x.groupBy("et").agg(
        F.median("v").cast("double").alias("md")
    )
    flagged = (
        x.join(F.broadcast(med), "et")
        .where(F.col("v").cast("double") != F.col("md"))
        .select(
            "et",
            "ts",
            "event_id",
            F.when(F.col("v").cast("double") > F.col("md"), 1)
            .otherwise(0)
            .alias("f"),
        )
    )
    w = W.partitionBy("et").orderBy("ts", "event_id")
    runs = flagged.select(
        "et",
        "f",
        F.when(
            ~F.lag("f").over(w).eqNullSafe(F.col("f")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    g = runs.groupBy("et").agg(
        F.sum("f").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("f")).cast("long").alias("n0"),
        F.sum("new_run").cast("long").alias("r"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    two = F.lit(2).cast("double")
    one = F.lit(1).cast("double")
    nn = d("n1") + d("n0")
    mu = two * d("n1") * d("n0") / nn + one
    var = (
        two * d("n1") * d("n0") * (two * d("n1") * d("n0") - d("n1") - d("n0"))
    ) / (nn * nn * (nn - one))
    return g.select(
        F.col("et").alias("event_type"),
        F.col("n1").alias("n_above"),
        F.col("n0").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round((d("r") - mu) / F.sqrt(var), 6).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Gini coefficient (r10): value-concentration per event series — the
# inequality summary (0 = perfectly even, ->1 = one event carries all
# value) every revenue/usage dashboard reports. Uses the rank identity
# G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) on the per-series rank order
# (row_number PARTITIONED by series; order among equal values is
# irrelevant to the sum, so the event_id tie-break is cosmetic). All
# sums exact int64: rank·value ≤ ~4e6·5e4 per row and Σ ≤ ~8e17 at
# sf100 (a larger deployment moves the accumulator to DECIMAL(38,0) per
# the pq.py rule — noted, not needed here). One shared double expression
# per series at the end.
# --------------------------------------------------------------------------

_GINI_ORACLE = """
WITH x AS (
  SELECT event_type AS et,
         cast(round(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cast(round(value * 100) AS BIGINT),
                                     event_id) AS i
  FROM events
), g AS (
  SELECT et,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(v) AS BIGINT) AS s,
         cast(sum(i * v) AS BIGINT) AS ws
  FROM x GROUP BY et
)
SELECT et AS event_type, n, s AS sum_cents,
       round((cast(2 AS DOUBLE) * cast(ws AS DOUBLE)
              - (cast(n AS DOUBLE) + cast(1 AS DOUBLE)) * cast(s AS DOUBLE))
             / (cast(n AS DOUBLE) * cast(s AS DOUBLE)), 6) AS gini
FROM g
"""


@register(
    "profile_gini_coefficient",
    oracle=_GINI_ORACLE,
    tags=("profile", "stats", "window"),
)
def profile_gini_coefficient(spark, sf_dir):
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    w = W.partitionBy("event_type").orderBy(v, "event_id")
    x = e.select(
        F.col("event_type").alias("et"),
        v.alias("v"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    g = x.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("i") * F.col("v")).cast("long").alias("ws"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    two = F.lit(2).cast("double")
    one = F.lit(1).cast("double")
    return g.select(
        F.col("et").alias("event_type"),
        "n",
        F.col("s").alias("sum_cents"),
        F.round(
            (two * d("ws") - (d("n") + one) * d("s")) / (d("n") * d("s")), 6
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation with ties (r12) — the missing nonparametric
# next to KS/Mann-Whitney/ANOVA/Levene/runs: per event series, the rank
# correlation between time and value, i.e. the standard monotonic-trend
# screen (Spearman(ts, value) ~ +-1 = drifting series, ~0 = stationary).
#
# Ties are handled exactly: doubled average ranks 2*cum_less + cnt + 1
# (the Mann-Whitney doubled-rank trick) computed on the DISTINCT-value
# table — per-group cumulative counts come from ONE global two-pass
# running sum ordered by (group, value) minus broadcast per-group
# offsets, so no partitionless window ever sees row-scale data. rho is
# then Pearson over the doubled ranks (the statistically correct form
# under ties): exact int64/DECIMAL(38) moments, one final double-precision
# formula shared textually with the oracle, rounded to 6 dp.
# --------------------------------------------------------------------------

_SPEAR_RHO = (
    "round((cast({n} as double) * cast({sxy} as double)"
    " - cast({sx} as double) * cast({sy} as double))"
    " / nullif(sqrt((cast({n} as double) * cast({sxx} as double)"
    "                - cast({sx} as double) * cast({sx} as double))"
    "               * (cast({n} as double) * cast({syy} as double)"
    "                  - cast({sy} as double) * cast({sy} as double))), 0.0)"
    ", 6)"
)

_SPEARMAN_ORACLE = f"""
WITH pts AS (
  SELECT event_type AS g, epoch_us(ts) AS x,
         cast(round(value * 100) AS BIGINT) AS y
  FROM events
),
dx AS (
  SELECT g, x, cast(count(*) AS BIGINT) AS c FROM pts GROUP BY g, x
),
rx AS (
  SELECT g, x,
         2 * (sum(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1 AS r
  FROM dx
),
dy AS (
  SELECT g, y, cast(count(*) AS BIGINT) AS c FROM pts GROUP BY g, y
),
ry AS (
  SELECT g, y,
         2 * (sum(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1 AS r
  FROM dy
),
ranked AS (
  SELECT pts.g, rx.r AS rx, ry.r AS ry
  FROM pts JOIN rx ON rx.g = pts.g AND rx.x = pts.x
           JOIN ry ON ry.g = pts.g AND ry.y = pts.y
),
mom AS (
  SELECT g, cast(count(*) AS BIGINT) AS n,
         cast(sum(rx) AS BIGINT) AS sx, cast(sum(ry) AS BIGINT) AS sy,
         sum(cast(rx AS HUGEINT) * ry) AS sxy,
         sum(cast(rx AS HUGEINT) * rx) AS sxx,
         sum(cast(ry AS HUGEINT) * ry) AS syy
  FROM ranked GROUP BY g
)
SELECT g AS event_type, n, sx, sy,
       {_SPEAR_RHO.format(n="n", sxy="sxy", sx="sx", sy="sy",
                          sxx="sxx", syy="syy")} AS rho
FROM mom
"""


def _doubled_ranks(pts, col: str):
    """Distinct-value doubled average ranks per group, scale-safe: one
    global two-pass running count over (g, col) minus per-group offsets."""
    from ._util import two_pass_global_window

    d = pts.groupBy("g", col).agg(F.count(F.lit(1)).cast("long").alias("c"))
    run = two_pass_global_window(d, ["g", col], value_col="c", out_col="cum")
    goff = run.groupBy("g").agg(
        (F.max("cum") - F.sum("c")).cast("long").alias("off")
    )
    return (
        run.join(F.broadcast(goff), "g")
        .select(
            "g",
            col,
            (
                2 * (F.col("cum") - F.col("c") - F.col("off"))
                + F.col("c")
                + 1
            ).cast("long").alias("r"),
        )
    )


@register(
    "profile_spearman_trend",
    oracle=_SPEARMAN_ORACLE,
    tags=("agg", "timeseries"),
)
def profile_spearman_trend(spark, sf_dir):
    from ._util import spread

    ev = spread(table(spark, sf_dir, "events"), "event_id")
    pts = ev.select(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    rx = _doubled_ranks(pts, "x").withColumnRenamed("r", "rx")
    ry = _doubled_ranks(pts, "y").withColumnRenamed("r", "ry")
    ranked = pts.join(rx, ["g", "x"]).join(ry, ["g", "y"])
    dec = lambda a, b: F.sum(  # noqa: E731
        (F.col(a).cast("decimal(38,0)") * F.col(b))
    )
    mom = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        dec("rx", "ry").alias("sxy"),
        dec("rx", "rx").alias("sxx"),
        dec("ry", "ry").alias("syy"),
    )
    rho = F.expr(
        _SPEAR_RHO.format(n="n", sxy="sxy", sx="sx", sy="sy", sxx="sxx", syy="syy")
    )
    return mom.select(
        F.col("g").alias("event_type"), "n", "sx", "sy", rho.alias("rho")
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend slope (r12) — the median-of-pairwise-slopes
# estimator (the robust companion to the Spearman trend screen above:
# Spearman says WHETHER a series drifts, Theil-Sen says HOW FAST,
# insensitive to outliers). Computed on the hourly bucket table, so the
# O(T^2) pair join is bounded by the TIME RANGE in hours (~720 buckets
# -> ~260k pairs per series), independent of corpus row count — more
# rows only sharpen the bucket means, they never grow the join. Exact
# integer end to end: bucket means and pair slopes are truncated-division
# micro-cent quantities (oracle mirrors Spark's `div` truncation on
# negative deltas via the abs trick), and the median is the LOWER median
# selected by deterministic row_number over the bounded pair table.
# --------------------------------------------------------------------------

_SEN_ORACLE = """
WITH b AS (
  SELECT event_type AS g, epoch_us(ts) // 3600000000 AS h,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
v AS (SELECT g, h, (s * 1000000) // c AS vm FROM b),
pairs AS (
  SELECT a.g, a.h AS h1, bb.h AS h2,
         CASE WHEN bb.vm - a.vm < 0
              THEN -((a.vm - bb.vm) // (bb.h - a.h))
              ELSE (bb.vm - a.vm) // (bb.h - a.h) END AS slope
  FROM v a JOIN v bb ON bb.g = a.g AND bb.h > a.h
),
ranked AS (
  SELECT g, slope,
         row_number() OVER (PARTITION BY g ORDER BY slope, h1, h2) AS rn,
         count(*) OVER (PARTITION BY g) AS m
  FROM pairs
)
SELECT r.g AS event_type,
       cast((SELECT count(*) FROM v WHERE v.g = r.g) AS BIGINT) AS n_buckets,
       cast(r.m AS BIGINT) AS n_pairs,
       cast(r.slope AS BIGINT) AS sen_slope_micro_per_hour
FROM ranked r WHERE r.rn = (r.m + 1) // 2
"""


@register(
    "ts_theil_sen_slope",
    oracle=_SEN_ORACLE,
    tags=("timeseries", "agg"),
)
def ts_theil_sen_slope(spark, sf_dir):
    from ._util import spread

    ev = spread(table(spark, sf_dir, "events"), "event_id")
    b = ev.groupBy(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    v = b.select("g", "h", F.expr("(s * 1000000) div c").alias("vm"))
    a = v.select("g", F.col("h").alias("h1"), F.col("vm").alias("v1"))
    bb = v.select("g", F.col("h").alias("h2"), F.col("vm").alias("v2"))
    # bounded theta join: <= T(T-1)/2 pairs per series, T = range hours
    pairs = (
        a.join(bb, "g")
        .filter(F.col("h2") > F.col("h1"))
        .select(
            "g",
            "h1",
            "h2",
            F.expr("(v2 - v1) div (h2 - h1)").alias("slope"),
        )
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("g").orderBy("slope", "h1", "h2")
    wm = W.partitionBy("g")
    nb = v.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_buckets"))
    ranked = pairs.withColumn("rn", F.row_number().over(wr)).withColumn(
        "m", F.count(F.lit(1)).over(wm)
    )
    return (
        ranked.filter(F.expr("rn = (m + 1) div 2"))
        .join(F.broadcast(nb), "g")
        .select(
            F.col("g").alias("event_type"),
            "n_buckets",
            F.col("m").cast("long").alias("n_pairs"),
            F.col("slope").cast("long").alias("sen_slope_micro_per_hour"),
        )
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality screen (r13): the moment-based test every
# parametric step above (Welch t, ANOVA, OLS bands) quietly assumes —
# JB = n/6 * (skew^2 + excess_kurtosis^2/4), chi-square(2) under
# normality, rejected at 5% when JB > 5.991465. Protocol: the four
# power sums are EXACT (S1..S3 int64; S4 in decimal(38,0)/HUGEINT —
# cents^4 reaches 1e20), central moments expand from them in one shared
# double expression per engine (no float summation anywhere), and skew/
# kurtosis/JB are quantized at 1e-6. One map-side-combinable corpus
# pass; everything after is series-count-sized.
# --------------------------------------------------------------------------

_JB_CRIT = "5.991465"  # chi2 inv-cdf at p=0.95, df=2

_JB_SKEW = """
  round((cast(s3 AS DOUBLE) / n
         - 3 * (cast(s1 AS DOUBLE) / n) * (cast(s2 AS DOUBLE) / n)
         + 2 * (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n)
             * (cast(s1 AS DOUBLE) / n))
        / pow(cast(s2 AS DOUBLE) / n
              - (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n), 1.5),
        6) AS skew
"""

_JB_KURT = """
  round((cast(s4 AS DOUBLE) / n
         - 4 * (cast(s1 AS DOUBLE) / n) * (cast(s3 AS DOUBLE) / n)
         + 6 * (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n)
             * (cast(s2 AS DOUBLE) / n)
         - 3 * (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n)
             * (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n))
        / ((cast(s2 AS DOUBLE) / n
            - (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n))
           * (cast(s2 AS DOUBLE) / n
              - (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n)))
        - 3, 6) AS kurt_excess
"""

_JB_ORACLE = f"""
WITH x AS (
  SELECT event_type, cast(round(value * 100) AS BIGINT) AS v FROM events
),
m AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n,
         cast(sum(v) AS BIGINT) AS s1,
         cast(sum(v * v) AS BIGINT) AS s2,
         sum(cast(v * v AS HUGEINT) * v) AS s3,
         sum(cast(v * v AS HUGEINT) * cast(v * v AS HUGEINT)) AS s4
  FROM x GROUP BY event_type
),
g AS (SELECT event_type, n, {_JB_SKEW}, {_JB_KURT} FROM m)
SELECT event_type, n, skew, kurt_excess,
       round(n / 6.0 * (skew * skew + kurt_excess * kurt_excess / 4), 6)
         AS jb,
       cast(CASE WHEN n / 6.0 * (skew * skew + kurt_excess * kurt_excess / 4)
                      > {_JB_CRIT} THEN 1 ELSE 0 END AS INTEGER)
         AS reject_normal
FROM g
"""


@register(
    "profile_jarque_bera",
    oracle=_JB_ORACLE,
    tags=("stats", "profile", "timeseries"),
)
def profile_jarque_bera(spark, sf_dir):
    """JB normality screen per event series from exact power sums;
    skew/kurtosis quantized, 5% chi2(2) rejection flag."""
    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    v2 = v * v
    m = e.select(F.col("event_type"), v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
        F.sum(
            (F.col("v") * F.col("v")).cast("decimal(38,0)")
            * F.col("v").cast("decimal(38,0)")
        ).alias("s3"),
        F.sum(
            (F.col("v") * F.col("v")).cast("decimal(38,0)")
            * (F.col("v") * F.col("v")).cast("decimal(38,0)")
        ).alias("s4"),
    )
    g = m.selectExpr("event_type", "n", _JB_SKEW, _JB_KURT)
    jb = F.round(
        F.col("n") / 6.0
        * (
            F.col("skew") * F.col("skew")
            + F.col("kurt_excess") * F.col("kurt_excess") / 4
        ),
        6,
    )
    return g.select(
        "event_type",
        "n",
        "skew",
        "kurt_excess",
        jb.alias("jb"),
        (
            F.col("n") / 6.0
            * (
                F.col("skew") * F.col("skew")
                + F.col("kurt_excess") * F.col("kurt_excess") / 4
            )
            > float(_JB_CRIT)
        )
        .cast("int")
        .alias("reject_normal"),
    )
