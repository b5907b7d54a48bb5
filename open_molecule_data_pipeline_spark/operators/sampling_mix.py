"""Training-corpus mixing and selection operators (split from
training_extra.py r13, hygiene only): temperature-weighted source
mixing, nucleus (top-p) corpus selection, deterministic shuffle/shard
export, and exact largest-remainder quota apportionment. All sampling
is deterministic md5-nibble Bernoulli / hex-rank — no RNG state, same
rows every run and engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


_ALPHA_DOC = "rate_k = floor(16 * sqrt(n_source / n_max))"  # alpha = 0.5

_TEMPERATURE_ORACLE = """
WITH counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
m AS (SELECT max(n) AS mx FROM counts),
rated AS (
  SELECT source, n,
         cast(floor(16 * sqrt(n / cast(m.mx AS DOUBLE))) AS INTEGER) AS rate_k
  FROM counts, m
),
kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN rated r ON d.source = r.source
  WHERE substr(md5(cast(d.doc_id AS VARCHAR)), 1, 1)
        < substr('0123456789abcdefg', r.rate_k + 1, 1)
  GROUP BY d.source
)
SELECT r.source,
       cast(r.n AS BIGINT) AS n_total,
       cast(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       r.rate_k
FROM rated r LEFT JOIN kept k ON r.source = k.source
"""


@register(
    "sample_temperature_mix",
    oracle=_TEMPERATURE_ORACLE,
    tags=("sample", "training"),
)
def sample_temperature_mix(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("mx"))
    rated = counts.crossJoin(F.broadcast(mx)).select(
        "source",
        "n",
        F.floor(
            16 * F.sqrt(F.col("n") / F.col("mx").cast("double"))
        ).cast("int").alias("rate_k"),
    )
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thresh = F.substring(F.lit("0123456789abcdefg"), F.col("rate_k") + 1, 1)
    kept = (
        d.join(F.broadcast(rated), "source")
        .filter(nibble < thresh)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rated.join(F.broadcast(kept), "source", "left").select(
        "source",
        F.col("n").cast("long").alias("n_total"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        "rate_k",
    )


# --------------------------------------------------------------------------
# Nucleus (top-p) corpus selection: per language, keep the highest-quality
# documents until their cumulative mass reaches p of the language total —
# the "quality nucleus" cut used to skim the best slice of a crawl (quality
# proxy here: n_chars; in production a model score column, same plan). The
# keep predicate 2 * mass_before < total is pure int64 — no float
# thresholds to disagree on. The running sum partitions by lang; at real
# scale the same two-pass rewrite as two_pass_global_window applies within
# each language (range-partition on the sort key, broadcast per-partition
# offsets), which keeps any one task's window bounded.
# --------------------------------------------------------------------------

_TOPP_NUM = 1  # p = _TOPP_NUM / _TOPP_DEN of total mass per language
_TOPP_DEN = 2

_NUCLEUS_ORACLE = f"""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(n_chars) OVER (PARTITION BY lang) AS total,
         count(*) OVER (PARTITION BY lang) AS n_total
  FROM documents
)
SELECT lang,
       cast(n_total AS BIGINT) AS n_docs,
       cast(count(*) AS BIGINT) AS n_selected,
       cast(sum(n_chars) AS BIGINT) AS chars_selected,
       round(sum(n_chars) * 100.0 / total, 6) AS pct_of_mass
FROM ranked
WHERE (cum - n_chars) * {_TOPP_DEN} < total * {_TOPP_NUM}
GROUP BY lang, total, n_total
"""


@register(
    "sample_nucleus_topp", oracle=_NUCLEUS_ORACLE, tags=("sample", "training")
)
def sample_nucleus_topp(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w_run = (
        W.partitionBy("lang")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("lang")
    ranked = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w_run).alias("cum"),
        F.sum("n_chars").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_total"),
    )
    kept = ranked.filter(
        (F.col("cum") - F.col("n_chars")) * _TOPP_DEN
        < F.col("total") * _TOPP_NUM
    )
    return kept.groupBy("lang", "total", "n_total").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_chars").alias("chars_selected"),
        F.round(F.sum("n_chars") * 100.0 / F.col("total"), 6).alias(
            "pct_of_mass"
        ),
    ).select(
        "lang",
        F.col("n_total").alias("n_docs"),
        "n_selected",
        "chars_selected",
        "pct_of_mass",
    )


# --------------------------------------------------------------------------
# Deterministic training shuffle + sharding: the export step that turns a
# curated corpus into N training shards with a reproducible pseudo-random
# order (order by md5 — a fixed uniform permutation, identical on every
# run and every engine, no RNG state to coordinate across executors).
# Per-shard windows are partitioned by shard (the parallel unit — a real
# export uses thousands of shards, so no global window ever forms) and the
# order checksum folds each doc's shard position into an exact int64 so a
# hash match PROVES byte-identical shard ordering, not just membership.
# --------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
WITH h AS (
  SELECT doc_id, n_chars,
         md5(cast(doc_id AS VARCHAR)) AS hx
  FROM documents
),
sh AS (
  SELECT doc_id, n_chars, hx,
         (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8 AS shard
  FROM h
),
pos AS (
  SELECT shard, doc_id, n_chars, hx,
         row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS rn
  FROM sh
)
SELECT cast(shard AS INTEGER) AS shard,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum((doc_id * rn) % 1000003) AS BIGINT) AS order_checksum,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       cast(min_by(doc_id, hx) AS BIGINT) AS first_doc
FROM pos
GROUP BY shard
"""


@register(
    "sample_shuffle_shards", oracle=_SHUFFLE_ORACLE, tags=("sample", "training")
)
def sample_shuffle_shards(spark, sf_dir):
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string"))
    sh = d.select(
        "doc_id",
        "n_chars",
        hx.alias("hx"),
        ((F.instr(F.lit("0123456789abcdef"), F.substring(hx, 1, 1)) - 1) % 8)
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    pos = sh.withColumn("rn", F.row_number().over(w))
    return pos.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("doc_id") * F.col("rn")) % 1000003)
        .cast("long")
        .alias("order_checksum"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min_by("doc_id", "hx").cast("long").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Largest-remainder (Hamilton) quota apportionment (r12) — the exact-
# composition step a mixture RATE (sample_temperature_mix) cannot give:
# given a batch budget of N examples and per-language corpus weights,
# integer per-language quotas that sum to EXACTLY N. base = floor(N*w/W);
# the N - sum(base) leftover seats go to the largest remainders
# (N*w mod W, ties by language — both engines compare identical int64s,
# so the apportionment is deterministic). The whole computation runs on
# the language-count table (bounded); the corpus cost is one groupBy.
# --------------------------------------------------------------------------

_QUOTA_N = 1000

_QUOTA_ORACLE = f"""
WITH w AS (
  SELECT lang, cast(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT cast(sum(n_docs) AS BIGINT) AS W FROM w),
base AS (
  SELECT lang, n_docs,
         ({_QUOTA_N} * n_docs) // tot.W AS base_q,
         ({_QUOTA_N} * n_docs) % tot.W AS rem
  FROM w, tot
),
r AS (SELECT {_QUOTA_N} - cast(sum(base_q) AS BIGINT) AS seats FROM base),
ranked AS (
  SELECT lang, n_docs, base_q, rem,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM base
)
SELECT lang, n_docs, cast(base_q AS BIGINT) AS base_q,
       cast(base_q + CASE WHEN rk <= r.seats THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked, r
"""


@register(
    "sample_quota_largest_remainder",
    oracle=_QUOTA_ORACLE,
    tags=("sample", "agg"),
)
def sample_quota_largest_remainder(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    w = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tot = w.agg(F.sum("n_docs").cast("long").alias("W"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"({_QUOTA_N} * n_docs) div W").alias("base_q"),
        F.expr(f"({_QUOTA_N} * n_docs) % W").alias("rem"),
    )
    seats = base.agg(
        (F.lit(_QUOTA_N) - F.sum("base_q")).cast("long").alias("seats")
    )
    # remainder rank WITHOUT a global window (the repo bans partitionless
    # windows outright): broadcast theta self-join over the bounded
    # language table — rk = 1 + |rows strictly ahead in (rem DESC, lang)|,
    # the text_zipf_coverage rank pattern
    other = base.select(
        F.col("lang").alias("o_lang"), F.col("rem").alias("o_rem")
    )
    rk = (
        base.join(
            F.broadcast(other),
            (F.col("o_rem") > F.col("rem"))
            | ((F.col("o_rem") == F.col("rem")) & (F.col("o_lang") < F.col("lang"))),
            "left",
        )
        .groupBy("lang", "n_docs", "base_q", "rem")
        .agg((F.count("o_lang") + 1).cast("long").alias("rk"))
    )
    return (
        rk
        .crossJoin(F.broadcast(seats))
        .select(
            "lang",
            "n_docs",
            F.col("base_q").cast("long").alias("base_q"),
            (
                F.col("base_q")
                + (F.col("rk") <= F.col("seats")).cast("long")
            ).cast("long").alias("quota"),
        )
    )


# --------------------------------------------------------------------------
# Neyman optimal allocation (r13): the variance-weighted upgrade of the
# Hamilton quota above — survey sampling's optimal stratified design
# (Neyman 1934) puts sample where the VARIANCE is, n_h ~ N_h * S_h, not
# where the rows are. Integer-exact protocol: per stratum the population
# std of cents-quantized value is s_milli = round(sqrt((N*Q - S^2)/N^2)
# * 1000) (exact power sums; one sqrt + one division, bit-identical),
# the Neyman weight is the int64 N_h * s_milli, and the largest-remainder
# apportionment then runs in PURE INTEGER arithmetic exactly as in
# sample_quota_largest_remainder. One corpus pass (the moments agg);
# everything after is stratum-table-sized. The allocated n_h feed the
# proven hash-top-k-per-group applier.
# --------------------------------------------------------------------------

_NEYMAN_N = 200

_NEYMAN_ORACLE = f"""
WITH m AS (
  SELECT event_type AS stratum,
         cast(count(*) AS BIGINT) AS n_rows,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(sum(cast(round(value * 100) AS BIGINT)
                  * cast(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1
),
w AS (
  SELECT stratum, n_rows,
         cast(round(sqrt(cast(n_rows * q - s * s AS DOUBLE)
                         / (cast(n_rows AS DOUBLE) * cast(n_rows AS DOUBLE)))
                    * 1000) AS BIGINT) AS std_milli
  FROM m
),
ww AS (SELECT stratum, n_rows, std_milli, n_rows * std_milli AS wt FROM w),
tot AS (SELECT cast(sum(wt) AS BIGINT) AS W FROM ww),
base AS (
  SELECT stratum, n_rows, std_milli, wt,
         ({_NEYMAN_N} * wt) // tot.W AS base_q,
         ({_NEYMAN_N} * wt) % tot.W AS rem
  FROM ww, tot
),
r AS (SELECT {_NEYMAN_N} - cast(sum(base_q) AS BIGINT) AS seats FROM base),
ranked AS (
  SELECT stratum, n_rows, std_milli, wt, base_q, rem,
         row_number() OVER (ORDER BY rem DESC, stratum) AS rk
  FROM base
)
SELECT stratum, n_rows, std_milli, cast(wt AS BIGINT) AS weight,
       cast(base_q AS BIGINT) AS base_q,
       cast(base_q + CASE WHEN rk <= r.seats THEN 1 ELSE 0 END AS BIGINT)
         AS n_alloc
FROM ranked, r
"""


@register(
    "sample_neyman_allocation",
    oracle=_NEYMAN_ORACLE,
    tags=("sample", "agg", "stats"),
)
def sample_neyman_allocation(spark, sf_dir):
    """Variance-optimal stratified sample sizes (n_h ~ N_h * S_h) by
    integer largest-remainder apportionment over quantized std weights."""
    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    m = e.groupBy(F.col("event_type").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(v).cast("long").alias("s"),
        F.sum(v * v).cast("long").alias("q"),
    )
    return neyman_from_moments(m)


def neyman_from_moments(m):
    """Apportionment from the (stratum, n_rows, s, q) moments table —
    shared by the batch query and its streaming twin (the moments are
    the entire sufficient statistic, so the stream carries 5 rows of
    state and this runs after completion)."""
    w = m.select(
        "stratum",
        "n_rows",
        F.round(
            F.sqrt(
                (F.col("n_rows") * F.col("q") - F.col("s") * F.col("s")).cast(
                    "double"
                )
                / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
            )
            * 1000
        )
        .cast("long")
        .alias("std_milli"),
    ).withColumn("wt", F.col("n_rows") * F.col("std_milli"))
    tot = w.agg(F.sum("wt").cast("long").alias("W"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "std_milli",
        "wt",
        F.expr(f"({_NEYMAN_N} * wt) div W").alias("base_q"),
        F.expr(f"({_NEYMAN_N} * wt) % W").alias("rem"),
    )
    seats = base.agg(
        (F.lit(_NEYMAN_N) - F.sum("base_q")).cast("long").alias("seats")
    )
    # remainder rank via the broadcast theta self-join (no partitionless
    # window — same pattern as sample_quota_largest_remainder above)
    other = base.select(
        F.col("stratum").alias("o_st"), F.col("rem").alias("o_rem")
    )
    ranked = (
        base.join(
            F.broadcast(other),
            (F.col("o_rem") > F.col("rem"))
            | (
                (F.col("o_rem") == F.col("rem"))
                & (F.col("o_st") < F.col("stratum"))
            ),
            "left",
        )
        .groupBy("stratum", "n_rows", "std_milli", "wt", "base_q", "rem")
        .agg((F.count("o_st") + 1).cast("long").alias("rk"))
    )
    return (
        ranked
        .crossJoin(F.broadcast(seats))
        .select(
            "stratum",
            "n_rows",
            "std_milli",
            F.col("wt").cast("long").alias("weight"),
            F.col("base_q").cast("long"),
            (
                F.col("base_q")
                + F.when(F.col("rk") <= F.col("seats"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_alloc"),
        )
    )


# --------------------------------------------------------------------------
# Experiment assignment + SRM check (r13): the two-step every A/B
# platform runs — deterministically bucket users into arms (md5 of the
# user id: stable across sessions, engines, and reruns; no assignment
# table to store), then test the realized arm counts against the
# intended split with the chi-square SAMPLE-RATIO-MISMATCH check. SRM
# is the canary for broken randomization (biased hash, filtered
# traffic, crash-looping arm): an experiment failing it is invalid
# regardless of its metric lift. Intended split 50/25/25 via hex-nibble
# ranges (8/4/4 of 16 — exact rational expectations, no float split
# points). Chi2 quantized per-arm before the 3-term sum (lsum playbook);
# the 5% threshold at df=2 is 5.991465.
# --------------------------------------------------------------------------

_SRM_ARMS = (("control", 0, 8), ("treat_a", 8, 12), ("treat_b", 12, 16))

_SRM_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
assigned AS (
  SELECT user_id,
         strpos('0123456789abcdef',
                substr(md5(cast(user_id AS VARCHAR)), 1, 1)) - 1 AS nib
  FROM u
),
observed AS (
  SELECT CASE WHEN nib < 8 THEN 'control'
              WHEN nib < 12 THEN 'treat_a' ELSE 'treat_b' END AS arm,
         cast(count(*) AS BIGINT) AS n
  FROM assigned GROUP BY 1
),
-- a completely EMPTY arm is the most extreme mismatch and must still
-- contribute its (0 - e)^2/e term: join onto the intended-arm spine
arms AS (
  SELECT s.arm, coalesce(o.n, 0) AS n
  FROM (VALUES ('control'), ('treat_a'), ('treat_b')) s(arm)
  LEFT JOIN observed o ON o.arm = s.arm
),
tot AS (SELECT cast(sum(n) AS BIGINT) AS nt FROM arms),
expect AS (
  SELECT a.arm, a.n,
         CASE a.arm WHEN 'control' THEN tot.nt * 8.0 / 16
                    WHEN 'treat_a' THEN tot.nt * 4.0 / 16
                    ELSE tot.nt * 4.0 / 16 END AS e
  FROM arms a, tot
),
q AS (
  SELECT arm, n, cast(round(e * 100) AS BIGINT) AS e_cents,
         cast(round((n - e) * (n - e) / e * 1000000000) AS BIGINT) AS q9
  FROM expect
),
chi AS (SELECT cast(sum(q9) AS BIGINT) AS s FROM q)
SELECT q.arm, q.n, q.e_cents,
       round(chi.s / 1000000000.0, 6) AS srm_chi2,
       cast(CASE WHEN chi.s / 1000000000.0 > 5.991465
                 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
FROM q, chi
"""


@register("sample_srm_check", oracle=_SRM_ORACLE, tags=("sample", "stats"))
def sample_srm_check(spark, sf_dir):
    """Deterministic 50/25/25 md5 arm assignment over distinct users +
    the chi-square sample-ratio-mismatch check against the intended
    split (per-arm contributions quantized before the sum)."""
    u = table(spark, sf_dir, "events").select("user_id").distinct()
    nib = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - 1
    )
    arm = (
        F.when(nib < 8, "control").when(nib < 12, "treat_a").otherwise("treat_b")
    )
    observed = u.select(arm.alias("arm")).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # empty arms still owe their (0 - e)^2/e term: intended-arm spine
    spine = u.sparkSession.createDataFrame(
        [(a,) for a, _, _ in _SRM_ARMS], "arm string"
    )
    arms = spine.join(observed, "arm", "left").select(
        "arm", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    tot = arms.agg(F.sum("n").cast("long").alias("nt"))
    e = (
        F.when(F.col("arm") == "control", F.col("nt") * 8.0 / 16)
        .when(F.col("arm") == "treat_a", F.col("nt") * 4.0 / 16)
        .otherwise(F.col("nt") * 4.0 / 16)
    )
    q = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        F.round(e * 100).cast("long").alias("e_cents"),
        F.round((F.col("n") - e) * (F.col("n") - e) / e * 1_000_000_000)
        .cast("long")
        .alias("q9"),
    )
    chi = q.agg(F.sum("q9").cast("long").alias("s"))
    return q.crossJoin(F.broadcast(chi)).select(
        "arm",
        "n",
        "e_cents",
        F.round(F.col("s") / 1_000_000_000.0, 6).alias("srm_chi2"),
        (F.col("s") / 1_000_000_000.0 > 5.991465).cast("int").alias("srm_flag"),
    )
