"""Corpus distribution-weighting operators (split from
training_extra.py r13, hygiene only): DSIR-style importance weights
(Xie et al. 2023), the importance-RESAMPLING keep/drop step built on
them, and the per-source unigram KL-divergence mix diagnostic. All
log-ratios micro-quantized int64 at the (Heaps-small) vocabulary level
so per-doc sums are exact integers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023): score every document by
# how much more likely its unigrams are under a TARGET distribution (here:
# the English slice — the "domain" being upsampled) than under the raw
# corpus distribution. weight(doc) = mean_tok [ ln p_t(tok) - ln p_r(tok) ],
# Laplace-smoothed over the shared vocabulary so out-of-target tokens are
# defined. Per-token log-ratios are quantized to round(x*1e6) int64 at the
# vocabulary level (broadcast — Heaps-law small), so every per-doc sum is
# exact integer arithmetic; one division + one round at the end, same
# correctly-rounded IEEE ops on both engines.
# --------------------------------------------------------------------------

_DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
v AS (SELECT cast(count(*) AS BIGINT) AS nv,
             cast(sum(cr) AS BIGINT) AS tr FROM vocab),
tgt AS (
  SELECT tok, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY tok
),
tt AS (SELECT cast(count(*) AS BIGINT) AS t FROM toks WHERE lang = 'en'),
lp AS (
  SELECT vocab.tok,
         cast(round((ln((coalesce(tgt.ct, 0) + 1)
                        / cast(tt.t + v.nv AS DOUBLE))
                     - ln((vocab.cr + 1) / cast(v.tr + v.nv AS DOUBLE)))
                    * 1000000) AS BIGINT) AS lq6
  FROM vocab LEFT JOIN tgt ON vocab.tok = tgt.tok, tt, v
),
ds AS (
  SELECT t.doc_id, max(t.source) AS source,
         cast(sum(l.lq6) AS BIGINT) AS s, count(*) AS n_tok
  FROM toks t JOIN lp l ON t.tok = l.tok
  GROUP BY t.doc_id
),
sc AS (
  SELECT source, round(s / cast(n_tok * 1000000 AS DOUBLE), 6) AS w FROM ds
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_upweighted,
       round(min(w), 6) AS min_w,
       round(max(w), 6) AS max_w
FROM sc
GROUP BY source
"""


@register("text_dsir_weights", oracle=_DSIR_ORACLE, tags=("text", "training"))
def text_dsir_weights(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cr"))
    v = vocab.agg(
        F.count(F.lit(1)).alias("nv"), F.sum("cr").cast("long").alias("tr")
    )
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tt = toks.filter(F.col("lang") == "en").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    lp = (
        vocab.join(tgt, "tok", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(v))
        .select(
            "tok",
            F.round(
                (
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1)
                        / (F.col("t") + F.col("nv")).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1)
                        / (F.col("tr") + F.col("nv")).cast("double")
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("lq6"),
        )
    )
    ds = (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.max("source").alias("source"),
            F.sum("lq6").cast("long").alias("s"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    sc = ds.select(
        "source",
        F.round(
            F.col("s") / (F.col("n_tok") * 1000000).cast("double"), 6
        ).alias("w"),
    )
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_upweighted"),
        F.round(F.min("w"), 6).alias("min_w"),
        F.round(F.max("w"), 6).alias("max_w"),
    )


# --------------------------------------------------------------------------
# Importance RESAMPLING: the second half of DSIR — turn the per-document
# target/corpus log-ratio weight into an actual keep/drop decision, giving
# a corpus thinned toward the target domain. The acceptance rate is a
# linear ramp on the int64-quantized weight (rate_k/16, rate_k =
# clamp(16 + w6/250000, 0, 16) — weight 0 or better keeps everything,
# -4.0 nats or worse drops everything), quantized to sixteenths so the
# decision reuses the repo's md5-nibble Bernoulli idiom: no RNG state, no
# float threshold comparison at the keep boundary, identical rows kept on
# every engine and every rerun. One broadcast-model join + one group-by,
# same scale shape as the weight computation itself.
# --------------------------------------------------------------------------

_RESAMPLE_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
v AS (SELECT cast(count(*) AS BIGINT) AS nv,
             cast(sum(cr) AS BIGINT) AS tr FROM vocab),
tgt AS (
  SELECT tok, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY tok
),
tt AS (SELECT cast(count(*) AS BIGINT) AS t FROM toks WHERE lang = 'en'),
lp AS (
  SELECT vocab.tok,
         cast(round((ln((coalesce(tgt.ct, 0) + 1)
                        / cast(tt.t + v.nv AS DOUBLE))
                     - ln((vocab.cr + 1) / cast(v.tr + v.nv AS DOUBLE)))
                    * 1000000) AS BIGINT) AS lq6
  FROM vocab LEFT JOIN tgt ON vocab.tok = tgt.tok, tt, v
),
ds AS (
  SELECT t.doc_id, max(t.lang) AS lang,
         cast(sum(l.lq6) AS BIGINT) AS s6, count(*) AS n_tok
  FROM toks t JOIN lp l ON t.tok = l.tok
  GROUP BY t.doc_id
),
rated AS (
  SELECT doc_id, lang,
         greatest(0, least(16, cast(floor(
             16 + s6 / (n_tok * cast(250000 AS DOUBLE))) AS INTEGER)))
             AS rate_k
  FROM ds
),
kept AS (
  SELECT doc_id, lang, rate_k,
         substr(md5(cast(doc_id AS VARCHAR)), 1, 1)
           < substr('0123456789abcdefg', rate_k + 1, 1) AS keep
  FROM rated
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       cast(sum(rate_k) AS BIGINT) AS sum_rate_k
FROM kept
GROUP BY lang
"""


@register(
    "sample_importance_resample",
    oracle=_RESAMPLE_ORACLE,
    tags=("sample", "training"),
)
def sample_importance_resample(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cr"))
    v = vocab.agg(
        F.count(F.lit(1)).alias("nv"), F.sum("cr").cast("long").alias("tr")
    )
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tt = toks.filter(F.col("lang") == "en").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    lp = (
        vocab.join(tgt, "tok", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(v))
        .select(
            "tok",
            F.round(
                (
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1)
                        / (F.col("t") + F.col("nv")).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1)
                        / (F.col("tr") + F.col("nv")).cast("double")
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("lq6"),
        )
    )
    ds = (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.sum("lq6").cast("long").alias("s6"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    rated = ds.select(
        "doc_id",
        "lang",
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(16),
                F.floor(
                    16
                    + F.col("s6")
                    / (F.col("n_tok") * F.lit(250000).cast("double"))
                ).cast("int"),
            ),
        ).alias("rate_k"),
    )
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thresh = F.substring(F.lit("0123456789abcdefg"), F.col("rate_k") + 1, 1)
    kept = rated.withColumn("keep", nibble < thresh)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum("rate_k").cast("long").alias("sum_rate_k"),
    )


# --------------------------------------------------------------------------
# Per-source unigram KL divergence (r10): KL(P_source || P_corpus) over
# the shared Laplace-smoothed vocabulary — the corpus-mix diagnostic that
# quantifies how far each source's token distribution sits from the blend
# (the number a temperature-mixing policy is reacting to). Same exactness
# scheme as text_dsir_weights directly above: all probabilities derive
# from exact int64 counts; the per-(source, token) term
# p_s·ln(p_s/p_c) is quantized to nano-nats BEFORE the cross-vocabulary
# sum, so the per-source KL is an exact integer sum (vocab is Heaps-law
# small; |term| ≤ ~1e9·1e5 rows per source stays far inside int64). The
# (source × vocab) grid is vocab crossJoin broadcast(distinct sources) —
# source cardinality is constant-bounded, so the grid is linear in vocab.
# --------------------------------------------------------------------------

_KL_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, cast(count(*) AS BIGINT) AS cr FROM toks GROUP BY tok),
v AS (SELECT cast(count(*) AS BIGINT) AS nv,
             cast(sum(cr) AS BIGINT) AS tr FROM vocab),
srcs AS (SELECT DISTINCT source FROM documents),
st AS (
  SELECT source, cast(count(*) AS BIGINT) AS ts_n FROM toks GROUP BY source
),
sc AS (
  SELECT source, tok, cast(count(*) AS BIGINT) AS cs
  FROM toks GROUP BY source, tok
),
grid AS (
  SELECT s.source, vb.tok, vb.cr,
         coalesce(c.cs, 0) AS cs, st.ts_n, v.nv, v.tr
  FROM vocab vb
  CROSS JOIN srcs s
  LEFT JOIN sc c ON c.source = s.source AND c.tok = vb.tok
  JOIN st ON st.source = s.source, v
),
terms AS (
  SELECT source,
         cast(round(((cs + 1) / cast(ts_n + nv AS DOUBLE))
                    * ln(((cs + 1) / cast(ts_n + nv AS DOUBLE))
                         / ((cr + 1) / cast(tr + nv AS DOUBLE)))
                    * 1000000000) AS BIGINT) AS t9
  FROM grid
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_vocab,
       round(cast(sum(t9) AS BIGINT)
             / cast(1000000000 AS DOUBLE), 6) AS kl_nats
FROM terms GROUP BY source
"""


@register(
    "text_source_kl_divergence",
    oracle=_KL_ORACLE,
    tags=("text", "training", "stats"),
)
def text_source_kl_divergence(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    v = vocab.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.sum("cr").cast("long").alias("tr"),
    )
    srcs = d.select("source").distinct()  # constant-bounded aggregate
    st = toks.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("ts_n"))
    sc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    grid = (
        vocab.crossJoin(F.broadcast(srcs))
        .join(sc, ["source", "tok"], "left")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(v))
        .select(
            "source",
            F.coalesce("cs", F.lit(0)).alias("cs"),
            "cr",
            "ts_n",
            "nv",
            "tr",
        )
    )
    p_s = (F.col("cs") + 1) / (F.col("ts_n") + F.col("nv")).cast("double")
    p_c = (F.col("cr") + 1) / (F.col("tr") + F.col("nv")).cast("double")
    t9 = F.round(p_s * F.log(p_s / p_c) * 1000000000).cast("long")
    return (
        grid.select("source", t9.alias("t9"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
            F.round(
                F.sum("t9").cast("double") / F.lit(1000000000).cast("double"), 6
            ).alias("kl_nats"),
        )
    )
