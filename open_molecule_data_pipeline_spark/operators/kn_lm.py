"""Kneser-Ney bigram LM + perplexity filter (r13, VERDICT r12 #3):
CCNet/RedPajama filter corpora on a SMOOTHED n-gram LM, not a unigram —
this closes the fidelity gap at the same plan shape as
``text_unigram_ppl_filter`` (unigram_lm.py).

Model (interpolated Kneser-Ney with absolute discount D = 0.75):

    P(w2|w1) = (c(w1,w2) - D) / c(w1)  +  lambda(w1) * P_cont(w2)
    lambda(w1) = D * N1+(w1,*) / c(w1)         (mass freed by discounting)
    P_cont(w2) = N1+(*,w2) / N1+(*,*)          (continuation probability)

where N1+ counts DISTINCT bigram types. Training and scoring share the
corpus (the same self-scoring contract as the unigram filter), so every
scored bigram is seen: c(w1,w2) >= 1 > D and the max(c-D, 0) branch of
the textbook formula never activates — documented, and P < 1 strictly,
so every per-bigram cost is a positive integer after micro-quantization.

Scale design: bigrams are built MAP-SIDE from the split-token array
(``arrays_zip`` of two slices — zero shuffle, no positional self-join),
then ONE partial-aggregated groupBy(w1,w2) pass is the corpus-side
model cost; every other model table (history counts, continuation
counts, the bigram-type total) derives from the distinct-bigram table,
which is Heaps-sublinear in corpus size. Scoring is one
(doc, w1, w2) partial agg joined to the per-bigram cost table — the
join is NOT hint-broadcast: distinct bigram types at 100 TB outgrow
any broadcast budget, so the plan leaves AQE free to pick broadcast at
small scale and a plain hash join at large (the one deliberate shape
difference from the unigram filter's broadcast word-cost table).

All log-probabilities are micro-quantized int64 (``round(-ln(P)*1e6)``)
from identical rational inputs on both engines — the unigram-LM /
naive-bayes precedent; integer sums from there on.

Scoring contract: a document's first token is not scored (no history);
documents with fewer than two tokens produce no bigrams and are
excluded. ``mean_nll_micro`` uses truncated division (both engines
truncate; the numerator is a sum of positives).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

_D = 0.75  # absolute discount
_KN_TOP_MODEL = 20  # bigrams emitted by the model query
_KN_TOP_DOCS = 15  # docs emitted by the filter (unigram filter's shape)

# shared SQL: the bigram stream + model tables (DuckDB side)
_KN_CTES = """
lf AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(2, len(t) + 1), i -> t[i - 1])) AS w1,
         unnest(list_transform(range(2, len(t) + 1), i -> t[i])) AS w2
  FROM lf
),
big AS (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
),
hist AS (
  SELECT w1, cast(sum(c12) AS BIGINT) AS c1,
         cast(count(*) AS BIGINT) AS n1p
  FROM big GROUP BY w1
),
cont AS (
  SELECT w2, cast(count(*) AS BIGINT) AS npre FROM big GROUP BY w2
),
nb AS (SELECT cast(count(*) AS BIGINT) AS nbig FROM big),
cost AS (
  SELECT b.w1, b.w2, b.c12, h.c1, h.n1p, c.npre,
         cast(round(-ln(
           (cast(b.c12 AS DOUBLE) - 0.75) / cast(h.c1 AS DOUBLE)
           + 0.75 * cast(h.n1p AS DOUBLE) / cast(h.c1 AS DOUBLE)
             * cast(c.npre AS DOUBLE) / cast(nb.nbig AS DOUBLE)
         ) * 1000000) AS BIGINT) AS cost_micro
  FROM big b
  JOIN hist h ON b.w1 = h.w1
  JOIN cont c ON b.w2 = c.w2, nb
)
"""

_MODEL_ORACLE = f"""
WITH {_KN_CTES}
SELECT w1, w2, c12, c1, n1p AS n1p_w1, npre AS npre_w2, cost_micro
FROM cost
ORDER BY c12 DESC, w1, w2
LIMIT {_KN_TOP_MODEL}
"""

_PPL_ORACLE = f"""
WITH {_KN_CTES},
dbg AS (
  SELECT doc_id, lang, w1, w2, cast(count(*) AS BIGINT) AS c
  FROM bg GROUP BY doc_id, lang, w1, w2
),
per_doc AS (
  SELECT d.doc_id, d.lang,
         cast(sum(d.c) AS BIGINT) AS n_bigrams,
         cast(sum(d.c * cost.cost_micro) AS BIGINT) AS nll_micro
  FROM dbg d JOIN cost ON cost.w1 = d.w1 AND cost.w2 = d.w2
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_bigrams, nll_micro,
       nll_micro // n_bigrams AS mean_nll_micro
FROM per_doc
ORDER BY mean_nll_micro DESC, doc_id
LIMIT {_KN_TOP_DOCS}
"""


def _bigram_stream(spark, sf_dir):
    """(doc_id, lang, w1, w2) bigram stream, built map-side from the
    token array — no shuffle, no positional self-join."""
    d = spread(
        table(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        "doc_id",
    )
    return (
        d.withColumn(
            "t", F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        )
        .filter(F.size("t") >= 2)
        .withColumn(
            "bg",
            F.expr(
                "arrays_zip(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1))"
            ),
        )
        .select(
            "doc_id",
            "lang",
            F.explode("bg").alias("p"),
        )
        .select(
            "doc_id", "lang", F.col("p.0").alias("w1"), F.col("p.1").alias("w2")
        )
    )


def _cost_table(bg):
    """Per-bigram KN cost table from the bigram stream (all derived
    tables live on the distinct-bigram table, Heaps-sublinear)."""
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    hist = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("npre"))
    nb = big.agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    return (
        big.join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nb))
        .withColumn(
            "cost_micro",
            F.round(
                -F.log(
                    (F.col("c12").cast("double") - F.lit(_D)) / F.col("c1")
                    + F.lit(_D) * F.col("n1p") / F.col("c1")
                    * F.col("npre") / F.col("nbig")
                )
                * 1_000_000
            ).cast("long"),
        )
    )


@register(
    "text_kn_bigram_model",
    oracle=_MODEL_ORACLE,
    tags=("text", "training"),
)
def text_kn_bigram_model(spark, sf_dir):
    """Top bigrams under the trained KN model with their count
    decomposition — the inspection view of the trainer."""
    cost = _cost_table(_bigram_stream(spark, sf_dir))
    return (
        cost.select(
            "w1",
            "w2",
            "c12",
            "c1",
            F.col("n1p").alias("n1p_w1"),
            F.col("npre").alias("npre_w2"),
            "cost_micro",
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(_KN_TOP_MODEL)
    )


@register(
    "text_kn_bigram_ppl",
    oracle=_PPL_ORACLE,
    tags=("text", "training"),
)
def text_kn_bigram_ppl(spark, sf_dir):
    """CCNet-fidelity perplexity filter: per-doc mean NLL under the
    interpolated KN bigram LM; worst (highest-perplexity) docs first."""
    bg = _bigram_stream(spark, sf_dir)
    cost = _cost_table(bg).select("w1", "w2", "cost_micro")
    dbg = bg.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = (
        dbg.join(cost, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("cost_micro"))
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "nll_micro",
            F.expr("nll_micro div n_bigrams").alias("mean_nll_micro"),
        )
        .orderBy(F.desc("mean_nll_micro"), "doc_id")
        .limit(_KN_TOP_DOCS)
    )


# --------------------------------------------------------------------------
# Held-out KN scoring with the FULL backoff ladder (r13): the self-scoring
# filter above never exercises the textbook max(c-D, 0) = 0 branch. Here
# the model trains on EVEN doc_ids and scores ODD docs, so every backoff
# branch executes and is driver-counted:
#
#   seen bigram:              P = (c12-D)/c1 + lam(w1)*Pcont(w2)
#   unseen pair, seen w1:     P = lam(w1)*Pcont(w2)        (discount mass)
#   unseen history w1:        P = Pcont(w2)                (pure backoff)
#   w2 never a continuation:  P = 1/(nbig+1)               (UNK floor)
#
# Output is the per-language accounting: how many scored bigrams hit each
# branch plus the exact integer NLL — the held-out-perplexity shape CCNet
# actually runs (train on Wikipedia, score the crawl). The synthetic
# corpus shares its vocabulary across docs, so hist/unk counts are ~0
# there; a hand fixture in pytest drives all four branches with
# hand-computed costs.
# --------------------------------------------------------------------------

_OOV_ORACLE = """
WITH lf AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(2, len(t) + 1), i -> t[i - 1])) AS w1,
         unnest(list_transform(range(2, len(t) + 1), i -> t[i])) AS w2
  FROM lf
),
tbg AS (SELECT w1, w2 FROM bg WHERE doc_id % 2 = 0),
big AS (SELECT w1, w2, cast(count(*) AS BIGINT) AS c12 FROM tbg GROUP BY w1, w2),
hist AS (
  SELECT w1, cast(sum(c12) AS BIGINT) AS c1, cast(count(*) AS BIGINT) AS n1p
  FROM big GROUP BY w1
),
cont AS (SELECT w2, cast(count(*) AS BIGINT) AS npre FROM big GROUP BY w2),
nb AS (SELECT cast(count(*) AS BIGINT) AS nbig FROM big),
sbg AS (
  SELECT lang, w1, w2, cast(count(*) AS BIGINT) AS c
  FROM bg WHERE doc_id % 2 = 1 GROUP BY lang, w1, w2
),
scored AS (
  SELECT s.lang, s.c,
         CASE WHEN cont.npre IS NULL THEN 'unk'
              WHEN hist.c1 IS NULL THEN 'hist'
              WHEN big.c12 IS NULL THEN 'lambda'
              ELSE 'seen' END AS branch,
         cast(round(-ln(
           CASE WHEN cont.npre IS NULL THEN 1.0 / (nb.nbig + 1)
                WHEN hist.c1 IS NULL
                  THEN cast(cont.npre AS DOUBLE) / cast(nb.nbig AS DOUBLE)
                WHEN big.c12 IS NULL
                  THEN 0.75 * cast(hist.n1p AS DOUBLE) / cast(hist.c1 AS DOUBLE)
                       * cast(cont.npre AS DOUBLE) / cast(nb.nbig AS DOUBLE)
                ELSE (cast(big.c12 AS DOUBLE) - 0.75) / cast(hist.c1 AS DOUBLE)
                     + 0.75 * cast(hist.n1p AS DOUBLE) / cast(hist.c1 AS DOUBLE)
                       * cast(cont.npre AS DOUBLE) / cast(nb.nbig AS DOUBLE)
           END) * 1000000) AS BIGINT) AS cost
  FROM sbg s
  LEFT JOIN hist ON hist.w1 = s.w1
  LEFT JOIN big ON big.w1 = s.w1 AND big.w2 = s.w2
  LEFT JOIN cont ON cont.w2 = s.w2, nb
)
SELECT lang,
       cast(sum(c) AS BIGINT) AS n_bigrams,
       cast(sum(CASE WHEN branch = 'seen' THEN c ELSE 0 END) AS BIGINT)
           AS n_seen,
       cast(sum(CASE WHEN branch = 'lambda' THEN c ELSE 0 END) AS BIGINT)
           AS n_lambda,
       cast(sum(CASE WHEN branch = 'hist' THEN c ELSE 0 END) AS BIGINT)
           AS n_hist,
       cast(sum(CASE WHEN branch = 'unk' THEN c ELSE 0 END) AS BIGINT)
           AS n_unk,
       cast(sum(c * cost) AS BIGINT) AS nll_micro,
       cast(sum(c * cost) AS BIGINT) // cast(sum(c) AS BIGINT)
           AS mean_nll_micro
FROM scored
GROUP BY lang
"""


@register(
    "text_kn_oov_backoff",
    oracle=_OOV_ORACLE,
    tags=("text", "training"),
)
def text_kn_oov_backoff(spark, sf_dir):
    """Held-out KN scoring: train on even doc_ids, score odd docs —
    every backoff branch (seen / discount-mass / history-backoff / UNK
    floor) executes and is counted per language."""
    bg = _bigram_stream(spark, sf_dir)
    tbg = bg.filter(F.col("doc_id") % 2 == 0)
    big = tbg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    hist = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("npre"))
    nb = big.agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    sbg = (
        bg.filter(F.col("doc_id") % 2 == 1)
        .groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    j = (
        sbg.join(hist, "w1", "left")
        .join(big, ["w1", "w2"], "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(nb))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p_seen = (d("c12") - F.lit(0.75)) / d("c1") + F.lit(0.75) * d("n1p") / d(
        "c1"
    ) * d("npre") / d("nbig")
    p_lambda = F.lit(0.75) * d("n1p") / d("c1") * d("npre") / d("nbig")
    p_hist = d("npre") / d("nbig")
    p_unk = F.lit(1.0) / (d("nbig") + 1)
    branch = (
        F.when(F.col("npre").isNull(), F.lit("unk"))
        .when(F.col("c1").isNull(), F.lit("hist"))
        .when(F.col("c12").isNull(), F.lit("lambda"))
        .otherwise(F.lit("seen"))
    )
    p = (
        F.when(F.col("npre").isNull(), p_unk)
        .when(F.col("c1").isNull(), p_hist)
        .when(F.col("c12").isNull(), p_lambda)
        .otherwise(p_seen)
    )
    scored = j.select(
        "lang",
        "c",
        branch.alias("branch"),
        F.round(-F.log(p) * 1_000_000).cast("long").alias("cost"),
    )
    cnt = lambda b: F.sum(  # noqa: E731
        F.when(F.col("branch") == b, F.col("c")).otherwise(F.lit(0))
    ).cast("long")
    return scored.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        cnt("seen").alias("n_seen"),
        cnt("lambda").alias("n_lambda"),
        cnt("hist").alias("n_hist"),
        cnt("unk").alias("n_unk"),
        F.sum(F.col("c") * F.col("cost")).cast("long").alias("nll_micro"),
        F.expr("sum(c * cost) div sum(c)").cast("long").alias("mean_nll_micro"),
    )


# --------------------------------------------------------------------------
# CCNet perplexity buckets (r13): the artifact CCNet actually ships —
# every language's documents split into head/middle/tail terciles by LM
# perplexity, with per-bucket doc/token accounting. Thresholds are exact
# interpolated per-lang percentiles (p33/p67) computed as ONE bounded
# aggregation and broadcast back (the ts_rfm_scores discipline: Spark
# `percentile` == DuckDB `quantile_cont` on integer inputs — never a
# per-lang window over the corpus). Perplexity = the self-scored KN
# mean NLL from text_kn_bigram_ppl's plan.
# --------------------------------------------------------------------------

_BUCKETS_ORACLE = f"""
WITH {_KN_CTES},
dbg AS (
  SELECT doc_id, lang, w1, w2, cast(count(*) AS BIGINT) AS c
  FROM bg GROUP BY doc_id, lang, w1, w2
),
per_doc AS (
  SELECT d.doc_id, d.lang,
         cast(sum(d.c) AS BIGINT) AS n_bigrams,
         cast(sum(d.c * cost.cost_micro) AS BIGINT)
             // cast(sum(d.c) AS BIGINT) AS mnll
  FROM dbg d JOIN cost ON cost.w1 = d.w1 AND cost.w2 = d.w2
  GROUP BY d.doc_id, d.lang
),
th AS (
  SELECT lang, quantile_cont(mnll, 0.33) AS t33,
         quantile_cont(mnll, 0.67) AS t67
  FROM per_doc GROUP BY lang
)
SELECT p.lang,
       CASE WHEN p.mnll <= th.t33 THEN 'head'
            WHEN p.mnll <= th.t67 THEN 'middle'
            ELSE 'tail' END AS bucket,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(p.n_bigrams) AS BIGINT) AS n_bigrams,
       cast(min(p.mnll) AS BIGINT) AS min_mnll,
       cast(max(p.mnll) AS BIGINT) AS max_mnll
FROM per_doc p JOIN th ON th.lang = p.lang
GROUP BY p.lang, bucket
"""


@register(
    "text_ccnet_ppl_buckets",
    oracle=_BUCKETS_ORACLE,
    tags=("text", "training"),
)
def text_ccnet_ppl_buckets(spark, sf_dir):
    """Per-language head/middle/tail perplexity terciles with doc/token
    accounting — the CCNet bucket artifact."""
    bg = _bigram_stream(spark, sf_dir)
    cost = _cost_table(bg).select("w1", "w2", "cost_micro")
    dbg = bg.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = (
        dbg.join(cost, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.expr("sum(c * cost_micro) div sum(c)")
            .cast("long")
            .alias("mnll"),
        )
    )
    th = per_doc.groupBy("lang").agg(
        F.expr("percentile(mnll, 0.33)").alias("t33"),
        F.expr("percentile(mnll, 0.67)").alias("t67"),
    )
    bucket = (
        F.when(F.col("mnll") <= F.col("t33"), F.lit("head"))
        .when(F.col("mnll") <= F.col("t67"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        per_doc.join(F.broadcast(th), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.min("mnll").cast("long").alias("min_mnll"),
            F.max("mnll").cast("long").alias("max_mnll"),
        )
    )


# --------------------------------------------------------------------------
# Min-K% Prob contamination audit (r13): the membership-inference screen
# (Shi et al. 2023) used to detect benchmark/eval contamination — a
# document the model has memorized scores HIGH probability even on its
# least-likely tokens, so rank docs by the mean NLL of their k=20%
# highest-cost bigrams, ascending (most suspicious first). Here the
# "model" is the corpus-trained KN bigram LM, making the audit
# self-contained and exact.
#
# Shape: the per-occurrence (doc, bigram) cost stream ranks inside a
# per-DOC window (partition size = doc length, bounded by the data's
# max doc length, never |corpus|), keeps the top ceil(n/5) costs, and
# aggregates. Ties order by (cost desc, w1, w2); tied duplicates are
# value-identical so the sum is order-free.
# --------------------------------------------------------------------------

_MINK_TOP = 15

_MINK_ORACLE = f"""
WITH {_KN_CTES},
occ AS (
  SELECT bg.doc_id, bg.lang, cost.cost_micro
  FROM bg JOIN cost ON cost.w1 = bg.w1 AND cost.w2 = bg.w2
),
sized AS (
  SELECT doc_id, lang, cost_micro,
         cast(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cost_micro DESC) AS rn
  FROM occ
),
mink AS (
  SELECT doc_id, lang, n, (n + 4) // 5 AS k,
         cast(sum(cost_micro) AS BIGINT) AS s
  FROM sized
  WHERE rn <= (n + 4) // 5
  GROUP BY doc_id, lang, n
)
SELECT doc_id, lang, n AS n_bigrams, cast(k AS BIGINT) AS k_used,
       s // k AS mink_mean_cost_micro
FROM mink
ORDER BY mink_mean_cost_micro, doc_id
LIMIT {_MINK_TOP}
"""


@register(
    "text_min_k_prob_audit",
    oracle=_MINK_ORACLE,
    tags=("text", "training", "quality"),
)
def text_min_k_prob_audit(spark, sf_dir):
    """Min-K% Prob: docs ranked by the mean cost of their 20% highest-
    cost bigrams, ascending — the contamination / membership screen."""
    from pyspark.sql import Window as W

    bg = _bigram_stream(spark, sf_dir)
    cost = _cost_table(bg).select("w1", "w2", "cost_micro")
    occ = bg.join(cost, ["w1", "w2"]).select("doc_id", "lang", "cost_micro")
    wn = W.partitionBy("doc_id")
    wr = W.partitionBy("doc_id").orderBy(F.desc("cost_micro"))
    sized = occ.select(
        "doc_id",
        "lang",
        "cost_micro",
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        F.row_number().over(wr).alias("rn"),
    )
    mink = (
        sized.where(F.col("rn") <= F.expr("(n + 4) div 5"))
        .groupBy("doc_id", "lang", "n")
        .agg(F.sum("cost_micro").cast("long").alias("s"))
        .select(
            "doc_id",
            "lang",
            F.col("n").alias("n_bigrams"),
            F.expr("(n + 4) div 5").cast("long").alias("k_used"),
            F.expr("s div ((n + 4) div 5)").alias("mink_mean_cost_micro"),
        )
    )
    return mink.orderBy("mink_mean_cost_micro", "doc_id").limit(_MINK_TOP)


# --------------------------------------------------------------------------
# TRIGRAM Kneser-Ney perplexity filter (r13): the full CCNet shape — the
# production filters run order-3+ smoothed LMs, where the bigram above
# is the fidelity floor. Interpolated KN with the proper backoff chain:
#
#   P(w3|w1 w2) = (c123 - D)/c12 + D * N1+(w1 w2 *)/c12 * Pbo(w3|w2)
#   Pbo(w3|w2)  = (N1+(* w2 w3) - D)/N1+(* w2 *)
#                 + D * N1+(w2 *)/N1+(* w2 *) * Pcont(w3)
#   Pcont(w3)   = N1+(* w3)/N1+(* *)          (over (w2,w3) bigram TYPES)
#
# where the MIDDLE level counts CONTINUATIONS (distinct-w1 types), not
# raw frequencies — the defining KN property, now exercised at two
# levels. Self-scoring (train = score corpus) keeps every max(x-D, 0)
# branch inactive: c123 >= 1 > D at the top and N1+(* w2 w3) >= 1 > D in
# the middle, so every probability is strictly in (0, 1) and every cost
# a positive integer after micro-quantization (the bigram precedent).
#
# Scale: the trigram stream is built MAP-SIDE (arrays_zip of three
# slices); ONE groupBy(w1,w2,w3) pass is the corpus-side cost; every
# model table (c12/N1+(w1w2*), continuation tables, bigram types) lives
# on the distinct-trigram table — Heaps-sublinear. The scoring join is
# un-hinted (AQE broadcasts at small scale; trigram types outgrow any
# broadcast budget at 100 TB).
# --------------------------------------------------------------------------

_KN3_TOP_DOCS = 15

_KN3_CTES = """
lf3 AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
tg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(3, len(t) + 1), i -> t[i - 2])) AS w1,
         unnest(list_transform(range(3, len(t) + 1), i -> t[i - 1])) AS w2,
         unnest(list_transform(range(3, len(t) + 1), i -> t[i])) AS w3
  FROM lf3
),
tri AS (
  SELECT w1, w2, w3, cast(count(*) AS BIGINT) AS c123
  FROM tg GROUP BY w1, w2, w3
),
h12 AS (
  SELECT w1, w2, cast(sum(c123) AS BIGINT) AS c12,
         cast(count(*) AS BIGINT) AS n12
  FROM tri GROUP BY w1, w2
),
cont23 AS (
  SELECT w2, w3, cast(count(*) AS BIGINT) AS n1p23 FROM tri GROUP BY w2, w3
),
mid2 AS (
  SELECT w2, cast(sum(n1p23) AS BIGINT) AS ndot2,
         cast(count(*) AS BIGINT) AS nm2
  FROM cont23 GROUP BY w2
),
bt AS (SELECT DISTINCT w2, w3 FROM tg),
cw3 AS (SELECT w3, cast(count(*) AS BIGINT) AS npre3 FROM bt GROUP BY w3),
nbt AS (SELECT cast(count(*) AS BIGINT) AS nbig FROM bt),
cost3 AS (
  SELECT t.w1, t.w2, t.w3,
         cast(round(-ln(
           (cast(t.c123 AS DOUBLE) - 0.75) / cast(h.c12 AS DOUBLE)
           + 0.75 * cast(h.n12 AS DOUBLE) / cast(h.c12 AS DOUBLE)
             * ((cast(c.n1p23 AS DOUBLE) - 0.75) / cast(m2.ndot2 AS DOUBLE)
                + 0.75 * cast(m2.nm2 AS DOUBLE) / cast(m2.ndot2 AS DOUBLE)
                  * cast(w.npre3 AS DOUBLE) / cast(nbt.nbig AS DOUBLE))
         ) * 1000000) AS BIGINT) AS cost_micro
  FROM tri t
  JOIN h12 h ON h.w1 = t.w1 AND h.w2 = t.w2
  JOIN cont23 c ON c.w2 = t.w2 AND c.w3 = t.w3
  JOIN mid2 m2 ON m2.w2 = t.w2
  JOIN cw3 w ON w.w3 = t.w3, nbt
)
"""

_KN3_PPL_ORACLE = f"""
WITH {_KN3_CTES},
dtg AS (
  SELECT doc_id, lang, w1, w2, w3, cast(count(*) AS BIGINT) AS c
  FROM tg GROUP BY doc_id, lang, w1, w2, w3
),
per_doc AS (
  SELECT d.doc_id, d.lang,
         cast(sum(d.c) AS BIGINT) AS n_trigrams,
         cast(sum(d.c * cost3.cost_micro) AS BIGINT) AS nll_micro
  FROM dtg d JOIN cost3
    ON cost3.w1 = d.w1 AND cost3.w2 = d.w2 AND cost3.w3 = d.w3
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_trigrams, nll_micro,
       nll_micro // n_trigrams AS mean_nll_micro
FROM per_doc
ORDER BY mean_nll_micro DESC, doc_id
LIMIT {_KN3_TOP_DOCS}
"""


def _trigram_stream(spark, sf_dir):
    d = spread(
        table(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        "doc_id",
    )
    return (
        d.withColumn(
            "t", F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        )
        .filter(F.size("t") >= 3)
        .withColumn(
            "tg",
            F.expr(
                "arrays_zip(slice(t, 1, size(t) - 2),"
                " slice(t, 2, size(t) - 2), slice(t, 3, size(t) - 2))"
            ),
        )
        .select("doc_id", "lang", F.explode("tg").alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
            F.col("p.2").alias("w3"),
        )
    )


@register(
    "text_kn_trigram_ppl",
    oracle=_KN3_PPL_ORACLE,
    tags=("text", "training"),
)
def text_kn_trigram_ppl(spark, sf_dir):
    """Per-doc mean NLL under the interpolated trigram KN model (two
    continuation levels), worst docs first — the order-3 CCNet filter."""
    tg = _trigram_stream(spark, sf_dir)
    # r17: same w2-clustered window-ladder restructure as the 4/5-gram
    # filters (one exchange serves every w2-containing level; unordered
    # siblings share the row_number sorts via explicit unbounded
    # frames). Identical integer stats, untouched cost formula.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tri = (
        tg.repartition(width, "w2")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
    )
    w12 = Window.partitionBy("w2", "w1")
    w23 = Window.partitionBy("w2", "w3")
    w2 = Window.partitionBy("w2")
    w3 = Window.partitionBy("w3")
    one = F.count(F.lit(1))
    unb = (Window.unboundedPreceding, Window.unboundedFollowing)
    stats = (
        # block 1: sorted (w2, w1)
        tri.withColumn("c12", F.sum("c123").over(w12))
        .withColumn("n12", one.over(w12))
        # block 2: sorted (w2, w3, w1)
        .withColumn(
            "f23",
            (F.row_number().over(w23.orderBy("w1")) == 1).cast("long"),
        )
        .withColumn("n1p23", one.over(w23.orderBy("w1").rowsBetween(*unb)))
        .withColumn("ndot2", one.over(w2))
        .withColumn("nm2", F.sum("f23").over(w2))
        # the (w3) level is the one key not clustered by w2
        .repartition(width, "w3")
        .withColumn("npre3", F.sum("f23").over(w3))
        .drop("f23")
    )
    nbt = (
        tri.select("w2", "w3")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    )
    pbo = (F.col("n1p23").cast("double") - F.lit(_D)) / F.col("ndot2") + F.lit(
        _D
    ) * F.col("nm2") / F.col("ndot2") * F.col("npre3") / F.col("nbig")
    cost3 = (
        stats.crossJoin(F.broadcast(nbt))
        .withColumn(
            "cost_micro",
            F.round(
                -F.log(
                    (F.col("c123").cast("double") - F.lit(_D)) / F.col("c12")
                    + F.lit(_D) * F.col("n12") / F.col("c12") * pbo
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    dtg = tg.groupBy("doc_id", "lang", "w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = (
        dtg.join(cost3.select("w1", "w2", "w3", "cost_micro"), ["w1", "w2", "w3"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_trigrams"),
            F.sum(F.col("c") * F.col("cost_micro"))
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        per_doc.withColumn(
            "mean_nll_micro", F.expr("nll_micro div n_trigrams")
        )
        .orderBy(F.desc("mean_nll_micro"), "doc_id")
        .limit(_KN3_TOP_DOCS)
    )


# --------------------------------------------------------------------------
# 4-gram interpolated Kneser-Ney + perplexity filter (r14, VERDICT r13
# #3): the CCNet/KenLM-standard higher order. The recursion adds one
# more continuation level to the trigram chain:
#
#   P4(w4|w1w2w3) = (c(1234)-D)/c(123.)  + D*N1+(123,*)/c(123.)  * P3
#   P3(w4|w2w3)   = (N1+(*,234)-D)/N1+(*,23,*) + D*Nf(23)/N1+(*,23,*) * P2
#   P2(w4|w3)     = (N1+(*,34)-D)/N1+(*,3,*)  + D*Nf(3)/N1+(*,3,*)  * Pc
#   Pc(w4)        = N1+(*,4) / |distinct (w3,w4) types|
#
# where every N1+ is a TYPE count. Plan shape (the trigram plan extended
# one level, same scale argument): ONE groupBy(w1..w4) corpus pass builds
# the count table; every lower-order table (cont234 -> n34 -> bt4) is a
# re-aggregation of the DISTINCT-4-gram table, so model-side cost is
# Heaps-sublinear in corpus size; state roughly doubles per order but
# stays a function of type counts, not token counts. The scoring join is
# un-hinted (AQE broadcasts at small scale; 4-gram types outgrow any
# broadcast budget at 100 TB).
#
# Self-scoring contract (as the bigram/trigram filters): every scored
# 4-gram is seen, so c1234 >= 1 > D and each level's first term is
# strictly positive — P < 1 and cost_micro is a positive int64.
# --------------------------------------------------------------------------

_KN4_TOP_DOCS = 15

_KN4_CTES = """
lf4 AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
fg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(4, len(t) + 1), i -> t[i - 3])) AS w1,
         unnest(list_transform(range(4, len(t) + 1), i -> t[i - 2])) AS w2,
         unnest(list_transform(range(4, len(t) + 1), i -> t[i - 1])) AS w3,
         unnest(list_transform(range(4, len(t) + 1), i -> t[i])) AS w4
  FROM lf4
),
four AS (
  SELECT w1, w2, w3, w4, cast(count(*) AS BIGINT) AS c1234
  FROM fg GROUP BY w1, w2, w3, w4
),
h123 AS (
  SELECT w1, w2, w3, cast(sum(c1234) AS BIGINT) AS c123,
         cast(count(*) AS BIGINT) AS n123
  FROM four GROUP BY w1, w2, w3
),
cont234 AS (
  SELECT w2, w3, w4, cast(count(*) AS BIGINT) AS n1p234
  FROM four GROUP BY w2, w3, w4
),
mid23 AS (
  SELECT w2, w3, cast(sum(n1p234) AS BIGINT) AS ndot23,
         cast(count(*) AS BIGINT) AS nm23
  FROM cont234 GROUP BY w2, w3
),
n34 AS (
  SELECT w3, w4, cast(count(*) AS BIGINT) AS n1p34
  FROM cont234 GROUP BY w3, w4
),
mid3 AS (
  SELECT w3, cast(sum(n1p34) AS BIGINT) AS ndot3,
         cast(count(*) AS BIGINT) AS nm3
  FROM n34 GROUP BY w3
),
cw4 AS (SELECT w4, cast(count(*) AS BIGINT) AS npre4 FROM n34 GROUP BY w4),
nbt4 AS (SELECT cast(count(*) AS BIGINT) AS nbig FROM n34),
cost4 AS (
  SELECT t.w1, t.w2, t.w3, t.w4,
         cast(round(-ln(
           (cast(t.c1234 AS DOUBLE) - 0.75) / cast(h.c123 AS DOUBLE)
           + 0.75 * cast(h.n123 AS DOUBLE) / cast(h.c123 AS DOUBLE)
             * ((cast(c.n1p234 AS DOUBLE) - 0.75) / cast(m23.ndot23 AS DOUBLE)
                + 0.75 * cast(m23.nm23 AS DOUBLE) / cast(m23.ndot23 AS DOUBLE)
                  * ((cast(p.n1p34 AS DOUBLE) - 0.75)
                       / cast(m3.ndot3 AS DOUBLE)
                     + 0.75 * cast(m3.nm3 AS DOUBLE)
                         / cast(m3.ndot3 AS DOUBLE)
                       * cast(w.npre4 AS DOUBLE)
                         / cast(nbt4.nbig AS DOUBLE)))
         ) * 1000000) AS BIGINT) AS cost_micro
  FROM four t
  JOIN h123 h ON h.w1 = t.w1 AND h.w2 = t.w2 AND h.w3 = t.w3
  JOIN cont234 c ON c.w2 = t.w2 AND c.w3 = t.w3 AND c.w4 = t.w4
  JOIN mid23 m23 ON m23.w2 = t.w2 AND m23.w3 = t.w3
  JOIN n34 p ON p.w3 = t.w3 AND p.w4 = t.w4
  JOIN mid3 m3 ON m3.w3 = t.w3
  JOIN cw4 w ON w.w4 = t.w4, nbt4
)
"""

_KN4_PPL_ORACLE = f"""
WITH {_KN4_CTES},
dfg AS (
  SELECT doc_id, lang, w1, w2, w3, w4, cast(count(*) AS BIGINT) AS c
  FROM fg GROUP BY doc_id, lang, w1, w2, w3, w4
),
per_doc AS (
  SELECT d.doc_id, d.lang,
         cast(sum(d.c) AS BIGINT) AS n_fourgrams,
         cast(sum(d.c * cost4.cost_micro) AS BIGINT) AS nll_micro
  FROM dfg d JOIN cost4
    ON cost4.w1 = d.w1 AND cost4.w2 = d.w2 AND cost4.w3 = d.w3
       AND cost4.w4 = d.w4
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_fourgrams, nll_micro,
       nll_micro // n_fourgrams AS mean_nll_micro
FROM per_doc
ORDER BY mean_nll_micro DESC, doc_id
LIMIT {_KN4_TOP_DOCS}
"""


def _fourgram_stream(spark, sf_dir):
    d = spread(
        table(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        "doc_id",
    )
    return (
        d.withColumn(
            "t", F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        )
        .filter(F.size("t") >= 4)
        .withColumn(
            "fg",
            F.expr(
                "arrays_zip(slice(t, 1, size(t) - 3),"
                " slice(t, 2, size(t) - 3), slice(t, 3, size(t) - 3),"
                " slice(t, 4, size(t) - 3))"
            ),
        )
        .select("doc_id", "lang", F.explode("fg").alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
            F.col("p.2").alias("w3"),
            F.col("p.3").alias("w4"),
        )
    )


@register(
    "text_kn_fourgram_ppl",
    oracle=_KN4_PPL_ORACLE,
    tags=("text", "training"),
)
def text_kn_fourgram_ppl(spark, sf_dir):
    """Per-doc mean NLL under the interpolated 4-gram KN model (three
    continuation levels), worst docs first — the KenLM-order CCNet
    filter."""
    fg = _fourgram_stream(spark, sf_dir)
    # r17: the five-join model-stat assembly becomes the fivegram's
    # w3-clustered WINDOW ladder (r16 commit 5124c1e pattern, plus the
    # r17 sort-sharing: every partition-key list is sequenced on the
    # shared w3/w2 prefix and the unordered siblings reuse the ordered
    # row_number sorts via explicit unbounded frames) — every stat is a
    # per-group constant over a nested-suffix key of the distinct
    # 4-gram table, so the ladder runs in ONE w3-clustered exchange +
    # one w4 re-exchange instead of re-joining seven derived tables.
    # Identical integer stats; the cost formula is untouched.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    four = (
        fg.repartition(width, "w3")
        .groupBy("w1", "w2", "w3", "w4")
        .agg(F.count(F.lit(1)).cast("long").alias("c1234"))
    )
    w123 = Window.partitionBy("w3", "w2", "w1")
    w234 = Window.partitionBy("w3", "w2", "w4")
    w23 = Window.partitionBy("w3", "w2")
    w34 = Window.partitionBy("w3", "w4")
    w3 = Window.partitionBy("w3")
    w4 = Window.partitionBy("w4")
    one = F.count(F.lit(1))
    unb = (Window.unboundedPreceding, Window.unboundedFollowing)
    stats = (
        # block 1: sorted (w3, w2, w1)
        four.withColumn("c123", F.sum("c1234").over(w123))
        .withColumn("n123", one.over(w123))
        # block 2: sorted (w3, w2, w4, w1)
        .withColumn(
            "f234",
            (F.row_number().over(w234.orderBy("w1")) == 1).cast("long"),
        )
        .withColumn(
            "n1p234", one.over(w234.orderBy("w1").rowsBetween(*unb))
        )
        .withColumn("ndot23", one.over(w23))
        .withColumn("nm23", F.sum("f234").over(w23))
        # block 3: sorted (w3, w4, w2, w1)
        .withColumn(
            "f34",
            (F.row_number().over(w34.orderBy("w2", "w1")) == 1).cast(
                "long"
            ),
        )
        .withColumn(
            "n1p34",
            F.sum("f234").over(w34.orderBy("w2", "w1").rowsBetween(*unb)),
        )
        .withColumn("ndot3", F.sum("f234").over(w3))
        .withColumn("nm3", F.sum("f34").over(w3))
        .drop("f234")
        # the (w4) level is the one key not clustered by w3
        .repartition(width, "w4")
        .withColumn("npre4", F.sum("f34").over(w4))
        .drop("f34")
    )
    nbt4 = (
        four.select("w3", "w4")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    )
    p2 = (F.col("n1p34").cast("double") - F.lit(_D)) / F.col("ndot3") + F.lit(
        _D
    ) * F.col("nm3") / F.col("ndot3") * F.col("npre4") / F.col("nbig")
    p3 = (F.col("n1p234").cast("double") - F.lit(_D)) / F.col(
        "ndot23"
    ) + F.lit(_D) * F.col("nm23") / F.col("ndot23") * p2
    cost4 = (
        stats.crossJoin(F.broadcast(nbt4))
        .withColumn(
            "cost_micro",
            F.round(
                -F.log(
                    (F.col("c1234").cast("double") - F.lit(_D))
                    / F.col("c123")
                    + F.lit(_D) * F.col("n123") / F.col("c123") * p3
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    dfg = fg.groupBy("doc_id", "lang", "w1", "w2", "w3", "w4").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = (
        dfg.join(
            cost4.select("w1", "w2", "w3", "w4", "cost_micro"),
            ["w1", "w2", "w3", "w4"],
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_fourgrams"),
            F.sum(F.col("c") * F.col("cost_micro"))
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        per_doc.withColumn(
            "mean_nll_micro", F.expr("nll_micro div n_fourgrams")
        )
        .orderBy(F.desc("mean_nll_micro"), "doc_id")
        .limit(_KN4_TOP_DOCS)
    )


# --------------------------------------------------------------------------
# 5-gram interpolated Kneser-Ney + perplexity filter (r14b): the full
# KenLM default order. One more continuation level on the 4-gram chain:
#
#   P5(w5|w1..w4) = (c(12345)-D)/c(1234.) + D*N1+(1234,*)/c(1234.) * P4
#   P4(w5|w2w3w4) = (N1+(*,2345)-D)/N1+(*,234,*)
#                     + D*Nf(234)/N1+(*,234,*) * P3
#   P3(w5|w3w4)   = (N1+(*,345)-D)/N1+(*,34,*) + D*Nf(34)/N1+(*,34,*) * P2
#   P2(w5|w4)     = (N1+(*,45)-D)/N1+(*,4,*)  + D*Nf(4)/N1+(*,4,*)  * Pc
#   Pc(w5)        = N1+(*,5) / |distinct (w4,w5) types|
#
# Same plan as the lower orders, one level deeper: ONE groupBy(w1..w5)
# corpus pass; every lower-order table re-aggregates the DISTINCT-
# 5-gram table (cont2345 -> n345 -> n45 -> bt5) — Heaps-sublinear
# model state; the scoring join stays un-hinted. Self-scoring keeps
# every level's first term strictly positive (c >= 1 > D).
# --------------------------------------------------------------------------

_KN5_TOP_DOCS = 15

_KN5_CTES = """
lf5 AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
  FROM documents
),
pg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(5, len(t) + 1), i -> t[i - 4])) AS w1,
         unnest(list_transform(range(5, len(t) + 1), i -> t[i - 3])) AS w2,
         unnest(list_transform(range(5, len(t) + 1), i -> t[i - 2])) AS w3,
         unnest(list_transform(range(5, len(t) + 1), i -> t[i - 1])) AS w4,
         unnest(list_transform(range(5, len(t) + 1), i -> t[i])) AS w5
  FROM lf5
),
five AS (
  SELECT w1, w2, w3, w4, w5, cast(count(*) AS BIGINT) AS c12345
  FROM pg GROUP BY w1, w2, w3, w4, w5
),
h1234 AS (
  SELECT w1, w2, w3, w4, cast(sum(c12345) AS BIGINT) AS c1234,
         cast(count(*) AS BIGINT) AS n1234
  FROM five GROUP BY w1, w2, w3, w4
),
cont2345 AS (
  SELECT w2, w3, w4, w5, cast(count(*) AS BIGINT) AS n1p2345
  FROM five GROUP BY w2, w3, w4, w5
),
mid234 AS (
  SELECT w2, w3, w4, cast(sum(n1p2345) AS BIGINT) AS ndot234,
         cast(count(*) AS BIGINT) AS nm234
  FROM cont2345 GROUP BY w2, w3, w4
),
n345 AS (
  SELECT w3, w4, w5, cast(count(*) AS BIGINT) AS n1p345
  FROM cont2345 GROUP BY w3, w4, w5
),
mid34 AS (
  SELECT w3, w4, cast(sum(n1p345) AS BIGINT) AS ndot34,
         cast(count(*) AS BIGINT) AS nm34
  FROM n345 GROUP BY w3, w4
),
n45 AS (
  SELECT w4, w5, cast(count(*) AS BIGINT) AS n1p45
  FROM n345 GROUP BY w4, w5
),
mid4 AS (
  SELECT w4, cast(sum(n1p45) AS BIGINT) AS ndot4,
         cast(count(*) AS BIGINT) AS nm4
  FROM n45 GROUP BY w4
),
cw5 AS (SELECT w5, cast(count(*) AS BIGINT) AS npre5 FROM n45 GROUP BY w5),
nbt5 AS (SELECT cast(count(*) AS BIGINT) AS nbig FROM n45),
cost5 AS (
  SELECT t.w1, t.w2, t.w3, t.w4, t.w5,
         cast(round(-ln(
           (cast(t.c12345 AS DOUBLE) - 0.75) / cast(h.c1234 AS DOUBLE)
           + 0.75 * cast(h.n1234 AS DOUBLE) / cast(h.c1234 AS DOUBLE)
             * ((cast(c.n1p2345 AS DOUBLE) - 0.75)
                  / cast(m234.ndot234 AS DOUBLE)
                + 0.75 * cast(m234.nm234 AS DOUBLE)
                    / cast(m234.ndot234 AS DOUBLE)
                  * ((cast(p3.n1p345 AS DOUBLE) - 0.75)
                       / cast(m34.ndot34 AS DOUBLE)
                     + 0.75 * cast(m34.nm34 AS DOUBLE)
                         / cast(m34.ndot34 AS DOUBLE)
                       * ((cast(p2.n1p45 AS DOUBLE) - 0.75)
                            / cast(m4.ndot4 AS DOUBLE)
                          + 0.75 * cast(m4.nm4 AS DOUBLE)
                              / cast(m4.ndot4 AS DOUBLE)
                            * cast(w.npre5 AS DOUBLE)
                              / cast(nbt5.nbig AS DOUBLE))))
         ) * 1000000) AS BIGINT) AS cost_micro
  FROM five t
  JOIN h1234 h
    ON h.w1 = t.w1 AND h.w2 = t.w2 AND h.w3 = t.w3 AND h.w4 = t.w4
  JOIN cont2345 c
    ON c.w2 = t.w2 AND c.w3 = t.w3 AND c.w4 = t.w4 AND c.w5 = t.w5
  JOIN mid234 m234 ON m234.w2 = t.w2 AND m234.w3 = t.w3 AND m234.w4 = t.w4
  JOIN n345 p3 ON p3.w3 = t.w3 AND p3.w4 = t.w4 AND p3.w5 = t.w5
  JOIN mid34 m34 ON m34.w3 = t.w3 AND m34.w4 = t.w4
  JOIN n45 p2 ON p2.w4 = t.w4 AND p2.w5 = t.w5
  JOIN mid4 m4 ON m4.w4 = t.w4
  JOIN cw5 w ON w.w5 = t.w5, nbt5
)
"""

_KN5_PPL_ORACLE = f"""
WITH {_KN5_CTES},
dpg AS (
  SELECT doc_id, lang, w1, w2, w3, w4, w5, cast(count(*) AS BIGINT) AS c
  FROM pg GROUP BY doc_id, lang, w1, w2, w3, w4, w5
),
per_doc AS (
  SELECT d.doc_id, d.lang,
         cast(sum(d.c) AS BIGINT) AS n_fivegrams,
         cast(sum(d.c * cost5.cost_micro) AS BIGINT) AS nll_micro
  FROM dpg d JOIN cost5
    ON cost5.w1 = d.w1 AND cost5.w2 = d.w2 AND cost5.w3 = d.w3
       AND cost5.w4 = d.w4 AND cost5.w5 = d.w5
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_fivegrams, nll_micro,
       nll_micro // n_fivegrams AS mean_nll_micro
FROM per_doc
ORDER BY mean_nll_micro DESC, doc_id
LIMIT {_KN5_TOP_DOCS}
"""


def _fivegram_stream(spark, sf_dir):
    d = spread(
        table(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        "doc_id",
    )
    return (
        d.withColumn(
            "t", F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        )
        .filter(F.size("t") >= 5)
        .withColumn(
            "pg",
            F.expr(
                "arrays_zip(slice(t, 1, size(t) - 4),"
                " slice(t, 2, size(t) - 4), slice(t, 3, size(t) - 4),"
                " slice(t, 4, size(t) - 4), slice(t, 5, size(t) - 4))"
            ),
        )
        .select("doc_id", "lang", F.explode("pg").alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
            F.col("p.2").alias("w3"),
            F.col("p.3").alias("w4"),
            F.col("p.4").alias("w5"),
        )
    )


@register(
    "text_kn_fivegram_ppl",
    oracle=_KN5_PPL_ORACLE,
    tags=("text", "training"),
    # headline r15 (VERDICT r14 #6): the heaviest registered text plan;
    # demotes text_html_strip, whose regex-scan shape
    # text_quality_score already tracks in the set
    bench=True,
)
def text_kn_fivegram_ppl(spark, sf_dir):
    """Per-doc mean NLL under the interpolated 5-gram KN model (four
    continuation levels), worst docs first — KenLM's default order."""
    pg = _fivegram_stream(spark, sf_dir)
    # r16 optimization round (guide §2.4, §7.2): the r15 form built each
    # of the eight model-stat tables (h1234, cont2345, mid234, n345,
    # mid34, n45, mid4, cw5) as its own aggregation branch and attached
    # them with eight broadcast joins — every broadcast BUILD re-executed
    # the scan→split→explode→five pipeline (88 Exchange nodes, ~55 s of
    # concurrent in-job CPU at sf0.1 for a 5.9 s wall). Every one of
    # those tables is a per-group constant over a NESTED-suffix key of
    # the fivegram, so they all attach as window aggregates over ONE
    # linear pass chain instead: each pass repartitions by the COARSEST
    # key of its level, which also satisfies the finer windows of the
    # same pass (hash clustering on a subset key co-locates the superset
    # key), and "count of distinct finer groups" becomes sum of a
    # first-row flag. Integer stats are byte-identical to the join form;
    # the cost formula below is untouched.
    # every grouping/window key below except (w5) CONTAINS w4, so one
    # exchange clustered on w4 serves the five aggregation AND all four
    # window levels (hash clustering on a subset key co-locates every
    # superset key); parallelism = |vocab(w4)|, and the per-w4 fan-in is
    # inherent to the algorithm (ndot4/nm4 ARE per-w4 statistics — the
    # r15 join form aggregated mid4 by w4 too, so no new skew exposure)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    five = (
        pg.repartition(width, "w4")
        .groupBy("w1", "w2", "w3", "w4", "w5")
        .agg(F.count(F.lit(1)).cast("long").alias("c12345"))
    )
    # r17 (guide §2.4, sort elimination): a Window's required child
    # ordering is its partition-key SEQUENCE + order keys, so every
    # distinct sequence used to pay its own full-table sort inside the
    # w4-clustered exchange (9 Sort nodes in the r16 plan). Partitioning
    # is a SET property — re-sequencing every key list to start with the
    # shared w4/w3/w2 prefix lets consecutive window blocks reuse one
    # sort (prefix-compatible ordering passes EnsureRequirements), so
    # the ladder runs 4 sorts instead of 9. Values are untouched: the
    # partition groups are the same sets, and each row_number's order
    # keys make it deterministic within its group exactly as before.
    w1234 = Window.partitionBy("w4", "w3", "w2", "w1")
    w2345 = Window.partitionBy("w4", "w3", "w2", "w5")
    w234 = Window.partitionBy("w4", "w3", "w2")
    w345 = Window.partitionBy("w4", "w3", "w5")
    w34 = Window.partitionBy("w4", "w3")
    w45 = Window.partitionBy("w4", "w5")
    w4 = Window.partitionBy("w4")
    w5 = Window.partitionBy("w5")
    one = F.count(F.lit(1))
    stats = (
        # levels A-D all ride the single w4-clustered exchange; the four
        # sort blocks below are ordered so that every coarser window
        # rides the sort of the finest window of its block.
        # f2345 / f345 / f45 mark one row per distinct finer group (the
        # remaining key columns are unique within each partition-ordered
        # group, so row_number is deterministic).
        # block 1: sorted (w4, w3, w2, w1)
        five.withColumn("c1234", F.sum("c12345").over(w1234))
        .withColumn("n1234", one.over(w1234))
        # block 2: sorted (w4, w3, w2, w5, w1) — the ordered row_number
        # spec comes FIRST so the unordered sibling rides its sort
        .withColumn(
            "f2345",
            (F.row_number().over(w2345.orderBy("w1")) == 1).cast("long"),
        )
        .withColumn(
            "n1p2345",
            one.over(
                w2345.orderBy("w1").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("ndot234", one.over(w234))
        .withColumn("nm234", F.sum("f2345").over(w234))
        .withColumn("ndot34", F.sum("f2345").over(w34))
        # block 3: sorted (w4, w3, w5, w2, w1)
        .withColumn(
            "f345",
            (F.row_number().over(w345.orderBy("w2", "w1")) == 1).cast(
                "long"
            ),
        )
        .withColumn(
            "n1p345",
            F.sum("f2345").over(
                w345.orderBy("w2", "w1").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("nm34", F.sum("f345").over(w34))
        .withColumn("ndot4", F.sum("f345").over(w4))
        .drop("f2345")
        # block 4: sorted (w4, w5, w3, w2, w1)
        .withColumn(
            "f45",
            (F.row_number().over(w45.orderBy("w3", "w2", "w1")) == 1).cast(
                "long"
            ),
        )
        .withColumn(
            "n1p45",
            F.sum("f345").over(
                w45.orderBy("w3", "w2", "w1").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("nm4", F.sum("f45").over(w4))
        .drop("f345")
        # the (w5) level is the one key not clustered by w4
        .repartition(width, "w5")
        .withColumn("npre5", F.sum("f45").over(w5))
        .drop("f45")
    )
    # nbig = |distinct (w4, w5)| — a tiny branch off the shared five
    # subtree (ReuseExchange dedups the repartition exchange), cheaper
    # than a single-partition global window over the stream
    nbt5 = (
        five.select("w4", "w5")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    )
    pc = F.col("npre5") / F.col("nbig")
    p2 = (F.col("n1p45").cast("double") - F.lit(_D)) / F.col("ndot4") + F.lit(
        _D
    ) * F.col("nm4") / F.col("ndot4") * pc
    p3 = (F.col("n1p345").cast("double") - F.lit(_D)) / F.col(
        "ndot34"
    ) + F.lit(_D) * F.col("nm34") / F.col("ndot34") * p2
    p4 = (F.col("n1p2345").cast("double") - F.lit(_D)) / F.col(
        "ndot234"
    ) + F.lit(_D) * F.col("nm234") / F.col("ndot234") * p3
    cost5 = (
        stats.crossJoin(F.broadcast(nbt5))
        .withColumn(
            "cost_micro",
            F.round(
                -F.log(
                    (F.col("c12345").cast("double") - F.lit(_D))
                    / F.col("c1234")
                    + F.lit(_D) * F.col("n1234") / F.col("c1234") * p4
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    dpg = pg.groupBy("doc_id", "lang", "w1", "w2", "w3", "w4", "w5").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = (
        dpg.join(
            cost5.select("w1", "w2", "w3", "w4", "w5", "cost_micro"),
            ["w1", "w2", "w3", "w4", "w5"],
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_fivegrams"),
            F.sum(F.col("c") * F.col("cost_micro"))
            .cast("long")
            .alias("nll_micro"),
        )
    )
    return (
        per_doc.withColumn(
            "mean_nll_micro", F.expr("nll_micro div n_fivegrams")
        )
        .orderBy(F.desc("mean_nll_micro"), "doc_id")
        .limit(_KN5_TOP_DOCS)
    )
