"""Dataset-construction split/batching operators (split from
training_extra.py r13, hygiene only): contrastive triplet mining,
length-bucketed batch accounting, and the temporal train/eval split
with an embargo gap."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


# --------------------------------------------------------------------------
# Contrastive triplet mining — the dataset-construction step for
# embedding/retrieval training: every document anchors one deterministic
# positive (same language) and one deterministic negative (the "next"
# language in the sorted-language ring). Pairing is hash-driven so it is
# a pure function of the corpus: docs order by md5(doc_id) within
# (lang, 2-hex-char hash bucket); the positive is the hash-successor in
# the bucket (wrapping to the bucket's first — self-pairs from singleton
# buckets are dropped); the negative is the SAME (bucket, rank) slot in
# the next language — an equi-join, not a window across languages.
# Scale notes: positives need one ordered window per (lang, bucket) —
# bucket width (hash-prefix length) is the parallelism knob; negatives
# are a plain (bucket, rank) equi-join. Output pins identities via exact
# integer id-sums per language, so the oracle catches any pairing drift,
# not just counts.
# --------------------------------------------------------------------------

_TRIPLET_ORACLE = """
WITH docs AS (
  SELECT doc_id, lang, md5(cast(doc_id AS VARCHAR)) AS h,
         substr(md5(cast(doc_id AS VARCHAR)), 1, 2) AS b
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, b,
         row_number() OVER (PARTITION BY lang, b ORDER BY h) AS r,
         coalesce(lead(doc_id) OVER (PARTITION BY lang, b ORDER BY h),
                  first_value(doc_id) OVER (PARTITION BY lang, b ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)) AS pos_id
  FROM docs
),
langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) AS lr,
         count(*) OVER () AS nl
  FROM (SELECT DISTINCT lang FROM docs)
),
ring AS (
  SELECT a.lang, b.lang AS next_lang
  FROM langs a JOIN langs b ON b.lr = a.lr % a.nl + 1
),
neg AS (
  SELECT a.doc_id, n.doc_id AS neg_id
  FROM ranked a
  JOIN ring ON a.lang = ring.lang
  JOIN ranked n ON n.lang = ring.next_lang AND n.b = a.b AND n.r = a.r
)
SELECT d.lang,
       cast(count(*) AS BIGINT) AS n_anchors,
       cast(sum(CASE WHEN r.pos_id <> d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
       cast(sum(CASE WHEN r.pos_id <> d.doc_id THEN r.pos_id ELSE 0 END)
            AS BIGINT) AS sum_pos_ids,
       cast(count(g.neg_id) AS BIGINT) AS n_neg,
       cast(coalesce(sum(g.neg_id), 0) AS BIGINT) AS sum_neg_ids
FROM docs d
JOIN ranked r ON r.doc_id = d.doc_id
LEFT JOIN neg g ON g.doc_id = d.doc_id
GROUP BY d.lang
"""


@register(
    "sample_contrastive_triplets",
    oracle=_TRIPLET_ORACLE,
    tags=("sample", "training", "window"),
)
def sample_contrastive_triplets(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("b"),
    )
    w = W.partitionBy("lang", "b").orderBy("h")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = docs.select(
        "doc_id",
        "lang",
        "b",
        F.row_number().over(w).alias("r"),
        F.coalesce(
            F.lead("doc_id").over(w), F.first("doc_id").over(wf)
        ).alias("pos_id"),
    )
    langs = (
        docs.select("lang")
        .distinct()
        .select(
            "lang",
            F.row_number().over(W.partitionBy(F.lit(1)).orderBy("lang")).alias("lr"),
            F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("nl"),
        )
    )
    ring = (
        langs.alias("a")
        .join(
            langs.alias("nx"),
            F.col("nx.lr") == F.col("a.lr") % F.col("a.nl") + 1,
        )
        .select(F.col("a.lang").alias("lang"), F.col("nx.lang").alias("next_lang"))
    )
    neg = (
        ranked.alias("a")
        .join(
            F.broadcast(ring.withColumnRenamed("lang", "a_lang")),
            F.col("a.lang") == F.col("a_lang"),
        )
        .join(
            ranked.alias("n"),
            (F.col("n.lang") == F.col("next_lang"))
            & (F.col("n.b") == F.col("a.b"))
            & (F.col("n.r") == F.col("a.r")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"), F.col("n.doc_id").alias("neg_id")
        )
    )
    joined = (
        docs.select("doc_id", "lang")
        .join(ranked.select("doc_id", "pos_id"), "doc_id")
        .join(neg, "doc_id", "left")
    )
    has_pos = F.col("pos_id") != F.col("doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.sum(F.when(has_pos, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(has_pos, F.col("pos_id")).otherwise(0))
        .cast("long")
        .alias("sum_pos_ids"),
        F.count("neg_id").alias("n_neg"),
        F.coalesce(F.sum("neg_id"), F.lit(0)).cast("long").alias("sum_neg_ids"),
    )


# --------------------------------------------------------------------------
# Length-bucketed batch accounting (r9): the padding-efficiency report for
# bucketed batching — docs grouped into power-of-two length buckets, fixed
# batches of _LB_BATCH per bucket, and the report prices what bucketing
# buys: padded slots = capacity the GPU pays for that carries no tokens
# (n_batches * batch * cap - real tokens). This is the accounting run
# before choosing bucket edges for a packing-free training loader (the
# alternative to text_sequence_packing's exact packing). Buckets are a
# literal CASE ladder, NOT pow(2, ceil(log2 n)) — integer-exact and
# immune to libm boundary drift across engines. One scan, one bounded
# groupBy (bucket count is the ladder length); utilization numerators in
# decimal(38,0)/HUGEINT (tokens * 1e6 passes int64 at corpus scale;
# quotient <= 1e6 so the long cast-back is bound-safe).
# --------------------------------------------------------------------------

_LB_BATCH = 32
_LB_EDGES = (16, 32, 64, 128, 256, 512, 1024)


def _lb_bucket_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} <= {e} THEN {e}" for e in _LB_EDGES
    )
    return f"CASE {cases} ELSE 2048 END"


_LENGTH_BUCKET_ORACLE = f"""
WITH sig AS (
  SELECT cast(len(string_split(text, ' ')) AS BIGINT) AS nw FROM documents
),
b AS (
  SELECT cast({_lb_bucket_sql('nw')} AS BIGINT) AS cap,
         cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(nw) AS BIGINT) AS real_tokens
  FROM sig GROUP BY 1
)
SELECT cap, n_docs, real_tokens,
       cast((n_docs + {_LB_BATCH} - 1) // {_LB_BATCH} AS BIGINT) AS n_batches,
       cast(((n_docs + {_LB_BATCH} - 1) // {_LB_BATCH}) * {_LB_BATCH} * cap
            - real_tokens AS BIGINT) AS padded_slots,
       cast((cast(real_tokens AS HUGEINT) * 1000000)
            // (((n_docs + {_LB_BATCH} - 1) // {_LB_BATCH}) * {_LB_BATCH} * cap)
            AS BIGINT) AS utilization_ppm
FROM b
"""


@register(
    "sample_length_bucket_batches",
    oracle=_LENGTH_BUCKET_ORACLE,
    tags=("sample", "training", "agg"),
)
def sample_length_bucket_batches(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " ")).cast("long")
    cap = F.expr(_lb_bucket_sql("nw")).cast("long")
    b = (
        d.select(nw.alias("nw"))
        .select("nw", cap.alias("cap"))
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nw").cast("long").alias("real_tokens"),
        )
    )
    n_batches = F.expr(f"(n_docs + {_LB_BATCH} - 1) div {_LB_BATCH}")
    return b.select(
        "cap",
        "n_docs",
        "real_tokens",
        n_batches.cast("long").alias("n_batches"),
        (n_batches * _LB_BATCH * F.col("cap") - F.col("real_tokens"))
        .cast("long")
        .alias("padded_slots"),
        F.expr(
            f"cast((cast(real_tokens AS DECIMAL(38,0)) * 1000000)"
            f"     div (((n_docs + {_LB_BATCH} - 1) div {_LB_BATCH})"
            f"          * {_LB_BATCH} * cap) AS BIGINT)"
        ).alias("utilization_ppm"),
    )


# --------------------------------------------------------------------------
# Temporal train/eval split with an embargo gap (r10): the time-series
# ML-ops split — train strictly before (cutoff − embargo), eval at/after
# cutoff, and the embargo day in between DROPPED so no eval label can
# leak into training features through lookback windows (the financial-ML
# "purged split"). The cutoff derives from the observed time range (80%
# point of [min_ts, max_ts], snapped to exact microseconds), so the query
# is self-contained at any scale factor; the one-row bounds aggregate is
# broadcast. Output is the split audit every training job logs: per-split
# event/user counts and actual time ranges — the eval_min >= cutoff and
# train_max < cutoff − embargo invariants ARE the leakage proof.
# --------------------------------------------------------------------------

_TEMPORAL_SPLIT_ORACLE = """
WITH bounds AS (
  SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
), cut AS (
  SELECT lo + ((hi - lo) * 8) // 10 AS cutoff_us,
         cast(86400000000 AS BIGINT) AS embargo_us
  FROM bounds
), tagged AS (
  SELECT CASE
           WHEN epoch_us(ts) < cutoff_us - embargo_us THEN 'train'
           WHEN epoch_us(ts) >= cutoff_us THEN 'eval'
           ELSE 'embargo'
         END AS split,
         user_id, ts
  FROM events, cut
)
SELECT split,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(ts) AS min_ts,
       max(ts) AS max_ts
FROM tagged GROUP BY split
"""


@register(
    "sample_temporal_split_embargo",
    oracle=_TEMPORAL_SPLIT_ORACLE,
    tags=("sampling", "training", "timeseries"),
)
def sample_temporal_split_embargo(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    bounds = e.groupBy().agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("lo"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("hi"),
    )
    cut = bounds.select(
        (
            F.col("lo")
            + F.expr("((hi - lo) * 8) div 10")
        ).alias("cutoff_us"),
        F.lit(86400000000).cast("long").alias("embargo_us"),
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tagged = e.crossJoin(F.broadcast(cut)).select(
        F.when(us < F.col("cutoff_us") - F.col("embargo_us"), "train")
        .when(us >= F.col("cutoff_us"), "eval")
        .otherwise("embargo")
        .alias("split"),
        "user_id",
        "ts",
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
