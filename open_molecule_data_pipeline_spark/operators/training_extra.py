"""Training-corpus mixing and incremental-dedup operators.

Two production shapes a 100 TB pipeline runs constantly:

- **Temperature-weighted source mixing** (`sample_temperature_mix`):
  down-weight head sources with rate ∝ (n_source / n_max)^0.5 — the
  standard multinomial temperature trick for corpus balance. Sampling is a
  deterministic md5-nibble Bernoulli (no RNG state, same rows every run /
  engine); rates are quantized to 16ths so the keep predicate is a plain
  lexicographic hex compare in both engines (floor() not round(): floor of
  an IEEE-exact double is engine-stable, round's half-way rule is not).
- **Incremental dedup** (`dedup_incremental_batch`): dedupe a NEW batch
  against the existing corpus without rescoring the corpus against itself
  — the nightly-ingest shape. The new batch's MinHash band keys equi-join
  the corpus band index (in production: the persisted band table, cf.
  `sim_ivf_persisted` for the partitioned-index pattern); cost tracks the
  batch size and band collisions, never corpus x corpus.

Both reuse the deterministic md5-based primitives of `dedup.py` /
`sample_bernoulli_hash`, so DuckDB reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import N_BANDS, _minhash_sig_df

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
# Incremental dedup: the "new batch" is the deterministic 1/16 md5 slice of
# documents (stands in for tonight's ingest); every new doc that shares a
# MinHash band with any corpus doc is flagged with its smallest banded
# corpus neighbor. The corpus never joins itself.
# --------------------------------------------------------------------------

# sigs CTE and band expressions are imported from dedup.py so the two
# ladders cannot drift apart.
from .dedup import _SIG_DUCK_CTE  # noqa: E402

_INCREMENTAL_ORACLE = f"""
WITH sigs AS ({_SIG_DUCK_CTE}),
bands AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT doc_id,
           unnest([{', '.join(str(b) for b in range(N_BANDS))}]) AS band_id,
           unnest([{', '.join(f'md5(sig_{2 * b} || sig_{2 * b + 1})' for b in range(N_BANDS))}]) AS band_key
    FROM sigs
  ) u
),
tagged AS (
  SELECT *, substr(md5(cast(doc_id AS VARCHAR)), 1, 1) = '0' AS is_new
  FROM bands
)
SELECT n.doc_id, cast(min(c.doc_id) AS BIGINT) AS dup_of
FROM tagged n
JOIN tagged c
  ON n.band_id = c.band_id AND n.band_key = c.band_key
 AND n.is_new AND NOT c.is_new
GROUP BY n.doc_id
"""


@register(
    "dedup_incremental_batch",
    oracle=_INCREMENTAL_ORACLE,
    tags=("dedup", "minhash", "incremental"),
)
def dedup_incremental_batch(spark, sf_dir):
    sigs = _minhash_sig_df(spark, sf_dir)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(F.col(f"sig_{2 * b}"), F.col(f"sig_{2 * b + 1}"))
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_entries).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    newb = bands.filter(is_new).select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_key"
    )
    corp = bands.filter(~is_new).select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    return (
        newb.join(corp, ["band_id", "band_key"])
        .groupBy(F.col("new_doc").alias("doc_id"))
        .agg(F.min("corpus_doc").alias("dup_of"))
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
