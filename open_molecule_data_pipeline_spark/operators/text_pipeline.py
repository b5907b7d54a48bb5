"""Training-data pipeline operators over the documents table: deterministic
dataset splitting, sequence packing, repetition scoring, and TF-IDF feature
extraction.

These are the LLM-corpus ops that sit downstream of dedup/quality filtering
in a 100 TB pipeline:
- the split must be a pure function of the record key (no sampling state to
  coordinate across executors) → md5-bucket on doc_id;
- packing assigns docs to fixed-token-budget bins from a running token
  total (one window, one shuffle; bin boundaries are exact integers);
- repetition ratio is the distinct-token share — a cheap boilerplate
  signal computed entirely JVM-side;
- TF-IDF ranks within-doc terms against corpus document frequency; the
  only irrational step (ln) is rounded to 6 digits *before* ranking so the
  cross-engine ordering cannot flip on a last-ulp difference.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

# --------------------------------------------------------------------------
# Deterministic train/eval split: last md5 hex nibble of the key gives 16
# uniform buckets; '0'..'c' (12/16 = 75%) → train. Lexicographic compare on
# one lowercase hex char is portable across engines.
# --------------------------------------------------------------------------

_SPLIT_ORACLE = """
SELECT CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 32, 1) < 'd'
            THEN 'train' ELSE 'eval' END AS split,
       lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 32, 1) < 'd'
              THEN 'train' ELSE 'eval' END, lang
"""


@register("text_train_eval_split", oracle=_SPLIT_ORACLE, tags=("text", "split"))
def text_train_eval_split(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    split = F.when(nibble < "d", "train").otherwise("eval")
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Sequence packing: assign docs (in doc_id order) to contiguous bins of
# ~2048 tokens by the running token total's start offset. All integers
# until one division by a double constant — identical on both sides.
# The global ordered window is the one inherently serial step; at 100 TB
# you'd pack per shard (partitionBy a shard key) — the per-shard plan is
# this same window with a partition clause.
# --------------------------------------------------------------------------

_PACK_ORACLE = """
WITH toks AS (
  SELECT doc_id, cast(len(string_split(text, ' ')) AS INTEGER) AS n_tok
  FROM documents
), packed AS (
  SELECT doc_id, n_tok,
         cast(floor((sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
                    / cast(2048 AS DOUBLE)) AS BIGINT) AS bin
  FROM toks
)
SELECT bin, cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_tok) AS BIGINT) AS bin_tokens,
       cast(min(doc_id) AS BIGINT) AS first_doc
FROM packed
GROUP BY bin
"""


@register("text_sequence_packing", oracle=_PACK_ORACLE, tags=("text", "packing", "window"))
def text_sequence_packing(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    # scale-safe global running total: range-partition on doc_id, local
    # window per partition, broadcast prefix offsets (operators/_util.py) —
    # no partitionless Window node, so no single-task funnel at 100 TB.
    packed = two_pass_global_window(
        toks, ["doc_id"], value_col="n_tok", out_col="__cum"
    ).withColumn(
        "bin",
        F.floor((F.col("__cum") - F.col("n_tok")) / F.lit(2048.0)).cast("bigint"),
    )
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Repetition ratio: 1 - distinct_tokens/total_tokens, a boilerplate /
# degenerate-text signal. Small-int division with an identical expression
# tree; round(6) for safety at the comparison boundary.
# --------------------------------------------------------------------------

_REP_ORACLE = """
SELECT doc_id,
       cast(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
       cast(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
       round(1 - cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / cast(len(string_split(text, ' ')) AS DOUBLE), 6) AS rep_ratio
FROM documents
"""


@register("text_repetition_ratio", oracle=_REP_ORACLE, tags=("text", "quality"))
def text_repetition_ratio(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_distinct.alias("n_distinct"),
        F.round(
            1 - n_distinct.cast("double") / n_tok.cast("double"), 6
        ).alias("rep_ratio"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document. tf and df are exact counts; idf = ln(N/df)
# is the one libm step, so the score is rounded to 6 digits BEFORE the
# ranking window — equal-to-6-digits scores tie and the term string breaks
# the tie, making the top-3 identical across engines.
# --------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, cast(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, cast(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term
), n AS (
  SELECT cast(count(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(cast(n.n_docs AS DOUBLE) / cast(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf, cast(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
"""


@register("text_tfidf_topterms", oracle=_TFIDF_ORACLE, tags=("text", "tfidf", "window"))
def text_tfidf_topterms(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rn")
    )


# --------------------------------------------------------------------------
# Composite quality filter: the keep/drop gate a corpus pipeline applies
# after dedup — language allowlist, token-count band, repetition cap, mean
# word length band. One JVM-side pass; the first failing rule (fixed CASE
# order) becomes the drop reason, so the decision is auditable.
# --------------------------------------------------------------------------

_FILTER_ORACLE = """
WITH sig AS (
  SELECT doc_id, lang,
         cast(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
         cast(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
         cast(length(text) AS INTEGER) AS n_chars
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN lang NOT IN ('en', 'es', 'fr') THEN 'lang'
         WHEN n_tok < 20 OR n_tok > 1000 THEN 'length'
         WHEN 1 - cast(n_distinct AS DOUBLE) / cast(n_tok AS DOUBLE) > 0.9 THEN 'repetition'
         WHEN cast(n_chars AS DOUBLE) / cast(n_tok AS DOUBLE) < 2.0
           OR cast(n_chars AS DOUBLE) / cast(n_tok AS DOUBLE) > 12.0 THEN 'word_len'
         ELSE 'keep'
       END AS verdict,
       n_tok
FROM sig
"""


@register("text_quality_filter", oracle=_FILTER_ORACLE, tags=("text", "quality", "filter"))
def text_quality_filter(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
    )
    rep = 1 - F.col("n_distinct").cast("double") / F.col("n_tok").cast("double")
    wlen = F.col("n_chars").cast("double") / F.col("n_tok").cast("double")
    verdict = (
        F.when(~F.col("lang").isin("en", "es", "fr"), "lang")
        .when((F.col("n_tok") < 20) | (F.col("n_tok") > 1000), "length")
        .when(rep > 0.9, "repetition")
        .when((wlen < 2.0) | (wlen > 12.0), "word_len")
        .otherwise("keep")
    )
    return sig.select("doc_id", verdict.alias("verdict"), "n_tok")


# --------------------------------------------------------------------------
# Bigram frequency: adjacent-token pairs per language, top-10 each — the
# n-gram language-model statistic. Pairs are built JVM-side by zipping the
# token array with itself shifted one (transform over indexes); ranking is
# on exact counts with a full tie-break.
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
), pairs AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM toks WHERE len(ts) >= 2
), counted AS (
  SELECT lang, bigram, cast(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY lang, bigram
)
SELECT lang, bigram, n, cast(rn AS INTEGER) AS rn FROM (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
  FROM counted
) t WHERE rn <= 10
"""


@register("text_bigram_top10", oracle=_BIGRAM_ORACLE, tags=("text", "ngram", "window"))
def text_bigram_top10(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("ts")).filter(
        F.size("ts") >= 2
    )
    # element_at is 1-based; sequence(1, n-1) is safe because n >= 2 here
    # (Spark's sequence DESCENDS when stop < start — the length filter
    # guards it, playbook rule).
    bigrams = toks.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("ts", i), F.element_at("ts", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    counted = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "bigram", "n", "rn")
    )


# --------------------------------------------------------------------------
# Gopher-style quality rule report (Rae et al. 2021, Appendix A): unlike
# text_quality_filter's CASCADE (each doc gets its first failing verdict),
# every rule here is evaluated INDEPENDENTLY per doc and reported as a
# per-language pass rate — the report that tunes thresholds before wiring
# them into the production cascade. All predicates are integer-exact
# (threshold fractions cleared to integer cross-products) and evaluated in
# one scan: per-doc booleans -> per-lang conditional sums -> one explode to
# (lang, rule) rows. No joins, no Python; pass_ppm numerators run in
# decimal(38,0) on Spark / HUGEINT in the oracle (n_pass * 1e6 overflows
# int64 past ~9e12 docs; the div quotient is <= 1e6, so the long cast-back
# is bound-safe — decimal div wraps silently, see ml_eval.py). HUGEINT
# rather than DECIMAL on the DuckDB side because DuckDB's DECIMAL //
# ROUNDS where HUGEINT // floors; Spark's decimal `div` truncates
# (== floor for positives).
# Gopher's line-based rules (bullet/ellipsis line fractions, duplicate
# lines) are omitted: the synthetic corpus is single-line by construction,
# and dedup_boilerplate_lines / dedup_paragraphs already cover recurring
# segments. The required-word list is parametrized to the corpus' function
# words (Gopher uses 8 English stopwords; this vocabulary has none).
# --------------------------------------------------------------------------

_GOPHER_REQUIRED = ("data", "table", "row", "value", "key")
_GOPHER_RULES = (
    # rule name, DuckDB predicate over sig columns (Spark twin built below)
    ("word_count_50_100k", "nw >= 50 AND nw <= 100000"),
    ("mean_word_len_3_10", "3 * nw <= sum_len AND sum_len <= 10 * nw"),
    ("symbol_ratio_le_10pct", "10 * (n_hash + n_ellipsis) <= nw"),
    ("alpha_words_ge_80pct", "5 * n_alpha >= 4 * nw"),
    ("required_words_ge_2", "n_required >= 2"),
)

_GOPHER_ORACLE = f"""
WITH sig AS (
  SELECT lang,
         cast(len(string_split(text, ' ')) AS BIGINT) AS nw,
         cast(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_len,
         cast(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
         cast((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_ellipsis,
         cast(len(list_filter(string_split(text, ' '),
                              t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         cast(len(list_intersect(string_split(text, ' '),
                                 {list(_GOPHER_REQUIRED)})) AS BIGINT) AS n_required
  FROM documents
),
per_lang AS (
  SELECT lang, cast(count(*) AS BIGINT) AS n_docs,
         {", ".join(
             f"cast(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS p{i}"
             for i, (_, pred) in enumerate(_GOPHER_RULES)
         )}
  FROM sig GROUP BY lang
)
{" UNION ALL ".join(
    f"SELECT lang, '{name}' AS rule, n_docs, p{i} AS n_pass, "
    f"cast((cast(p{i} AS HUGEINT) * 1000000) // n_docs AS BIGINT) AS pass_ppm "
    f"FROM per_lang"
    for i, (name, _) in enumerate(_GOPHER_RULES)
)}
"""


@register(
    "text_gopher_quality_rules",
    oracle=_GOPHER_ORACLE,
    tags=("text", "quality", "agg"),
)
def text_gopher_quality_rules(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = d.select(
        "lang",
        F.size(toks).cast("long").alias("nw"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
        .cast("long")
        .alias("n_hash"),
        (
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit("...")))
            )
            / 3
        )
        .cast("long")
        .alias("n_ellipsis"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
        .cast("long")
        .alias("n_alpha"),
        F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(wd) for wd in _GOPHER_REQUIRED])
            )
        )
        .cast("long")
        .alias("n_required"),
    )
    preds = {
        "word_count_50_100k": (F.col("nw") >= 50) & (F.col("nw") <= 100000),
        "mean_word_len_3_10": (3 * F.col("nw") <= F.col("sum_len"))
        & (F.col("sum_len") <= 10 * F.col("nw")),
        "symbol_ratio_le_10pct": 10 * (F.col("n_hash") + F.col("n_ellipsis"))
        <= F.col("nw"),
        "alpha_words_ge_80pct": 5 * F.col("n_alpha") >= 4 * F.col("nw"),
        "required_words_ge_2": F.col("n_required") >= 2,
    }
    agg = sig.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"p{i}")
            for i, pred in enumerate(preds.values())
        ],
    )
    rules = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"p{i}").alias("n_pass")
            )
            for i, name in enumerate(preds)
        ]
    )
    return (
        agg.select("lang", "n_docs", F.explode(rules).alias("x"))
        .select(
            "lang",
            "x.rule",
            "n_docs",
            "x.n_pass",
            F.expr(
                "cast((cast(n_pass AS DECIMAL(38,0)) * 1000000)"
                "     div n_docs AS BIGINT)"
            ).alias("pass_ppm"),
        )
    )
