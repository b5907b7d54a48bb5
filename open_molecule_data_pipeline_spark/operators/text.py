"""Text-analysis operators over the documents table: token statistics, word
frequency, quality scoring, stopword language ID, document fingerprints.

These are LLM-training-pipeline operators the reference only planned
(reference ``docs/system-plan.md:24-27``). Everything is built-in array/
string expressions — tokenization, shingling and hashing all run inside
whole-stage codegen with zero Python UDFs, so per-row cost is JVM-only and
the ops are embarrassingly parallel (no shuffle except the final
aggregations).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Shared fragments: tokens / distinct word list, kept textually parallel
# between the Spark expressions and the DuckDB oracle.
_tokens_spark = lambda: F.split(F.col("text"), " ")  # lazy: needs an active session
_TOKENS_DUCK = "string_split(text, ' ')"


def _in_set(var: str, words: tuple[str, ...]) -> str:
    """Lambda-safe membership test (DuckDB lambdas dislike IN lists)."""
    return " or ".join(f"{var} = '{w}'" for w in words)


# --------------------------------------------------------------------------
# token statistics
# --------------------------------------------------------------------------

_TOKEN_ORACLE = f"""
SELECT doc_id, lang,
       cast(len({_TOKENS_DUCK}) AS INTEGER) AS n_tokens,
       cast(length(replace(text, ' ', '')) AS INTEGER) AS n_letters,
       round(cast(length(replace(text, ' ', '')) AS DOUBLE)
             / len({_TOKENS_DUCK}), 6) AS avg_token_len
FROM documents
"""


@register("text_token_stats", oracle=_TOKEN_ORACLE, tags=("text",))
def text_token_stats(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    n_tokens = F.size(_tokens_spark())
    n_letters = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_letters.alias("n_letters"),
        F.round(n_letters.cast("double") / n_tokens, 6).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# corpus word frequency, top 20 — explode + count + deterministic top-k.
# At scale: the explode output is wide but the partial aggregation collapses
# it map-side; the final top-k sorts only the distinct vocabulary.
# --------------------------------------------------------------------------

_FREQ_ORACLE = f"""
SELECT word, n FROM (
  SELECT word, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, word) AS rn
  FROM (SELECT unnest({_TOKENS_DUCK}) AS word FROM documents) t
  GROUP BY word
) r WHERE rn <= 20
"""


@register("text_word_freq_top20", oracle=_FREQ_ORACLE, tags=("text",), bench=True)
def text_word_freq_top20(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    counts = (
        d.select(F.explode(_tokens_spark()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # global top-k as orderBy().limit() -> TakeOrderedAndProject (per-partition
    # heaps + bounded merge), never a partitionless Window over the vocabulary
    return counts.orderBy(F.col("n").desc(), "word").limit(20)


# --------------------------------------------------------------------------
# quality score: stopword ratio + length signals, the standard cheap
# pretraining-data heuristics. Pure array lambdas, no explode.
# --------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
SELECT doc_id,
       round(stop_ratio, 6) AS stop_ratio,
       round(0.5 * stop_ratio
             + 0.3 * least(cast(n_tokens AS DOUBLE) / 100.0, 1.0)
             + 0.2 * least(avg_len / 10.0, 1.0), 6) AS quality
FROM (
  SELECT doc_id,
         cast(len(list_filter({_TOKENS_DUCK}, w -> {_in_set('w', STOPWORDS)}))
              AS DOUBLE) / len({_TOKENS_DUCK}) AS stop_ratio,
         len({_TOKENS_DUCK}) AS n_tokens,
         cast(length(replace(text, ' ', '')) AS DOUBLE)
           / len({_TOKENS_DUCK}) AS avg_len
  FROM documents
) t
"""


# bench r16: demoted for stream_quality_gate_twin (VERDICT r15 #7) —
# the gate twin shares these scoring signals and carries the richer
# streaming plan, so the heuristic scorer's shape stays tracked
@register("text_quality_score", oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality_score(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = _tokens_spark()
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    n_tokens = F.size(toks)
    stop_ratio = n_stop.cast("double") / n_tokens
    avg_len = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    quality = (
        0.5 * stop_ratio
        + 0.3 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
        + 0.2 * F.least(avg_len / 10.0, F.lit(1.0))
    )
    return d.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


# --------------------------------------------------------------------------
# stopword-profile language ID. A real system uses char-n-gram profiles
# (see functions/langid.py for that variant, rows-only); this one is the
# SQL-expressible marker-word scorer so the oracle can confirm it exactly.
# --------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
    "fr": ("le", "les", "une"),
}

_score_duck = {
    lang: f"len(list_filter({_TOKENS_DUCK}, w -> {_in_set('w', words)}))"
    for lang, words in _MARKERS.items()
}

_LANGID_ORACLE = f"""
SELECT doc_id, lang,
       CASE
         WHEN en >= de AND en >= es AND en >= fr THEN 'en'
         WHEN de >= es AND de >= fr THEN 'de'
         WHEN es >= fr THEN 'es'
         ELSE 'fr'
       END AS lang_pred,
       cast(en AS INTEGER) AS en_score,
       cast(de AS INTEGER) AS de_score,
       cast(es AS INTEGER) AS es_score,
       cast(fr AS INTEGER) AS fr_score
FROM (
  SELECT doc_id, lang,
         {_score_duck['en']} AS en,
         {_score_duck['de']} AS de,
         {_score_duck['es']} AS es,
         {_score_duck['fr']} AS fr
  FROM documents
) t
"""


@register("text_langid_stopword", oracle=_LANGID_ORACLE, tags=("text", "langid"))
def text_langid_stopword(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = _tokens_spark()

    def score(words):
        return F.size(F.filter(toks, lambda w: w.isin(*words)))

    scored = d.select(
        "doc_id",
        "lang",
        score(_MARKERS["en"]).alias("en_score"),
        score(_MARKERS["de"]).alias("de_score"),
        score(_MARKERS["es"]).alias("es_score"),
        score(_MARKERS["fr"]).alias("fr_score"),
    )
    en, de, es, fr = (F.col(c) for c in ("en_score", "de_score", "es_score", "fr_score"))
    pred = (
        F.when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return scored.select(
        "doc_id", "lang", pred.alias("lang_pred"),
        "en_score", "de_score", "es_score", "fr_score",
    )


# --------------------------------------------------------------------------
# content-defined fingerprint: md5 over the sorted distinct vocabulary.
# Word-order-insensitive, so trivially reordered copies collapse — the
# cheap tier of the dedup ladder (see operators/dedup.py for MinHash).
# --------------------------------------------------------------------------

_FP_ORACLE = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split(lower(text), ' '))), ' ')) AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=_FP_ORACLE, tags=("text", "dedup"))
def text_fingerprint(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ", F.sort_array(F.array_distinct(F.split(F.lower("text"), " ")))
            )
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash every
# char k-gram, then keep the MINIMUM hash of each sliding window of w
# positions — guarantees any shared substring of length >= k + w - 1
# shares a fingerprint, at ~2/(w+1) selection density. The whole pipeline
# is per-row array algebra (sequence -> transform -> slice -> array_min),
# so the plan has ZERO shuffles and stays in codegen except the md5 calls:
# the shape that fingerprints 100 TB in one map pass. Output is the
# per-doc fingerprint-set summary (count / min / exact int64 checksum);
# the candidate join on shared fingerprints is the same banded equi-join
# as MinHash-LSH (operators/dedup.py).
# --------------------------------------------------------------------------

_WINNOW_K = 8  # char k-gram length
_WINNOW_W = 4  # winnowing window (positions per selection)

_WINNOW_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(length(lower(text)) - {_WINNOW_K - 1}, 0)),
           i -> cast(cast('0x' || substr(md5(substr(lower(text), i, {_WINNOW_K})), 1, 8) AS UBIGINT) AS BIGINT)
         ) AS hashes
  FROM documents
),
fp AS (
  SELECT doc_id,
         len(hashes) AS n_grams,
         list_distinct(list_transform(
           generate_series(1, greatest(len(hashes) - {_WINNOW_W - 1}, 0)),
           i -> list_aggregate(hashes[i : i + {_WINNOW_W - 1}], 'min')
         )) AS fps
  FROM h
)
SELECT doc_id,
       cast(n_grams AS BIGINT) AS n_grams,
       cast(len(fps) AS BIGINT) AS n_fps,
       list_aggregate(fps, 'min') AS fp_min,
       -- coalesce: DuckDB sums an empty list to NULL, Spark's aggregate()
       -- returns its 0 seed — align on 0 for docs shorter than k + w - 1
       cast(coalesce(list_aggregate(fps, 'sum'), 0) AS BIGINT) AS fp_sum
FROM fp
"""


@register(
    "text_winnowing_fingerprints",
    oracle=_WINNOW_ORACLE,
    tags=("text", "dedup"),
)
def text_winnowing_fingerprints(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    k, w = _WINNOW_K, _WINNOW_W
    hashes = (
        f"CASE WHEN length(lower(text)) >= {k} THEN "
        f"transform(sequence(1, length(lower(text)) - {k - 1}), "
        f"i -> cast(conv(substring(md5(substring(lower(text), i, {k})), 1, 8), 16, 10) AS BIGINT)) "
        f"ELSE array() END"
    )
    fps = (
        f"array_distinct(CASE WHEN size(hashes) >= {w} THEN "
        f"transform(sequence(1, size(hashes) - {w - 1}), "
        f"i -> array_min(slice(hashes, i, {w}))) ELSE array() END)"
    )
    return (
        d.select("doc_id", F.expr(hashes).alias("hashes"))
        .select("doc_id", F.size("hashes").cast("long").alias("n_grams"), F.expr(fps).alias("fps"))
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").cast("long").alias("n_fps"),
            F.array_min("fps").alias("fp_min"),
            F.expr(
                "aggregate(fps, cast(0 as bigint), (acc, x) -> acc + x)"
            ).alias("fp_sum"),
        )
    )


# --------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix + per-language precision/recall
# of the stopword classifier against the corpus's lang labels — the eval
# half the classifier above was missing (every model in the repo now
# ships with its own scoring query: IRLS -> AUC/calibration, dedup ->
# recall-vs-exact, langid -> this). Pure composition: the classifier's
# own oracle becomes a CTE, so the eval inherits its determinism. One
# extra (lang, lang_pred) aggregation; precision/recall are single
# divisions of exact counts.
# --------------------------------------------------------------------------

_LANGID_CONF_ORACLE = f"""
WITH preds AS ({_LANGID_ORACLE}),
conf AS (
  SELECT lang, lang_pred, cast(count(*) AS BIGINT) AS n
  FROM preds GROUP BY lang, lang_pred
),
row_t AS (SELECT lang, cast(sum(n) AS BIGINT) AS rt FROM conf GROUP BY lang),
col_t AS (
  SELECT lang_pred, cast(sum(n) AS BIGINT) AS ct FROM conf GROUP BY lang_pred
)
SELECT c.lang, c.lang_pred, c.n,
       round(CASE WHEN c.lang = c.lang_pred
                  THEN c.n / cast(r.rt AS DOUBLE) END, 6) AS recall,
       round(CASE WHEN c.lang = c.lang_pred
                  THEN c.n / cast(t.ct AS DOUBLE) END, 6) AS precision
FROM conf c
JOIN row_t r ON c.lang = r.lang
JOIN col_t t ON c.lang_pred = t.lang_pred
"""


@register(
    "text_langid_confusion", oracle=_LANGID_CONF_ORACLE, tags=("text", "langid", "ml")
)
def text_langid_confusion(spark, sf_dir):
    preds = text_langid_stopword(spark, sf_dir)
    conf = preds.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    row_t = conf.groupBy("lang").agg(F.sum("n").cast("long").alias("rt"))
    col_t = conf.groupBy("lang_pred").agg(F.sum("n").cast("long").alias("ct"))
    diag = F.col("lang") == F.col("lang_pred")
    return (
        conf.join(F.broadcast(row_t), "lang")
        .join(F.broadcast(col_t), "lang_pred")
        .select(
            "lang",
            "lang_pred",
            "n",
            F.round(
                F.when(diag, F.col("n") / F.col("rt").cast("double")), 6
            ).alias("recall"),
            F.round(
                F.when(diag, F.col("n") / F.col("ct").cast("double")), 6
            ).alias("precision"),
        )
    )
