"""Corpus-cleaning text operators: markup stripping, Unicode normalization,
readability scoring, feature hashing, Zipf coverage profiling.

The standard pre-training text-cleaning ladder (C4/RefinedWeb/FineWeb
pipelines): strip HTML to visible text, normalize Unicode (NFC + control
characters), score readability, hash features into a fixed-width space,
and profile the token distribution's head. The synthetic documents table
holds clean space-separated words, so the dirty inputs (markup, combining
characters, control bytes) are CONSTRUCTED deterministically inside each
query from doc fields — both engines build the identical dirty text, so
the cleaning transforms are verified as exact round-trips rather than
vibes. Everything except the NFC step is JVM-side codegen; NFC uses one
Arrow-batched pandas UDF (there is no built-in normalizer in either
Spark's function library or codegen) with the DuckDB ``nfc_normalize``
twin as the oracle.

Reference parity note: the reference pipeline normalizes records only
field-wise (``src/open_molecule_data_pipeline/ingestion/normalize.py``);
corpus-level text cleaning is part of the training-data surface this
engine adds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread

# --------------------------------------------------------------------------
# HTML strip: build markup around each doc (every token its own <p>, an
# <h1> from source, a <script> payload that must be dropped wholesale, and
# entity-encoded text), then strip: script blocks, tags, entity decode,
# whitespace collapse. Round-trip check: the stripped text must equal the
# exact expected visible text, per doc, counted per language.
# --------------------------------------------------------------------------

_HTML_ORACLE = """
WITH built AS (
  SELECT lang,
         source || ' ' || text || ' x & y <z>' AS expected,
         '<html><body><h1>' || source || '</h1><p>'
           || replace(text, ' ', '</p><p>')
           || '</p><script>var id=' || cast(doc_id AS VARCHAR)
           || ';</script><p>x &amp; y &lt;z&gt;</p></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT lang, expected,
         trim(regexp_replace(
           replace(replace(replace(
             regexp_replace(
               regexp_replace(html, '<script>.*?</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
           ' +', ' ', 'g')) AS visible
  FROM built
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN visible = expected THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip_ok,
       cast(sum(len(string_split(visible, ' '))) AS BIGINT) AS sum_tokens,
       cast(sum(length(visible)) AS BIGINT) AS sum_chars
FROM stripped
GROUP BY lang
"""


# bench demoted r15: text_kn_fivegram_ppl promoted under the cap-34 swap
# policy; this regex-scan plan shape stays tracked via text_quality_score
@register("text_html_strip", oracle=_HTML_ORACLE, tags=("text",))
def text_html_strip(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.regexp_replace("text", " ", "</p><p>"),
        F.lit("</p><script>var id="),
        F.col("doc_id").cast("string"),
        F.lit(";</script><p>x &amp; y &lt;z&gt;</p></body></html>"),
    )
    # &amp; must decode LAST (after &lt;/&gt;) so '&amp;lt;' style double
    # encodings never appear; same order as the oracle.
    visible = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_replace(html, "<script>.*?</script>", " "),
                            "<[^>]+>",
                            " ",
                        ),
                        "&lt;",
                        "<",
                    ),
                    "&gt;",
                    ">",
                ),
                "&amp;",
                "&",
            ),
            " +",
            " ",
        )
    )
    expected = F.concat(F.col("source"), F.lit(" "), F.col("text"), F.lit(" x & y <z>"))
    per_doc = d.select(
        "lang",
        visible.alias("visible"),
        (visible == expected).cast("long").alias("ok"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ok").alias("n_roundtrip_ok"),
        F.sum(F.size(F.split("visible", " "))).alias("sum_tokens"),
        F.sum(F.length("visible")).alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# Unicode normalization: docs get combining-acute sequences (a + U+0301)
# and control bytes injected deterministically; cleaning strips controls
# then NFC-composes. Spark side: one Arrow-batched pandas UDF around
# unicodedata (no JVM builtin exists); oracle: DuckDB's utf8proc-backed
# nfc_normalize. Both implement Unicode normalization, so agreement is the
# spec, not luck.
# --------------------------------------------------------------------------

_UNICODE_ORACLE = """
WITH dirty AS (
  SELECT lang,
         (CASE WHEN doc_id % 3 = 0
               THEN replace(text, 'a', 'a' || chr(769)) ELSE text END)
         || (CASE WHEN doc_id % 5 = 0 THEN chr(7) || chr(8) ELSE '' END)
           AS dt
  FROM documents
),
cleaned AS (
  SELECT lang, dt,
         nfc_normalize(regexp_replace(dt, '[\\x00-\\x1F\\x7F]', '', 'g')) AS ct
  FROM dirty
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN ct <> dt THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       cast(sum(length(dt)) AS BIGINT) AS sum_chars_dirty,
       cast(sum(length(ct)) AS BIGINT) AS sum_chars_clean
FROM cleaned
GROUP BY lang
"""


@F.pandas_udf(T.StringType())
def _nfc_clean(s):
    import re
    import unicodedata

    ctrl = re.compile(r"[\x00-\x1f\x7f]")
    return s.map(
        lambda t: unicodedata.normalize("NFC", ctrl.sub("", t))
        if t is not None
        else None
    )


@register("text_unicode_clean", oracle=_UNICODE_ORACLE, tags=("text",))
def text_unicode_clean(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    dirty = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            # replacement is 'a' + U+0301 COMBINING ACUTE (decomposed; NFC composes)
            F.regexp_replace("text", "a", "a\u0301"),
        ).otherwise(F.col("text")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("\x07\x08")).otherwise(F.lit("")),
    )
    per_doc = d.select("lang", dirty.alias("dt")).withColumn(
        "ct", _nfc_clean(F.col("dt"))
    )
    # length() counts UTF-16 units in Spark vs codepoints in DuckDB — equal
    # here because every character involved (combining acute, controls,
    # composed latin) is BMP.
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ct") != F.col("dt")).cast("long")).alias("n_changed"),
        F.sum(F.length("dt")).alias("sum_chars_dirty"),
        F.sum(F.length("ct")).alias("sum_chars_clean"),
    )


# --------------------------------------------------------------------------
# Flesch-style readability, integer-exact: words from the token count,
# syllables approximated as vowel-group runs, sentences synthesized as
# ceil(words/8) (the corpus has no sentence punctuation). The classic
# coefficients scaled x1000 with integer division keep the whole score in
# int64 — zero libm, bit-identical across engines.
# --------------------------------------------------------------------------

_FLESCH_ORACLE = """
WITH scored AS (
  SELECT lang,
         len(string_split(text, ' ')) AS w,
         len(regexp_extract_all(text, '[aeiouy]+')) AS syl,
         (len(string_split(text, ' ')) + 7) // 8 AS s
  FROM documents
  WHERE length(text) > 0
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(206835 - (1015 * w) // s - (84600 * syl) // w) AS BIGINT)
         AS sum_score_milli,
       cast(min(206835 - (1015 * w) // s - (84600 * syl) // w) AS BIGINT)
         AS min_score_milli,
       cast(max(206835 - (1015 * w) // s - (84600 * syl) // w) AS BIGINT)
         AS max_score_milli
FROM scored
GROUP BY lang
"""


@register("text_flesch_readability", oracle=_FLESCH_ORACLE, tags=("text",))
def text_flesch_readability(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    base = d.filter(F.length("text") > 0).select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("w"),
        F.regexp_count("text", F.lit("[aeiouy]+")).cast("long").alias("syl"),
    )
    scored = base.select(
        "lang",
        (
            F.lit(206835)
            - F.expr("(1015 * w) div ((w + 7) div 8)")
            - F.expr("(84600 * syl) div w")
        ).alias("score"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score").alias("sum_score_milli"),
        F.min("score").alias("min_score_milli"),
        F.max("score").alias("max_score_milli"),
    )


# --------------------------------------------------------------------------
# Feature hashing ("the hashing trick"): terms land in a fixed 256-bucket
# space via an md5 prefix, the exact construction a streaming featurizer
# uses when the vocabulary cannot be enumerated. Output = the 20 heaviest
# buckets with their collision width (distinct terms sharing the bucket) —
# bounded top-k, so the plan is TakeOrderedAndProject, never a global sort.
# --------------------------------------------------------------------------

_FEATHASH_ORACLE = """
WITH terms AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
buckets AS (
  SELECT substr(md5(term), 1, 2) AS bucket,
         cast(count(*) AS BIGINT) AS total_cnt,
         cast(count(DISTINCT term) AS BIGINT) AS n_terms
  FROM terms GROUP BY 1
)
SELECT bucket, n_terms, total_cnt
FROM buckets
ORDER BY total_cnt DESC, bucket
LIMIT 20
"""


@register("text_feature_hashing", oracle=_FEATHASH_ORACLE, tags=("text",))
def text_feature_hashing(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    terms = d.select(F.explode(F.split("text", " ")).alias("term"))
    buckets = terms.groupBy(
        F.substring(F.md5("term"), 1, 2).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("total_cnt"),
        F.countDistinct("term").alias("n_terms"),
    )
    return (
        buckets.orderBy(F.col("total_cnt").desc(), "bucket")
        .limit(20)
        .select("bucket", "n_terms", "total_cnt")
    )


# --------------------------------------------------------------------------
# Zipf coverage: how much of the corpus the top-10/100/1000 words cover —
# the profile that sizes vocabularies and stopword lists. Scale shape: the
# head is isolated with a bounded top-k (TakeOrderedAndProject over the
# word counts), and rank/cumulative-coverage over the 1000-row head comes
# from a broadcast theta self-join (the skyline trick) instead of a global
# window; the corpus total is a broadcast scalar.
# --------------------------------------------------------------------------

_ZIPF_K = 1000

_ZIPF_ORACLE = f"""
WITH counts AS (
  SELECT term, cast(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
  GROUP BY term
),
head AS (
  SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT {_ZIPF_K}
),
tot AS (SELECT sum(cnt) AS total FROM counts),
ranked AS (
  SELECT a.term,
         cast(count(*) AS BIGINT) AS r,
         cast(sum(b.cnt) AS BIGINT) AS cum_cnt
  FROM head a JOIN head b
    ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.term <= a.term)
  GROUP BY a.term
)
SELECT r,
       cum_cnt,
       cast((cum_cnt * 1000000) // (SELECT total FROM tot) AS BIGINT)
         AS share_ppm
FROM ranked
WHERE r IN (10, 100, {_ZIPF_K})
"""


@register("text_zipf_coverage", oracle=_ZIPF_ORACLE, tags=("text",))
def text_zipf_coverage(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    head = counts.orderBy(F.col("cnt").desc(), "term").limit(_ZIPF_K)
    tot = counts.groupBy().agg(F.sum("cnt").alias("total"))
    a = head.select(F.col("term").alias("t_a"), F.col("cnt").alias("c_a"))
    b = head.select(F.col("term").alias("t_b"), F.col("cnt").alias("c_b"))
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("c_b") > F.col("c_a"))
            | ((F.col("c_b") == F.col("c_a")) & (F.col("t_b") <= F.col("t_a"))),
        )
        .groupBy("t_a")
        .agg(F.count(F.lit(1)).alias("r"), F.sum("c_b").alias("cum_cnt"))
    )
    return (
        ranked.filter(F.col("r").isin(10, 100, _ZIPF_K))
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "cum_cnt",
            # cum_cnt ~ total token count: x1e6 wraps int64 past ~9e12
            # tokens, so the ppm numerator runs in decimal(38,0)
            F.expr(
                "cast((cast(cum_cnt as decimal(38,0)) * 1000000) div total"
                "     as long)"
            ).alias("share_ppm"),
        )
    )
