"""Vocabulary drift between corpus slices (r14 stretch): per-language
Jensen-Shannon divergence of token distributions — the TEXT twin of
``profile_psi_drift`` (numeric-bucket PSI over order prices). Crawl
pipelines run exactly this between snapshots to catch scraper breakage,
template churn, and language mix shifts before they poison a training
mix; PSI can't see any of it because vocabulary is not binnable.

Slices reuse the repo's deterministic doc-hash split (md5(doc_id) last
hex nibble < '8' => slice A, ~= half the corpus — the
``text_train_eval_split`` convention), standing in for two crawl
snapshots. Per language:

    JS(P, Q) = 0.5 * sum_t p_t ln(p_t / m_t) + 0.5 * sum_t q_t ln(q_t / m_t)
    m_t = (p_t + q_t) / 2

with each token's contribution computed from INTEGER counts through one
shared double expression — the ln argument is the rational
``2 * ca * Nb / (ca * Nb + cb * Na)`` so both engines evaluate the same
quotient — then nano-quantized to int64 BEFORE summation (the lsum
playbook; nano sits ~7 orders above ln's cross-engine ulp noise, the
``graph_modularity`` precedent). Zero-count sides contribute exactly 0
(their CASE arm never evaluates ln). JS is bounded by ln 2, so the
per-language sum is far inside int64 at any scale.

Also reports each language's highest-drift token (argmin of
(-contribution, token) via a map-side-combinable struct-min — no
window, no driver).

Plan shape (100 TB): ONE token explode -> groupBy(lang, token) with
conditional slice counts (map-side combinable), lang totals from a
second bounded agg on the vocab table, contribution math on the
Heaps-sublinear vocab table, final per-lang rollup. No corpus-sized
shuffle beyond the token count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

# one shared rational-to-double contribution, nano-quantized; {ca}/{cb}
# are integer slice counts, {na}/{nb} integer slice totals
_CONTRIB = (
    "cast(round(("
    "CASE WHEN {ca} > 0 THEN 0.5 * (cast({ca} AS DOUBLE) / {na})"
    " * ln((2 * cast({ca} AS DOUBLE) * {nb})"
    " / (cast({ca} AS DOUBLE) * {nb} + cast({cb} AS DOUBLE) * {na}))"
    " ELSE 0 END"
    " + CASE WHEN {cb} > 0 THEN 0.5 * (cast({cb} AS DOUBLE) / {nb})"
    " * ln((2 * cast({cb} AS DOUBLE) * {na})"
    " / (cast({ca} AS DOUBLE) * {nb} + cast({cb} AS DOUBLE) * {na}))"
    " ELSE 0 END) * 1000000000) AS BIGINT)"
)

_DRIFT_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         substr(md5(cast(doc_id AS VARCHAR)), 32, 1) < '8' AS in_a,
         unnest(list_filter(string_split(text, ' '),
                            x -> length(x) > 0)) AS token
  FROM documents
),
tc AS (
  SELECT lang, token,
         cast(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         cast(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM toks GROUP BY lang, token
),
lt AS (
  SELECT lang,
         cast(sum(ca) AS BIGINT) AS na, cast(sum(cb) AS BIGINT) AS nb,
         cast(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
         cast(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b
  FROM tc GROUP BY lang
),
contrib AS (
  SELECT tc.lang, tc.token,
         {_CONTRIB.format(ca="tc.ca", cb="tc.cb", na="lt.na", nb="lt.nb")}
           AS c_nano
  FROM tc JOIN lt ON lt.lang = tc.lang
)
SELECT c.lang, lt.na AS tokens_a, lt.nb AS tokens_b,
       lt.vocab_a, lt.vocab_b,
       cast(sum(c.c_nano) AS BIGINT) AS js_nano,
       min({{'nc': -c.c_nano, 'tok': c.token}}).tok AS top_drift_token,
       cast(max(c.c_nano) AS BIGINT) AS top_drift_nano
FROM contrib c JOIN lt ON lt.lang = c.lang
GROUP BY c.lang, lt.na, lt.nb, lt.vocab_a, lt.vocab_b
ORDER BY c.lang
"""


@register(
    "text_vocab_drift_js",
    oracle=_DRIFT_ORACLE,
    tags=("text", "quality", "profile"),
)
def text_vocab_drift_js(spark, sf_dir):
    """Per-language Jensen-Shannon vocabulary drift between the two
    deterministic doc-hash slices, with the highest-drift token."""
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "lang",
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1) < "8"
        ).alias("in_a"),
        F.explode(
            F.expr("filter(split(text, ' '), x -> length(x) > 0)")
        ).alias("token"),
    )
    tc = toks.groupBy("lang", "token").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1))
        .cast("long")
        .alias("cb"),
    )
    lt = tc.groupBy("lang").agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum((F.col("ca") > 0).cast("long")).cast("long").alias("vocab_a"),
        F.sum((F.col("cb") > 0).cast("long")).cast("long").alias("vocab_b"),
    )
    # lang table is bounded (5 langs) and aggregate-derived — broadcast
    contrib = tc.join(F.broadcast(lt), "lang").withColumn(
        "c_nano",
        F.expr(_CONTRIB.format(ca="ca", cb="cb", na="na", nb="nb")),
    )
    return (
        contrib.groupBy("lang", "na", "nb", "vocab_a", "vocab_b")
        .agg(
            F.sum("c_nano").cast("long").alias("js_nano"),
            F.min(
                F.struct(
                    (-F.col("c_nano")).alias("nc"),
                    F.col("token").alias("tok"),
                )
            )["tok"].alias("top_drift_token"),
            F.max("c_nano").cast("long").alias("top_drift_nano"),
        )
        .select(
            "lang",
            F.col("na").alias("tokens_a"),
            F.col("nb").alias("tokens_b"),
            "vocab_a",
            "vocab_b",
            "js_nano",
            "top_drift_token",
            "top_drift_nano",
        )
        .orderBy("lang")
    )
