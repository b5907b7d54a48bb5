"""Retrieval scoring over the documents corpus: BM25 top-k.

The classic inverted-index ranking function, expressed as pure DataFrame
algebra so Catalyst keeps it JVM-side end to end:

- tokenize = ``split`` + ``explode`` (a JVM ``Generate``, no Python),
- term frequencies = one partial-aggregated ``groupBy(doc, term)``,
- document frequencies = one ``groupBy(term)`` over the (tiny) query-term
  subset, broadcast back,
- corpus stats (N, avgdl) = a single aggregate row, broadcast,
- final score = ``sum`` per doc + ``TakeOrderedAndProject`` top-k — never a
  global sort.

At 100 TB the only shuffle is the (doc_id, term) partial aggregation; the
query side (terms, df, corpus stats) stays broadcast however large the
corpus grows. Scores are rounded to 6 digits before ranking so a libm ulp
difference between the JVM's ``Math.log`` and DuckDB's ``std::log`` cannot
flip the ordering (same playbook as the IVF rounded-cosine ranking in
``similarity.py``).

BM25 constants: k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))
(the Robertson/Sparck-Jones form with the +1 that keeps idf positive).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

_TERMS = ("dup", "vector", "key")  # one rare term (high idf), two common
_K1 = 1.2
_B = 0.75
_TOPK = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         cast(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(dl) AS BIGINT) AS sum_dl
  FROM (SELECT doc_id, max(dl) AS dl FROM toks GROUP BY doc_id) d
),
tf AS (
  SELECT doc_id, w, cast(count(*) AS BIGINT) AS tf, max(dl) AS dl
  FROM toks WHERE w IN ({_TERMS_SQL}) GROUP BY doc_id, w
),
df AS (
  SELECT w, cast(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE w IN ({_TERMS_SQL}) GROUP BY w
),
scored AS (
  SELECT t.doc_id,
         sum(
           ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({_K1} + 1))
           / (t.tf + {_K1} * (1 - {_B} + {_B} * t.dl
                              / (cast(s.sum_dl AS DOUBLE) / s.n_docs)))
         ) AS score
  FROM tf t JOIN df d ON t.w = d.w CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, round(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {_TOPK}
"""


@register("text_bm25_topk", oracle=_BM25_ORACLE, tags=("text", "similarity"))
def text_bm25_topk(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tk = F.split("text", " ")
    toks = d.select(
        "doc_id",
        F.explode(tk).alias("w"),
        F.size(tk).cast("long").alias("dl"),
    )
    stats = toks.groupBy("doc_id").agg(F.max("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    hits = toks.filter(F.col("w").isin(*_TERMS))
    tf = hits.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    df = hits.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * (F.col("tf") * (_K1 + 1))
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOPK)
    )
