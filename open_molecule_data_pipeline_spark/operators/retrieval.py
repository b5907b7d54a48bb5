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


@register(
    "text_bm25_topk", oracle=_BM25_ORACLE, tags=("text", "similarity"), bench=True
)
def text_bm25_topk(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tk = F.split("text", " ")
    toks = d.select(
        "doc_id",
        F.explode(tk).alias("w"),
        F.size(tk).cast("long").alias("dl"),
    )
    # r8: corpus stats (N, sum of doc lengths) come straight from size(tk)
    # per document — the old form aggregated the EXPLODED token stream by
    # doc_id first, shuffling every corpus token to recover per-doc lengths
    # the scan already had (7.6x cold at sf1: 3.9 -> 0.5s, same output).
    stats = d.select(F.size(tk).cast("long").alias("dl")).agg(
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


# --------------------------------------------------------------------------
# Persisted inverted index with partition-pruned lookup — the text twin of
# ``sim_ivf_persisted``. Posting lists (term, doc_id, tf) are written out
# partitioned by a 16-way term-hash bucket; a query for a term set then
# reads ONLY the buckets its terms hash to (static partition pruning — the
# bucket literals are computed from the terms before the plan is built, so
# the FileScan's PartitionFilters prune at planning time, no scan of the
# other 15/16ths). This is how a 100 TB corpus serves term lookups without
# touching the whole index; refreshing the index is an append of new docs'
# postings into the same bucket layout.
# --------------------------------------------------------------------------

import hashlib as _hashlib


def _term_bucket_py(term: str) -> int:
    return int(_hashlib.md5(term.encode()).hexdigest()[0], 16)


_IDX_TERMS = ("dup", "vector", "key")
_IDX_TOP = 3

_IDX_ORACLE = f"""
WITH postings AS (
  SELECT w, doc_id, cast(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) t
  WHERE w IN ({", ".join(f"'{t}'" for t in _IDX_TERMS)})
  GROUP BY w, doc_id
),
ranked AS (
  SELECT w AS term, doc_id, tf,
         row_number() OVER (PARTITION BY w ORDER BY tf DESC, doc_id) AS rn
  FROM postings
)
SELECT term, doc_id, tf FROM ranked WHERE rn <= {_IDX_TOP}
"""


@register(
    "text_inverted_index_persisted",
    oracle=_IDX_ORACLE,
    tags=("text", "formats"),
)
def text_inverted_index_persisted(spark, sf_dir):
    from pyspark.sql import Window as W

    from .file_formats import _scratch

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    postings = (
        toks.groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket",
            F.expr("instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1"),
        )
    )
    out = _scratch("invidx", sf_dir)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(str(out))

    wanted_buckets = sorted({_term_bucket_py(t) for t in _IDX_TERMS})
    lists = (
        spark.read.parquet(str(out))
        .filter(F.col("bucket").isin(wanted_buckets))
        .filter(F.col("w").isin(*_IDX_TERMS))
    )
    rn = F.row_number().over(
        W.partitionBy("w").orderBy(F.desc("tf"), "doc_id")
    )
    return (
        lists.withColumn("rn", rn)
        .filter(F.col("rn") <= _IDX_TOP)
        .select(F.col("w").alias("term"), "doc_id", "tf")
    )
