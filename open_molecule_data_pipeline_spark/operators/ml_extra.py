"""ML-adjacent DataFrame operators over the embeddings/documents tables:
a deterministic k-means assignment step, per-label embedding centroids, a
BPE-ish regex tokenizer, and grouping()-labelled rollups.

All JVM-side (higher-order array lambdas, posexplode, regexp_extract_all).
Cross-engine determinism: float→double upcast BEFORE arithmetic, per-row
array folds run in element order in both engines (bit-identical squared
distances), cross-row double averages rounded to 6 digits.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

N_CLUSTERS = 8  # centroids = embeddings with vec_id < N_CLUSTERS

# --------------------------------------------------------------------------
# One Lloyd (k-means) assignment step with deterministic seed centroids.
# Squared-L2 per pair is a fixed-order fold over 64 elements — bit-identical
# in both engines, so the argmin needs no rounding; only the cross-row avg
# is rounded. The centroid side is N_CLUSTERS rows → broadcast; the full
# iteration loop (assign → recompute → repeat) reuses this exact plan per
# round with updated centroid literals, shuffle-free on the corpus side.
# --------------------------------------------------------------------------

_SQDIST = (
    "aggregate(zip_with({a}, {b},"
    " (x, y) -> (cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double))),"
    " cast(0 as double), (acc, v) -> acc + v)"
)

_KMEANS_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding AS e FROM embeddings
), cent AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {N_CLUSTERS}
), scored AS (
  SELECT v.vec_id, cent.cid,
         list_aggregate(
           list_transform(list_zip(v.e, cent.ce),
             p -> (cast(p[1] AS DOUBLE) - cast(p[2] AS DOUBLE))
                  * (cast(p[1] AS DOUBLE) - cast(p[2] AS DOUBLE))),
           'sum') AS d2
  FROM v, cent
), assigned AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM scored
)
SELECT cid, cast(count(*) AS BIGINT) AS n_members,
       round(avg(d2), 6) AS avg_sqdist
FROM assigned WHERE rn = 1
GROUP BY cid
"""


@register("ml_kmeans_assign", oracle=_KMEANS_ORACLE, tags=("ml", "similarity"), bench=True)
def ml_kmeans_assign(spark, sf_dir):
    v = spread(table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", F.col("embedding").alias("e")
    )
    cent = v.filter(F.col("vec_id") < N_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "d2", F.expr(_SQDIST.format(a="e", b="ce"))
    )
    w = W.partitionBy("vec_id").orderBy("d2", "cid")
    assigned = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("d2"), 6).alias("avg_sqdist"),
    )


# --------------------------------------------------------------------------
# Per-label embedding centroid (first 8 dims): posexplode + per-(label,pos)
# average — the embedding-aggregation building block for class prototypes /
# IVF coarse-quantizer retraining. Map-side partial avg keeps the shuffle
# at |labels| x dims rows regardless of corpus size.
# --------------------------------------------------------------------------

_CENTROID_DIMS = 8

_CENTROID_ORACLE = f"""
SELECT label, cast(i AS INTEGER) AS pos,
       cast(count(*) AS BIGINT) AS n,
       round(avg(cast(embedding[i + 1] AS DOUBLE)), 6) AS avg_val
FROM '__embeddings__' AS e, unnest(range({_CENTROID_DIMS})) AS t(i)
GROUP BY label, i
""".replace("'__embeddings__'", "embeddings")


@register("ml_embedding_centroid_per_label", oracle=_CENTROID_ORACLE, tags=("ml", "agg"))
def ml_embedding_centroid_per_label(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.slice("embedding", 1, _CENTROID_DIMS)).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("val").cast("double")), 6).alias("avg_val"),
        )
    )


# --------------------------------------------------------------------------
# BPE-ish regex tokenizer: split documents into word / number / other-symbol
# token classes (character-class-only patterns — identical under Java regex
# and RE2) plus the chars/4 LLM token estimate. Pure codegen string ops.
# --------------------------------------------------------------------------

_TOKENIZE_ORACLE = """
SELECT doc_id,
       cast(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_word,
       cast(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_num,
       cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS INTEGER) AS n_sym,
       cast(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe_tokens
FROM documents
"""


@register("text_regex_tokenize", oracle=_TOKENIZE_ORACLE, tags=("text", "training"))
def text_regex_tokenize(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # idx=0 = whole match; Spark's default idx=1 would need a capture group
    n = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), 0))
    return d.select(
        "doc_id",
        n("[A-Za-z]+").alias("n_word"),
        n("[0-9]+").alias("n_num"),
        n("[^A-Za-z0-9 ]").alias("n_sym"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("est_bpe_tokens"),
    )


# --------------------------------------------------------------------------
# ROLLUP with grouping() labels: subtotal rows are tagged explicitly rather
# than by nullness, disambiguating genuine NULL keys from rollup NULLs.
# --------------------------------------------------------------------------

_GROUPING_ID_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       cast(grouping(o_orderstatus) AS INTEGER) AS g_status,
       cast(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       cast(count(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("agg_grouping_id_rollup", oracle=_GROUPING_ID_ORACLE, tags=("agg", "grouping-sets"))
def agg_grouping_id_rollup(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "g_status",
        "g_priority",
        "n",
    )
