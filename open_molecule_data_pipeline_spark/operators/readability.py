"""Deterministic k-fold assignment (r10).

``sample_kfold_assign``: deterministic 5-fold split via the first two
hex chars of md5(doc_id) — both engines hash the same string to the
same hex, and ``instr`` on the hex alphabet turns chars into a value
0..255 (256 % 5 leaves a 1/256 imbalance — negligible and fully
deterministic, unlike rand(seed) which is engine-specific). Output is
the per-fold audit a training pipeline wants: doc count, distinct
languages, char mass, and each fold's share of the corpus. Pure
hash-groupBy — one shuffle, no window, scales like word-count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_KFOLD_K = 5
_HEX = "0123456789abcdef"

_KFOLD_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang, n_chars,
         md5(cast(doc_id AS VARCHAR)) AS hx
  FROM documents
),
f AS (
  SELECT doc_id, lang, n_chars,
         ((instr('{_HEX}', substr(hx, 1, 1)) - 1) * 16
          + (instr('{_HEX}', substr(hx, 2, 1)) - 1)) % {_KFOLD_K} AS fold
  FROM h
)
SELECT fold,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(count(DISTINCT lang) AS BIGINT) AS n_langs,
       cast(sum(n_chars) AS BIGINT) AS sum_chars,
       round(cast(count(*) AS DOUBLE)
             / cast((SELECT count(*) FROM documents) AS DOUBLE), 6) AS share
FROM f
GROUP BY fold
"""


@register(
    "sample_kfold_assign",
    oracle=_KFOLD_ORACLE,
    tags=("sample", "training", "split"),
)
def sample_kfold_assign(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string"))
    fold = (
        (F.instr(F.lit(_HEX), F.substring(hx, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(hx, 2, 1)) - 1)
    ) % _KFOLD_K
    folds = d.select(
        fold.cast("long").alias("fold"), "lang", "n_chars"
    )
    total = d.groupBy().agg(F.count(F.lit(1)).alias("total"))
    per_fold = folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    # single-row total broadcast-joined onto 5 fold rows
    return per_fold.join(F.broadcast(total)).select(
        "fold",
        "n_docs",
        "n_langs",
        "sum_chars",
        F.round(
            F.col("n_docs").cast("double") / F.col("total").cast("double"), 6
        ).alias("share"),
    )
