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


# --------------------------------------------------------------------------
# GROUP k-fold (r10): the leakage-safe variant of sample_kfold_assign —
# the fold is a function of the GROUP key (user_id), so every event of a
# user lands in exactly one fold and no user straddles a train/eval
# boundary (the grouped-CV contract; per-row hashing would leak user
# state across folds). Same engine-portable md5-hex-pair arithmetic as
# the doc-level k-fold; the per-fold audit carries event AND user counts
# so the output itself shows the group discipline (sum of n_users over
# folds == total distinct users — only true when groups are fold-pure).
# --------------------------------------------------------------------------

_GROUP_KFOLD_ORACLE = f"""
WITH h AS (
  SELECT user_id, event_type,
         md5(cast(user_id AS VARCHAR)) AS hx
  FROM events
),
f AS (
  SELECT user_id, event_type,
         ((instr('{_HEX}', substr(hx, 1, 1)) - 1) * 16
          + (instr('{_HEX}', substr(hx, 2, 1)) - 1)) % {_KFOLD_K} AS fold
  FROM h
)
SELECT fold,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
       cast(count(DISTINCT event_type) AS BIGINT) AS n_types,
       round(cast(count(*) AS DOUBLE)
             / cast((SELECT count(*) FROM events) AS DOUBLE), 6) AS share
FROM f
GROUP BY fold
"""


@register(
    "sample_group_kfold",
    oracle=_GROUP_KFOLD_ORACLE,
    tags=("sample", "training", "split"),
)
def sample_group_kfold(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    fold = (
        (F.instr(F.lit(_HEX), F.substring(hx, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(hx, 2, 1)) - 1)
    ) % _KFOLD_K
    folds = e.select(fold.cast("long").alias("fold"), "user_id", "event_type")
    total = e.groupBy().agg(F.count(F.lit(1)).alias("total"))
    per_fold = folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )
    return per_fold.join(F.broadcast(total)).select(
        "fold",
        "n_events",
        "n_users",
        "n_types",
        F.round(
            F.col("n_events").cast("double") / F.col("total").cast("double"), 6
        ).alias("share"),
    )
