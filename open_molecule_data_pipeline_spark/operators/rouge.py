"""ROUGE-L near-duplicate verification (r13): exact token-level LCS
over the MinHash-LSH candidate pairs — the sequence-similarity second
opinion a dedup pipeline runs on its set-similarity candidates.

MinHash Jaccard sees documents as shingle SETS: it cannot tell a
reordered-paragraph near-dup from a true prefix/suffix overlap. ROUGE-L
(Lin 2004) scores the longest common SUBSEQUENCE, so candidate pairs
with high Jaccard but low LCS-F1 are bag-of-words twins, not textual
duplicates — exactly the disagreement this query surfaces (both scores
are emitted side by side).

LCS is the second "operator Spark lacks" solved here by a bounded
nested fold (the dtw.py playbook): the textbook DP
``L[i][j] = max(L[i-1][j], L[i][j-1], eq ? L[i-1][j-1]+1 : 0)`` (the
max-of-three form, equivalent to the classic by monotonicity) runs as
an outer ``aggregate`` over rows carrying the previous DP row, whose
lambda builds each new row LEFT-TO-RIGHT with an inner ``aggregate``
(the within-row L[i][j-1] dependency that defeats elementwise
transforms is just sequential state in the inner fold). The oracle
replays the identical algebra: a recursive CTE over i whose row build
is a ``list_reduce`` seeded by prepending the row's leading zero —
probed exact on DuckDB v1.0.

Scale shape: candidates come from the PROVEN LSH join (never all
pairs); tokens are capped at the first 128 per doc, so each pair's
DP is a bounded O(128^2) expression — per-pair cost is a constant,
total cost scales with the candidate count, and the whole query is one
LSH candidate build + two broadcast-free doc joins + a map pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import _MINHASH_PAIRS_ORACLE, dedup_minhash_lsh_pairs

_CAP = 128  # LCS runs on the first _CAP tokens of each side
_TOP = 15

_LCS_EXPR = """
element_at(
  aggregate(
    sequence(1, size(ta)),
    transform(sequence(0, size(tb)), x -> cast(0 as bigint)),
    (prev, i) -> aggregate(
      sequence(1, size(tb)),
      array(cast(0 as bigint)),
      (row, j) -> array_append(row, greatest(
        element_at(prev, j + 1),
        element_at(row, j),
        if(element_at(ta, i) = element_at(tb, j),
           element_at(prev, j) + 1, cast(0 as bigint))))),
    prev -> prev),
  size(tb) + 1)
"""

_ROUGE_ORACLE = f"""
WITH RECURSIVE
lsh AS ({_MINHASH_PAIRS_ORACLE}),
tok AS (
  SELECT doc_id, (string_split(text, ' '))[1:{_CAP}] AS t FROM documents
),
st AS (
  SELECT l.doc_a, l.doc_b, l.jaccard, x.t AS a, y.t AS b, 0 AS i,
         list_transform(range(0, len(y.t) + 1), z -> 0::BIGINT) AS prev
  FROM lsh l JOIN tok x ON x.doc_id = l.doc_a
  JOIN tok y ON y.doc_id = l.doc_b
  UNION ALL
  SELECT doc_a, doc_b, jaccard, a, b, i + 1,
         list_reduce(
           list_concat([[0::BIGINT]],
                       list_transform(range(1, len(b) + 1),
                                      j -> [j::BIGINT])),
           (acc, x) -> list_concat(acc,
             [greatest(prev[x[1] + 1], acc[len(acc)],
                       CASE WHEN a[i + 1] = b[x[1]] THEN prev[x[1]] + 1
                            ELSE 0 END)])
         ) AS prev
  FROM st WHERE i < len(a)
),
fin AS (
  SELECT doc_a, doc_b, jaccard,
         cast(len(a) AS BIGINT) AS la, cast(len(b) AS BIGINT) AS lb,
         prev[len(b) + 1] AS lcs
  FROM st WHERE i = len(a)
)
SELECT doc_a, doc_b, jaccard, la, lb, lcs,
       2 * lcs * 1000000 // (la + lb) AS f1_ppm
FROM fin
ORDER BY f1_ppm DESC, doc_a, doc_b
LIMIT {_TOP}
"""


@register(
    "dedup_rouge_l_verify",
    oracle=_ROUGE_ORACLE,
    tags=("dedup", "text"),
)
def dedup_rouge_l_verify(spark, sf_dir):
    """Token-LCS (ROUGE-L) F1 for every MinHash-LSH candidate pair,
    emitted next to the pair's Jaccard — the sequence-vs-set
    verification pass; top pairs by F1."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, _CAP).alias("t")
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    out = (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("la", F.size("ta").cast("long"))
        .withColumn("lb", F.size("tb").cast("long"))
        .withColumn("lcs", F.expr(_LCS_EXPR))
        .withColumn(
            "f1_ppm", F.expr("2 * lcs * 1000000 div (la + lb)")
        )
    )
    return (
        out.orderBy(F.desc("f1_ppm"), "doc_a", "doc_b")
        .limit(_TOP)
        .select("doc_a", "doc_b", "jaccard", "la", "lb", "lcs", "f1_ppm")
    )
