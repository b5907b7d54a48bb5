"""Maximal Marginal Relevance re-ranking (r13): the diversity pass a
retrieval stack runs between candidate generation and serving
(Carbonell & Goldstein 1998) — from each query's cosine top-10, pick 5
greedily by MMR(i) = 0.7 * rel(i) - 0.3 * max_{j in selected} sim(i, j),
so near-duplicate candidates cannot crowd the result list.

Arithmetic: relevance and candidate-pair similarities are
micro-quantized cosines (round(cos * 1e6) int64, the binquant.py
precedent), and the MMR score is the pure-integer 700 * rel6 -
300 * maxsim6 — argmax with a neighbor-id tie-break, no doubles in the
selection logic. Step 1's empty selected set scores 700 * rel6 (the
textbook MMR start).

Shape: the greedy loop is 5 DRIVER-side rounds (the BPE-trainer
pattern) over CANDIDATE-sized tables only — the corpus is touched once
to build the top-10 lists and the 10x9-per-query pair sims; each round
is one anti-join + one max-sim aggregation + one per-query argmax, all
bounded by queries x 10. The oracle unrolls the same five steps as
chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread
from .similarity import _DOT, N_QUERIES

_R = 10  # candidate pool per query
_K_MMR = 5  # results per query
_WREL, _WDIV = 700, 300  # lambda = 0.7 in milli weights

_MMR_BASE = f"""
v AS (
  SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS e
  FROM embeddings
),
cand AS (
  SELECT query_id, neighbor_id, rel6 FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           cast(round(list_dot_product(q.e, c.e)
                / (sqrt(list_dot_product(q.e, q.e))
                   * sqrt(list_dot_product(c.e, c.e))) * 1000000) AS BIGINT)
             AS rel6,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY cast(round(list_dot_product(q.e, c.e)
                / (sqrt(list_dot_product(q.e, q.e))
                   * sqrt(list_dot_product(c.e, c.e))) * 1000000) AS BIGINT)
               DESC, c.vec_id) AS rn
    FROM v q JOIN v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  ) t WHERE rn <= {_R}
),
sims AS (
  SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
         cast(round(list_dot_product(x.e, y.e)
              / (sqrt(list_dot_product(x.e, x.e))
                 * sqrt(list_dot_product(y.e, y.e))) * 1000000) AS BIGINT)
           AS sim6
  FROM cand a
  JOIN cand b ON b.query_id = a.query_id AND b.neighbor_id <> a.neighbor_id
  JOIN v x ON x.vec_id = a.neighbor_id
  JOIN v y ON y.vec_id = b.neighbor_id
)
"""


def _mmr_oracle() -> str:
    parts = [f"WITH {_MMR_BASE}"]
    sel_union = None
    for t in range(1, _K_MMR + 1):
        if t == 1:
            parts.append(f""",
s1 AS (
  SELECT query_id, neighbor_id, rel6, cast(0 AS BIGINT) AS maxsim6,
         {_WREL} * rel6 AS mmr_milli, 1 AS rank FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel6 DESC, neighbor_id) AS rn
    FROM cand
  ) t WHERE rn = 1
)""")
            sel_union = "SELECT query_id, neighbor_id FROM s1"
            continue
        parts.append(f""",
sel{t} AS ({sel_union}),
m{t} AS (
  SELECT c.query_id, c.neighbor_id, c.rel6,
         max(s.sim6) AS maxsim6
  FROM cand c
  JOIN sims s ON s.query_id = c.query_id AND s.i = c.neighbor_id
  JOIN sel{t} z ON z.query_id = s.query_id AND z.neighbor_id = s.j
  WHERE NOT EXISTS (SELECT 1 FROM sel{t} w
                    WHERE w.query_id = c.query_id
                      AND w.neighbor_id = c.neighbor_id)
  GROUP BY c.query_id, c.neighbor_id, c.rel6
),
s{t} AS (
  SELECT query_id, neighbor_id, rel6, maxsim6,
         {_WREL} * rel6 - {_WDIV} * maxsim6 AS mmr_milli, {t} AS rank FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY {_WREL} * rel6 - {_WDIV} * maxsim6 DESC, neighbor_id) AS rn
    FROM m{t}
  ) t WHERE rn = 1
)""")
        sel_union += f" UNION ALL SELECT query_id, neighbor_id FROM s{t}"
    finals = " UNION ALL ".join(f"SELECT * FROM s{t}" for t in range(1, _K_MMR + 1))
    return "".join(parts) + f"\nSELECT query_id, neighbor_id, rel6, maxsim6, mmr_milli, rank FROM ({finals}) u"


@register("sim_rerank_mmr", oracle=_mmr_oracle(), tags=("similarity",))
def sim_rerank_mmr(spark, sf_dir):
    """Greedy MMR selection of 5 from each query's cosine top-10 with
    integer 700/300 scoring; 5 driver-side rounds over candidate-sized
    tables."""
    e = spread(
        table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "embedding",
            F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("nn"),
        ),
        "vec_id",
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nn").alias("qq"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nn").alias("cc"),
    )
    rel6 = (
        F.round(
            F.expr(_DOT.format(a="qe", b="ce"))
            / (F.col("qq") * F.col("cc"))
            * 1_000_000
        )
        .cast("long")
        .alias("rel6")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("rel6"), "neighbor_id")
    cand = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", rel6)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _R)
        .drop("rn")
        # the loop tables are CONSTANT-size (|Q| x 10 regardless of
        # corpus): bound their partition count so the 5 greedy rounds
        # schedule a handful of tasks, not shuffle.partitions' worth
        .repartition(4, "query_id")
        .localCheckpoint(eager=True)
    )
    x = e.select(F.col("vec_id").alias("i"), F.col("embedding").alias("xe"),
                 F.col("nn").alias("xn"))
    y = e.select(F.col("vec_id").alias("j"), F.col("embedding").alias("ye"),
                 F.col("nn").alias("yn"))
    a = cand.select("query_id", F.col("neighbor_id").alias("i"))
    b = cand.select(F.col("query_id").alias("qb"), F.col("neighbor_id").alias("j"))
    sim6 = (
        F.round(
            F.expr(_DOT.format(a="xe", b="ye"))
            / (F.col("xn") * F.col("yn"))
            * 1_000_000
        )
        .cast("long")
        .alias("sim6")
    )
    sims = (
        # embedding fetches are deliberately UN-hinted: the small side is
        # the bounded candidate-pair table (|Q| x 10 x 9), the embedding
        # side scales with the corpus — AQE broadcasts the right one
        a.join(b, (F.col("query_id") == F.col("qb")) & (F.col("i") != F.col("j")))
        .join(x, "i")
        .join(y, "j")
        .select("query_id", "i", "j", sim6)
        .repartition(4, "query_id")
        .localCheckpoint(eager=True)
    )
    selected = None
    winners = []
    for t in range(1, _K_MMR + 1):
        if t == 1:
            w1 = (
                cand.withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") == 1)
                .select(
                    "query_id",
                    "neighbor_id",
                    "rel6",
                    F.lit(0).cast("long").alias("maxsim6"),
                    (F.lit(_WREL) * F.col("rel6")).alias("mmr_milli"),
                    F.lit(1).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            winners.append(w1)
            selected = w1.select("query_id", "neighbor_id")
            continue
        rem = cand.join(selected, ["query_id", "neighbor_id"], "left_anti")
        sel_j = selected.select(
            "query_id", F.col("neighbor_id").alias("j")
        )
        # sims' query column is RENAMED before the join: rem and sims
        # share checkpoint lineage, so joining on same-named columns
        # resolves to a trivially-true predicate (self-join ambiguity) —
        # harmless here only because sim6 is query-independent, but the
        # explicit alias kills the ambiguity and the cross-query fanout
        sims_t = sims.select(
            F.col("query_id").alias("sq"), "i", "j", "sim6"
        )
        m = (
            rem.join(
                sims_t,
                (F.col("query_id") == F.col("sq"))
                & (F.col("neighbor_id") == F.col("i")),
            )
            .join(sel_j, ["query_id", "j"])
            .groupBy("query_id", "neighbor_id", "rel6")
            .agg(F.max("sim6").alias("maxsim6"))
        )
        score = F.lit(_WREL) * F.col("rel6") - F.lit(_WDIV) * F.col("maxsim6")
        ws = W.partitionBy("query_id").orderBy(
            F.desc(score), "neighbor_id"
        )
        wt = (
            m.withColumn("rn", F.row_number().over(ws))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "rel6",
                "maxsim6",
                score.alias("mmr_milli"),
                F.lit(t).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        winners.append(wt)
        selected = selected.unionByName(wt.select("query_id", "neighbor_id"))
    out = winners[0]
    for wdf in winners[1:]:
        out = out.unionByName(wdf)
    return out
