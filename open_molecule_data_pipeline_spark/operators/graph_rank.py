"""HITS hubs-and-authorities (r10) on the user→event_type bipartite graph.

Kleinberg's HITS is the other classic link-analysis recurrence next to
PageRank (graph.py): authority(t) = Σ hub(u) over in-neighbors, hub(u) =
Σ authority(t) over out-neighbors. Like ``graph_pagerank_3iter`` the
Spark side runs the canonical distributed shape — iterate join-against-
edges + groupBy-sum — and the oracle unrolls the identical recurrence as
chained CTEs.

Exactness: unlike PageRank there is NO per-iteration normalization here —
starting from hub=1 every score stays an exact int64, so cross-engine
parity is integer-exact with zero FP risk; one double division (by the
max) normalizes at the very end. Magnitude bound, documented not hoped:
with U users and T types (T=5 here), a1 ≤ U, h1 ≤ T·U, a2 ≤ U·h1 ≤ T·U²
— at sf1000 (U≈2e7) a2 ≈ 2e15 < int64; one more full round would
overflow, which is exactly when a real deployment switches to the
normalized-double form (the PageRank plan, round-off absorbed by
round(6)).

Scale notes: the 5-row authority table is BROADCAST into the edge join
(never a shuffle keyed on a 5-value column — the block-skew trap the
low-card join lint exists for); the hub join keys on user_id
(high-cardinality, hash-partitions evenly).

Reference parity: engine addition (SURVEY.md §2B graph row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_HITS_ORACLE = """
WITH edges AS (
  SELECT DISTINCT user_id AS u, event_type AS t FROM events
), a1 AS (
  SELECT t, cast(count(*) AS BIGINT) AS a FROM edges GROUP BY t
), h1 AS (
  SELECT e.u, cast(sum(a1.a) AS BIGINT) AS h
  FROM edges e JOIN a1 ON e.t = a1.t GROUP BY e.u
), a2 AS (
  SELECT e.t, cast(sum(h1.h) AS BIGINT) AS a
  FROM edges e JOIN h1 ON e.u = h1.u GROUP BY e.t
), mx AS (
  SELECT cast(max(a) AS BIGINT) AS m FROM a2
)
SELECT a1.t AS event_type,
       a1.a AS in_degree,
       a2.a AS authority_raw,
       round(cast(a2.a AS DOUBLE) / cast(mx.m AS DOUBLE), 6) AS authority_norm
FROM a1 JOIN a2 ON a1.t = a2.t, mx
"""


@register(
    "graph_hits_authorities",
    oracle=_HITS_ORACLE,
    tags=("graph", "iterative"),
)
def graph_hits_authorities(spark, sf_dir):
    edges = (
        table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("u"), F.col("event_type").alias("t"))
        .distinct()
    )
    # One edge scan feeds three joins; checkpoint once (the graph.py rule:
    # every iteration re-joining a lazily-recomputed edge set re-runs the
    # whole upstream scan per round).
    edges = edges.localCheckpoint(eager=True)
    a1 = edges.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("a"))
    h1 = (
        edges.join(F.broadcast(a1), "t")  # T rows — broadcast, never shuffle
        .groupBy("u")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    a2 = (
        edges.join(h1, "u")  # user_id keys: high-cardinality shuffle, even
        .groupBy("t")
        .agg(F.sum("h").cast("long").alias("a2"))
    )
    mx = a2.groupBy().agg(F.max("a2").cast("long").alias("m"))
    return (
        a1.join(F.broadcast(a2), "t")
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("t").alias("event_type"),
            F.col("a").alias("in_degree"),
            F.col("a2").alias("authority_raw"),
            F.round(F.col("a2").cast("double") / F.col("m").cast("double"), 6).alias(
                "authority_norm"
            ),
        )
    )
