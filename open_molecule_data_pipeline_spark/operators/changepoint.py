"""Changepoint detection (r10): one binary-segmentation split per series.

``ts_changepoint_binseg`` finds, independently for every event_type
series, the split index k that minimizes SSE(left 1..k) + SSE(right
k+1..n) — the first (and reusable) step of binary segmentation, the
standard changepoint algorithm for level shifts.

Plan shape / exactness:
- one pass builds per-row prefix sums S_k = Σv, Q_k = Σv² over a window
  PARTITIONED BY event_type (per-series prefix state is inherent to the
  algorithm; real telemetry has series count >> cores, so the partition
  key is the natural shard — a single monster series would take the
  two-pass range form, cf. _util.two_pass_global_window);
- v is the exact scaled int v_e2 = round(value·100); S and Q accumulate
  in int64 (Q ≤ n·(max v_e2)² ≈ 2e5·2.5e9 = 5e14 at sf1 — safe);
- SSE(1..k) = Q_k − S_k²/k is evaluated in doubles FROM those exact ints
  with one shared expression order, so both engines produce bit-identical
  cost doubles; the per-series argmin ties-breaks on k ascending.

The totals (n, S_n, Q_n) come from one groupBy on the same scan and
broadcast back (series-count-sized table).

Reference parity: engine addition (SURVEY.md §2B time-series row).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_CP_ORACLE = """
WITH x AS (
  SELECT event_type AS et, ts, event_id,
         cast(round(value * 100) AS BIGINT) AS v
  FROM events
), pre AS (
  SELECT et, ts,
         cast(row_number() OVER w AS BIGINT) AS k,
         cast(sum(v) OVER w AS BIGINT) AS sk,
         cast(sum(v * v) OVER w AS BIGINT) AS qk
  FROM x
  WINDOW w AS (PARTITION BY et ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT et, cast(count(*) AS BIGINT) AS n,
         cast(sum(v) AS BIGINT) AS sn,
         cast(sum(v * v) AS BIGINT) AS qn
  FROM x GROUP BY et
), cost AS (
  SELECT p.et, p.k, p.ts, t.n, t.qn, t.sn,
         (cast(p.qk AS DOUBLE)
          - cast(p.sk AS DOUBLE) * cast(p.sk AS DOUBLE) / cast(p.k AS DOUBLE))
         + (cast(t.qn - p.qk AS DOUBLE)
            - cast(t.sn - p.sk AS DOUBLE) * cast(t.sn - p.sk AS DOUBLE)
              / cast(t.n - p.k AS DOUBLE)) AS sse_split
  FROM pre p JOIN tot t ON p.et = t.et
  WHERE p.k < t.n
), best AS (
  SELECT et, k, ts, n, sse_split,
         cast(qn AS DOUBLE)
           - cast(sn AS DOUBLE) * cast(sn AS DOUBLE) / cast(n AS DOUBLE)
           AS sse_total,
         row_number() OVER (PARTITION BY et ORDER BY sse_split, k) AS rn
  FROM cost
)
SELECT et AS event_type, n AS n_points, k AS split_k, ts AS split_ts,
       round(sse_split / cast(10000 AS DOUBLE), 4) AS sse_split,
       round((sse_total - sse_split) / cast(10000 AS DOUBLE), 4) AS sse_gain
FROM best WHERE rn = 1
"""


@register(
    "ts_changepoint_binseg",
    oracle=_CP_ORACLE,
    tags=("timeseries", "stats", "window"),
)
def ts_changepoint_binseg(spark, sf_dir):
    x = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        W.partitionBy("et")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pre = x.select(
        "et",
        "ts",
        F.row_number().over(W.partitionBy("et").orderBy("ts", "event_id"))
        .cast("long")
        .alias("k"),
        F.sum("v").over(w).cast("long").alias("sk"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("long").alias("qk"),
    )
    tot = x.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sn"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("qn"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    joined = pre.join(F.broadcast(tot), "et").where(F.col("k") < F.col("n"))
    sse_split = (
        d(F.col("qk")) - d(F.col("sk")) * d(F.col("sk")) / d(F.col("k"))
    ) + (
        d(F.col("qn") - F.col("qk"))
        - d(F.col("sn") - F.col("sk"))
        * d(F.col("sn") - F.col("sk"))
        / d(F.col("n") - F.col("k"))
    )
    sse_total = d(F.col("qn")) - d(F.col("sn")) * d(F.col("sn")) / d(F.col("n"))
    cost = joined.select(
        "et",
        "n",
        sse_split.alias("sse_split"),
        sse_total.alias("sse_total"),
        "k",
        "ts",
    )
    # per-series argmin, ties broken toward the smallest k: struct-min is a
    # map-side-combinable aggregate — no rank window over the raw rows.
    best = cost.groupBy("et", "n", "sse_total").agg(
        F.min(F.struct("sse_split", "k", "ts")).alias("b")
    )
    ten4 = F.lit(10000).cast("double")
    return best.select(
        F.col("et").alias("event_type"),
        F.col("n").alias("n_points"),
        F.col("b.k").alias("split_k"),
        F.col("b.ts").alias("split_ts"),
        F.round(F.col("b.sse_split") / ten4, 4).alias("sse_split"),
        F.round((F.col("sse_total") - F.col("b.sse_split")) / ten4, 4).alias(
            "sse_gain"
        ),
    )
