"""Dynamic Time Warping distance between event series (r12) — the
classic elastic similarity measure for time series (alignment-tolerant,
unlike the lockstep cross-correlation in acf.py), computed between every
pair of event types over their DAILY mean series.

DTW is the canonical "operator Spark lacks": a sequential O(T_a x T_b)
dynamic program. Two design moves make it an exact, scale-sane Spark
query:

1. **Bounded state**: the DP runs on the daily bucket table, so the
   grid is bounded by the TIME RANGE in days (~30x30 here), independent
   of corpus row count — the same boundedness argument as
   ``ts_theil_sen_slope``. More rows only sharpen the bucket means.

2. **Row recurrence without sequential scans**: the textbook cell
   recurrence ``D[i][j] = c + min(D[i-1][j], D[i-1][j-1], D[i][j-1])``
   has a within-row dependency (D[i][j-1]) that no elementwise
   list/array op can express. Substituting prefix sums
   ``P[j] = sum(c[i][1..j])`` unrolls it to

       D[i][j] = P[j] + min over k <= j of (m[k] - P[k-1]),
       m[k] = min(D[i-1][k], D[i-1][k-1])

   — a prefix-MIN over quantities that depend only on the PREVIOUS row,
   so each row is a pure elementwise+slice-min transform of the last
   (verified against the textbook DP on 200 random cases in
   tests/test_round12_ops.py). The Spark side folds rows with one
   ``aggregate`` whose lambda binds P and q via the
   ``transform(array(expr), x -> ...)`` let-trick; the oracle replays
   the identical algebra in a recursive CTE carrying the DP row as a
   LIST column, with slice-sums/mins standing in for the prefixes.

All arithmetic is exact int64 (daily means in truncated cents; the
sentinel 1e15 dominates every real path cost of <= 60 cells * 1e7
cents), so the per-pair DTW cost hashes identically across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

_INF = 1_000_000_000_000_000

# ---- Spark fold expression (built once; aa/bs/ta/tb are row columns) ----

# P[j] = prefix sums of row-i costs, as an array with P[0] at position 1
_P_EXPR = (
    "aggregate(sequence(1, tb), array(cast(0 as bigint)),"
    " (pp, j) -> array_append(pp, element_at(pp, j)"
    "   + abs(element_at(aa, i) - element_at(bs, j))))"
)
# q[k] = min(prev[k], prev[k-1]) - P[k-1]  (prev holds D[i-1][0..tb])
_Q_EXPR = (
    "transform(sequence(1, tb), k ->"
    " least(element_at(prev, k + 1), element_at(prev, k))"
    " - element_at(P, k))"
)
_NEW_ROW = (
    f"concat(array(cast({_INF} as bigint)),"
    " transform(sequence(1, tb), j ->"
    "   element_at(P, j + 1) + array_min(slice(Q, 1, j))))"
)
_DTW_EXPR = f"""
element_at(
  aggregate(
    sequence(1, ta),
    concat(array(cast(0 as bigint)),
           array_repeat(cast({_INF} as bigint), tb)),
    (prev, i) ->
      element_at(transform(array({_P_EXPR}), P ->
        element_at(transform(array({_Q_EXPR}), Q -> {_NEW_ROW}), 1)
      ), 1),
    prev -> prev),
  tb + 1)
"""

_DTW_ORACLE = f"""
WITH RECURSIVE
b AS (
  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ser AS (
  -- daily-mean cents: Spark `div` truncates toward zero while DuckDB
  -- BIGINT // floors — mirror truncation so negative sums (possible if
  -- the generator ever emits negative values) cannot diverge silently
  SELECT g, list(CASE WHEN s < 0 THEN -((-s) // c) ELSE s // c END
                 ORDER BY d) AS vs,
         cast(count(*) AS BIGINT) AS t
  FROM b GROUP BY g
),
pairs AS (
  SELECT a.g AS g1, bb.g AS g2, a.vs AS aa, bb.vs AS bs,
         a.t AS ta, bb.t AS tb
  FROM ser a JOIN ser bb ON a.g < bb.g
),
fwd AS (
  SELECT g1, g2, aa, bs, ta, tb, 0 AS i,
         list_concat([cast(0 AS BIGINT)],
                     list_transform(range(1, cast(tb AS INTEGER) + 1),
                                    x -> cast({_INF} AS BIGINT))) AS prev
  FROM pairs
  UNION ALL
  SELECT g1, g2, aa, bs, ta, tb, i + 1,
         list_concat(
           [cast({_INF} AS BIGINT)],
           list_transform(range(1, cast(tb AS INTEGER) + 1), j ->
             coalesce(list_sum(list_transform(range(1, j + 1),
                        l -> abs(aa[i + 1] - bs[l]))), 0)
             + list_min(list_transform(range(1, j + 1), k ->
                 least(prev[k + 1], prev[k])
                 - coalesce(list_sum(list_transform(range(1, k),
                              l -> abs(aa[i + 1] - bs[l]))), 0))))) AS prev
  FROM fwd WHERE i < ta
)
SELECT g1, g2, ta AS n_a, tb AS n_b,
       cast(prev[cast(tb AS INTEGER) + 1] AS BIGINT) AS dtw_cents
FROM fwd WHERE i = ta
"""


@register(
    "ts_dtw_pairwise",
    oracle=_DTW_ORACLE,
    tags=("timeseries", "similarity"),
)
def ts_dtw_pairwise(spark, sf_dir):
    ev = spread(table(spark, sf_dir, "events"), "event_id")
    b = ev.groupBy(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    ser = (
        b.select("g", "d", F.expr("s div c").alias("v"))
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, v))), x -> x.v)"
            ).alias("vs"),
            F.count(F.lit(1)).cast("long").alias("t"),
        )
    )
    a = ser.select(
        F.col("g").alias("g1"), F.col("vs").alias("aa"),
        F.col("t").cast("int").alias("ta"),
    )
    bb = ser.select(
        F.col("g").alias("g2"), F.col("vs").alias("bs"),
        F.col("t").cast("int").alias("tb"),
    )
    pairs = a.join(F.broadcast(bb), F.col("g1") < F.col("g2"))
    return pairs.select(
        "g1",
        "g2",
        F.col("ta").cast("long").alias("n_a"),
        F.col("tb").cast("long").alias("n_b"),
        F.expr(_DTW_EXPR).cast("long").alias("dtw_cents"),
    )
