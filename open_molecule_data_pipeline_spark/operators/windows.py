"""Window functions: ranking, analytic (lag/lead), running and range frames.

Absent from the reference (SURVEY.md §2B). Every ORDER BY inside a window
carries a full tie-breaker so results are deterministic across engines —
``row_number`` over a non-unique ordering is a correctness bug in any
cross-engine comparison.

Scale notes: all windows here are partitioned by a high-cardinality key
(custkey/suppkey), so state per partition stays small and the sort happens
within hash-partitioned groups — no global sort, no driver involvement.
The one global window (ntile over all customers) is flagged: at 100 TB that
operator needs a range-partitioned two-pass implementation instead.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

# --------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
"""


@register("window_topk_per_customer", oracle=_TOPK_ORACLE, tags=("window", "topk"), bench=True)
def window_topk_per_customer(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Running aggregate: deterministic accumulation order (rows frame over a
# unique ordering) makes the double sum bit-stable in both engines.
# --------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


@register("window_running_revenue", oracle=_RUNNING_ORACLE, tags=("window", "frame"))
def window_running_revenue(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       cast(date_diff('day',
            lag(l_shipdate) OVER (PARTITION BY l_suppkey
                                  ORDER BY l_shipdate, l_orderkey, l_linenumber),
            l_shipdate) AS BIGINT) AS gap_days
FROM lineitem
"""


@register("window_lag_ship_gap", oracle=_LAG_ORACLE, tags=("window", "analytic"))
def window_lag_ship_gap(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lag(F.col("l_shipdate").cast("date")).over(w),
        )
        .cast("long")
        .alias("gap_days"),
    )


# --------------------------------------------------------------------------
# rank / dense_rank are tie-stable by definition (peers share a rank), so no
# tie-breaker is needed for determinism.
# --------------------------------------------------------------------------

_RANK_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice,
       rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense
FROM part
"""


@register("window_rank_parts", oracle=_RANK_ORACLE, tags=("window", "rank"))
def window_rank_parts(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense"),
    )


# --------------------------------------------------------------------------
# RANGE frame over a numeric ordering (epoch day) — trailing 30-day order
# count per customer. Numeric range frames have identical peer semantics in
# Spark and DuckDB.
# --------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT o_custkey, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY ord_day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_trailing_30d
FROM (
  SELECT o_custkey, o_orderkey,
         cast(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS ord_day
  FROM orders
) t
"""


@register("window_range_trailing_30d", oracle=_RANGE_ORACLE, tags=("window", "frame"))
def window_range_trailing_30d(spark, sf_dir):
    o = table(spark, sf_dir, "orders").withColumn(
        "ord_day",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast(
            "long"
        ),
    )
    w = W.partitionBy("o_custkey").orderBy("ord_day").rangeBetween(-30, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_trailing_30d"),
    )


# --------------------------------------------------------------------------
# ntile over a single global ordering — implemented scale-safe: global rank
# via the two-pass range-partition form (per-partition row_number + broadcast
# prefix offsets, operators/_util.py), then the ntile bucket formula applied
# to (rank, total). No partitionless Window node anywhere in the plan, so no
# single-task funnel at 100 TB. Oracle stays DuckDB's native ntile.
# --------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey, c_acctbal,
       cast(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
FROM customer
"""

_NTILE_EXPR = """
CASE WHEN __rn <= (__n % 4) * ((__n div 4) + 1)
     THEN cast((__rn - 1) div ((__n div 4) + 1) + 1 AS INT)
     ELSE cast((__n % 4) + ((__rn - 1 - (__n % 4) * ((__n div 4) + 1))
                            div greatest(__n div 4, 1)) + 1 AS INT)
END
"""


@register("window_ntile_quartiles", oracle=_NTILE_ORACLE, tags=("window", "ntile"))
def window_ntile_quartiles(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = two_pass_global_window(c, ["c_acctbal", "c_custkey"], out_col="__rn")
    total = c.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.join(F.broadcast(total))
        .withColumn("quartile", F.expr(_NTILE_EXPR))
        .select("c_custkey", "c_acctbal", "quartile")
    )
