"""Additional TPC-H-shape queries broadening join/agg/subquery coverage.

Each exercises a distinct physical pattern: returned-revenue top-k (Q10),
conditional-aggregate ratio (Q14), distinct-count per attribute pair (Q16),
large-order HAVING-join (Q18), disjunctive multi-predicate scan (Q19),
anti-join + scalar-subquery threshold (Q22).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lavg, lsum, s_lavg, s_lsum

# --------------------------------------------------------------------------
# Q10 shape: revenue lost to returns, per customer+nation.
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
"""


@register("join_returned_revenue", oracle=_Q10_ORACLE, tags=("join", "agg"))
def join_returned_revenue(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        # customer/part/supplier grow with SF, so the SF-scaling dims in
        # this module are not force-broadcast: size stats + AQE broadcast
        # them while small and fall back to shuffle joins at cluster scale
        # (nation/region stay hinted: fixed 25/5 rows by construction).
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share — conditional aggregation in one pass.
# The ratio divides two exact scaled-integer sums, so the double result is
# bit-identical across engines without rounding.
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  ({s_lsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 10000)}
   / {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)}) AS promo_share,
  count(*) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-03-01'
"""


@register("agg_promo_share", oracle=_Q14_ORACLE, tags=("agg", "conditional"))
def agg_promo_share(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (lsum(promo, 10000) / lsum(disc, 10000)).alias("promo_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier variety per (brand, type, size) — distinct agg after
# an anti-ish filter.
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("agg_supplier_variety", oracle=_Q16_ORACLE, tags=("agg", "distinct"))
def agg_supplier_variety(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q18 shape: large orders — HAVING over a child aggregate joined back to
# the parents. The inner aggregate keeps only qualifying keys, so the join
# input shrinks before the wide join.
# --------------------------------------------------------------------------

_Q18_ORACLE = f"""
SELECT c.c_name, o.o_orderkey, o.o_totalprice, big.sum_qty
FROM (
  SELECT l_orderkey, {s_lsum('l_quantity', 100)} AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {s_lsum('l_quantity', 100)} > 250
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("join_large_orders", oracle=_Q18_ORACLE, tags=("join", "having"))
def join_large_orders(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(lsum("l_quantity", 100).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive predicate bundles (OR of AND-groups) — stresses
# predicate normalization; the common partkey equi-join still extracts.
# --------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("join_disjunctive_predicates", oracle=_Q19_ORACLE, tags=("join", "filter"))
def join_disjunctive_predicates(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")

    def bundle(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        bundle("Brand#12", 15, 1, 21)
        | bundle("Brand#23", 20, 10, 30)
        | bundle("Brand#34", 25, 20, 40)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape: positive-balance customers with no orders, bucketed by a name
# substring — anti-join + scalar-subquery threshold + string bucketing.
# --------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT substr(c.c_name, 10, 1) AS bucket,
       count(*) AS numcust,
       {s_lsum('c.c_acctbal', 100)} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT {s_lavg('c_acctbal', 100)} FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY substr(c.c_name, 10, 1)
"""


@register("join_global_sales_opportunity", oracle=_Q22_ORACLE, tags=("join", "subquery"))
def join_global_sales_opportunity(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        lavg("c_acctbal", 100).alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            lsum("c_acctbal", 100).alias("totacctbal"),
        )
    )
