"""Core relational operators: scans, filters, joins, aggregations, set ops.

The reference implements none of these (SURVEY.md §2B: its `analysis/` and
`pipeline/` packages are docstring-only scaffolds, reference
``src/open_molecule_data_pipeline/analysis/__init__.py:1``); this module
provides the standard relational surface Spark-first. Every query is
declarative DataFrame API so Catalyst handles predicate pushdown, column
pruning and join selection; broadcast hints are applied where a dimension
side is known-small relative to the fact side (nation/region/supplier —
at 100 TB the fact tables grow, the dims don't).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lavg, lsum, s_lavg, s_lsum

# --------------------------------------------------------------------------
# agg_pricing_summary — TPC-H Q1 shape: scan -> filter -> hash agg -> (sort)
# Partial aggregation (map-side combine) happens automatically; the shuffle
# carries only 4-ish groups x 8 aggregate buffers, so this scales linearly
# in input size regardless of cluster width.
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {s_lsum('l_quantity', 100)} AS sum_qty,
  {s_lsum('l_extendedprice', 100)} AS sum_base_price,
  {s_lsum('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_price,
  {s_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} AS sum_charge,
  {s_lavg('l_quantity', 100)} AS avg_qty,
  {s_lavg('l_extendedprice', 100)} AS avg_price,
  {s_lavg('l_discount', 100)} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-06-30'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_Q1_ORACLE, tags=("agg",), bench=True)
def agg_pricing_summary(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1999-06-30").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum("l_quantity", 100).alias("sum_qty"),
            lsum("l_extendedprice", 100).alias("sum_base_price"),
            lsum(disc_price, 10000).alias("sum_disc_price"),
            lsum(charge, 1000000).alias("sum_charge"),
            lavg("l_quantity", 100).alias("avg_qty"),
            lavg("l_extendedprice", 100).alias("avg_price"),
            lavg("l_discount", 100).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# filter_project — predicate + projection with a computed column. The filter
# and the 4-column projection both push into the parquet scan (verify via
# .explain: PushedFilters / ReadSchema).
# --------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag,
       round(l_extendedprice * (1 - l_discount), 4) AS disc_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
  AND l_quantity < 10
"""


@register("filter_project", oracle=_FILTER_ORACLE, tags=("filter",))
def filter_project(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "disc_price"
            ),
        )
    )


# --------------------------------------------------------------------------
# join_shipping_priority — TPC-H Q3 shape: 3-way join + agg. customer is the
# small side of its join (broadcast); orders<->lineitem is a shuffle
# hash/sort-merge join on orderkey, which AQE will size at runtime.
# --------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate
"""


@register("join_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg"), bench=True)
def join_shipping_priority(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------------
# join_semi_order_priority — TPC-H Q4 shape: EXISTS as a left-semi join
# (never multiplies rows, shuffles only the join key).
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
)
GROUP BY o_orderpriority
"""


@register("join_semi_order_priority", oracle=_Q4_ORACLE, tags=("join", "semi"))
def join_semi_order_priority(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# join_local_supplier_volume — TPC-H Q5 shape: 6-way star join. All dims
# (region/nation/supplier/customer) broadcast; only orders<->lineitem
# shuffles. At 100 TB the dims stay broadcastable; the one shuffle is on
# orderkey, the natural co-location key.
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name,
       {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@register("join_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg"), bench=True)
def join_local_supplier_volume(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer/supplier grow with SF: unhinted, AQE broadcasts under the
        # threshold and shuffle-joins at cluster scale (nation/region are
        # fixed 25/5 rows and keep their hints)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# agg_revenue_forecast — TPC-H Q6 shape: tight scan+filter+global agg.
# --------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {s_lsum('l_extendedprice * l_discount', 10000)} AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@register("agg_revenue_forecast", oracle=_Q6_ORACLE, tags=("agg",), bench=True)
def agg_revenue_forecast(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            lsum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# join_left_outer_order_counts — LEFT OUTER + agg: customers keep their row
# even with zero orders (count(col) skips nulls in both engines).
# --------------------------------------------------------------------------

_LEFT_ORACLE = """
SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


@register("join_left_outer_order_counts", oracle=_LEFT_ORACLE, tags=("join", "outer"))
def join_left_outer_order_counts(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# join_full_outer_nation_presence — FULL OUTER of two pre-aggregated sides
# (distinct keys on both sides -> clean 1:1 outer merge).
# --------------------------------------------------------------------------

_FULL_ORACLE = """
WITH cc AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
            FROM customer GROUP BY c_nationkey),
     ss AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
            FROM supplier GROUP BY s_nationkey)
SELECT coalesce(cc.nationkey, ss.nationkey) AS nationkey,
       coalesce(cc.n_cust, 0) AS n_cust,
       coalesce(ss.n_supp, 0) AS n_supp
FROM cc FULL OUTER JOIN ss ON cc.nationkey = ss.nationkey
"""


@register("join_full_outer_nation_presence", oracle=_FULL_ORACLE, tags=("join", "outer"))
def join_full_outer_nation_presence(spark, sf_dir):
    cc = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    ss = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cc.join(ss, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


# --------------------------------------------------------------------------
# join_anti_customers_without_orders — NOT EXISTS as left-anti join.
# --------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("join_anti_customers_without_orders", oracle=_ANTI_ORACLE, tags=("join", "anti"))
def join_anti_customers_without_orders(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# --------------------------------------------------------------------------
# join_theta_price_band — equi-join on partkey with a non-equi residual
# band predicate (theta). The equi key carries the shuffle; the band is a
# post-join filter, so no nested-loop blowup.
# --------------------------------------------------------------------------

_THETA_ORACLE = """
SELECT p.p_brand, count(*) AS n, round(avg(l.l_extendedprice / p.p_retailprice), 4) AS avg_ratio
FROM part p
JOIN lineitem l
  ON l.l_partkey = p.p_partkey
 AND l.l_extendedprice BETWEEN p.p_retailprice * 5 AND p.p_retailprice * 30
GROUP BY p.p_brand
"""


@register("join_theta_price_band", oracle=_THETA_ORACLE, tags=("join", "theta"))
def join_theta_price_band(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    return (
        # equi-key on partkey + band predicates: unhinted this stays a hash
        # join that degrades to SMJ when part outgrows the AQE threshold
        l.join(
            p,
            (l.l_partkey == p.p_partkey)
            & (l.l_extendedprice >= p.p_retailprice * 5)
            & (l.l_extendedprice <= p.p_retailprice * 30),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("l_extendedprice") / F.col("p_retailprice")), 4).alias(
                "avg_ratio"
            ),
        )
    )


# --------------------------------------------------------------------------
# agg_distinct_by_segment — exact distinct aggregation (expand + two-phase).
# --------------------------------------------------------------------------

_DISTINCT_ORACLE = f"""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_cust,
       {s_lsum('c_acctbal', 100)} AS sum_bal
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_distinct_by_segment", oracle=_DISTINCT_ORACLE, tags=("agg", "distinct"))
def agg_distinct_by_segment(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_cust"),
        lsum("c_acctbal", 100).alias("sum_bal"),
    )


# --------------------------------------------------------------------------
# agg_approx_distinct — HyperLogLog++ sketch. At 100 TB this replaces exact
# distinct counts that would shuffle every key. The sketch value itself is
# engine-specific, so the driver-checkable form returns the EXACT distinct
# counts plus a bounded-relative-error verdict on the sketch (rsd=0.02,
# asserted within 10%); the oracle computes the exact counts and expects the
# verdicts to be TRUE — a wrong sketch flips the boolean and fails the hash.
# --------------------------------------------------------------------------

_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       cast(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       cast(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS approx_parts_ok,
       TRUE AS approx_orders_ok
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_approx_distinct", oracle=_APPROX_DISTINCT_ORACLE, tags=("agg", "approx"))
def agg_approx_distinct(spark, sf_dir):
    """r8 plan rework (28x at sf1: 227 -> 8s, identical output): the
    original single groupBy mixed two ``count_distinct`` columns with two
    ``approx_count_distinct`` sketches — Catalyst plans multi-column
    distinct via Expand (x3 input rows), and every expanded row then
    carries the HLL++ sketch buffers through the aggregate, a
    pathological combination measured at 28x the split form. The rework
    runs each exact distinct as its own two-level (distinct -> count)
    aggregation and the two sketches in one plain groupBy, then joins the
    three 3-row results — three narrow shuffles, no Expand, partial aggs
    on every path; the join keys are the 3 return flags (broadcast-sized
    at any corpus scale)."""
    l = table(spark, sf_dir, "lineitem")
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )
    exact_parts = (
        l.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    exact_orders = (
        l.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    agged = sketches.join(exact_parts, "l_returnflag").join(
        exact_orders, "l_returnflag"
    )

    def ok(approx: str, exact: str) -> F.Column:
        err = F.abs(F.col(approx) - F.col(exact)) / F.col(exact).cast("double")
        return (err <= 0.10).alias(f"{approx}_ok")

    return agged.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        ok("approx_parts", "exact_parts"),
        ok("approx_orders", "exact_orders"),
    )


# --------------------------------------------------------------------------
# agg_rollup_returns / agg_cube_orders / agg_grouping_sets — multi-level
# aggregates in one pass (Catalyst expands then hash-aggregates).
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {s_lsum('l_quantity', 100)} AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup_returns", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def agg_rollup_returns(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        lsum("l_quantity", 100).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


_CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, {s_lsum('o_totalprice', 100)} AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube_orders", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def agg_cube_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), lsum("o_totalprice", 100).alias("sum_total")
    )


_GSETS_SQL = f"""
SELECT c_mktsegment, c_nationkey,
       count(*) AS n_cust, {s_lsum('c_acctbal', 100)} AS sum_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_SQL, tags=("agg", "grouping-sets"))
def agg_grouping_sets(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------------------------
# setop_except / setop_intersect / setop_union_tagged — set operations.
# --------------------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


@register("setop_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    orderers = o.select(F.col("o_custkey").alias("c_custkey"))
    # subtract == EXCEPT DISTINCT; exceptAll().distinct() would keep values
    # whose left multiplicity merely exceeds the right's.
    return rich.subtract(orderers)


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
"""


@register("setop_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    orderers = o.select(F.col("o_custkey").alias("c_custkey"))
    return rich.intersect(orderers)


_UNION_ORACLE = """
SELECT side, count(*) AS n, count(DISTINCT nationkey) AS n_nations FROM (
  SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
) t GROUP BY side
"""


@register("setop_union_tagged", oracle=_UNION_ORACLE, tags=("setop",))
def setop_union_tagged(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(
        F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionByName(s)
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("nationkey").alias("n_nations"),
        )
    )


_DISTINCT_PAIRS_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("setop_distinct_pairs", oracle=_DISTINCT_PAIRS_ORACLE, tags=("setop",))
def setop_distinct_pairs(spark, sf_dir):
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# subquery_above_avg_balance — scalar subquery: the global aggregate is
# computed once and broadcast into the filter (no per-row recompute). The
# threshold uses the exact scaled-integer mean so both engines compare
# against bit-identical doubles.
# --------------------------------------------------------------------------

_ABOVE_AVG_ORACLE = f"""
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT {s_lavg('c_acctbal', 100)} FROM customer)
"""


@register("subquery_above_avg_balance", oracle=_ABOVE_AVG_ORACLE, tags=("subquery",))
def subquery_above_avg_balance(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    avg_df = c.agg(lavg("c_acctbal", 100).alias("__avg"))
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_acctbal")
    )


# --------------------------------------------------------------------------
# agg_having_filter — HAVING on an aggregate.
# --------------------------------------------------------------------------

_HAVING_ORACLE = """
SELECT o_custkey, count(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING count(*) > 12
"""


@register("agg_having_filter", oracle=_HAVING_ORACLE, tags=("agg", "having"))
def agg_having_filter(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


# --------------------------------------------------------------------------
# sort_top10_orders — global top-k: Spark runs TakeOrderedAndProject (per-
# partition heap + driver merge), not a full sort. Tie-break on orderkey for
# cross-engine determinism.
# --------------------------------------------------------------------------

_TOP10_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("sort_top10_orders", oracle=_TOP10_ORACLE, tags=("sort", "limit"))
def sort_top10_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Skyline / Pareto frontier (preference query): parts minimizing
# (retailprice, size) jointly — a part is on the frontier iff no other
# part is <= in both dimensions and strictly < in at least one. The naive
# evaluation is the O(n^2) NOT-EXISTS domination join (that's the
# oracle); the scale-safe 2-D rewrite is sort-based: group to distinct
# price levels (min size per level), then a point survives iff its size
# equals its level's min AND is strictly below the running min over all
# SMALLER price levels. The running strict-min uses the two-pass
# range-partition form inline: partition-local windows keyed by __pid
# plus a partition-count-sized offsets table computed with a tiny
# theta self-join (never a partitionless window over data rows) — so the
# plan holds at any cardinality of price levels. Output aggregates the
# frontier points with exact counts and min-part ids.
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT cast(round(p_retailprice * 100) AS BIGINT) AS price_c,
         cast(p_size AS BIGINT) AS size_,
         cast(count(*) AS BIGINT) AS n_parts,
         cast(min(p_partkey) AS BIGINT) AS min_partkey
  FROM part GROUP BY 1, 2
)
SELECT price_c, size_, n_parts, min_partkey
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price_c <= a.price_c AND b.size_ <= a.size_
    AND (b.price_c < a.price_c OR b.size_ < a.size_)
)
"""


@register("join_skyline_pareto", oracle=_SKYLINE_ORACLE, tags=("join", "window", "agg"))
def join_skyline_pareto(spark, sf_dir):
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part")
    pts = p.groupBy(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size_"),
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").cast("long").alias("min_partkey"),
    )
    # distinct price levels with their min size
    lvl = pts.groupBy("price_c").agg(F.min("size_").alias("msz"))
    ranged = (
        lvl.repartitionByRange("price_c")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = ranged.withColumn("local_prev", F.min("msz").over(local_w))
    pid_mins = ranged.groupBy("__pid").agg(F.min("msz").alias("pmin"))
    # offsets: strict-min over all EARLIER range partitions — a tiny theta
    # self-join on the partition-count-sized table (lint-clean, bounded)
    off = (
        pid_mins.alias("a")
        .join(pid_mins.alias("b"), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.min(F.col("b.pmin")).alias("off_prev"))
    )
    prev = with_local.join(F.broadcast(off), "__pid").select(
        "price_c",
        "msz",
        F.least(
            F.coalesce("local_prev", F.lit(None)), F.coalesce("off_prev", "local_prev")
        ).alias("prev_strict"),
    )
    frontier_lvls = prev.filter(
        F.col("prev_strict").isNull() | (F.col("msz") < F.col("prev_strict"))
    ).select(
        F.col("price_c").alias("f_price"), F.col("msz").alias("f_size")
    )
    return pts.join(
        frontier_lvls,
        (F.col("price_c") == F.col("f_price"))
        & (F.col("size_") == F.col("f_size")),
    ).select("price_c", "size_", "n_parts", "min_partkey")
