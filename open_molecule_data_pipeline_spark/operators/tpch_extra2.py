"""Second batch of TPC-H-shape queries: the correlated-subquery and
multi-self-join family.

Each exercises a distinct physical pattern the first batch does not:
nation-pair self-joined dims (Q7), grouped ratio-of-conditional-sums (Q8),
expression profit rollup (Q9), late-shipment conditional counts (Q12),
left-join double aggregation (Q13), scalar-subquery equality against a CTE
max (Q15), correlated-average threshold (Q17), sole-late-supplier
exists/not-exists (Q21), per-group-min equality (Q2's correlated min), and
global-share HAVING (Q11's value threshold).

The testdata has no ``partsupp`` table and no ship/commit/receipt date
triple, so Q2/Q9/Q11/Q12/Q21 keep their operator *shape* on the columns
that exist (retail price as the cost proxy, shipdate-vs-orderdate lag as
the lateness signal); the join/agg/subquery structure is unchanged.

All float aggregates follow the scaled-integer rules in ``_util`` so both
engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lavg, lsum, s_lavg, s_lsum

# --------------------------------------------------------------------------
# Q7 shape: volume shipping between a nation pair — the nation dim joins
# twice under different roles (supplier side, customer side). Both sides
# broadcast; the pair predicate prunes before the aggregate.
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       cast(year(l.l_shipdate) AS integer) AS ship_year,
       {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
GROUP BY ns.n_name, nc.n_name, cast(year(l.l_shipdate) AS integer)
"""


@register("join_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "agg"))
def join_volume_shipping(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        # SF-scaling dims (customer/supplier/part) are unhinted module-wide;
        # AQE broadcasts them under the threshold, shuffle-joins at scale.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: market share — per-year ratio of one nation's revenue to total
# revenue for one part type. Both sums are exact scaled integers, so the
# grouped division is bit-identical across engines.
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT cast(year(o.o_orderdate) AS integer) AS order_year,
       ({s_lsum("CASE WHEN n.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 10000)}
        / {s_lsum('l.l_extendedprice * (1 - l.l_discount)', 10000)}) AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'PROMO'
GROUP BY cast(year(o.o_orderdate) AS integer)
"""


@register("agg_market_share", oracle=_Q8_ORACLE, tags=("agg", "conditional"))
def agg_market_share(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg((lsum(nation_vol, 10000) / lsum(vol, 10000)).alias("mkt_share"))
    )


# --------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and year. The testdata has no
# partsupp.ps_supplycost, so retail price * quantity stands in as the cost
# term — same expression-heavy agg over a LIKE-filtered part dim.
# profit has 4 decimal digits (2+2 each term), hence scale 10^4.
# --------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation, cast(year(o.o_orderdate) AS integer) AS order_year,
       {s_lsum('l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity', 10000)} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, cast(year(o.o_orderdate) AS integer)
"""


@register("agg_profit_by_nation_year", oracle=_Q9_ORACLE, tags=("agg", "join"))
def agg_profit_by_nation_year(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(lsum(profit, 10000).alias("profit"))
    )


# --------------------------------------------------------------------------
# Q12 shape: late-shipment priority counts. No l_shipmode/receiptdate in
# the testdata, so "late" is shipdate > orderdate + 90 days and the group
# key is l_linestatus — the conditional-count structure is Q12's.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY l.l_linestatus
"""


@register("join_late_shipment_priority", oracle=_Q12_ORACLE, tags=("join", "conditional"))
def join_late_shipment_priority(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — left outer join with an
# extra join-side predicate, then a second aggregation over the first's
# result (count of counts).
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, cast(count(*) AS bigint) AS custdist
FROM (
  SELECT c.c_custkey, cast(count(o.o_orderkey) AS bigint) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@register("agg_customer_order_distribution", oracle=_Q13_ORACLE, tags=("agg", "join"))
def agg_customer_order_distribution(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: top supplier — quarter revenue per supplier, then equality
# against the scalar max of that same derived relation. The revenue is an
# exact scaled-integer sum, so cross-engine equality is safe.
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {s_lsum('l_extendedprice * (1 - l_discount)', 10000)} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
"""


@register("join_top_supplier", oracle=_Q15_ORACLE, tags=("join", "subquery"))
def join_top_supplier(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "total_rev"
            )
        )
    )
    top = rev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_rev") == F.col("__max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue — correlated average threshold
# (quantity below 20% of the part's own mean). The mean uses the exact
# scaled-sum/count sequence on BOTH sides, so the threshold double is
# bit-identical and the comparison cannot diverge.
# --------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT ({s_lsum('l.l_extendedprice', 100)} / cast(7 AS double)) AS avg_yearly,
       cast(count(*) AS bigint) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < (
    SELECT cast(0.2 AS double) * {s_lavg('l_quantity', 100)}
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("subquery_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("subquery", "agg"))
def subquery_small_quantity_revenue(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        lavg("l_quantity", 100).alias("avg_qty")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (lsum("l_extendedprice", 100) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who alone were late in a multi-supplier order. The
# testdata has no commit/receipt dates, so "late" is shipdate more than 60
# days after the order date. The oracle keeps Q21's EXISTS / NOT EXISTS
# formulation; the Spark plan rewrites it as one per-order aggregate
# (distinct suppliers vs distinct late suppliers) — same semantics, one
# shuffle instead of two self-joins.
# --------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s.s_name, cast(count(*) AS bigint) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
"""


@register("join_waiting_suppliers", oracle=_Q21_ORACLE, tags=("join", "subquery"))
def join_waiting_suppliers(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    order_stats = lo.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        lo.filter(F.col("is_late"))
        .join(order_stats, F.col("l_orderkey") == F.col("os_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q2's correlated-min shape: rows equal to their group's minimum. No
# partsupp table, so the min is retail price within part type. Raw-value
# equality (no arithmetic) is exact in both engines; Spark uses a window
# min — one shuffle, no self-join.
# --------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p.p_partkey, p.p_name, p.p_brand, p.p_type, p.p_retailprice
FROM part p
WHERE p.p_size < 10
  AND p.p_retailprice = (
    SELECT min(p2.p_retailprice) FROM part p2
    WHERE p2.p_type = p.p_type AND p2.p_size < 10
  )
"""


@register("subquery_min_price_part", oracle=_Q2_ORACLE, tags=("subquery", "window"))
def subquery_min_price_part(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("__min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
    )


# --------------------------------------------------------------------------
# Q11's value-share shape: groups whose total exceeds a fraction of the
# global total (scalar subquery HAVING). Part revenue stands in for
# partsupp stock value. Both totals are exact scaled sums.
# --------------------------------------------------------------------------

_Q11_ORACLE = f"""
SELECT l_partkey, {s_lsum('l_extendedprice', 100)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {s_lsum('l_extendedprice', 100)} > (
  SELECT cast(0.0005 AS double) * {s_lsum('l_extendedprice', 100)} FROM lineitem
)
"""


@register("agg_important_part_value", oracle=_Q11_ORACLE, tags=("agg", "subquery"))
def agg_important_part_value(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(lsum("l_extendedprice", 100).alias("part_value"))
    total = l.agg((F.lit(0.0005) * lsum("l_extendedprice", 100)).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total), F.col("part_value") > F.col("__threshold"))
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested-IN semi-join chain — suppliers whose shipped PROMO
# volume in a year clears a threshold. No partsupp table, so the inner
# correlated availqty check becomes the HAVING threshold on the shipped
# aggregate; the IN chain (supplier <- qualifying suppkeys <- part-filtered
# lineitem) keeps Q20's shape. Spark plans the IN as a left-semi join on
# the pre-aggregated (small) key set.
# --------------------------------------------------------------------------

_Q20_ORACLE = f"""
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
  HAVING {s_lsum('l.l_quantity', 100)} > 400
)
"""


@register("join_promo_stock_suppliers", oracle=_Q20_ORACLE, tags=("join", "subquery"))
def join_promo_stock_suppliers(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qualifying = (
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(lsum("l_quantity", 100).alias("__qty"))
        .filter(F.col("__qty") > 400)
        .select("l_suppkey")
    )
    return s.join(
        qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


# --------------------------------------------------------------------------
# Yannakakis-style semi-join reduction: revenue by nation for URGENT orders
# from high-balance customers. The naive plan shuffles ALL of lineitem
# into the orders join even though only URGENT-order rows survive; the
# reduced plan first shrinks orders by its customer filter, then shrinks
# lineitem by a LEFT SEMI join against the surviving order keys, and only
# then runs the fat equi-join — at 100 TB the semi-join (which shuffles
# just the key column, or becomes a runtime Bloom filter under AQE) cuts
# the dominant lineitem exchange by the filter's selectivity. Results are
# IDENTICAL to the direct join by construction; the oracle is the plain
# three-way join, so the driver hash-check proves the reduction changes
# the plan, not the answer.
# --------------------------------------------------------------------------

_SEMIJOIN_ORACLE = f"""
SELECT n.n_name,
       cast(count(*) AS BIGINT) AS n_items,
       {s_lsum("l.l_extendedprice * (1 - l.l_discount)", 10000)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderpriority = '1-URGENT' AND c.c_acctbal > 5000
GROUP BY n.n_name
"""


@register(
    "join_semijoin_reduction", oracle=_SEMIJOIN_ORACLE, tags=("join", "perf")
)
def join_semijoin_reduction(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")

    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_nationkey")
    # reducer 1: orders that survive BOTH their own filter and the customer
    # filter (semi join keeps the build side to one key column)
    o_red = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .join(
            rich.select(F.col("c_custkey").alias("semi_ck")),
            F.col("o_custkey") == F.col("semi_ck"),
            "left_semi",
        )
        .select("o_orderkey", "o_custkey")
    )
    # reducer 2: prune lineitem down to surviving order keys BEFORE the fat
    # join — the step that shrinks the dominant exchange
    li_red = li.join(
        o_red.select(F.col("o_orderkey").alias("semi_ok")),
        F.col("l_orderkey") == F.col("semi_ok"),
        "left_semi",
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li_red.join(o_red, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(rich, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            lsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
                "revenue"
            ),
        )
    )
