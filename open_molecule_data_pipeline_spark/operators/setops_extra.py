"""Multiset set-operations (ALL variants) + union-by-name with missing
columns + a skew-salting template."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lsum, s_lsum

_EXCEPT_ALL_ORACLE = """
SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40
"""


@register("setop_except_all", oracle=_EXCEPT_ALL_ORACLE, tags=("setop", "multiset"))
def setop_except_all(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    hi = l.filter(F.col("l_quantity") > 40).select("l_suppkey")
    returned = l.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 40)
    ).select("l_suppkey")
    return hi.exceptAll(returned)


_INTERSECT_ALL_ORACLE = """
SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.05
"""


@register("setop_intersect_all", oracle=_INTERSECT_ALL_ORACLE, tags=("setop", "multiset"))
def setop_intersect_all(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    hi = l.filter(F.col("l_quantity") > 40).select("l_suppkey")
    disc = l.filter(F.col("l_discount") >= 0.05).select("l_suppkey")
    return hi.intersectAll(disc)


_UNION_MISSING_ORACLE = """
SELECT c_custkey AS key, c_acctbal AS bal, NULL AS region FROM customer
  WHERE c_custkey < 50
UNION ALL
SELECT n_nationkey AS key, NULL AS bal, cast(n_regionkey AS DOUBLE) AS region
  FROM nation
"""


@register("setop_union_missing_cols", oracle=_UNION_MISSING_ORACLE, tags=("setop",))
def setop_union_missing_cols(spark, sf_dir):
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    )
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("key"),
        F.col("n_regionkey").cast("double").alias("region"),
    )
    return c.unionByName(n, allowMissingColumns=True)


# --------------------------------------------------------------------------
# Salted aggregation — the skew-mitigation template: aggregate on
# (key, salt) first so one hot key fans across N reducers, then merge the
# partials. Exact same result as the direct aggregate (the oracle proves
# it); at 100 TB this is what keeps one viral key from serializing a stage.
# --------------------------------------------------------------------------

_SALTED_ORACLE = f"""
SELECT l_returnflag, {s_lsum('l_quantity', 100)} AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""

_N_SALTS = 16


@register("agg_salted_skew", oracle=_SALTED_ORACLE, tags=("agg", "skew"))
def agg_salted_skew(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    salted = l.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(_N_SALTS)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("__sq"),
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy("l_returnflag").agg(
        (F.sum("__sq") / 100.0).alias("sum_qty"),
        F.sum("__n").alias("n"),
    )


# --------------------------------------------------------------------------
# Salted join — the skew-mitigation template for joins: the big (skewed)
# side gets a deterministic salt, the small side is replicated once per
# salt value, and the join key becomes (key, salt) so one hot key spreads
# across N reducers instead of serializing one. Bit-identical to the
# unsalted join (the oracle proves it). AQE's skew-join split handles
# moderate skew automatically; this is the explicit pattern for the
# pathological key that still overflows a single split.
# --------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = f"""
SELECT c.c_mktsegment, {s_lsum('l.l_extendedprice', 100)} AS revenue,
       cast(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


@register("join_salted_skew", oracle=_SALTED_JOIN_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").withColumn(
        "__salt", F.pmod(F.col("l_linenumber"), F.lit(_N_SALTS))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    o_rep = o.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
    )
    return (
        l.join(o_rep, (l.l_orderkey == o_rep.o_orderkey) & (l["__salt"] == o_rep["__salt"]))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            lsum("l_extendedprice", 100).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
