"""Third scalar/aggregate function batch: higher-order array lambdas,
portable histogram bucketing, string edit distance, datetime field
extraction, bitwise aggregates, and libm trigonometry.

Cross-engine notes (probed against this runtime's DuckDB):
- DuckDB has no ``width_bucket``/``months_between`` — the histogram uses an
  identical ``floor((x - lo) / step)`` expression on both sides instead.
- DuckDB ``dayofweek`` is 0-based (Sunday=0) vs Spark's 1-based (Sunday=1);
  the oracle adds 1.
- Array lambdas map 1:1: ``transform/filter/aggregate/zip_with`` ↔
  ``list_transform/list_filter/list_aggregate/list_zip``. Per-row list
  folds iterate in element order in both engines, so double sums inside one
  row are deterministic; float32 inputs are upcast to double *before*
  arithmetic (playbook rule) and irrational results rounded to 6 digits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# Higher-order array functions over the embeddings table.
# --------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT vec_id,
       round(sqrt(list_aggregate(list_transform(embedding, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
       cast(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       round(cast(list_max(embedding) AS DOUBLE), 6) AS max_elem,
       round(list_aggregate(list_transform(list_zip(embedding, list_reverse(embedding)), p -> cast(p[1] AS DOUBLE) * cast(p[2] AS DOUBLE)), 'sum'), 6) AS rev_dot
FROM embeddings
"""


@register("func_higher_order_arrays", oracle=_HOF_ORACLE, tags=("functions", "array", "lambda"))
def func_higher_order_arrays(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)
    rev_prod = F.zip_with(
        "embedding",
        F.reverse(F.col("embedding")),
        lambda a, b: a.cast("double") * b.cast("double"),
    )
    return e.select(
        "vec_id",
        F.round(F.sqrt(fold(sq)), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
        F.round(fold(rev_prod), 6).alias("rev_dot"),
    )


# --------------------------------------------------------------------------
# Histogram bucketing with a portable constant-bounds floor formula — the
# expression tree is identical on both sides, so the FP division cannot
# diverge. (width_bucket itself is Spark-only in this runtime.)
# --------------------------------------------------------------------------

_HISTO_ORACLE = """
SELECT cast(floor(o_totalprice / cast(5000 AS DOUBLE)) AS BIGINT) AS bucket,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(min(o_orderkey) AS BIGINT) AS min_key
FROM orders
GROUP BY cast(floor(o_totalprice / cast(5000 AS DOUBLE)) AS BIGINT)
"""


@register("func_histogram_buckets", oracle=_HISTO_ORACLE, tags=("functions", "histogram"))
def func_histogram_buckets(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(5000.0)).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


# --------------------------------------------------------------------------
# Levenshtein edit distance — integer-exact in both engines.
# --------------------------------------------------------------------------

_LEV_ORACLE = """
SELECT cast(levenshtein(p_name, 'small ring') AS INTEGER) AS edit_dist,
       cast(count(*) AS BIGINT) AS n_parts,
       min(p_name) AS sample_name
FROM part
GROUP BY cast(levenshtein(p_name, 'small ring') AS INTEGER)
"""


@register("func_string_distance", oracle=_LEV_ORACLE, tags=("functions", "string"))
def func_string_distance(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("small ring"))
    return (
        p.groupBy(dist.alias("edit_dist"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_name").alias("sample_name"),
        )
    )


# --------------------------------------------------------------------------
# Datetime field extraction + month arithmetic. Spark add_months returns
# DATE → cast back to TIMESTAMP (playbook: never output DATE columns).
# --------------------------------------------------------------------------

_DT_ORACLE = """
SELECT cast(quarter(o_orderdate) AS INTEGER) AS q,
       cast(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       cast(count(*) AS BIGINT) AS n_orders,
       min(cast(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)) AS min_plus3m,
       max(cast(last_day(o_orderdate) AS TIMESTAMP)) AS max_month_end
FROM orders
GROUP BY cast(quarter(o_orderdate) AS INTEGER), cast(dayofweek(o_orderdate) + 1 AS INTEGER)
"""


@register("func_datetime_extra", oracle=_DT_ORACLE, tags=("functions", "datetime"))
def func_datetime_extra(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.quarter("o_orderdate").alias("q"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.add_months("o_orderdate", 3).cast("timestamp_ntz")).alias(
                "min_plus3m"
            ),
            F.max(F.last_day("o_orderdate").cast("timestamp_ntz")).alias(
                "max_month_end"
            ),
        )
    )


# --------------------------------------------------------------------------
# Bitwise aggregates — integer-exact, order-insensitive by construction.
# --------------------------------------------------------------------------

_BITS_ORACLE = """
SELECT l_returnflag,
       cast(bit_and(l_orderkey) AS BIGINT) AS key_and,
       cast(bit_or(l_orderkey) AS BIGINT) AS key_or,
       cast(bit_xor(l_orderkey) AS BIGINT) AS key_xor
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_bitwise_keys", oracle=_BITS_ORACLE, tags=("agg", "bitwise"))
def agg_bitwise_keys(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("key_and"),
        F.bit_or("l_orderkey").alias("key_or"),
        F.bit_xor("l_orderkey").alias("key_xor"),
    )


# --------------------------------------------------------------------------
# Trigonometry / libm scalars. Inputs are exact 2-decimal doubles; results
# may differ in the last ulp between JVM Math and C libm, so round(6)
# before comparing (playbook rule for genuinely-irrational doubles).
# --------------------------------------------------------------------------

_TRIG_ORACLE = """
SELECT p_partkey,
       round(sin(p_retailprice), 6) AS sin_price,
       round(cos(p_retailprice), 6) AS cos_price,
       round(atan2(p_retailprice, cast(p_size AS DOUBLE)), 6) AS atan2_ps,
       round(radians(cast(p_size AS DOUBLE)), 6) AS size_rad
FROM part
WHERE p_partkey <= 500
"""


@register("func_trig_math", oracle=_TRIG_ORACLE, tags=("functions", "math"))
def func_trig_math(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.round(F.sin("p_retailprice"), 6).alias("sin_price"),
        F.round(F.cos("p_retailprice"), 6).alias("cos_price"),
        F.round(F.atan2(F.col("p_retailprice"), F.col("p_size").cast("double")), 6).alias(
            "atan2_ps"
        ),
        F.round(F.radians(F.col("p_size").cast("double")), 6).alias("size_rad"),
    )


# --------------------------------------------------------------------------
# Boolean aggregates + conditional count — order-insensitive by
# construction, so no float precautions needed. DuckDB count_if returns
# HUGEINT-ish → cast; Spark count_if returns bigint.
# --------------------------------------------------------------------------

_BOOLAGG_ORACLE = """
SELECT c_mktsegment,
       cast(count_if(c_acctbal > 5000) AS BIGINT) AS n_high,
       bool_and(c_acctbal > -1000) AS all_above_floor,
       bool_or(c_acctbal > 9900) AS any_near_cap,
       cast(count(*) AS BIGINT) AS n_total
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_boolean_flags", oracle=_BOOLAGG_ORACLE, tags=("agg", "boolean"))
def agg_boolean_flags(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count_if(F.col("c_acctbal") > 5000).alias("n_high"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9900).alias("any_near_cap"),
        F.count(F.lit(1)).alias("n_total"),
    )


# --------------------------------------------------------------------------
# C-style string formatting: Spark format_string and DuckDB printf share
# the printf dialect for %s/%d with width/zero-pad flags.
# --------------------------------------------------------------------------

_FMT_ORACLE = """
SELECT p_partkey,
       printf('%s#%05d', p_brand, p_partkey) AS brand_tag,
       printf('%-8s|%4d', p_type, p_size) AS type_cell
FROM part
WHERE p_partkey <= 1000
"""


@register("func_format_strings", oracle=_FMT_ORACLE, tags=("functions", "string"))
def func_format_strings(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    return p.select(
        "p_partkey",
        F.format_string("%s#%05d", "p_brand", "p_partkey").alias("brand_tag"),
        F.format_string("%-8s|%4d", "p_type", "p_size").alias("type_cell"),
    )
