"""Scalar function families: string / date / math / JSON / array / conditional.

The reference's only scalar ops are ``strip``/``split``/``str()`` string picks
(SURVEY.md §2A P1-P3, reference ``ingestion/common.py:184-205``); here the
full built-in families are exercised JVM-side (whole-stage codegen, no
Python UDFs in any hot path).

Cross-engine notes baked into the oracle SQL:
- DuckDB ``length``/``year``/``ceil`` return wider types than Spark — the
  oracle casts to Spark's type so the driver's schema check agrees.
- float32 array elements are upcast to double *before* arithmetic in both
  engines so the math happens in the same precision.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------

_STRING_ORACLE = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       cast(length(p_name) AS INTEGER) AS name_len,
       substr(p_name, 1, 8) AS name_prefix,
       replace(p_name, ' ', '_') AS name_snake,
       concat(p_brand, '|', p_type) AS brand_type,
       regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
       (p_name LIKE '%a%') AS has_a
FROM part
"""


@register("func_string_part", oracle=_STRING_ORACLE, tags=("functions", "string"))
def func_string_part(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


# --------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT o_orderkey,
       cast(year(o_orderdate) AS INTEGER) AS yr,
       cast(month(o_orderdate) AS INTEGER) AS mo,
       cast(day(o_orderdate) AS INTEGER) AS dy,
       date_trunc('month', o_orderdate) AS month_start,
       cast(last_day(cast(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       cast(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS day_num,
       cast(cast(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30
FROM orders
"""


@register("func_date_orders", oracle=_DATE_ORACLE, tags=("functions", "date"))
def func_date_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("plus30"),
    )


# --------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - 50000.0), 2) AS abs_diff,
       cast(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
       cast(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
       l_orderkey % 7 AS mod7,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(power(1 + l_discount, 2), 6) AS pow_disc,
       greatest(l_quantity, l_discount * 100) AS hi,
       least(l_quantity, l_discount * 100) AS lo
FROM lineitem
WHERE l_orderkey % 50 = 0
"""


@register("func_math_lineitem", oracle=_MATH_ORACLE, tags=("functions", "math"))
def func_math_lineitem(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000.0), 2).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7.0).alias("ceil7"),
        F.floor(F.col("l_quantity") / 7.0).alias("floor7"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("pow_disc"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("hi"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("lo"),
    )


# --------------------------------------------------------------------------
# JSON extraction from the events.props payload — the Spark analog of the
# reference's JSON-path record extraction (``common.py:109-120``).
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT user_id % 10 AS cohort,
       count(*) AS n,
       cast(sum(k) AS BIGINT) / count(*) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT user_id, cast(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) t
GROUP BY user_id % 10
"""


@register("func_json_events", oracle=_JSON_ORACLE, tags=("functions", "json"))
def func_json_events(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long").alias("k")
    return (
        e.select((F.col("user_id") % 10).alias("cohort"), k)
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("k") / F.count(F.lit(1))).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT bucket, event_type, count(*) AS n
FROM (
  SELECT event_type,
         CASE WHEN value < 50 THEN 'low'
              WHEN value < 200 THEN 'mid'
              ELSE 'high' END AS bucket
  FROM events
) t
GROUP BY bucket, event_type
HAVING count(*) > 10
"""


@register("func_case_bucket", oracle=_CASE_ORACLE, tags=("functions", "conditional"))
def func_case_bucket(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return (
        e.select(bucket, "event_type")
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 10)
    )


# --------------------------------------------------------------------------
# pivot — wide event-type matrix per user cohort. Spark's pivot with an
# explicit value list avoids the extra distinct-values job; nulls are
# coalesced to 0 to match SQL conditional aggregation.
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

_PIVOT_ORACLE = """
SELECT user_id % 10 AS cohort,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'view') AS view,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events
GROUP BY user_id % 10
"""


@register("func_pivot_events", oracle=_PIVOT_ORACLE, tags=("functions", "pivot"))
def func_pivot_events(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    pivoted = (
        e.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# exact percentiles — Spark `percentile` and DuckDB `quantile_cont` share
# linear interpolation semantics.
# --------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
       round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal
FROM customer
GROUP BY c_mktsegment
"""


@register("func_percentile_segment", oracle=_PCT_ORACLE, tags=("functions", "percentile"))
def func_percentile_segment(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
    )


# --------------------------------------------------------------------------
# array ops over the embeddings table (float32 -> double upcast first).
# --------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT vec_id,
       cast(len(embedding) AS INTEGER) AS dim,
       round(cast(embedding[1] AS DOUBLE) + cast(embedding[2] AS DOUBLE), 6) AS first2,
       round(cast(embedding[64] AS DOUBLE), 6) AS last_elem,
       label
FROM embeddings
"""


@register("func_array_ops", oracle=_ARRAY_ORACLE, tags=("functions", "array"))
def func_array_ops(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(el(1) + el(2), 6).alias("first2"),
        F.round(el(64), 6).alias("last_elem"),
        "label",
    )
