"""Coverage extensions: analytic windows, ordered string aggregation,
unpivot, map functions, seeded sampling, null-handling functions."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lsum, s_lsum

# --------------------------------------------------------------------------
# lead / first_value / last_value / percent_rank / cume_dist over a unique
# ordering (deterministic across engines).
# --------------------------------------------------------------------------

_ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS last_price,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_analytic_misc", oracle=_ANALYTIC_ORACLE, tags=("window", "analytic"))
def window_analytic_misc(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
# ordered string aggregation (collect_list + sort + join == ordered
# string_agg) — deterministic because the list is sorted post-collect.
# --------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT c_nationkey,
       array_to_string(list_sort(list(c_name)), ',') AS names,
       count(*) AS n
FROM customer
WHERE c_acctbal > 9000
GROUP BY c_nationkey
"""


@register("agg_collect_strings", oracle=_COLLECT_ORACLE, tags=("agg", "collect"))
def agg_collect_strings(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# unpivot (stack): wide measures -> long (metric, value) rows.
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT event_id, 'value' AS metric, value AS metric_value
FROM events WHERE event_id % 20 = 0
UNION ALL
SELECT event_id, 'kvalue' AS metric,
       cast(json_extract_string(props, '$.k') AS DOUBLE) AS metric_value
FROM events WHERE event_id % 20 = 0
"""


@register("func_unpivot_stack", oracle=_UNPIVOT_ORACLE, tags=("functions", "unpivot"))
def func_unpivot_stack(spark, sf_dir):
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    return e.select(
        "event_id",
        F.col("value"),
        F.get_json_object("props", "$.k").cast("double").alias("kvalue"),
    ).selectExpr(
        "event_id",
        "stack(2, 'value', value, 'kvalue', kvalue) AS (metric, metric_value)",
    )


# --------------------------------------------------------------------------
# map functions — build/inspect/filter a map column. The oracle states the
# expected outputs directly from the base columns, so Spark's map semantics
# are what's actually under test.
# --------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT doc_id,
       'lang,source' AS keys,
       source AS source_val,
       2 AS n_entries,
       1 AS n_after_filter
FROM documents
"""


@register("func_map_ops", oracle=_MAP_ORACLE, tags=("functions", "map"))
def func_map_ops(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    filtered = F.map_filter(m, lambda k, v: k != F.lit("lang"))
    return d.select(
        "doc_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).alias("n_entries"),
        F.size(filtered).alias("n_after_filter"),
    )


# --------------------------------------------------------------------------
# seeded sampling — deterministic for a fixed seed within Spark, but the
# XORShift stream is not reproducible by another engine. The driver-checkable
# form returns statistical properties another engine CAN verify: the exact
# population size, a binomial-tolerance verdict on the sample size
# (fraction=0.01; tolerance 0.5%·N + 100 is > 12 sigma at every test SF),
# and a determinism verdict (two samples with the same seed are identical).
# --------------------------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT cast(count(*) AS BIGINT) AS n_total,
       TRUE AS size_ok,
       TRUE AS seed_deterministic
FROM lineitem
"""


@register("func_sample_seeded", oracle=_SAMPLE_ORACLE, tags=("functions", "sample"))
def func_sample_seeded(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    s1 = l.sample(fraction=0.01, seed=42)
    s2 = l.sample(fraction=0.01, seed=42)
    stats = s1.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.bit_xor(F.xxhash64("l_orderkey", "l_linenumber")).alias("sig"),
    )
    stats2 = s2.agg(
        F.count(F.lit(1)).alias("n_sampled2"),
        F.bit_xor(F.xxhash64("l_orderkey", "l_linenumber")).alias("sig2"),
    )
    total = l.agg(F.count(F.lit(1)).alias("n_total"))
    tol = F.col("n_total") * 0.005 + 100.0
    return (
        total.crossJoin(stats)
        .crossJoin(stats2)
        .select(
            "n_total",
            (F.abs(F.col("n_sampled") - F.col("n_total") * 0.01) <= tol).alias(
                "size_ok"
            ),
            (
                (F.col("n_sampled") == F.col("n_sampled2"))
                & F.col("sig").eqNullSafe(F.col("sig2"))
            ).alias("seed_deterministic"),
        )
    )


# --------------------------------------------------------------------------
# null-handling: nullif / coalesce / null-aware aggregation.
# --------------------------------------------------------------------------

_NULLS_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       count(nullif(l_discount, 0.0)) AS n_discounted,
       {s_lsum('coalesce(nullif(l_discount, 0.0), -1.0)', 100)} AS coalesced_sum
FROM lineitem
GROUP BY l_returnflag
"""


@register("func_null_ops", oracle=_NULLS_ORACLE, tags=("functions", "null"))
def func_null_ops(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nz).alias("n_discounted"),
        lsum(F.coalesce(nz, F.lit(-1.0)), 100).alias("coalesced_sum"),
    )


# --------------------------------------------------------------------------
# posexplode — positional explode of an array slice (oracle pairs unnest
# with generate_subscripts).
# --------------------------------------------------------------------------

_POSEXPLODE_ORACLE = """
SELECT vec_id,
       generate_subscripts(sl, 1) - 1 AS pos,
       round(cast(unnest(sl) AS DOUBLE), 6) AS val
FROM (SELECT vec_id, embedding[1:4] AS sl FROM embeddings) t
"""


@register("func_posexplode_slice", oracle=_POSEXPLODE_ORACLE, tags=("functions", "explode"))
def func_posexplode_slice(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "v"))
        .select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))
    )


# --------------------------------------------------------------------------
# recursive CTE (Spark 4 WITH RECURSIVE): generate a month spine covering
# the order history, then left-join monthly order counts onto it — months
# with zero orders still appear. One SQL text serves both engines.
#
# The loop's upper bound is computed ONCE in the anchor and carried through
# the recursion as a column: a scalar subquery in the recursive step's
# WHERE clause is re-evaluated every iteration by Spark's UnionLoop
# execution, i.e. one full rescan of ``orders`` per generated month
# (measured 21.6 s -> 1.9 s at sf0.01 for 80 months; at warehouse scale
# each of those rescans is the whole fact table). With the bound inline,
# ``orders`` is scanned exactly twice: anchor min/max + the final join.
# --------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE months(m, hi) AS (
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate))
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
)
SELECT m AS month_start, count(o_orderkey) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
"""


@register("recursive_month_spine", oracle=_RECURSIVE_SQL, tags=("recursive", "cte"))
def recursive_month_spine(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SQL)


# --------------------------------------------------------------------------
# regexp_extract_all — list outputs joined to a stable string form.
# --------------------------------------------------------------------------

_REGEXPALL_ORACLE = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
       array_to_string(regexp_extract_all(p_brand, '[0-9]+'), ',') AS brand_digits,
       cast(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER) AS n_words
FROM part
"""


@register("func_regexp_extract_all", oracle=_REGEXPALL_ORACLE, tags=("functions", "regex"))
def func_regexp_extract_all(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    words = F.expr("regexp_extract_all(p_name, '[a-z]+', 0)")
    digits = F.expr("regexp_extract_all(p_brand, '[0-9]+', 0)")
    return p.select(
        "p_partkey",
        F.array_join(words, ",").alias("words"),
        F.array_join(digits, ",").alias("brand_digits"),
        F.size(words).alias("n_words"),
    )


# --------------------------------------------------------------------------
# sketch quantiles — approximate by design (GK sketch; rank error <= n/1000
# at accuracy=1000). Driver-checkable form: re-rank the sketch's answer
# against the raw data — count(x < p)/n and count(x <= p)/n must straddle
# the target quantile within a 0.01 rank tolerance (10x the sketch bound).
# The oracle computes the group sizes exactly and expects TRUE verdicts.
# --------------------------------------------------------------------------

_APPROX_PCTL_ORACLE = """
SELECT l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       TRUE AS p50_ok,
       TRUE AS p99_ok
FROM lineitem
GROUP BY l_returnflag
"""


@register("func_approx_percentile", oracle=_APPROX_PCTL_ORACLE, tags=("functions", "approx"))
def func_approx_percentile(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    sk = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99"),
    )

    def rank_ok(p_col: str, q: float) -> F.Column:
        n = F.count(F.lit(1)).cast("double")
        lt = F.count_if(F.col("l_extendedprice") < F.col(p_col)) / n
        le = F.count_if(F.col("l_extendedprice") <= F.col(p_col)) / n
        return ((lt <= q + 0.01) & (le >= q - 0.01)).alias(f"{p_col}_ok")

    return (
        l.join(F.broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rank_ok("p50", 0.5),
            rank_ok("p99", 0.99),
        )
    )


# --------------------------------------------------------------------------
# Correlated LATERAL subquery join (Spark 4 / DuckDB share the syntax):
# latest order per customer as a per-row dependent subquery — the
# non-window formulation of top-1-per-group. Catalyst decorrelates it into
# a join + aggregate, so it scales like the window variant; one SQL text
# serves both engines. Tie-broken on (o_orderdate, o_orderkey) DESC.
# --------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, t.o_orderkey AS last_orderkey,
       t.o_orderdate AS last_orderdate, t.o_totalprice AS last_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
) t
WHERE c.c_custkey < 500
"""


@register("join_lateral_latest_order", oracle=_LATERAL_SQL, tags=("join", "lateral"))
def join_lateral_latest_order(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)
