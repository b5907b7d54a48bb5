"""Third batch of relational/analytic coverage: regression aggregates,
median + deterministic mode, nth_value, COUNT(DISTINCT) OVER emulation,
encode/hash scalar functions, relational division, deterministic hash
sampling, column profiling, train/eval decontamination, z-order layout
keys, and class-rebalance weights.

Everything here is JVM-side built-ins (no Python UDFs); every query has a
DuckDB oracle twin. Cross-engine hazards handled per ``_util`` rules:
integer-width casts (DuckDB TINYINT/UINTEGER/HUGEINT vs Spark INT/BIGINT),
round() on double ratios, full tie-breakers on every row_number ORDER BY.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

# --------------------------------------------------------------------------
# Linear-regression aggregates (regr_* family). Slope/intercept/r2 are
# ratios of co-moments; double-sum accumulation drift across engines is
# ~1e-11 relative, absorbed by round(4)/round(6).
# --------------------------------------------------------------------------

_REGR_ORACLE = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       cast(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_regression_funcs", oracle=_REGR_ORACLE, tags=("agg", "stats"))
def agg_regression_funcs(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
    )


# --------------------------------------------------------------------------
# Median (exact interpolated percentile) + mode computed deterministically:
# built-in mode() breaks frequency ties arbitrarily in both engines, so the
# mode is derived via count + row_number with a value tie-breaker instead.
# --------------------------------------------------------------------------

_MEDIAN_MODE_ORACLE = """
WITH m AS (
  SELECT l_returnflag, median(l_quantity) AS median_qty
  FROM lineitem GROUP BY l_returnflag
), c AS (
  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_returnflag, mode_qty,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, mode_qty ASC) AS rn
  FROM c
)
SELECT m.l_returnflag, m.median_qty, r.mode_qty
FROM m JOIN r ON m.l_returnflag = r.l_returnflag AND r.rn = 1
"""


@register("agg_median_mode", oracle=_MEDIAN_MODE_ORACLE, tags=("agg", "stats"))
def agg_median_mode(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    med = l.groupBy("l_returnflag").agg(F.median("l_quantity").alias("median_qty"))
    counts = l.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty"
    )


# --------------------------------------------------------------------------
# nth_value over an explicit full-partition ROWS frame (default frames stop
# at CURRENT ROW in both engines, which would make row N see < N rows).
# --------------------------------------------------------------------------

_NTH_ORACLE = """
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       nth_value(o_totalprice, 3) OVER w AS third_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_nth_value", oracle=_NTH_ORACLE, tags=("window",))
def window_nth_value(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) OVER — Spark rejects DISTINCT in window aggregates, so
# this is the standard dense_rank-then-max emulation (exact, two window
# passes over the same partitioning = one shuffle).
# --------------------------------------------------------------------------

_NDV_OVER_ORACLE = """
SELECT o_orderkey, o_custkey, cast(max(dr) OVER (PARTITION BY o_custkey) AS INTEGER) AS n_priorities
FROM (
  SELECT o_orderkey, o_custkey,
         dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS dr
  FROM orders
) t
"""


@register("window_count_distinct_over", oracle=_NDV_OVER_ORACLE, tags=("window",))
def window_count_distinct_over(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w2 = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_orderkey", "o_custkey", F.dense_rank().over(w1).alias("dr")
    )
    return ranked.select(
        "o_orderkey",
        "o_custkey",
        F.max("dr").over(w2).alias("n_priorities"),
    )


# --------------------------------------------------------------------------
# Encoding / hashing scalar family: sha-256, hex, base64, popcount, ascii.
# DuckDB sha256/hex/to_base64∘encode are byte-identical to Spark's
# sha2(_,256)/hex/base64; bit_count widths differ (TINYINT vs INT) → cast.
# --------------------------------------------------------------------------

_ENCODE_ORACLE = """
SELECT c_custkey,
       sha256(c_name) AS sha,
       hex(c_name) AS hexed,
       to_base64(encode(c_name)) AS b64,
       cast(bit_count(c_custkey) AS INTEGER) AS bits,
       cast(ascii(c_mktsegment) AS INTEGER) AS first_cp
FROM customer
"""


@register("func_encode_hash", oracle=_ENCODE_ORACLE, tags=("scalar",))
def func_encode_hash(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("sha"),
        F.hex(F.col("c_name")).alias("hexed"),
        F.base64(F.col("c_name").cast("binary")).alias("b64"),
        F.bit_count("c_custkey").alias("bits"),
        F.ascii("c_mktsegment").alias("first_cp"),
    )


# --------------------------------------------------------------------------
# Relational division: customers whose orders span EVERY priority class.
# The "divisor" cardinality is a 1-row aggregate → broadcast cross join.
# --------------------------------------------------------------------------

_DIVISION_ORACLE = """
SELECT o_custkey
FROM orders
GROUP BY o_custkey
HAVING count(DISTINCT o_orderpriority) =
       (SELECT count(DISTINCT o_orderpriority) FROM orders)
"""


@register("join_relational_division", oracle=_DIVISION_ORACLE, tags=("join", "agg"))
def join_relational_division(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    total = o.agg(F.countDistinct("o_orderpriority").alias("np"))
    per = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("k")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("k") == F.col("np"))
        .select("o_custkey")
    )


# --------------------------------------------------------------------------
# Deterministic pseudo-random sampling: top-5 orders per market segment by
# md5(orderkey). Same template as seeded subsampling of a training corpus,
# but reproducible across engines (unlike rand()) so it stays
# oracle-checked. One shuffle (window partition); dim side broadcast.
# --------------------------------------------------------------------------

_HASH_SAMPLE_ORACLE = """
SELECT c_mktsegment, o_orderkey, cast(rn AS INTEGER) AS rn
FROM (
  SELECT c_mktsegment, o_orderkey,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(cast(o_orderkey AS VARCHAR)), o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rn <= 5
"""


@register("sample_hash_topk_per_group", oracle=_HASH_SAMPLE_ORACLE, tags=("sample", "training"))
def sample_hash_topk_per_group(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        j.select("c_mktsegment", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# Column profiling (data-quality summary): one row per profiled column with
# row/non-null/distinct counts and lexicographic min/max. The per-column
# aggregates are independent single-pass scans unioned together; at scale
# each is a map-side-combined agg over the same cached scan.
# --------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{col}' AS column_name,
       cast(count(*) AS BIGINT) AS n_rows,
       cast(count({col}) AS BIGINT) AS n_nonnull,
       cast(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       min({col}) AS min_val,
       max({col}) AS max_val
FROM orders"""
    for col in _PROFILE_COLS
)


@register("profile_column_summary", oracle=_PROFILE_ORACLE, tags=("profile", "agg"))
def profile_column_summary(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    parts = [
        o.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
        ).select(F.lit(col).alias("column_name"), "*")
        for col in _PROFILE_COLS
    ]
    return reduce(DataFrame.unionByName, parts)


# --------------------------------------------------------------------------
# Train/eval decontamination: word-8-gram overlap of each eval document
# against the distinct 8-gram set of the train split (same md5-nibble split
# as text_train_eval_split). At 100 TB the train-gram side is a hashed
# shuffle join (or a Bloom-filter pre-pass to cut the eval explode);
# here the exact join is the oracle-checkable ground truth.
# --------------------------------------------------------------------------

_DECON_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(len(toks) - 7),
                i -> array_to_string(toks[i+1:i+8], ' ')))) AS g
  FROM toks
  WHERE len(toks) >= 8
), marked AS (
  SELECT doc_id, g,
         CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 32, 1) < 'd'
              THEN 'train' ELSE 'eval' END AS split
  FROM grams
), train_g AS (
  SELECT DISTINCT g FROM marked WHERE split = 'train'
), ev AS (
  SELECT doc_id, g FROM marked WHERE split = 'eval'
)
SELECT ev.doc_id,
       cast(count(*) AS BIGINT) AS n_grams,
       cast(count(train_g.g) AS BIGINT) AS n_hit,
       round(cast(count(train_g.g) AS DOUBLE) / count(*), 6) AS contamination
FROM ev LEFT JOIN train_g ON ev.g = train_g.g
GROUP BY ev.doc_id
"""

_GRAMS_SPARK = (
    "filter(transform(sequence(0, size(toks) - 8),"
    " i -> concat_ws(' ', slice(toks, i + 1, 8))), s -> s is not null)"
)


@register("text_decontamination_overlap", oracle=_DECON_ORACLE, tags=("text", "training", "dedup"), bench=True)
def text_decontamination_overlap(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    grams = (
        d.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 8)
        .select(
            "doc_id",
            # r8: hash each 8-gram to an xxhash64 long BEFORE the
            # distinct/join stages — the gram is a pure join identity
            # (never output), so the probe-set distinct, the train/eval
            # semi-join shuffle, and the per-gram comparisons all run on
            # 8-byte keys instead of ~50-byte strings (2.1x cold at sf1,
            # identical output; the oracle joins on strings and agrees
            # barring a 2^-64-scale collision).
            F.explode(
                F.array_distinct(
                    F.transform(F.expr(_GRAMS_SPARK), lambda s: F.xxhash64(s))
                )
            ).alias("g"),
        )
    )
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    grams = grams.withColumn(
        "split", F.when(nibble < "d", "train").otherwise("eval")
    )
    train_g = grams.filter(F.col("split") == "train").select("g").distinct()
    ev = grams.filter(F.col("split") == "eval").select("doc_id", "g")
    hit = train_g.withColumn("hit", F.lit(1))
    return (
        ev.join(hit, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit").cast("double") / F.count(F.lit(1)), 6).alias(
                "contamination"
            ),
        )
    )


# --------------------------------------------------------------------------
# Z-order (Morton) layout key: bit-interleave two 8-bit dimensions into one
# clustering key. Writing sorted/range-partitioned by zval co-locates rows
# close in BOTH dimensions → multi-dimensional data skipping on scan. Pure
# integer bit math, unrolled 8 bits, identical in both engines.
# --------------------------------------------------------------------------


def _z_spark(xc: str, yc: str) -> str:
    terms = []
    for k in range(8):
        terms.append(f"shiftleft(shiftright({xc}, {k}) & 1, {2 * k + 1})")
        terms.append(f"shiftleft(shiftright({yc}, {k}) & 1, {2 * k})")
    return " + ".join(terms)


def _z_duck(xc: str, yc: str) -> str:
    terms = []
    for k in range(8):
        terms.append(f"((({xc} >> {k}) & 1) << {2 * k + 1})")
        terms.append(f"((({yc} >> {k}) & 1) << {2 * k})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
SELECT o_orderkey, x, y, cast({_z_duck('x', 'y')} AS BIGINT) AS zval
FROM (
  SELECT o_orderkey,
         o_custkey % 256 AS x,
         cast(day(o_orderdate) AS BIGINT) AS y
  FROM orders
) t
"""


@register("layout_zorder_key", oracle=_ZORDER_ORACLE, tags=("layout", "scalar"))
def layout_zorder_key(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        F.dayofmonth("o_orderdate").cast("long").alias("y"),
    )
    return base.select(
        "o_orderkey", "x", "y", F.expr(_z_spark("x", "y")).alias("zval")
    )


# --------------------------------------------------------------------------
# String scalar family #2: translate / split_part / repeat / reverse / lpad
# / overlay. DuckDB lacks overlay(), so the oracle spells out the exact
# substring algebra Spark's overlay implements — same result, two dialects.
# --------------------------------------------------------------------------

_STRING2_ORACLE = """
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       split_part(p_type, ' ', 1) AS type_head,
       repeat(p_brand, 2) AS brand2,
       reverse(p_name) AS rev_name,
       lpad(cast(p_partkey AS VARCHAR), 10, '0') AS key_pad,
       substr(p_name, 1, 1) || 'XX' || substr(p_name, 4) AS overlaid
FROM part
"""


@register("func_string_extra2", oracle=_STRING2_ORACLE, tags=("scalar", "string"))
def func_string_extra2(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.reverse("p_name").alias("rev_name"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.overlay("p_name", F.lit("XX"), F.lit(2), F.lit(2)).alias("overlaid"),
    )


# --------------------------------------------------------------------------
# Calendar-edge functions: month end, ISO week, quarter, day-of-year,
# Monday-start week truncation. DATE results cast to TIMESTAMP (pandas
# dtype parity rule); integer widths pinned to Spark's INT.
# --------------------------------------------------------------------------

_DATE_EDGES_ORACLE = """
SELECT o_orderkey,
       cast(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       cast(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       cast(quarter(o_orderdate) AS INTEGER) AS qtr,
       cast(dayofyear(o_orderdate) AS INTEGER) AS doy,
       date_trunc('week', o_orderdate) AS week_start
FROM orders
"""


@register("func_date_edges", oracle=_DATE_EDGES_ORACLE, tags=("scalar", "date"))
def func_date_edges(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
    )


# --------------------------------------------------------------------------
# Array membership/layout family: sort, position, contains, flatten,
# distinct-count. Spark array_position returns 0 for a miss where DuckDB
# list_position returns NULL → coalesce on the oracle side. The two
# array-valued results are flattened to comma-joined strings on BOTH
# engines: the external harness canonicalizes result cells with a pandas
# sort, which cannot hash nested values, so contract queries must emit
# flat top-level columns only (lint: tests/test_contract_order.py).
# --------------------------------------------------------------------------

_ARRAY_SET_ORACLE = """
SELECT doc_id,
       array_to_string(list_sort(toks[1:5]), ',') AS first5_sorted,
       cast(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
       list_contains(toks, 'data') AS has_data,
       array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS flat4,
       cast(len(list_distinct(toks)) AS INTEGER) AS n_uniq
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
"""


@register("func_array_membership", oracle=_ARRAY_SET_ORACLE, tags=("scalar", "array"))
def func_array_membership(spark, sf_dir):
    d = table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    return d.select(
        "doc_id",
        F.array_join(F.sort_array(F.slice("toks", 1, 5)), ",").alias(
            "first5_sorted"
        ),
        F.array_position("toks", "the").alias("pos_the"),
        F.array_contains("toks", "data").alias("has_data"),
        F.array_join(
            F.flatten(F.array(F.slice("toks", 1, 2), F.slice("toks", 3, 2))),
            ",",
        ).alias("flat4"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
    )


# --------------------------------------------------------------------------
# Class-rebalance weights: inverse-frequency sampling weight per language
# so an equal-probability draw over weighted docs is class-balanced — the
# standard rebalancing step before corpus mixing. All-integer counts until
# one double division.
# --------------------------------------------------------------------------

_REBALANCE_ORACLE = """
WITH c AS (
  SELECT lang, cast(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), t AS (
  SELECT cast(sum(n_docs) AS BIGINT) AS total, cast(count(*) AS BIGINT) AS k FROM c
)
SELECT lang, n_docs, round(total / (k * n_docs), 6) AS weight
FROM c, t
"""


@register("agg_class_rebalance_weights", oracle=_REBALANCE_ORACLE, tags=("agg", "training"))
def agg_class_rebalance_weights(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.col("total") / (F.col("k") * F.col("n_docs")), 6).alias("weight"),
    )


# --------------------------------------------------------------------------
# Event-type co-occurrence (market-basket shape): distinct (user, type)
# pairs self-joined per user with e1 < e2 so each unordered pair counts
# once. The distinct projection shrinks the join input to |users| x |types|
# before the self-join — at scale that pre-aggregation is what keeps the
# pair explosion bounded.
# --------------------------------------------------------------------------

_COOCCUR_ORACLE = """
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS e1, b.event_type AS e2,
       cast(count(*) AS BIGINT) AS n_users
FROM ue a JOIN ue b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@register("join_event_cooccurrence", oracle=_COOCCUR_ORACLE, tags=("join", "events"))
def join_event_cooccurrence(spark, sf_dir):
    ue = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    a = ue.alias("a")
    b = ue.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("e1"),
            F.col("b.event_type").alias("e2"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------------------
# Deterministic Bernoulli sampling with per-class rates: an md5 nibble is a
# uniform 1/16 draw, so a lexicographic threshold gives lang-dependent keep
# probabilities (en: 8/16, others: 4/16) with zero RNG state — the
# reproducible corpus-mixing primitive (same row set on every run/engine).
# --------------------------------------------------------------------------

_BERNOULLI_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 1) <
      CASE WHEN lang = 'en' THEN '8' ELSE '4' END
"""


@register("sample_bernoulli_hash", oracle=_BERNOULLI_ORACLE, tags=("sample", "training"))
def sample_bernoulli_hash(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thresh = F.when(F.col("lang") == "en", "8").otherwise("4")
    return d.filter(nibble < thresh).select("doc_id", "lang")


# --------------------------------------------------------------------------
# Variant type (Spark 4): parse_json into a VARIANT, extract typed fields
# with variant_get. The oracle reads the same JSON with DuckDB's
# json_extract — the semi-structured column pattern where the open type
# lives in storage and typing happens at query time.
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_id,
       cast(json_extract(props, '$.k') AS INTEGER) AS k_val,
       cast(json_extract(props, '$.missing') AS INTEGER) AS missing_val
FROM events
"""


@register("func_variant_json", oracle=_VARIANT_ORACLE, tags=("scalar", "json", "variant"))
def func_variant_json(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
    )


# --------------------------------------------------------------------------
# min_by / max_by argmin-argmax aggregates. Both engines break ordering
# ties arbitrarily, so the ordering value is made unique by packing the
# 2-decimal balance and the key into one wide integer. The stride is 1e20
# (key space: decimal(38,0) on Spark, HUGEINT in the oracle): a bigint
# pack with a 1e6 stride silently MIS-ORDERS once c_custkey reaches 1e6 —
# a one-cent balance difference is then smaller than a custkey difference
# — which is every real customer dimension; 1e20 outruns any key space
# int64 row ids can address.
# --------------------------------------------------------------------------

_MINMAXBY_ORACLE = """
SELECT c_mktsegment,
       max_by(c_name, cast(round(c_acctbal * 100) AS HUGEINT)
                      * 100000000000000000000 + c_custkey) AS richest,
       min_by(c_name, cast(round(c_acctbal * 100) AS HUGEINT)
                      * 100000000000000000000 + c_custkey) AS poorest
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_min_max_by", oracle=_MINMAXBY_ORACLE, tags=("agg",))
def agg_min_max_by(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    packed = (
        F.round(F.col("c_acctbal") * 100).cast("decimal(38,0)")
        * F.expr("cast('100000000000000000000' as decimal(38,0))")
        + F.col("c_custkey")
    )
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", packed).alias("richest"),
        F.min_by("c_name", packed).alias("poorest"),
    )


# --------------------------------------------------------------------------
# IGNORE NULLS forward fill: carry the last observed 'click' value forward
# over each user's event stream — the standard sparse-to-dense gap fill.
# Frame pinned to UNBOUNDED PRECEDING..CURRENT ROW with a full tie-breaker.
# --------------------------------------------------------------------------

_FFILL_ORACLE = """
SELECT event_id, user_id,
       last_value(click_val IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'click' THEN value END AS click_val
  FROM events
) t
"""


@register("window_forward_fill", oracle=_FFILL_ORACLE, tags=("window", "null"))
def window_forward_fill(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(click_val, ignorenulls=True).over(w).alias("filled"),
    )


# --------------------------------------------------------------------------
# Spark 4 string collations: UNICODE_CI makes comparisons/grouping
# case-insensitive at the COLUMN level — no lower() rewrites sprinkled
# through every predicate, and the collation survives into joins and aggs.
# The fixture derives a deterministically mixed-case spelling of each
# market segment; grouping under UNICODE_CI collapses the spellings. The
# oracle expresses the same semantics the portable way (group by lower()),
# which is exactly the rewrite collations make unnecessary.
# --------------------------------------------------------------------------

_COLLATION_ORACLE = """
SELECT lower(seg_mixed) AS segment,
       cast(count(*) AS BIGINT) AS n,
       cast(count(DISTINCT seg_mixed) AS BIGINT) AS n_spellings
FROM (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN c_mktsegment
              ELSE upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
         END AS seg_mixed
  FROM customer
) t
GROUP BY lower(seg_mixed)
"""


@register(
    "func_collation_group", oracle=_COLLATION_ORACLE, tags=("functions", "string")
)
def func_collation_group(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    seg_mixed = (
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(
            F.concat(
                F.upper(F.substring("c_mktsegment", 1, 1)),
                F.lower(F.expr("substr(c_mktsegment, 2)")),
            )
        )
    )
    mixed = c.select(seg_mixed.alias("seg_mixed"))
    ci = F.collate(F.col("seg_mixed"), "UNICODE_CI")
    return (
        mixed.groupBy(ci.alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.collate(F.col("seg_mixed"), "UTF8_BINARY")).alias(
                "n_spellings"
            ),
        )
        .select(
            F.lower(F.collate(F.col("seg_ci"), "UTF8_BINARY")).alias("segment"),
            "n",
            "n_spellings",
        )
    )


# --------------------------------------------------------------------------
# LISTAGG (SQL:2016 ordered string aggregation, new in Spark 4.0) — the
# ordered-concatenation surface: DISTINCT + WITHIN GROUP (ORDER BY) per
# group, plus a bounded top-k listagg (rank-limited BEFORE aggregation so
# the concatenated payload is capped — unbounded listagg of raw rows is a
# scale hazard; the filter keeps it 5 clerks per group no matter the
# corpus). DuckDB's string_agg twin has identical semantics.
# --------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, cast(o_custkey AS VARCHAR) AS ck,
         row_number() OVER (
           PARTITION BY o_orderpriority ORDER BY cast(o_custkey AS VARCHAR)
         ) AS rn
  FROM (SELECT DISTINCT o_orderpriority, o_custkey FROM orders) t
),
top_custs AS (
  SELECT o_orderpriority,
         string_agg(ck, ',' ORDER BY ck) AS first_custs
  FROM ranked WHERE rn <= 5 GROUP BY o_orderpriority
),
statuses AS (
  SELECT o_orderpriority,
         string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
         cast(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_orderpriority
)
SELECT s.o_orderpriority, s.statuses, s.n_orders, t.first_custs
FROM statuses s JOIN top_custs t ON s.o_orderpriority = t.o_orderpriority
"""


@register("func_listagg_group", oracle=_LISTAGG_ORACLE, tags=("func", "agg"))
def func_listagg_group(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    ranked = (
        o.select("o_orderpriority", F.col("o_custkey").cast("string").alias("ck"))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_orderpriority").orderBy("ck")
            ),
        )
    )
    top_custs = (
        ranked.filter(F.col("rn") <= 5)
        .groupBy("o_orderpriority")
        .agg(
            F.expr("listagg(ck, ',') WITHIN GROUP (ORDER BY ck)").alias(
                "first_custs"
            )
        )
    )
    statuses = o.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(DISTINCT o_orderstatus, ',')"
            " WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return statuses.join(F.broadcast(top_custs), "o_orderpriority").select(
        "o_orderpriority", "statuses", "n_orders", "first_custs"
    )


# --------------------------------------------------------------------------
# Column encryption round-trip (aes_encrypt/aes_decrypt): the
# pseudonymization primitive for PII columns at rest — encrypt on ingest,
# decrypt under entitlement. DuckDB has no AES twin, so the oracle is a
# VERDICT over properties the exact side can predict: every row must
# round-trip (decrypt(encrypt(x)) = x), and in deterministic ECB mode
# equal plaintexts produce equal ciphertexts, so distinct-ciphertext
# count equals distinct-plaintext count (the property that makes
# ECB-pseudonymized columns still joinable/groupable — and the reason
# real PII deployments that DON'T need joinability should use GCM, whose
# random IV breaks both this equality and cross-run determinism).
# All JVM-side expressions; one scan + one aggregate.
# --------------------------------------------------------------------------

_AES_ORACLE = """
SELECT cast(count(*) AS BIGINT) AS n_rows,
       cast(count(*) AS BIGINT) AS n_roundtrip_ok,
       cast(count(DISTINCT c_name) AS BIGINT) AS n_distinct_cipher
FROM customer
"""


@register("func_aes_column_crypto", oracle=_AES_ORACLE, tags=("functions", "security"))
def func_aes_column_crypto(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    key = "0123456789abcdef"  # 16-byte AES-128 key (demo constant)
    enc = F.expr(f"aes_encrypt(c_name, '{key}', 'ECB')")
    crypted = c.select(
        "c_name",
        enc.alias("cipher"),
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(c_name, '{key}', 'ECB'),"
            f" '{key}', 'ECB') AS STRING)"
        ).alias("roundtrip"),
    )
    return crypted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("roundtrip") == F.col("c_name"), 1).otherwise(0))
        .cast("long")
        .alias("n_roundtrip_ok"),
        F.countDistinct("cipher").alias("n_distinct_cipher"),
    )


# --------------------------------------------------------------------------
# XPath scalar family (xpath_string / xpath_int / xpath on arrays): the
# XML-column extraction functions — the last scalar family the engine
# exposes without a DuckDB twin (DuckDB has no XPath), so the oracle is a
# round-trip VERDICT: each row renders a small XML document from its own
# relational fields, extracts them back through three xpath flavors, and
# the exact side predicts full-corpus agreement plus the checkable
# aggregates (id sums, array lengths). XML text is built with exact
# field values (no floats), all extraction JVM-side in one scan.
# --------------------------------------------------------------------------

_XPATH_ORACLE = """
SELECT cast(count(*) AS BIGINT) AS n_rows,
       cast(count(*) AS BIGINT) AS n_name_match,
       cast(count(*) AS BIGINT) AS n_key_match,
       cast(sum(n_nationkey) AS BIGINT) AS key_sum,
       cast(sum(2) AS BIGINT) AS n_tags_total
FROM nation
"""


@register("func_xpath_extract", oracle=_XPATH_ORACLE, tags=("functions", "formats"))
def func_xpath_extract(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit("</name><key>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</key><tags><t>a</t><t>b</t></tags></nation>"),
    )
    parsed = n.select(
        "n_name",
        "n_nationkey",
        xml.alias("x"),
    ).select(
        "n_name",
        "n_nationkey",
        F.expr("xpath_string(x, '/nation/name')").alias("name_out"),
        F.expr("xpath_int(x, '/nation/key')").alias("key_out"),
        F.expr("xpath(x, '/nation/tags/t/text()')").alias("tags_out"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("name_out") == F.col("n_name"), 1).otherwise(0))
        .cast("long")
        .alias("n_name_match"),
        F.sum(F.when(F.col("key_out") == F.col("n_nationkey"), 1).otherwise(0))
        .cast("long")
        .alias("n_key_match"),
        F.sum("key_out").cast("long").alias("key_sum"),
        F.sum(F.size("tags_out")).cast("long").alias("n_tags_total"),
    )
