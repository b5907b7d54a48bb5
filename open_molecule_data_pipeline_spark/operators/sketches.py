"""Mergeable sketch aggregates: count-min heavy hitters, KMV distinct /
merge / intersect, HLL union, Misra-Gries, approx-percentile verdict,
bitmap distinct.

Split out of ``corpus_refinery.py`` r14 (VERDICT r13 #7 — family-line
hygiene, the ``training_extra.py`` precedent): code moved verbatim, no
behavior change. Every sketch here is mergeable by construction (plain
integer sums / mins / maxes), so Spark computes them as ONE map-side
partially-aggregated corpus pass; estimates are joined against exact
counts where the query's contract is an accuracy verdict.

Hash-derived buckets/positions are md5 hex substrings so Spark and the
DuckDB oracle compute identical values with no integer-conversion
divergence (the ``_hex32`` idiom).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# Count-min sketch heavy hitters over lineitem suppliers. d=3 hash rows,
# w=256 buckets (2 md5 hex chars). The counter grid is one groupBy over
# (row, bucket) — mergeable partial aggregation, O(d*w) state regardless of
# input size. Estimates (min over rows) are joined against exact counts for
# the top-10 keys; overcount >= 0 always (the CMS guarantee).
# --------------------------------------------------------------------------

_CMS_D = 3
_TOP = 10


def _cms_bucket_sql(key: str, j: int) -> str:
    return f"substr(md5({key} || '|{j}'), 1, 2)"


_CMS_ORACLE = f"""
WITH keyed AS (
  SELECT 'sup_' || cast(l_suppkey AS VARCHAR) AS k FROM lineitem
),
grid AS (
  SELECT j.j, {_cms_bucket_sql('k', 0)} AS b, count(*) AS c
  FROM keyed, (SELECT unnest([0]) AS j) j GROUP BY 1, 2
  UNION ALL
  SELECT 1, {_cms_bucket_sql('k', 1)}, count(*) FROM keyed GROUP BY 1, 2
  UNION ALL
  SELECT 2, {_cms_bucket_sql('k', 2)}, count(*) FROM keyed GROUP BY 1, 2
),
exact AS (
  SELECT k, count(*) AS exact_n FROM keyed GROUP BY k
),
est AS (
  SELECT e.k, e.exact_n, min(g.c) AS est_n
  FROM exact e
  JOIN grid g
    ON (g.j = 0 AND g.b = {_cms_bucket_sql('e.k', 0)})
    OR (g.j = 1 AND g.b = {_cms_bucket_sql('e.k', 1)})
    OR (g.j = 2 AND g.b = {_cms_bucket_sql('e.k', 2)})
  GROUP BY e.k, e.exact_n
)
SELECT k, cast(exact_n AS BIGINT) AS exact_n, cast(est_n AS BIGINT) AS est_n,
       cast(est_n - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY exact_n DESC, k
LIMIT {_TOP}
"""


@register(
    "agg_countmin_heavy_hitters", oracle=_CMS_ORACLE, tags=("agg", "sketch")
)
def agg_countmin_heavy_hitters(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.concat(F.lit("sup_"), F.col("l_suppkey").cast("string")).alias("k")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.substring(F.md5(F.concat(F.col("k"), F.lit(f"|{j}"))), 1, 2).alias(
                    "b"
                ),
            )
            for j in range(_CMS_D)
        ]
    )
    grid = (
        keyed.select(F.explode(rows).alias("r"))
        .groupBy("r.j", "r.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "k",
        "exact_n",
        F.explode(rows).alias("r"),
    ).select("k", "exact_n", "r.j", "r.b")
    est = (
        probes.join(F.broadcast(grid), ["j", "b"])
        .groupBy("k", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        est.select(
            "k",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "k")
        .limit(_TOP)
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch: keep the k smallest
# normalized hashes of the key stream; estimate = (k-1) / R_k where R_k is
# the k-th smallest hash as a fraction of the hash space. Mergeable (union
# of KMV sets -> take k smallest again) and O(k) state however large the
# input — the sketch family's third member next to Bloom (membership) and
# count-min (frequency). The k smallest ride a TakeOrderedAndProject, never
# a global sort; hashes decode portably via strpos-into-hex-alphabet.
# --------------------------------------------------------------------------

_KMV_K = 64


def _hex32(expr_tpl: str, hash_expr: str) -> str:
    """32-bit int from the first 8 hex chars of an md5 hex digest."""
    nibbles = [
        expr_tpl.format(d=f"substr({hash_expr}, {i + 1}, 1)") for i in range(8)
    ]
    return " + ".join(
        f"{nib} * {16 ** (7 - i)}" for i, nib in enumerate(nibbles)
    )


# bigint nibble values: the * 16^7 weight overflows int32 under ANSI mode
_HEXVAL_DUCK = "(cast(strpos('0123456789abcdef', {d}) AS BIGINT) - 1)"
_HEXVAL_SPARK = "(cast(instr('0123456789abcdef', {d}) AS BIGINT) - 1)"

_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT cast({_hex32(_HEXVAL_DUCK, "md5('cust_' || cast(o_custkey AS VARCHAR))")} AS BIGINT) AS h
  FROM orders
),
kmin AS (
  SELECT max(h) AS rk FROM (SELECT h FROM hashed ORDER BY h LIMIT {_KMV_K}) t
),
exact AS (SELECT cast(count(*) AS BIGINT) AS exact_distinct FROM hashed)
SELECT exact_distinct,
       round(({_KMV_K} - 1) * 4294967296.0 / rk, 4) AS kmv_estimate,
       round(abs(({_KMV_K} - 1) * 4294967296.0 / rk - exact_distinct)
             * 100.0 / exact_distinct, 4) AS rel_err_pct
FROM exact, kmin
"""


@register("agg_kmv_distinct", oracle=_KMV_ORACLE, tags=("agg", "sketch"))
def agg_kmv_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    hashed = o.select(
        F.expr(
            _hex32(
                _HEXVAL_SPARK, "md5('cust_' || cast(o_custkey AS STRING))"
            )
        )
        .cast("long")
        .alias("h")
    ).distinct()
    kmin = hashed.orderBy("h").limit(_KMV_K).agg(F.max("h").alias("rk"))
    exact = hashed.agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = (_KMV_K - 1) * F.lit(4294967296.0) / F.col("rk")
    return exact.crossJoin(F.broadcast(kmin)).select(
        "exact_distinct",
        F.round(est, 4).alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("exact_distinct")) * 100.0
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err_pct"),
    )


# --------------------------------------------------------------------------
# KMV merge: the property that makes KMV a *distributed* sketch — the union
# of two keys-streams' sketches is just the k smallest of the combined
# hash sets, with the same estimator. Here the two independently-sketched
# streams are the order-placing customers and the full customer registry;
# the merged estimate is checked against the exact distinct of the union.
# At 100 TB each stream's sketch is O(k) state produced by its own top-k
# (TakeOrderedAndProject), and the merge touches 2k rows however large
# either input — this is how per-partition / per-day sketches roll up.
# --------------------------------------------------------------------------

_KMV_MERGE_ORACLE = f"""
WITH h_orders AS (
  SELECT DISTINCT cast({_hex32(_HEXVAL_DUCK, "md5('cust_' || cast(o_custkey AS VARCHAR))")} AS BIGINT) AS h
  FROM orders
),
h_cust AS (
  SELECT DISTINCT cast({_hex32(_HEXVAL_DUCK, "md5('cust_' || cast(c_custkey AS VARCHAR))")} AS BIGINT) AS h
  FROM customer
),
sk_orders AS (SELECT h FROM h_orders ORDER BY h LIMIT {_KMV_K}),
sk_cust AS (SELECT h FROM h_cust ORDER BY h LIMIT {_KMV_K}),
merged AS (
  SELECT h FROM (
    SELECT DISTINCT h FROM (
      SELECT h FROM sk_orders UNION ALL SELECT h FROM sk_cust
    ) u
  ) d ORDER BY h LIMIT {_KMV_K}
),
rk AS (SELECT max(h) AS rk, count(*) AS k FROM merged),
exact AS (
  SELECT cast(count(*) AS BIGINT) AS exact_union FROM (
    SELECT h FROM h_orders UNION SELECT h FROM h_cust
  ) u
)
SELECT exact_union,
       round((k - 1) * 4294967296.0 / rk, 4) AS kmv_estimate,
       round(abs((k - 1) * 4294967296.0 / rk - exact_union)
             * 100.0 / exact_union, 4) AS rel_err_pct
FROM exact, rk
"""


@register("agg_kmv_merge", oracle=_KMV_MERGE_ORACLE, tags=("agg", "sketch"))
def agg_kmv_merge(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")

    def sketch(df, key_expr):
        hashed = df.select(
            F.expr(_hex32(_HEXVAL_SPARK, f"md5('cust_' || cast({key_expr} AS STRING))"))
            .cast("long")
            .alias("h")
        ).distinct()
        return hashed

    h_orders = sketch(o, "o_custkey")
    h_cust = sketch(c, "c_custkey")
    sk_orders = h_orders.orderBy("h").limit(_KMV_K)
    sk_cust = h_cust.orderBy("h").limit(_KMV_K)
    merged = (
        sk_orders.unionAll(sk_cust).distinct().orderBy("h").limit(_KMV_K)
    )
    rk = merged.agg(F.max("h").alias("rk"), F.count(F.lit(1)).alias("k"))
    exact = (
        h_orders.unionAll(h_cust)
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_union"))
    )
    est = (F.col("k") - 1) * F.lit(4294967296.0) / F.col("rk")
    return exact.crossJoin(F.broadcast(rk)).select(
        "exact_union",
        F.round(est, 4).alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("exact_union")) * 100.0 / F.col("exact_union"), 4
        ).alias("rel_err_pct"),
    )


# --------------------------------------------------------------------------
# Apache DataSketches HLL: Spark 4's hll_sketch_agg / hll_union_agg /
# hll_sketch_estimate — the PRODUCTION mergeable-sketch path (the KMV ops
# above show the algebra with a hand-rolled sketch; this is the library
# flavor a platform team actually deploys, with binary sketches that merge
# across partitions/days/engines). Per-nation sketches are built in one
# partial-aggregated pass, merged with hll_union_agg, and the merged
# estimate is compared against the exact distinct of the union. The sketch
# bytes are engine-specific, so the driver-checkable form is the verdict
# pattern of agg_approx_distinct: exact values + a bounded-relative-error
# boolean (lgConfigK=12 -> ~1.6% rse; 6% bound = ~4 sigma).
# --------------------------------------------------------------------------

_HLL_ORACLE = """
SELECT cast(count(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
       cast((SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer) n)
            AS BIGINT) AS n_sketches,
       TRUE AS merged_estimate_ok
FROM customer
"""


@register(
    "agg_hll_sketch_merge", oracle=_HLL_ORACLE, tags=("agg", "sketch", "approx")
)
def agg_hll_sketch_merge(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(12)).alias("sk")
    )
    merged = per_nation.agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = c.agg(F.countDistinct("c_custkey").alias("exact_distinct"))
    err = (
        F.abs(F.col("est") - F.col("exact_distinct"))
        / F.col("exact_distinct").cast("double")
    )
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_distinct",
        "n_sketches",
        (err <= 0.06).alias("merged_estimate_ok"),
    )


# --------------------------------------------------------------------------
# Approximate-percentile correctness verdict — the quantile sketch joins
# the mergeable-sketch family (count-min, KMV, HLL) with the same
# bounded-property technique: Spark's percentile_approx (Greenwald-Khanna,
# accuracy a) guarantees rank error <= n/a, so the verdict checks the
# approximate median lands between the EXACT order statistics at ranks
# floor(n/2 - n/a) and ceil(n/2 + n/a) + 1 per group. DuckDB can't run GK,
# but it can verify the guarantee: the oracle recomputes n, the exact
# interpolated median (identical (n-1)*p definition on both engines), and
# asserts the bound literally. At 100 TB the sketch is the only viable
# path (exact percentiles need a full sort); this query is the proof the
# cheap path stays inside its error contract.
# --------------------------------------------------------------------------

_APPROX_PCT_ACCURACY = 10000

_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
       true AS approx_in_rank_bounds
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_approx_percentile_verdict",
    oracle=_APPROX_PCT_ORACLE,
    tags=("agg", "sketch", "stats"),
)
def agg_approx_percentile_verdict(spark, sf_dir):
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            "l_extendedprice", 0.5, _APPROX_PCT_ACCURACY
        ).alias("ap"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
            "exact_p50"
        ),
    )
    # exact order statistics bracketing the allowed rank window
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.withColumn("rn", F.row_number().over(w))
    bounded = ranked.join(
        agg.select(
            "l_returnflag",
            F.floor(
                F.col("n") / 2 - F.col("n") / _APPROX_PCT_ACCURACY
            ).alias("lo"),
            F.ceil(
                F.col("n") / 2 + F.col("n") / _APPROX_PCT_ACCURACY + 1
            ).alias("hi"),
        ),
        "l_returnflag",
    ).filter(F.col("rn").between(F.col("lo"), F.col("hi")))
    brackets = bounded.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo_v"),
        F.max("l_extendedprice").alias("hi_v"),
    )
    return agg.join(brackets, "l_returnflag").select(
        "l_returnflag",
        "n",
        "exact_p50",
        F.col("ap").between(F.col("lo_v"), F.col("hi_v")).alias(
            "approx_in_rank_bounds"
        ),
    )


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters — the DETERMINISTIC-GUARANTEE member of the
# frequency-sketch family (count-min above gives probabilistic overcounts;
# MG gives certain bounds with O(k) state). Per-Arrow-batch summaries are
# merged by plain count-sum, which preserves both MG invariants at any
# partitioning: (a) underestimate — each batch summary undercounts its own
# batch, so the sum undercounts the stream; (b) completeness — total
# decrements across batches <= n/(k+1), so any key with true frequency
# > n/(k+1) survives into the merged summary. The verdict output exposes
# ONLY these order-invariant guarantees (batch boundaries and row order
# inside a partition are not deterministic, the guarantees are), so the
# exact-side oracle can predict every column.
#
# The keyed stream is synthesized skewed (3 hot keys ~ 1/6 of the stream
# each + per-part cold tail) because the testdata's natural keys are
# uniform; the hot/cold split is a pure function of row keys, so both
# engines derive the identical stream. Scale: the sketch pass is one
# mapInPandas over the (projected) scan — O(k) memory per task, summary
# rows ~ k per batch; the exact twin (for the verdict) is one count
# aggregation.
# --------------------------------------------------------------------------

_MG_K = 32


def _mg_key_sql(order_col: str, part_col: str, str_t: str = "VARCHAR") -> str:
    return (
        f"CASE WHEN {order_col} % 4 < 2 THEN 'hot_' || cast({order_col} % 3 AS"
        f" {str_t}) ELSE 'cold_' || cast({part_col} AS {str_t}) END"
    )


_MG_ORACLE = f"""
WITH stream AS (
  SELECT {_mg_key_sql("l_orderkey", "l_partkey")} AS k FROM lineitem
),
exact AS (SELECT k, cast(count(*) AS BIGINT) AS n FROM stream GROUP BY k),
tot AS (SELECT cast(sum(n) AS BIGINT) AS n FROM exact)
SELECT t.n,
       {_MG_K} AS k,
       (SELECT cast(count(*) AS BIGINT) FROM exact) AS n_distinct,
       (SELECT cast(count(*) AS BIGINT) FROM exact e
        WHERE e.n * ({_MG_K} + 1) > t.n) AS n_heavy_exact,
       (SELECT cast(count(*) AS BIGINT) FROM exact e
        WHERE e.n * ({_MG_K} + 1) > t.n) AS n_heavy_reported,
       cast(0 AS BIGINT) AS n_underestimate_violations
FROM tot t
"""


@register("agg_misra_gries_verdict", oracle=_MG_ORACLE, tags=("agg", "sketch"))
def agg_misra_gries_verdict(spark, sf_dir):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    li = table(spark, sf_dir, "lineitem")
    stream = li.select(
        F.expr(_mg_key_sql("l_orderkey", "l_partkey", "STRING")).alias("k")
    )

    out_schema = StructType(
        [StructField("k", StringType()), StructField("cnt", LongType())]
    )

    def mg(batches):
        import pandas as pd

        k_cap = _MG_K
        for pdf in batches:
            counters: dict[str, int] = {}
            for key in pdf["k"]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k_cap:
                    counters[key] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
            if counters:
                yield pd.DataFrame(
                    {"k": list(counters), "cnt": list(counters.values())}
                )

    summaries = stream.mapInPandas(mg, out_schema)
    est = summaries.groupBy("k").agg(F.sum("cnt").cast("long").alias("est"))
    exact = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    tot = exact.agg(F.sum("n").cast("long").alias("n"))
    joined = exact.join(est, "k", "left").crossJoin(F.broadcast(tot).withColumnRenamed("n", "tot_n"))
    return joined.agg(
        F.max("tot_n").alias("n"),
        F.max(F.lit(_MG_K)).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.when(F.col("n") * (_MG_K + 1) > F.col("tot_n"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_heavy_exact"),
        F.sum(
            F.when(
                (F.col("n") * (_MG_K + 1) > F.col("tot_n"))
                & F.col("est").isNotNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_heavy_reported"),
        F.sum(F.when(F.col("est") > F.col("n"), 1).otherwise(0))
        .cast("long")
        .alias("n_underestimate_violations"),
    )


# --------------------------------------------------------------------------
# KMV set-operation estimates: Jaccard and intersection cardinality from
# two k-minimum-values sketches (streams: customers placing URGENT vs HIGH
# priority orders). The union sketch is the k smallest of the two sketch
# unions; Jaccard-hat = |{h in K_union : h in A and h in B}| / k; the
# intersection estimate is Jaccard-hat x the union's KMV cardinality
# estimate (Beyer et al., SIGMOD'07). Everything is a deterministic
# function of the key sets — no RNG — so the oracle replays the identical
# sketch algebra and the driver check is exact, while rel_err columns
# document how good the k=64 estimate actually is against the exact
# intersection. Scale: each sketch is a TakeOrderedAndProject (never a
# global sort); sketch algebra is on 3 x 64-row broadcast relations.
# --------------------------------------------------------------------------

_KMV_I_ORACLE = f"""
WITH a_keys AS (
  SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
),
b_keys AS (
  SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderpriority = '2-HIGH'
),
a_h AS (SELECT cast({_hex32(_HEXVAL_DUCK, "md5('ck_' || cast(ck AS VARCHAR))")} AS BIGINT) AS h FROM a_keys),
b_h AS (SELECT cast({_hex32(_HEXVAL_DUCK, "md5('ck_' || cast(ck AS VARCHAR))")} AS BIGINT) AS h FROM b_keys),
sk_a AS (SELECT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
sk_b AS (SELECT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
sk_u AS (
  SELECT h FROM (SELECT h FROM sk_a UNION SELECT h FROM sk_b) u
  ORDER BY h LIMIT {_KMV_K}
),
ucard AS (
  SELECT ({_KMV_K} - 1) * 4294967296.0 / max(h) AS est_union FROM sk_u
),
jacc AS (
  SELECT cast(count(*) AS BIGINT) AS n_both
  FROM sk_u
  WHERE h IN (SELECT h FROM sk_a) AND h IN (SELECT h FROM sk_b)
),
exact AS (
  SELECT cast(count(*) AS BIGINT) AS exact_inter
  FROM a_keys JOIN b_keys USING (ck)
)
SELECT e.exact_inter,
       round(cast(j.n_both AS DOUBLE) / {_KMV_K}, 6) AS jaccard_est,
       round(cast(j.n_both AS DOUBLE) / {_KMV_K} * u.est_union, 4) AS est_inter,
       round(abs(cast(j.n_both AS DOUBLE) / {_KMV_K} * u.est_union - e.exact_inter)
             * 100.0 / e.exact_inter, 4) AS rel_err_pct
FROM exact e CROSS JOIN jacc j CROSS JOIN ucard u
"""


@register("agg_kmv_intersect", oracle=_KMV_I_ORACLE, tags=("agg", "sketch"))
def agg_kmv_intersect(spark, sf_dir):
    o = table(spark, sf_dir, "orders")

    def sketch(priority: str):
        keys = (
            o.filter(F.col("o_orderpriority") == priority)
            .select(F.col("o_custkey").alias("ck"))
            .distinct()
        )
        hashed = keys.select(
            F.expr(
                _hex32(_HEXVAL_SPARK, "md5('ck_' || cast(ck AS STRING))")
            )
            .cast("long")
            .alias("h")
        )
        return hashed.orderBy("h").limit(_KMV_K)

    sk_a, sk_b = sketch("1-URGENT"), sketch("2-HIGH")
    sk_u = (
        sk_a.unionByName(sk_b).distinct().orderBy("h").limit(_KMV_K)
    )
    ucard = sk_u.agg(
        ((_KMV_K - 1) * F.lit(4294967296.0) / F.max("h")).alias("est_union")
    )
    jacc = (
        sk_u.join(sk_a, "h", "left_semi")
        .join(sk_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    a_keys = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    b_keys = (
        o.filter(F.col("o_orderpriority") == "2-HIGH")
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    exact = a_keys.join(b_keys, "ck").agg(
        F.count(F.lit(1)).alias("exact_inter")
    )
    est_i = F.col("n_both").cast("double") / _KMV_K * F.col("est_union")
    return (
        exact.crossJoin(F.broadcast(jacc))
        .crossJoin(F.broadcast(ucard))
        .select(
            "exact_inter",
            F.round(F.col("n_both").cast("double") / _KMV_K, 6).alias(
                "jaccard_est"
            ),
            F.round(est_i, 4).alias("est_inter"),
            F.round(
                F.abs(est_i - F.col("exact_inter"))
                * 100.0
                / F.col("exact_inter"),
                4,
            ).alias("rel_err_pct"),
        )
    )


# --------------------------------------------------------------------------
# Bitmap-index distinct counting (Spark 3.5+ bitmap_* functions): the EXACT
# mergeable-distinct structure — each (group, bucket) holds a fixed 4 KB
# bitmap of key bit-positions; per-group distinct = sum of bucket popcounts,
# and cross-group distinct is bitmap_or_agg over the SAME buckets (the
# pre-aggregation pattern warehouses use for precomputed COUNT(DISTINCT)
# at 100 TB: bitmaps union by OR across any slice, unlike raw distinct
# counts which never merge). The oracle is plain COUNT(DISTINCT) per group
# + global — an exact-equality proof that the bitmap pipeline loses
# nothing. Shuffle carries 4 KB bitmaps per (group, bucket), never keys.
# --------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT o_orderpriority AS grp,
       cast(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL', cast(count(DISTINCT o_custkey) AS BIGINT) FROM orders
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def agg_bitmap_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    buckets = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
    )
    per_group = buckets.groupBy("grp").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct")
    )
    merged = (
        buckets.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct"))
        .select(F.lit("ALL").alias("grp"), "n_distinct")
    )
    return per_group.unionByName(merged)


