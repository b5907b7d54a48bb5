"""Corpus-refinery operators: the cleanup passes a web-scale training
pipeline runs between raw ingest and tokenization, plus the data-quality /
skew-diagnosis reports that keep such a pipeline operable.

- Boilerplate line removal (RefinedWeb/CCNet-style): drop text segments
  that recur across many documents (nav bars, cookie banners, license
  headers). Segments shuffle as 8-byte xxhash64 keys (r8, was md5 hex),
  never bodies; the boilerplate set is vocabulary-bounded and joined
  unhinted so AQE broadcasts it only while it fits.
- Bloom-filter decontamination prefilter: the eval set's n-grams are folded
  into a tiny deterministic Bloom bitset that every executor holds; only
  grams passing the bitset are candidates for the (expensive) exact check.
  At 100 TB the bitset replaces a shuffle of the full training gram stream
  with a broadcast + local membership test.
- Count-min sketch heavy hitters: fixed d x w counter grid, mergeable by
  construction (counts are plain sums => map-side partial aggregation),
  estimate = min over d rows. The sketch is O(d*w) however large the input;
  the report joins estimates against exact counts to show the one-sided
  overcount guarantee.
- Data-quality constraint report (Deequ-shape): declarative completeness /
  uniqueness / range / pattern / referential-integrity checks, each a
  single scan-and-aggregate, unioned into one verdict table.
- Shuffle-key skew profiler: per-key frequency of a join/shuffle key with
  share-of-total and ratio-to-mean — the report that decides whether a key
  needs salting (cf. ``join_salted_skew``).

All cross-row float sums follow the scaled-int64 playbook in ``_util``;
hash-derived buckets/positions are md5 hex substrings so Spark and the
DuckDB oracle compute identical values with no integer-conversion
divergence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

# --------------------------------------------------------------------------
# Boilerplate segment removal. The synthetic documents are single-line, so
# "lines" are modeled as aligned 3-token segments; a segment is boilerplate
# when it appears in >= _BOILER_K distinct documents. Real pipelines use the
# same plan with newline-split lines: explode -> count distinct docs per
# segment hash -> broadcast the (small) boilerplate set -> per-doc rebuild.
# --------------------------------------------------------------------------

_SEG = 3
_BOILER_K = 3

_BOILER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk,
         cast(len(string_split(text, ' ')) AS INTEGER) AS n
  FROM documents
),
segs AS (
  SELECT doc_id, lang,
         md5(array_to_string(tk[{_SEG} * i.i + 1 : {_SEG} * i.i + {_SEG}], ' ')) AS h
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, cast(floor((n - 1) / {_SEG}) AS INTEGER))) AS i) i
  WHERE len(tk[{_SEG} * i.i + 1 : {_SEG} * i.i + {_SEG}]) = {_SEG}
),
boiler AS (
  SELECT h FROM segs GROUP BY h HAVING count(DISTINCT doc_id) >= {_BOILER_K}
),
marked AS (
  SELECT s.doc_id, s.lang,
         CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS is_boiler
  FROM segs s LEFT JOIN boiler b ON s.h = b.h
),
per_doc AS (
  SELECT doc_id, max(lang) AS lang,
         count(*) AS n_segs, cast(sum(is_boiler) AS BIGINT) AS n_removed
  FROM marked GROUP BY doc_id
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_segs) AS BIGINT) AS n_segments,
       cast(sum(n_removed) AS BIGINT) AS n_removed,
       cast(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_affected,
       cast(sum((n_segs - n_removed) * {_SEG}) AS BIGINT) AS kept_tokens
FROM per_doc
GROUP BY lang
"""


@register("dedup_boilerplate_lines", oracle=_BOILER_ORACLE, tags=("dedup", "text"))
def dedup_boilerplate_lines(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tk = F.split("text", " ")
    base = d.select("doc_id", "lang", tk.alias("tk"), F.size(tk).alias("n"))
    seg = F.slice("tk", _SEG * F.col("i") + 1, _SEG)
    segs = (
        base.select(
            "doc_id",
            "lang",
            F.explode(
                F.sequence(F.lit(0), F.floor((F.col("n") - 1) / _SEG).cast("int"))
            ).alias("i"),
            "tk",
        )
        .filter(F.size(seg) == _SEG)
        # r8: 8-byte xxhash64 segment key (internal groupBy/join identity)
        .select("doc_id", "lang", F.xxhash64(F.concat_ws(" ", seg)).alias("h"))
    )
    boiler = (
        segs.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BOILER_K)
        .select("h", F.lit(1).alias("is_boiler"))
    )
    # the boilerplate dictionary grows with the corpus — unhinted so AQE
    # broadcasts it only while it actually fits
    marked = segs.join(boiler, "h", "left").select(
        "doc_id", "lang", F.coalesce("is_boiler", F.lit(0)).alias("is_boiler")
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.max("lang").alias("lang"),
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("is_boiler").alias("n_removed"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_segs").alias("n_segments"),
        F.sum("n_removed").alias("n_removed"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_affected"),
        F.sum((F.col("n_segs") - F.col("n_removed")) * _SEG).alias("kept_tokens"),
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination prefilter. Eval 4-grams hash to k=2
# positions in a 16-bit space (4 md5 hex chars); the distinct-position set
# is the Bloom bitset, broadcast to every executor. A train gram "hits"
# when both its positions are set — a superset of the exact matches (the
# one-sided Bloom guarantee, visible here as bloom_hits > exact_hits). The
# report shows both counts per language, i.e. the measured false-positive
# cost of skipping the exact anti-join for non-candidate grams.
# --------------------------------------------------------------------------

_G = 4

_BLOOM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         substr(md5(cast(doc_id AS VARCHAR)), 32, 1) < 'd' AS is_train,
         string_split(text, ' ') AS tk,
         cast(len(string_split(text, ' ')) AS INTEGER) AS n
  FROM documents
),
grams AS (
  SELECT doc_id, lang, is_train,
         array_to_string(tk[i.i : i.i + {_G} - 1], ' ') AS g
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, n - {_G} + 1)) AS i) i
  WHERE n >= {_G}
),
ev AS (SELECT DISTINCT g FROM grams WHERE NOT is_train),
bits AS (
  SELECT DISTINCT p FROM (
    SELECT substr(md5(g || '|0'), 1, 4) AS p FROM ev
    UNION ALL
    SELECT substr(md5(g || '|1'), 1, 4) AS p FROM ev
  ) u
),
tr AS (
  SELECT lang, g,
         substr(md5(g || '|0'), 1, 4) AS p0,
         substr(md5(g || '|1'), 1, 4) AS p1
  FROM grams WHERE is_train
),
hit AS (
  SELECT lang,
         CASE WHEN p0 IN (SELECT p FROM bits)
               AND p1 IN (SELECT p FROM bits) THEN 1 ELSE 0 END AS bloom_hit,
         CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END AS exact_hit
  FROM tr
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_train_grams,
       cast(sum(bloom_hit) AS BIGINT) AS bloom_hits,
       cast(sum(exact_hit) AS BIGINT) AS exact_hits,
       cast(sum(bloom_hit) - sum(exact_hit) AS BIGINT) AS false_positives
FROM hit
GROUP BY lang
"""


@register("text_bloom_decontaminate", oracle=_BLOOM_ORACLE, tags=("text", "dedup"))
def text_bloom_decontaminate(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tk = F.split("text", " ")
    base = d.select(
        "doc_id",
        "lang",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1) < "d").alias(
            "is_train"
        ),
        tk.alias("tk"),
        F.size(tk).alias("n"),
    ).filter(F.col("n") >= _G)
    gram = F.concat_ws(" ", F.slice("tk", F.col("i"), _G))
    grams = base.select(
        "doc_id",
        "lang",
        "is_train",
        F.explode(F.sequence(F.lit(1), F.col("n") - _G + 1)).alias("i"),
        "tk",
    ).select("doc_id", "lang", "is_train", gram.alias("g"))

    ev = grams.filter(~F.col("is_train")).select("g").distinct()
    bits = (
        ev.select(F.substring(F.md5(F.concat(F.col("g"), F.lit("|0"))), 1, 4).alias("p"))
        .union(
            ev.select(F.substring(F.md5(F.concat(F.col("g"), F.lit("|1"))), 1, 4))
        )
        .distinct()
        .agg(F.array_sort(F.collect_set("p")).alias("bits"))
    )
    ev_flag = ev.select("g", F.lit(1).alias("exact_hit"))
    tr = grams.filter("is_train").select(
        "lang",
        "g",
        F.substring(F.md5(F.concat(F.col("g"), F.lit("|0"))), 1, 4).alias("p0"),
        F.substring(F.md5(F.concat(F.col("g"), F.lit("|1"))), 1, 4).alias("p1"),
    )
    hit = (
        tr.crossJoin(F.broadcast(bits))
        .join(F.broadcast(ev_flag), "g", "left")
        .select(
            "lang",
            (
                F.array_contains("bits", F.col("p0"))
                & F.array_contains("bits", F.col("p1"))
            )
            .cast("long")
            .alias("bloom_hit"),
            F.coalesce("exact_hit", F.lit(0)).cast("long").alias("exact_hit"),
        )
    )
    return hit.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_train_grams"),
        F.sum("bloom_hit").alias("bloom_hits"),
        F.sum("exact_hit").alias("exact_hits"),
        (F.sum("bloom_hit") - F.sum("exact_hit")).alias("false_positives"),
    )


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
# Data-quality constraint report (Deequ shape): each declared constraint is
# one scan-and-aggregate; the report is a tiny union. On a cluster each
# branch is an independent Spark job over the (column-pruned) scan — no
# shuffle beyond the final single-row aggregations.
# --------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT * FROM (
  SELECT 'not_null_o_custkey' AS constraint, 'orders' AS tbl,
         cast(count(*) AS BIGINT) AS n_rows,
         cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'unique_o_orderkey', 'orders', cast(count(*) AS BIGINT),
         cast(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'range_l_discount_0_0.1', 'lineitem', cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'pattern_o_orderpriority', 'orders', cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'fk_lineitem_orders', 'lineitem', cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'accepted_l_returnflag', 'lineitem', cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
) checks
"""


@register("dq_constraint_report", oracle=_DQ_ORACLE, tags=("quality", "profile"))
def dq_constraint_report(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def check(name, tbl, df, viol):
        return df.agg(
            F.lit(name).alias("constraint"),
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(viol.cast("long")).alias("n_violations"),
        ).select("constraint", "tbl", "n_rows", "n_violations")

    uniq = o.agg(
        F.lit("unique_o_orderkey").alias("constraint"),
        F.lit("orders").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
    ).select("constraint", "tbl", "n_rows", "n_violations")
    fk = check(
        "fk_lineitem_orders",
        "lineitem",
        li.join(
            o.select(F.col("o_orderkey")),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left",
        ),
        F.col("o_orderkey").isNull(),
    )
    parts = [
        check("not_null_o_custkey", "orders", o, F.col("o_custkey").isNull()),
        uniq,
        check(
            "range_l_discount_0_0.1",
            "lineitem",
            li,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        ),
        check(
            "pattern_o_orderpriority",
            "orders",
            o,
            ~F.col("o_orderpriority").rlike("^[1-5]-"),
        ),
        fk,
        check(
            "accepted_l_returnflag",
            "lineitem",
            li,
            ~F.col("l_returnflag").isin("A", "N", "R"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Shuffle-key skew profiler: the top-10 heaviest l_partkey values with
# share-of-total and ratio-to-mean. This is the report that decides whether
# a downstream join needs salting; the plan is one partial-aggregated
# groupBy plus a TakeOrderedAndProject (never a global sort). The two
# global scalars (total rows, distinct keys) broadcast back onto 10 rows.
# --------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH counts AS (
  SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT cast(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM counts
)
SELECT k, cast(n AS BIGINT) AS n,
       round(n * 100 / cast(total AS DOUBLE), 6) AS share_pct,
       round(n * n_keys / cast(total AS DOUBLE), 6) AS ratio_to_avg
FROM counts, tot
ORDER BY n DESC, k
LIMIT 10
"""


@register("profile_skew_keys", oracle=_SKEW_ORACLE, tags=("profile", "skew"))
def profile_skew_keys(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").cast("long").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n",
            F.round(F.col("n") * 100 / F.col("total").cast("double"), 6).alias(
                "share_pct"
            ),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total").cast("double"), 6
            ).alias("ratio_to_avg"),
        )
        .orderBy(F.desc("n"), "k")
        .limit(10)
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
# Population-stability-index (PSI) drift report: the monitoring query a
# production pipeline runs between a reference window and the current
# window to decide whether a feature's distribution moved. Fixed-width
# buckets over o_totalprice, reference = orders before the split date,
# current = after; PSI contribution per bucket = (p - q) * ln(p / q).
# One scan, one partial-aggregated groupBy, a broadcast of the two total
# counts back onto <= 8 bucket rows. Fixed bucket edges (not quantiles)
# keep the report mergeable across days and engines.
# --------------------------------------------------------------------------

_PSI_SPLIT = "1998-05-01"
_PSI_WIDTH = 50000
_PSI_CAP = 7

_PSI_ORACLE = f"""
WITH bucketed AS (
  SELECT least(cast(floor(o_totalprice / {_PSI_WIDTH}) AS INTEGER), {_PSI_CAP}) AS bucket,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
counts AS (
  SELECT bucket,
         cast(sum(is_ref) AS BIGINT) AS n_ref,
         cast(sum(1 - is_ref) AS BIGINT) AS n_cur
  FROM bucketed GROUP BY bucket
),
tot AS (
  SELECT cast(sum(n_ref) AS BIGINT) AS t_ref,
         cast(sum(n_cur) AS BIGINT) AS t_cur
  FROM counts
)
SELECT bucket, n_ref, n_cur,
       round(n_ref * 100.0 / t_ref, 6) AS ref_pct,
       round(n_cur * 100.0 / t_cur, 6) AS cur_pct,
       round((n_ref * 1.0 / t_ref - n_cur * 1.0 / t_cur)
             * ln((n_ref * 1.0 / t_ref) / (n_cur * 1.0 / t_cur)), 6)
         AS psi_contrib
FROM counts, tot
WHERE n_ref > 0 AND n_cur > 0
ORDER BY bucket
"""


@register("profile_psi_drift", oracle=_PSI_ORACLE, tags=("profile", "agg"))
def profile_psi_drift(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("int"), F.lit(_PSI_CAP)
    )
    is_ref = (F.col("o_orderdate") < _PSI_SPLIT).cast("long")
    counts = (
        o.select(bucket.alias("bucket"), is_ref.alias("is_ref"))
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.col("n_ref") * 1.0 / F.col("t_ref")
    q = F.col("n_cur") * 1.0 / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round(F.col("n_ref") * 100.0 / F.col("t_ref"), 6).alias("ref_pct"),
            F.round(F.col("n_cur") * 100.0 / F.col("t_cur"), 6).alias("cur_pct"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
        )
        .orderBy("bucket")
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
# Single-pass pipeline metrics via observe(): data-quality counters
# collected as a SIDE EFFECT of a job the pipeline already runs — zero
# extra scans, which at 100 TB is the difference between "monitored" and
# "we skipped the checks to save a pass". The observed aggregates ride the
# same physical plan as the real work (here: writing nothing, just a
# count() action stands in for the sink) and surface through the
# Observation handle after the action completes.
# --------------------------------------------------------------------------

_OBSERVE_ORACLE = """
SELECT cast(count(*) AS BIGINT) AS n_rows,
       cast(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonpositive_price,
       cast(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_priority,
       cast(max(length(o_orderpriority)) AS BIGINT) AS max_priority_len
FROM orders
"""


@register(
    "dq_observe_metrics", oracle=_OBSERVE_ORACLE, tags=("quality", "profile")
)
def dq_observe_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "nonpositive_price"
        ),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias(
            "null_priority"
        ),
        F.max(F.length("o_orderpriority")).cast("long").alias(
            "max_priority_len"
        ),
    )
    observed.count()  # the pipeline's real action; metrics ride along
    row = obs.get
    return spark.createDataFrame(
        [
            (
                row["n_rows"],
                row["nonpositive_price"],
                row["null_priority"],
                row["max_priority_len"],
            )
        ],
        "n_rows bigint, nonpositive_price bigint, null_priority bigint,"
        " max_priority_len bigint",
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
# Benford first-digit profile — the classic data-quality screen for
# "organically grown" numeric columns (prices, populations, file sizes):
# fabricated or truncated data deviates loudly from log10(1 + 1/d). The
# leading digit comes from the STRING form of the exact integer cents
# (double->string formatting differs across engines; int64->string does
# not), the shares are single divisions of exact counts, and the Benford
# expectations are embedded as identical 9-dp literals on both sides — no
# cross-engine log10 in sight. One groupBy on a 9-value key: map-side
# combine makes the shuffle 9 rows regardless of corpus size.
# --------------------------------------------------------------------------

_BENFORD_P = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737, 4: 0.096910013,
    5: 0.079181246, 6: 0.06694679, 7: 0.057991947, 8: 0.051152522,
    9: 0.045757491,
}

# Spark parses bare decimal literals as DECIMAL — the D suffix pins
# DOUBLE so both engines hash the same IEEE value
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
)
_BENFORD_CASE_SPARK = " ".join(
    f"WHEN {d} THEN {p}D" for d, p in _BENFORD_P.items()
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT cast(substr(cast(cast(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM lineitem
  WHERE l_extendedprice > 0
),
counts AS (
  SELECT digit, cast(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT digit, n,
       round(n / cast(t AS DOUBLE), 6) AS share,
       CASE digit {_BENFORD_CASE} END AS benford_expected,
       round(abs(n / cast(t AS DOUBLE) - CASE digit {_BENFORD_CASE} END), 6)
         AS abs_dev
FROM counts, tot
"""


@register(
    "profile_benford_first_digit",
    oracle=_BENFORD_ORACLE,
    tags=("profile", "quality", "agg"),
)
def profile_benford_first_digit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    digit = F.substring(
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        1,
        1,
    ).cast("int")
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("t"))
    expected = F.expr(f"CASE digit {_BENFORD_CASE_SPARK} END")
    share = F.col("n") / F.col("t").cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        expected.alias("benford_expected"),
        F.round(F.abs(share - expected), 6).alias("abs_dev"),
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


# --------------------------------------------------------------------------
# End-to-end corpus pipeline report — the stage-by-stage survivor funnel
# every training-data run is judged by: raw -> quality gate (the
# text_quality_filter rules) -> exact dedup (canonical min-doc_id per
# md5(text)) -> duplicated-span accounting on the survivors (the
# dedup_duplicate_spans islands), reported as one row per stage with doc
# and token counts (stage 3's token count is EFFECTIVE tokens: survivors'
# tokens minus removable duplicated-span tokens). Each stage is the
# composition of operators verified individually elsewhere; this query
# pins the glue — the same filters applied in sequence produce the same
# funnel on both engines. Cost = the sum of its stages: one scan + one
# digest shuffle + one k-gram exchange on the (smaller) survivor set.
# --------------------------------------------------------------------------

_PIPELINE_ORACLE = """
WITH sig AS (
  SELECT doc_id, lang, text,
         cast(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         cast(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_distinct,
         cast(length(text) AS BIGINT) AS n_chars
  FROM documents
),
kept AS (
  SELECT doc_id, lang, text, n_tok FROM sig
  WHERE lang IN ('en', 'es', 'fr')
    AND n_tok BETWEEN 20 AND 1000
    AND 1 - cast(n_distinct AS DOUBLE) / n_tok <= 0.9
    AND cast(n_chars AS DOUBLE) / n_tok BETWEEN 2.0 AND 12.0
),
exact AS (
  SELECT doc_id, lang, text, n_tok FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        AS rn
    FROM kept
  ) WHERE rn = 1
),
grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(tk[(i+1):(i+8)], ' ')) AS key
  FROM (
    SELECT doc_id, string_split(text, ' ') AS tk, n_tok,
           unnest(range(n_tok - 7)) AS i
    FROM exact WHERE n_tok >= 8
  )
),
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
    FROM grams
  ) WHERE rn > 1
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL THEN 0
              WHEN pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
spans AS (
  SELECT doc_id,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island, pos
  FROM isl
),
dup_tok AS (
  SELECT cast(coalesce(sum(p1 - p0 + 8), 0) AS BIGINT) AS removable
  FROM (SELECT doc_id, island, min(pos) AS p0, max(pos) AS p1
        FROM spans GROUP BY doc_id, island)
)
SELECT * FROM (
  SELECT 0 AS stage, 'raw' AS name,
         cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(n_tok) AS BIGINT) AS n_tokens
  FROM sig
  UNION ALL
  SELECT 1, 'quality_gate', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM kept
  UNION ALL
  SELECT 2, 'exact_dedup', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM exact
  UNION ALL
  SELECT 3, 'span_dedup_effective', 
         (SELECT cast(count(*) AS BIGINT) FROM exact),
         (SELECT cast(sum(n_tok) AS BIGINT) FROM exact)
             - (SELECT removable FROM dup_tok)
) t
"""


@register(
    "corpus_pipeline_report", oracle=_PIPELINE_ORACLE, tags=("text", "dedup", "quality")
)
def corpus_pipeline_report(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars"),
    )
    kept = sig.filter(
        F.col("lang").isin("en", "es", "fr")
        & F.col("n_tok").between(20, 1000)
        & (1 - F.col("n_distinct").cast("double") / F.col("n_tok") <= 0.9)
        & (F.col("n_chars").cast("double") / F.col("n_tok")).between(2.0, 12.0)
    ).persist()
    exact = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                # r8: xxhash64 window key — 8 bytes through the exchange
                W.partitionBy(F.xxhash64("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist()
    )
    tk = F.split("text", " ")
    grams = exact.filter(F.col("n_tok") >= 8).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tok") - 8).cast("int")),
                lambda i: F.xxhash64(F.array_join(F.slice(tk, i + 1, 8), " ")),
            )
        ).alias("pos", "key"),
    )
    dup = (
        grams.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("key").orderBy("doc_id", "pos")),
        )
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos")
    )
    w_doc = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.lag("pos").over(w_doc).isNull(), 0).otherwise(
        F.when(F.col("pos") - F.lag("pos").over(w_doc) > 8, 1).otherwise(0)
    )
    spans = (
        dup.withColumn("brk", brk)
        .withColumn(
            "island",
            F.sum("brk").over(w_doc.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("p0"), F.max("pos").alias("p1"))
    )
    removable = spans.agg(
        F.coalesce(F.sum(F.col("p1") - F.col("p0") + 8), F.lit(0))
        .cast("long")
        .alias("removable")
    )

    def stage(df, num, name):
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        ).select(
            F.lit(num).alias("stage"), F.lit(name).alias("name"), "n_docs", "n_tokens"
        )

    s3 = (
        exact.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tok"),
        )
        .crossJoin(F.broadcast(removable))
        .select(
            F.lit(3).alias("stage"),
            F.lit("span_dedup_effective").alias("name"),
            "n_docs",
            (F.col("tok") - F.col("removable")).alias("n_tokens"),
        )
    )
    return (
        stage(sig, 0, "raw")
        .unionByName(stage(kept, 1, "quality_gate"))
        .unionByName(stage(exact, 2, "exact_dedup"))
        .unionByName(s3)
    )


# --------------------------------------------------------------------------
# Full-funnel pipeline report v2 (r13, VERDICT r12 #5): the production
# training-data chain as ONE accounting artifact — langid gate ->
# quality gate -> exact dedup -> near-dup (signature) -> decontamination
# -> re-tokenize -> pack — one row per stage with doc/token counts that
# telescope. Every stage reuses a separately-verified operator's shape:
# the quality rules and exact dedup from corpus_pipeline_report, the
# one-permutation MinHash signature from dedup.py (full-signature
# equality = the high-threshold near-dup rung; band-graph clustering is
# verified separately in dedup_clusters), 8-gram decontamination against
# a held-out eval set (doc_id % 97 == 0, taken from RAW docs — the eval
# set is external to the funnel), the established regex token classes
# (ml_extra.py) for the tokenizer basis change, and contiguous-stream
# packing accounting (blocks = ceil(total/512)).
#
# Stage semantics: stages 0-5 filter docs (both counts non-increasing);
# stage 6 keeps stage-5 docs but re-bases n_tokens to the BPE-ish regex
# count; stage 7 re-bases n_docs to packed 512-token blocks. The
# telescoping invariants are pinned in pytest; the driver hash checks
# every number.
#
# Scale shape: one corpus scan feeds per-doc signals; exact/near dedup
# shuffle 8-16-byte keys; decontamination is one shingle equi-join
# against the (tiny) eval-gram set — each engine uses its own gram hash
# (values never leave the join); everything else is bounded aggs.
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH sig0 AS (
  SELECT doc_id, lang, text,
         cast(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         cast(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_distinct,
         cast(length(text) AS BIGINT) AS n_chars
  FROM documents
),
l1 AS (
  SELECT * FROM sig0 WHERE lang IN ('en', 'es', 'fr', 'de')
),
kept AS (
  SELECT * FROM l1
  WHERE n_tok BETWEEN 20 AND 1000
    AND 1 - cast(n_distinct AS DOUBLE) / n_tok <= 0.9
    AND cast(n_chars AS DOUBLE) / n_tok BETWEEN 2.0 AND 12.0
),
exact AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        AS rn
    FROM kept
  ) t WHERE rn = 1
),
msig AS (
  SELECT doc_id,
         list_min(list_transform(hs, h -> substr(h, 1, 4)))
      || list_min(list_transform(hs, h -> substr(h, 5, 4)))
      || list_min(list_transform(hs, h -> substr(h, 9, 4)))
      || list_min(list_transform(hs, h -> substr(h, 13, 4)))
      || list_min(list_transform(hs, h -> substr(h, 17, 4)))
      || list_min(list_transform(hs, h -> substr(h, 21, 4)))
      || list_min(list_transform(hs, h -> substr(h, 25, 4)))
      || list_min(list_transform(hs, h -> substr(h, 29, 4))) AS msig
  FROM (
    SELECT doc_id, list_transform(
             list_filter(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]),
               s -> s is not null),
             s -> md5(s)) AS hs
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM exact)
  ) h
),
near AS (
  SELECT e.* FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY msig ORDER BY doc_id)
        AS rn
    FROM msig
  ) r JOIN exact e ON e.doc_id = r.doc_id
  WHERE r.rn = 1
),
evalg AS (
  SELECT DISTINCT md5(array_to_string(tk[(i+1):(i+8)], ' ')) AS g
  FROM (
    SELECT string_split(text, ' ') AS tk, n_tok, unnest(range(n_tok - 7)) AS i
    FROM sig0 WHERE doc_id % 97 = 0 AND n_tok >= 8
  ) t
),
dirty AS (
  SELECT DISTINCT doc_id
  FROM (
    SELECT doc_id, md5(array_to_string(tk[(i+1):(i+8)], ' ')) AS g
    FROM (
      SELECT doc_id, string_split(text, ' ') AS tk, n_tok,
             unnest(range(n_tok - 7)) AS i
      FROM near WHERE n_tok >= 8
    ) t0
  ) t JOIN evalg ON evalg.g = t.g
),
clean AS (
  SELECT * FROM near
  WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
),
tok6 AS (
  SELECT doc_id,
         cast(len(regexp_extract_all(text, '[A-Za-z]+'))
              + len(regexp_extract_all(text, '[0-9]+'))
              + len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
              AS BIGINT) AS n_bpe
  FROM clean
),
t6 AS (
  SELECT cast(count(*) AS BIGINT) AS n_docs,
         cast(coalesce(sum(n_bpe), 0) AS BIGINT) AS n_tokens
  FROM tok6
)
SELECT * FROM (
  SELECT 0 AS stage, 'raw' AS name, cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(n_tok) AS BIGINT) AS n_tokens FROM sig0
  UNION ALL
  SELECT 1, 'langid_gate', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM l1
  UNION ALL
  SELECT 2, 'quality_gate', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM kept
  UNION ALL
  SELECT 3, 'exact_dedup', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM exact
  UNION ALL
  SELECT 4, 'neardup_signature', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM near
  UNION ALL
  SELECT 5, 'decontaminated', cast(count(*) AS BIGINT),
         cast(sum(n_tok) AS BIGINT) FROM clean
  UNION ALL
  SELECT 6, 'tokenized', n_docs, n_tokens FROM t6
  UNION ALL
  SELECT 7, 'packed', (n_tokens + 511) // 512, n_tokens FROM t6
) z
"""


@register(
    "corpus_funnel_report",
    oracle=_FUNNEL_ORACLE,
    tags=("text", "dedup", "quality"),
)
def corpus_funnel_report(spark, sf_dir):
    from pyspark.sql import Window as W

    from .dedup import _SHINGLES_SPARK, _sig_spark

    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig0 = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars"),
    )
    l1 = sig0.filter(F.col("lang").isin("en", "es", "fr", "de"))
    kept = l1.filter(
        F.col("n_tok").between(20, 1000)
        & (1 - F.col("n_distinct").cast("double") / F.col("n_tok") <= 0.9)
        & (F.col("n_chars").cast("double") / F.col("n_tok")).between(2.0, 12.0)
    )
    exact = (
        kept.withColumn(
            "rn",
            F.row_number().over(W.partitionBy(F.xxhash64("text")).orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist()
    )
    msig = (
        exact.withColumn("toks", toks)
        .withColumn("shingles", F.expr(_SHINGLES_SPARK))
        .withColumn("hs", F.expr("transform(shingles, s -> md5(s))"))
        .select(
            "doc_id",
            F.concat(*[F.expr(_sig_spark(k)) for k in range(8)]).alias("msig"),
        )
    )
    near = (
        msig.withColumn(
            "rn", F.row_number().over(W.partitionBy("msig").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .join(exact, "doc_id")
        .persist()
    )
    tk = F.split("text", " ")
    gram = lambda df: df.filter(F.col("n_tok") >= 8).select(  # noqa: E731
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tok") - 8).cast("int")),
                lambda i: F.xxhash64(F.array_join(F.slice(tk, i + 1, 8), " ")),
            )
        ).alias("g"),
    )
    evalg = gram(sig0.filter(F.col("doc_id") % 97 == 0)).select("g").distinct()
    dirty = (
        gram(near).join(evalg, "g").select("doc_id").distinct()
    )
    clean = (
        near.filter(F.col("doc_id") % 97 != 0)
        .join(dirty, "doc_id", "left_anti")
        .persist()
    )
    n = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), 0))  # noqa: E731
    tok6 = clean.select(
        "doc_id",
        (n("[A-Za-z]+") + n("[0-9]+") + n("[^A-Za-z0-9 ]"))
        .cast("long")
        .alias("n_bpe"),
    )
    t6 = tok6.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_bpe"), F.lit(0)).cast("long").alias("n_tokens"),
    ).persist()

    def stage(df, num, name):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        ).select(
            F.lit(num).alias("stage"),
            F.lit(name).alias("name"),
            "n_docs",
            "n_tokens",
        )

    s6 = t6.select(
        F.lit(6).alias("stage"), F.lit("tokenized").alias("name"),
        "n_docs", "n_tokens",
    )
    s7 = t6.select(
        F.lit(7).alias("stage"),
        F.lit("packed").alias("name"),
        F.expr("(n_tokens + 511) div 512").alias("n_docs"),
        "n_tokens",
    )
    return (
        stage(sig0, 0, "raw")
        .unionByName(stage(l1, 1, "langid_gate"))
        .unionByName(stage(kept, 2, "quality_gate"))
        .unionByName(stage(exact, 3, "exact_dedup"))
        .unionByName(stage(near, 4, "neardup_signature"))
        .unionByName(stage(clean, 5, "decontaminated"))
        .unionByName(s6)
        .unionByName(s7)
    )
