"""Data-quality profiling: functional-dependency discovery, value-pattern
(mask) profiling.

Profiler features in the Deequ / Great Expectations / ydata family, both
pure JVM-side aggregation:

- ``profile_fd_violations``: does column A determine column B? For each
  candidate pair, count LHS values, LHS values with more than one distinct
  RHS (violations), and the widest RHS fan-out. The discovery shape is one
  two-level aggregate per pair — at scale this is the map-side-combinable
  form, never a distinct over the raw pair stream.
- ``profile_value_patterns``: format inference by masking characters into
  classes (digit→9, lower→a, upper→A), reporting the top-5 masks per
  column with counts — how a profiler detects mixed formats in a column
  (phone numbers, ids, JSON blobs) without enumerating values.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_FD_ORACLE = """
WITH fd1 AS (
  SELECT 'documents.source->lang' AS fd,
         cast(count(*) AS BIGINT) AS n_lhs,
         cast(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         cast(max(nd) AS BIGINT) AS max_rhs
  FROM (SELECT source, count(DISTINCT lang) AS nd
        FROM documents GROUP BY source) t
),
fd2 AS (
  SELECT 'documents.lang->source',
         cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         cast(max(nd) AS BIGINT)
  FROM (SELECT lang, count(DISTINCT source) AS nd
        FROM documents GROUP BY lang) t
),
fd3 AS (
  SELECT 'events.user_bucket->event_type',
         cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         cast(max(nd) AS BIGINT)
  FROM (SELECT user_id % 100 AS ub, count(DISTINCT event_type) AS nd
        FROM events GROUP BY ub) t
),
fd4 AS (
  SELECT 'nation.n_nationkey->n_regionkey',
         cast(count(*) AS BIGINT),
         cast(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
         cast(max(nd) AS BIGINT)
  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
        FROM nation GROUP BY n_nationkey) t
)
SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
"""


@register("profile_fd_violations", oracle=_FD_ORACLE, tags=("agg",))
def profile_fd_violations(spark, sf_dir):
    def fd(df, name, lhs, rhs):
        per_lhs = df.groupBy(lhs.alias("lhs")).agg(
            F.countDistinct(rhs).alias("nd")
        )
        return per_lhs.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_violating"),
            F.max("nd").alias("max_rhs"),
        )

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "events")
    n = table(spark, sf_dir, "nation")
    parts = [
        fd(d, "documents.source->lang", F.col("source"), F.col("lang")),
        fd(d, "documents.lang->source", F.col("lang"), F.col("source")),
        fd(
            e,
            "events.user_bucket->event_type",
            F.col("user_id") % 100,
            F.col("event_type"),
        ),
        fd(
            n,
            "nation.n_nationkey->n_regionkey",
            F.col("n_nationkey"),
            F.col("n_regionkey"),
        ),
    ]
    return reduce(lambda x, y: x.unionAll(y), parts)


_MASK_SQL = (
    "regexp_replace(regexp_replace(regexp_replace({col}, '[0-9]', '9', 'g'),"
    " '[a-z]', 'a', 'g'), '[A-Z]', 'A', 'g')"
)

_PATTERN_ORACLE = f"""
WITH masks AS (
  SELECT 'customer.c_name' AS col, {_MASK_SQL.format(col="c_name")} AS mask
  FROM customer
  UNION ALL
  SELECT 'part.p_brand', {_MASK_SQL.format(col="p_brand")} FROM part
  UNION ALL
  SELECT 'events.props', {_MASK_SQL.format(col="props")} FROM events
),
counted AS (
  SELECT col, mask, cast(count(*) AS BIGINT) AS cnt FROM masks GROUP BY col, mask
)
SELECT col, mask, cnt FROM (
  SELECT *, row_number() OVER (PARTITION BY col ORDER BY cnt DESC, mask) AS rn
  FROM counted
) t WHERE rn <= 5
"""


def _mask(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, "[0-9]", "9"), "[a-z]", "a"),
        "[A-Z]",
        "A",
    )


@register("profile_value_patterns", oracle=_PATTERN_ORACLE, tags=("agg",))
def profile_value_patterns(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part")
    e = table(spark, sf_dir, "events")
    masks = (
        c.select(F.lit("customer.c_name").alias("col"), _mask(F.col("c_name")).alias("mask"))
        .unionAll(
            p.select(F.lit("part.p_brand"), _mask(F.col("p_brand")))
        )
        .unionAll(e.select(F.lit("events.props"), _mask(F.col("props"))))
    )
    counted = masks.groupBy("col", "mask").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("col").orderBy(F.col("cnt").desc(), "mask")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("col", "mask", "cnt")
    )


# --------------------------------------------------------------------------
# k-anonymity audit (r12) — the data-governance gate a training pipeline
# runs before releasing or joining user-adjacent tables: every
# quasi-identifier combination (here nation x market segment) must cover
# at least K individuals, else the rows are re-identifiable. Per group:
# size, risk flag, and the size of the one-level generalization
# (suppressing the nation, falling back to segment-only) that would
# absorb a risky group — the standard remediation ladder. Shape at 100 TB:
# one two-level partial aggregation (group sizes, then segment rollup
# broadcast back); no row-level data leaves the executors.
# --------------------------------------------------------------------------

_KANON_K = 10

_KANON_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         cast(count(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
s AS (
  SELECT mktsegment, cast(sum(n) AS BIGINT) AS gen_n FROM g GROUP BY mktsegment
)
SELECT g.nationkey, g.mktsegment, g.n,
       cast(CASE WHEN g.n < {_KANON_K} THEN 1 ELSE 0 END AS INTEGER)
         AS risky,
       s.gen_n
FROM g JOIN s ON s.mktsegment = g.mktsegment
"""


@register("dq_k_anonymity", oracle=_KANON_ORACLE, tags=("agg",))
def dq_k_anonymity(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    g = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = g.groupBy("mktsegment").agg(F.sum("n").cast("long").alias("gen_n"))
    return g.join(F.broadcast(s), "mktsegment").select(
        "nationkey",
        "mktsegment",
        "n",
        (F.col("n") < _KANON_K).cast("int").alias("risky"),
        "gen_n",
    )


# --------------------------------------------------------------------------
# Referential-integrity audit (r13): the Deequ `isContainedIn`/foreign-key
# check over the star schema's five FK edges. Per edge, the child side is
# FIRST reduced to its distinct-key table with occurrence counts (one
# map-side-combinable aggregation — orphan detection never anti-joins the
# raw row stream), then one anti-join each way: child keys without a
# parent (orphans, weighted back to row counts by the carried cnt) and
# parent keys without children (childless — 257 real childless orders in
# the fixture, the non-degenerate case). Parent key columns are unique by
# construction, so the parent side joins as-is; AQE broadcasts the small
# parents (nation) and hash-joins the big ones.
# --------------------------------------------------------------------------

_RI_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
)


def _ri_oracle() -> str:
    parts = []
    for fk, child, ckey, parent, pkey in _RI_EDGES:
        parts.append(f"""
SELECT '{fk}' AS fk,
       (SELECT cast(count(*) AS BIGINT) FROM {child}) AS child_rows,
       (SELECT cast(count(DISTINCT {ckey}) AS BIGINT) FROM {child})
         AS child_keys,
       (SELECT cast(count(*) AS BIGINT) FROM {child} WHERE {ckey} IS NULL)
         AS null_keys,
       (SELECT cast(coalesce(sum(cnt), 0) AS BIGINT) FROM
         (SELECT {ckey} AS k, count(*) AS cnt FROM {child}
          WHERE {ckey} IS NOT NULL GROUP BY {ckey}) ck
         WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = ck.k))
         AS orphan_rows,
       (SELECT cast(count(*) AS BIGINT) FROM
         (SELECT DISTINCT {ckey} AS k FROM {child}
          WHERE {ckey} IS NOT NULL) ck
         WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = ck.k))
         AS orphan_keys,
       (SELECT cast(count(*) AS BIGINT) FROM {parent} p
         WHERE NOT EXISTS (SELECT 1 FROM {child} c
                           WHERE c.{ckey} = p.{pkey}))
         AS childless_parents""")
    return "\nUNION ALL\n".join(parts)


def _ri_edge_report(spark, sf_dir, edge):
    """One FK edge's report row: distinct-key reduction, then the two
    key-table anti-joins (orphans weighted back by carried counts)."""
    fk, child, ckey, parent, pkey = edge
    c = table(spark, sf_dir, child).select(F.col(ckey).alias("k"))
    p = table(spark, sf_dir, parent).select(F.col(pkey).alias("k"))
    ck = c.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = ck.agg(
        F.sum("cnt").cast("long").alias("child_rows"),
        F.count(F.when(F.col("k").isNotNull(), 1)).cast("long").alias(
            "child_keys"
        ),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("null_keys"),
    )
    orphans = (
        ck.filter(F.col("k").isNotNull())
        .join(p, "k", "left_anti")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
            .cast("long")
            .alias("orphan_rows"),
            F.count(F.lit(1)).cast("long").alias("orphan_keys"),
        )
    )
    childless = (
        p.join(ck.filter(F.col("k").isNotNull()), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("childless_parents"))
    )
    return (
        tot.crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(childless))
        .select(
            F.lit(fk).alias("fk"),
            "child_rows",
            "child_keys",
            "null_keys",
            "orphan_rows",
            "orphan_keys",
            "childless_parents",
        )
    )


@register("dq_referential_integrity", oracle=_ri_oracle(), tags=("quality", "agg"))
def dq_referential_integrity(spark, sf_dir):
    """FK audit over the schema's five edges: orphan child keys/rows,
    null keys, childless parents — one distinct-key reduction plus two
    key-table anti-joins per edge."""
    outs = [_ri_edge_report(spark, sf_dir, e) for e in _RI_EDGES]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --------------------------------------------------------------------------
# l-diversity audit (r13): k-anonymity's necessary complement (Machanavajjhala
# et al. 2007) — a group can be large (k-safe) yet still leak if everyone in
# it shares the SENSITIVE value. Same quasi-identifier groups as
# dq_k_anonymity (nation x market segment); sensitive attribute = the
# account-balance sign/band (negative / low / high), a 3-value proxy for
# the reference's financial-standing column. Per group: distinct sensitive
# values l, entropy of the sensitive distribution in micro-nats (the
# entropy-l-diversity variant, integer-exact via per-value quantized
# -p*ln(p) terms), and the diversity flag l >= L. Shape: one two-level
# partial aggregation ((qid, sensitive) counts -> qid rollup), everything
# after is group-table-sized.
# --------------------------------------------------------------------------

_LDIV_L = 2

_LDIV_ORACLE = f"""
WITH s AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS sens,
         cast(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
),
tot AS (
  SELECT nationkey, mktsegment, cast(sum(n) AS BIGINT) AS nt
  FROM s GROUP BY nationkey, mktsegment
),
terms AS (
  SELECT s.nationkey, s.mktsegment, s.n,
         cast(round(-(cast(s.n AS DOUBLE) / cast(t.nt AS DOUBLE))
                    * ln(cast(s.n AS DOUBLE) / cast(t.nt AS DOUBLE))
                    * 1000000) AS BIGINT) AS e6
  FROM s JOIN tot t
    ON t.nationkey = s.nationkey AND t.mktsegment = s.mktsegment
),
g AS (
  SELECT nationkey, mktsegment,
         cast(sum(n) AS BIGINT) AS n_rows,
         cast(count(*) AS BIGINT) AS l_distinct,
         cast(sum(e6) AS BIGINT) AS entropy_micro
  FROM terms GROUP BY nationkey, mktsegment
)
SELECT nationkey, mktsegment, n_rows, l_distinct, entropy_micro,
       cast(CASE WHEN l_distinct >= {_LDIV_L} THEN 1 ELSE 0 END AS INTEGER)
         AS diverse
FROM g
"""


@register("dq_l_diversity", oracle=_LDIV_ORACLE, tags=("quality", "agg"))
def dq_l_diversity(spark, sf_dir):
    """Distinct-l and entropy-l diversity of the sensitive balance band
    per quasi-identifier group, with the l >= 2 flag."""
    c = table(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    s = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        sens.alias("sens"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = s.groupBy("nationkey", "mktsegment").agg(
        F.sum("n").cast("long").alias("nt")
    )
    # per-(group, sensitive) -p*ln(p) term quantized BEFORE the group sum
    # (the chi2 lsum playbook - no float-sum order dependence)
    p = F.col("n").cast("double") / F.col("nt").cast("double")
    terms = s.join(F.broadcast(tot), ["nationkey", "mktsegment"]).select(
        "nationkey",
        "mktsegment",
        "n",
        F.round(-p * F.log(p) * 1_000_000).cast("long").alias("e6"),
    )
    g = terms.groupBy("nationkey", "mktsegment").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.sum("e6").cast("long").alias("entropy_micro"),
    )
    return g.select(
        "nationkey",
        "mktsegment",
        "n_rows",
        "l_distinct",
        "entropy_micro",
        (F.col("l_distinct") >= _LDIV_L).cast("int").alias("diverse"),
    )
