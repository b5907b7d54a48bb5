"""ML training/eval primitives: histogram split finding, kNN, PR curve.

Three more pieces of the in-warehouse ML surface, all exact-integer so the
DuckDB twin is a bit-identical oracle:

- ``ml_decision_stump``: best single-feature threshold by Gini impurity
  over a bounded histogram — the LightGBM-style formulation where split
  candidates are bin boundaries, not raw values, so the reduce side is
  O(bins), never O(n). Gini comparison is done on an exact integer
  cross-product score (no division until the final quantized report).
- ``ml_knn_classify``: k-nearest-neighbor majority vote where vectors are
  quantized per-component with floor(x*1000) and the dot product is pure
  int64 — the similarity ladder's exact-arithmetic classifier.
- ``ml_pr_curve``: precision/recall along a bounded threshold sweep
  (cumulative TP/FP via broadcast theta self-join over the ≤1000-point
  score space — the same rank trick as ``text_zipf_coverage``; no global
  window).

int64 headroom note: the stump's score numerator is O(n^3) in row count,
so the squared-count products run in decimal(38,0) (exact to ~1e38, i.e.
~4e12 rows) and only the final ppm score — bounded by n*1e6 — returns to
int64. The remainder-scaling keeps every intermediate <= den*1e6.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

# --------------------------------------------------------------------------
# Decision stump: feature = floor(embedding[1] * 1e6) histogrammed into
# 4096-wide bins; label = label % 2. For each boundary b: left = bins <= b.
# Maximize (l0^2 + l1^2) * nR + (r0^2 + r1^2) * nL, the integer-exact
# monotone transform of minimizing weighted Gini impurity.
# --------------------------------------------------------------------------

_BIN = 4096
_OFF = 500000  # shifts the feature into the positive range before binning

_STUMP_ORACLE = f"""
WITH pts AS (
  SELECT (cast(floor(cast(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
          + {_OFF}) // {_BIN} AS b,
         label % 2 AS y
  FROM embeddings
),
hist AS (
  SELECT b, cast(sum(y) AS BIGINT) AS n1,
         cast(count(*) - sum(y) AS BIGINT) AS n0
  FROM pts GROUP BY b
),
tot AS (SELECT sum(n1) AS t1, sum(n0) AS t0 FROM hist),
cum AS (
  SELECT a.b, cast(sum(h.n1) AS BIGINT) AS l1, cast(sum(h.n0) AS BIGINT) AS l0
  FROM hist a JOIN hist h ON h.b <= a.b
  GROUP BY a.b
),
scored AS (
  SELECT c.b, c.l0, c.l1,
         cast(t.t0 - c.l0 AS BIGINT) AS r0, cast(t.t1 - c.l1 AS BIGINT) AS r1,
         ((c.l0 * c.l0 + c.l1 * c.l1) * (t.t0 + t.t1 - c.l0 - c.l1)
          + ((t.t0 - c.l0) * (t.t0 - c.l0) + (t.t1 - c.l1) * (t.t1 - c.l1))
            * (c.l0 + c.l1)) AS num,
         (c.l0 + c.l1) * (t.t0 + t.t1 - c.l0 - c.l1) AS den
  FROM cum c CROSS JOIN tot t
  WHERE (c.l0 + c.l1) > 0 AND (t.t0 + t.t1 - c.l0 - c.l1) > 0
)
SELECT b AS split_bin, l0, l1, r0, r1,
       cast((num // den) * 1000000 + ((num % den) * 1000000) // den AS BIGINT)
         AS score_ppm
FROM scored
ORDER BY (num // den) * 1000000 + ((num % den) * 1000000) // den DESC, b
LIMIT 1
"""


@register("ml_decision_stump", oracle=_STUMP_ORACLE, tags=("ml", "agg"))
def ml_decision_stump(spark, sf_dir):
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    pts = e.select(
        F.expr(
            f"(cast(floor(cast(embedding[0] as double) * 1000000) as bigint)"
            f" + {_OFF}) div {_BIN}"
        ).alias("b"),
        (F.col("label") % 2).cast("long").alias("y"),
    )
    hist = pts.groupBy("b").agg(
        F.sum("y").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n0"),
    )
    tot = hist.groupBy().agg(F.sum("n1").alias("t1"), F.sum("n0").alias("t0"))
    a = hist.select(F.col("b").alias("cb"))
    cum = (
        a.join(F.broadcast(hist), F.col("b") <= F.col("cb"))
        .groupBy("cb")
        .agg(F.sum("n1").alias("l1"), F.sum("n0").alias("l0"))
    )
    dec = "decimal(38,0)"
    l0d, l1d = F.col("l0").cast(dec), F.col("l1").cast(dec)
    r0d, r1d = F.col("r0").cast(dec), F.col("r1").cast(dec)
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("r0", F.col("t0") - F.col("l0"))
        .withColumn("r1", F.col("t1") - F.col("l1"))
        .filter((F.col("l0") + F.col("l1") > 0) & (F.col("r0") + F.col("r1") > 0))
        # num is O(n^3): squared class counts times the opposite side's
        # size. int64 wraps (ANSI: aborts) near 3e6 rows per side, so the
        # products run in decimal(38,0) — exact to ~4e12 rows.
        .withColumn(
            "num",
            (l0d * l0d + l1d * l1d) * (r0d + r1d)
            + (r0d * r0d + r1d * r1d) * (l0d + l1d),
        )
        .withColumn("den", (l0d + l1d) * (r0d + r1d))
        .withColumn(
            # floor(num * 1e6 / den) WITHOUT forming num*1e6 (which would
            # need decimal headroom num already consumes): split into the
            # integer quotient (<= n, back in int64) and the exactly-scaled
            # remainder (< den * 1e6, still inside decimal(38,0)).
            # CAUTION (ADVICE r8): decimal `div` returns LongType and
            # WRAPS SILENTLY on int64 overflow even under ANSI — the
            # quotient bounds (num div den <= n; remainder-quotient
            # < 1e6 * n here) are load-bearing, not backstopped by an
            # ANSI abort. Same caveat applies to every cast(... div ...)
            # ppm idiom in this family (pr_curve, ndcg, zipf, lttb,
            # clustering coefficient).
            "score_ppm",
            F.expr(
                "cast((num div den) * 1000000"
                "     + ((num % den) * 1000000) div den as long)"
            ),
        )
    )
    return (
        scored.orderBy(F.col("score_ppm").desc(), "cb")
        .limit(1)
        .select(
            F.col("cb").alias("split_bin"), "l0", "l1", "r0", "r1", "score_ppm"
        )
    )


# --------------------------------------------------------------------------
# kNN classifier: queries = every 25th vector, corpus = the rest. Vectors
# quantized to int64 per component (floor(x*1000)); similarity = exact
# integer dot product; k=5 neighbors; majority label with (votes desc,
# label asc) tie-break. Scale shape: the query side broadcasts (queries
# are the small side by construction in batch scoring), the corpus never
# shuffles, and top-k is a per-query window, not a global sort.
# --------------------------------------------------------------------------

_KNN_K = 5

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS true_label,
         list_transform(embedding,
           e -> cast(floor(cast(e AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % 25 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, label,
         list_transform(embedding,
           e -> cast(floor(cast(e AS DOUBLE) * 1000) AS BIGINT)) AS cv
  FROM embeddings WHERE vec_id % 25 <> 0
),
dots AS (
  SELECT q.query_id, q.true_label, c.neighbor_id, c.label,
         sum(q.qv[t.i] * c.cv[t.i]) AS dot
  FROM q, c, generate_series(1, 64) t(i)
  GROUP BY q.query_id, q.true_label, c.neighbor_id, c.label
),
topk AS (
  SELECT query_id, true_label, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id) AS rn
  FROM dots
),
votes AS (
  SELECT query_id, true_label, label, cast(count(*) AS BIGINT) AS votes
  FROM topk WHERE rn <= {_KNN_K}
  GROUP BY query_id, true_label, label
)
SELECT query_id, true_label,
       label AS pred_label, votes,
       CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label) AS vr
  FROM votes
) v WHERE vr = 1
"""


@register("ml_knn_classify", oracle=_KNN_ORACLE, tags=("ml", "similarity"))
def ml_knn_classify(spark, sf_dir):
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    quant = F.expr(
        "transform(embedding, e -> cast(floor(cast(e as double) * 1000) as bigint))"
    )
    q = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        quant.alias("qv"),
    )
    c = e.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        quant.alias("cv"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "true_label", "neighbor_id", "label", dot.alias("dot")
    )
    w = W.partitionBy("query_id").orderBy(F.col("dot").desc(), "neighbor_id")
    votes = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .groupBy("query_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    vw = W.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "votes",
            (F.col("label") == F.col("true_label")).cast("int").alias("correct"),
        )
    )


# --------------------------------------------------------------------------
# Precision/recall curve: deterministic pseudo-score in [0, 1000) from a
# Knuth multiplicative hash of event_id; positives = user_id % 3 = 0.
# Cumulative TP/FP per threshold via broadcast theta self-join over the
# bounded score space; reported at every 100th threshold.
# --------------------------------------------------------------------------

_PR_ORACLE = """
WITH scored AS (
  SELECT ((event_id % 1000) * (2654435761 % 1000)) % 1000 AS s,
         CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y
  FROM events
),
hist AS (
  SELECT s, cast(sum(y) AS BIGINT) AS pos,
         cast(count(*) - sum(y) AS BIGINT) AS neg
  FROM scored GROUP BY s
),
tot AS (SELECT sum(pos) AS p FROM hist),
cum AS (
  SELECT a.s, cast(sum(h.pos) AS BIGINT) AS tp, cast(sum(h.neg) AS BIGINT) AS fp
  FROM hist a JOIN hist h ON h.s >= a.s
  GROUP BY a.s
)
SELECT c.s AS threshold, c.tp, c.fp,
       cast((c.tp * 1000000) // (c.tp + c.fp) AS BIGINT) AS precision_ppm,
       cast((c.tp * 1000000) // t.p AS BIGINT) AS recall_ppm
FROM cum c CROSS JOIN tot t
WHERE c.s % 100 = 0
"""


@register("ml_pr_curve", oracle=_PR_ORACLE, tags=("ml", "agg"))
def ml_pr_curve(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        # (a*b) % m computed as ((a%m)*(b%m)) % m: same value, but the
        # product stays ~1e6 where a*b wraps int64 past ~3.5e9 events
        (((F.col("event_id") % 1000) * (2654435761 % 1000)) % 1000).alias("s"),
        (F.col("user_id") % 3 == 0).cast("long").alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    tot = hist.groupBy().agg(F.sum("pos").alias("p"))
    a = hist.select(F.col("s").alias("threshold"))
    cum = (
        a.join(F.broadcast(hist), F.col("s") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.sum("pos").alias("tp"), F.sum("neg").alias("fp"))
    )
    return (
        cum.filter(F.col("threshold") % 100 == 0)
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "tp",
            "fp",
            # tp ~ row count: x1e6 wraps int64 past ~9e12 rows, so the
            # ppm numerator runs in decimal(38,0)
            F.expr(
                "cast((cast(tp as decimal(38,0)) * 1000000) div (tp + fp)"
                "     as long)"
            ).alias("precision_ppm"),
            F.expr(
                "cast((cast(tp as decimal(38,0)) * 1000000) div p as long)"
            ).alias("recall_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Ranking quality: NDCG with an exact-rational LINEAR discount (1/(i+1)
# scaled to ppm) instead of the classic 1/log2(i+1) — same monotone
# position weighting, zero libm, so the eval is bit-identical across
# engines. Ranking = the kNN top-10 by integer dot; relevance = neighbor
# shares the query's label; ideal = all relevant results first, capped by
# how many same-label items the corpus holds.
# --------------------------------------------------------------------------

_NDCG_K = 10

_NDCG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS true_label,
         list_transform(embedding,
           e -> cast(floor(cast(e AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % 25 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, label,
         list_transform(embedding,
           e -> cast(floor(cast(e AS DOUBLE) * 1000) AS BIGINT)) AS cv
  FROM embeddings WHERE vec_id % 25 <> 0
),
dots AS (
  SELECT q.query_id, q.true_label, c.neighbor_id, c.label,
         sum(q.qv[t.i] * c.cv[t.i]) AS dot
  FROM q, c, generate_series(1, 64) t(i)
  GROUP BY q.query_id, q.true_label, c.neighbor_id, c.label
),
topk AS (
  SELECT query_id, true_label, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id) AS rn
  FROM dots
),
ldcg AS (
  SELECT query_id, true_label,
         cast(sum(CASE WHEN label = true_label
                       THEN 1000000 // (rn + 1) ELSE 0 END) AS BIGINT) AS ldcg
  FROM topk WHERE rn <= {_NDCG_K}
  GROUP BY query_id, true_label
),
avail AS (
  SELECT q.query_id, cast(count(*) AS BIGINT) AS n_rel
  FROM q JOIN c ON c.label = q.true_label
  GROUP BY q.query_id
),
ideal AS (
  SELECT a.query_id,
         cast(sum(1000000 // (t.i + 1)) AS BIGINT) AS ildcg
  FROM avail a, generate_series(1, {_NDCG_K}) t(i)
  WHERE t.i <= least(a.n_rel, {_NDCG_K})
  GROUP BY a.query_id
)
SELECT l.query_id, l.ldcg, i.ildcg,
       cast((l.ldcg * 1000000) // i.ildcg AS BIGINT) AS ndcg_ppm
FROM ldcg l JOIN ideal i ON i.query_id = l.query_id
"""


@register("ml_ndcg_linear", oracle=_NDCG_ORACLE, tags=("ml", "similarity"))
def ml_ndcg_linear(spark, sf_dir):
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    quant = F.expr(
        "transform(embedding, e -> cast(floor(cast(e as double) * 1000) as bigint))"
    )
    q = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        quant.alias("qv"),
    )
    c = e.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        quant.alias("cv"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "true_label", "neighbor_id", "label", dot.alias("dot")
    )
    w = W.partitionBy("query_id").orderBy(F.col("dot").desc(), "neighbor_id")
    ldcg = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _NDCG_K)
        .groupBy("query_id", "true_label")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("true_label"),
                    F.expr("1000000 div (rn + 1)"),
                ).otherwise(F.lit(0))
            ).alias("ldcg")
        )
    )
    avail = (
        q.join(
            F.broadcast(c.select("label")),
            q["true_label"] == F.col("label"),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    ideal = (
        avail.select(
            "query_id",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(_NDCG_K)))
            ).alias("i"),
        )
        .groupBy("query_id")
        .agg(F.sum(F.expr("1000000 div (i + 1)")).alias("ildcg"))
    )
    return (
        ldcg.join(ideal, "query_id")
        .select(
            "query_id",
            "ldcg",
            "ildcg",
            F.expr("(ldcg * 1000000) div ildcg").alias("ndcg_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Two-round gradient boosting (r12) — the GBT training loop the single
# stump above is one iteration of: round 1 fits a variance-reduction
# stump on the target (price cents vs quantity), round 2 fits a second
# stump on the RESIDUALS against a different feature (discount pct) —
# exactly how LightGBM/XGBoost descend, one histogram stump per round on
# the gradient of the loss so far.
#
# Exact-integer discipline (the stump's playbook): maximizing variance
# reduction == maximizing S_L^2/n_L + S_R^2/n_R; comparisons rank on the
# exact floored quotient num // den with num = S_L^2 * n_R + S_R^2 * n_L
# (DECIMAL(38,0) on the Spark side, HUGEINT in the oracle — both floor
# for these non-negative operands; the quotient is ~1e17 cents^2, so the
# integer part alone separates thresholds); the reported gain is the
# floored quotient MINUS the unsplit node's floored S^2/n (the variance
# reduction — int64-safe at any scale), ties by threshold.
# Leaf predictions are truncated-division cents (Spark `div` truncates
# toward zero; the oracle mirrors that truncation on negative round-2
# residual sums via the CASE abs-trick below — do NOT "fix" it to a
# plain floor), so
# round-2 residuals are exact int64 and the whole two-round report is
# bit-identical across engines. Shape at scale: each round is ONE
# partial-aggregated histogram (<= 50 rows) + a bounded theta join —
# rows never shuffle, the loop moves O(bins) numbers per round.
# --------------------------------------------------------------------------


def _gbt_round_sql(pts: str, feat: str, target: str, rnd: int) -> str:
    """One stump round over `pts(f, v)`: argmax variance-reduction split."""
    return f"""
  SELECT cast({rnd} AS INTEGER) AS round, '{feat}' AS feature,
         b AS threshold, nl AS n_left, nr AS n_right,
         sl AS sum_left, sr AS sum_right,
         -- TRUNCATED division (matches Spark `div`): DuckDB // floors,
         -- which differs on the negative residual sums of round 2
         cast(CASE WHEN sl < 0 THEN -((-sl) // nl) ELSE sl // nl END
              AS BIGINT) AS pred_left,
         cast(CASE WHEN sr < 0 THEN -((-sr) // nr) ELSE sr // nr END
              AS BIGINT) AS pred_right,
         -- variance REDUCTION vs the unsplit node (both terms floored
         -- on non-negative operands): fits int64 at any derivation scale,
         -- unlike the raw quotient which nears 2^63 already at sf0.01
         cast(num // den
              - (cast(sl + sr AS HUGEINT) * (sl + sr)) // (nl + nr)
              AS BIGINT) AS gain_red
  FROM (
    SELECT b, nl, nr, sl, sr,
           (cast(sl AS HUGEINT) * sl * nr
            + cast(sr AS HUGEINT) * sr * nl) AS num,
           cast(nl AS HUGEINT) * nr AS den
    FROM (
      SELECT c.b,
             c.ln AS nl, t.n - c.ln AS nr,
             c.ls AS sl, t.s - c.ls AS sr
      FROM (
        SELECT a.f AS b, cast(sum(h.n) AS BIGINT) AS ln,
               cast(sum(h.s) AS BIGINT) AS ls
        FROM (SELECT f, cast(count(*) AS BIGINT) AS n,
                     cast(sum(v) AS BIGINT) AS s FROM {pts} GROUP BY f) a
        JOIN (SELECT f, cast(count(*) AS BIGINT) AS n,
                     cast(sum(v) AS BIGINT) AS s FROM {pts} GROUP BY f) h
          ON h.f <= a.f
        GROUP BY a.f
      ) c
      CROSS JOIN (SELECT cast(count(*) AS BIGINT) AS n,
                         cast(sum(v) AS BIGINT) AS s FROM {pts}) t
      WHERE c.ln < t.n
    ) sp
  ) sc
  ORDER BY gain_red DESC, threshold
  LIMIT 1
"""


_GBT_ORACLE = f"""
WITH pts1 AS (
  SELECT cast(round(l_quantity) AS BIGINT) AS f,
         cast(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
r1 AS ({_gbt_round_sql("pts1", "quantity", "v", 1)}),
pts2 AS (
  SELECT cast(round(l_discount * 100) AS BIGINT) AS f,
         cast(round(l_extendedprice * 100) AS BIGINT)
           - (CASE WHEN cast(round(l_quantity) AS BIGINT) <= r1.threshold
                   THEN r1.pred_left ELSE r1.pred_right END) AS v
  FROM lineitem CROSS JOIN r1
),
r2 AS ({_gbt_round_sql("pts2", "discount_pct", "v", 2)})
SELECT * FROM r1 UNION ALL SELECT * FROM r2
"""


def _gbt_round_df(pts, feat: str, rnd: int):
    """Spark twin of ``_gbt_round_sql``: pts has columns (f, v)."""
    hist = pts.groupBy("f").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("long").alias("tn"),
        F.sum("v").cast("long").alias("ts"),
    )
    a = hist.select(F.col("f").alias("b"))
    cum = (
        a.join(F.broadcast(hist), hist.f <= a.b)
        .groupBy("b")
        .agg(F.sum("n").cast("long").alias("nl"), F.sum("s").cast("long").alias("sl"))
    )
    sp = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("tn"))
        .select(
            "b",
            "nl",
            (F.col("tn") - F.col("nl")).alias("nr"),
            "sl",
            (F.col("ts") - F.col("sl")).alias("sr"),
        )
    )
    sc = sp.select(
        "b",
        "nl",
        "nr",
        "sl",
        "sr",
        F.expr(
            "cast(sl as decimal(38,0)) * sl * nr"
            " + cast(sr as decimal(38,0)) * sr * nl"
        ).alias("num"),
        F.expr("cast(nl as decimal(38,0)) * nr").alias("den"),
    )
    return (
        sc.select(
            F.lit(rnd).cast("int").alias("round"),
            F.lit(feat).alias("feature"),
            F.col("b").alias("threshold"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.col("sl").alias("sum_left"),
            F.col("sr").alias("sum_right"),
            F.expr("sl div nl").cast("long").alias("pred_left"),
            F.expr("sr div nr").cast("long").alias("pred_right"),
            F.expr(
                "cast(num div den - (cast(sl + sr as decimal(38,0))"
                " * (sl + sr)) div (nl + nr) as bigint)"
            ).alias("gain_red"),
        )
        .orderBy(F.desc("gain_red"), "threshold")
        .limit(1)
    )


@register("ml_gbt_two_rounds", oracle=_GBT_ORACLE, tags=("ml", "agg"))
def ml_gbt_two_rounds(spark, sf_dir):
    li = spread(table(spark, sf_dir, "lineitem"), "l_orderkey")
    pts1 = li.select(
        F.round("l_quantity").cast("long").alias("f"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    r1 = _gbt_round_df(pts1, "quantity", 1)
    pts2 = (
        li.crossJoin(F.broadcast(r1.select("threshold", "pred_left", "pred_right")))
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("f"),
            (
                F.round(F.col("l_extendedprice") * 100).cast("long")
                - F.when(
                    F.round("l_quantity").cast("long") <= F.col("threshold"),
                    F.col("pred_left"),
                ).otherwise(F.col("pred_right"))
            ).alias("v"),
        )
    )
    r2 = _gbt_round_df(pts2, "discount_pct", 2)
    return r1.unionByName(r2)


# --------------------------------------------------------------------------
# k-center greedy seeding (r12) — Gonzalez's farthest-first traversal,
# the 2-approximation for the k-center objective and the deterministic
# stand-in for k-means++ seeding (and the standard coreset picker for
# embedding-space data selection). Four unrolled rounds: start from the
# smallest-md5 vector (the sampled-quantizer convention), then repeatedly
# take the point FARTHEST from the chosen set; finish with the coverage
# radius (the k-center objective value) and its witness point.
#
# Exactness: squared distances quantize each of the 64 per-dimension
# terms to nano-units BEFORE the sum (the feature_eval.py house rule), so
# every argmax compares identical int64s; ties break on vec_id. Scale
# shape: each round is corpus x ONE broadcast row -> max_by; the final
# plan is a single corpus scan with four broadcast joins — rows never
# shuffle, the loop moves one vector per round.
# --------------------------------------------------------------------------

_KC_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " cast(round((cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double)) * 1000000000) as bigint)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)

_KC_D2_SQL = (
    "list_sum(list_transform(range(1, 65), i ->"
    " cast(round((cast({a}[i] AS DOUBLE) - cast({b}[i] AS DOUBLE))"
    " * (cast({a}[i] AS DOUBLE) - cast({b}[i] AS DOUBLE))"
    " * 1000000000) AS BIGINT)))"
)


def _kc_oracle() -> str:
    d = lambda a, b: _KC_D2_SQL.format(a=a, b=b)  # noqa: E731
    return f"""
WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
c1 AS (
  SELECT vec_id, e FROM v
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT 1
),
s1 AS (
  SELECT v.vec_id, v.e, {d("v.e", "c1.e")} AS dmin FROM v CROSS JOIN c1
),
c2 AS (SELECT vec_id, e, dmin FROM s1 ORDER BY dmin DESC, vec_id LIMIT 1),
s2 AS (
  SELECT s1.vec_id, s1.e, least(s1.dmin, {d("s1.e", "c2.e")}) AS dmin
  FROM s1 CROSS JOIN c2
),
c3 AS (SELECT vec_id, e, dmin FROM s2 ORDER BY dmin DESC, vec_id LIMIT 1),
s3 AS (
  SELECT s2.vec_id, s2.e, least(s2.dmin, {d("s2.e", "c3.e")}) AS dmin
  FROM s2 CROSS JOIN c3
),
c4 AS (SELECT vec_id, e, dmin FROM s3 ORDER BY dmin DESC, vec_id LIMIT 1),
s4 AS (
  SELECT s3.vec_id, least(s3.dmin, {d("s3.e", "c4.e")}) AS dmin
  FROM s3 CROSS JOIN c4
),
rad AS (SELECT vec_id, dmin FROM s4 ORDER BY dmin DESC, vec_id LIMIT 1)
SELECT cast(1 AS INTEGER) AS step, vec_id, cast(0 AS BIGINT) AS d2_nano
FROM c1
UNION ALL SELECT 2, vec_id, cast(dmin AS BIGINT) FROM c2
UNION ALL SELECT 3, vec_id, cast(dmin AS BIGINT) FROM c3
UNION ALL SELECT 4, vec_id, cast(dmin AS BIGINT) FROM c4
UNION ALL SELECT 5, vec_id, cast(dmin AS BIGINT) FROM rad
"""


@register(
    "ml_kcenter_greedy_seed",
    oracle=_kc_oracle(),
    tags=("ml", "similarity"),
)
def ml_kcenter_greedy_seed(spark, sf_dir):
    from ._util import spread

    v = spread(
        table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").alias("e")
        ),
        "vec_id",
    )
    c1 = (
        v.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    d2 = F.expr(_KC_D2.format(a="e", b="ce"))
    cur = v.crossJoin(F.broadcast(c1)).select(
        "vec_id", "e", d2.alias("dmin")
    )
    steps = [
        c1.select(
            F.lit(1).cast("int").alias("step"),
            F.col("cid").alias("vec_id"),
            F.lit(0).cast("long").alias("d2_nano"),
        )
    ]
    for step in (2, 3, 4):
        ck = (
            cur.orderBy(F.desc("dmin"), "vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("e").alias("ce"),
                F.col("dmin").alias("cd"),
            )
        )
        steps.append(
            ck.select(
                F.lit(step).cast("int").alias("step"),
                F.col("cid").alias("vec_id"),
                F.col("cd").alias("d2_nano"),
            )
        )
        cur = cur.crossJoin(F.broadcast(ck.drop("cd"))).select(
            "vec_id", "e", F.least("dmin", d2).alias("dmin")
        )
    rad = (
        cur.orderBy(F.desc("dmin"), "vec_id")
        .limit(1)
        .select(
            F.lit(5).cast("int").alias("step"),
            "vec_id",
            F.col("dmin").alias("d2_nano"),
        )
    )
    out = steps[0]
    for s_ in steps[1:] + [rad]:
        out = out.unionByName(s_)
    return out
