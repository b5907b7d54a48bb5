"""Feature/score evaluation (r10): mutual information and lift/gains.

The two tables every model-training pipeline prints before a fit:

- ``ml_mutual_info_rank``: MI(feature; label) in nats for the first 4
  embedding dimensions, each discretized into 4 fixed bins. One narrow
  posexplode (4 rows per vector — bounded fanout), one groupBy to the
  (feature, bin, label) contingency cells, then marginals via windows
  PARTITIONED by the cell keys (cell cardinality <= 4·4·#labels, so the
  window inputs are aggregate-sized). Cross-row MI terms are quantized to
  int64 nano-nats BEFORE summation (the ml_extra.py IRLS convention), so
  the cross-engine sum is exact integers; residual risk is a libm-vs-JVM
  1-ulp ln() landing exactly on a .5 nano-nat boundary — negligible and
  documented (cf. ml_extra.py:580).

- ``ml_lift_gains_deciles``: the decile lift/gains table for a scored
  population — rank by score, cut into 10 equal-count buckets, report
  per-decile and cumulative positive rates against the base rate. The
  global rank is the scale hazard, so it uses the two-pass
  range-partition row_number (``_util.two_pass_global_window``) — never a
  partitionless window; the cumulative-over-deciles step runs on the
  10-row aggregate via a bounded JVM sequence+explode (the
  cdc_time_travel idiom), not a nested-loop theta join. The "model" is a
  fixed linear scorer over 4 embedding dims — deterministic per row in
  both engines (fixed left-assoc double expression), which is exactly
  what a real scored table looks like by the time it reaches this query.

Reference parity: engine additions (SURVEY.md §2B ML-eval row); the
reference has no analysis layer.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread, two_pass_global_window

_N_FEATS = 4

_MI_ORACLE = f"""
WITH x AS (
  SELECT label, r.i AS pos, cast(embedding[r.i + 1] AS DOUBLE) AS xv
  FROM embeddings, range({_N_FEATS}) r(i)
), binned AS (
  SELECT pos, label,
         CASE WHEN xv < -0.1 THEN 0
              WHEN xv < 0.0 THEN 1
              WHEN xv < 0.1 THEN 2
              ELSE 3 END AS bin
  FROM x
), j AS (
  SELECT pos, bin, label, cast(count(*) AS BIGINT) AS njoint
  FROM binned GROUP BY pos, bin, label
), m AS (
  SELECT pos, njoint,
         cast(sum(njoint) OVER (PARTITION BY pos, bin) AS BIGINT) AS nb,
         cast(sum(njoint) OVER (PARTITION BY pos, label) AS BIGINT) AS nl,
         cast(sum(njoint) OVER (PARTITION BY pos) AS BIGINT) AS nn
  FROM j
), t AS (
  SELECT pos,
         cast(round((cast(njoint AS DOUBLE) / cast(nn AS DOUBLE))
                    * ln(cast(njoint AS DOUBLE) * cast(nn AS DOUBLE)
                         / (cast(nb AS DOUBLE) * cast(nl AS DOUBLE)))
                    * 1000000000) AS BIGINT) AS term_e9
  FROM m
)
SELECT pos AS feature_idx,
       cast(count(*) AS BIGINT) AS n_cells,
       round(cast(sum(term_e9) AS DOUBLE) / cast(1000000000 AS DOUBLE), 6)
         AS mi_nats
FROM t GROUP BY pos
"""


@register(
    "ml_mutual_info_rank",
    oracle=_MI_ORACLE,
    tags=("ml", "stats", "embeddings"),
)
def ml_mutual_info_rank(spark, sf_dir):
    emb = spread(
        table(spark, sf_dir, "embeddings").select(
            "label",
            F.expr(
                f"transform(slice(embedding, 1, {_N_FEATS}),"
                " x -> cast(x as double))"
            ).alias("xs"),
        ),
        "label",
    )
    x = emb.select("label", F.posexplode("xs").alias("pos", "xv"))
    binned = x.select(
        "pos",
        "label",
        F.when(F.col("xv") < -0.1, 0)
        .when(F.col("xv") < 0.0, 1)
        .when(F.col("xv") < 0.1, 2)
        .otherwise(3)
        .alias("bin"),
    )
    j = binned.groupBy("pos", "bin", "label").agg(
        F.count(F.lit(1)).cast("long").alias("njoint")
    )
    # marginals over the CELL table (<= 4*4*#labels rows) — aggregate-sized
    # window inputs, all integer sums.
    m = j.select(
        "pos",
        "njoint",
        F.sum("njoint").over(W.partitionBy("pos", "bin")).cast("long").alias("nb"),
        F.sum("njoint").over(W.partitionBy("pos", "label")).cast("long").alias("nl"),
        F.sum("njoint").over(W.partitionBy("pos")).cast("long").alias("nn"),
    )
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    term_e9 = F.round(
        (nd("njoint") / nd("nn"))
        * F.log(nd("njoint") * nd("nn") / (nd("nb") * nd("nl")))
        * 1000000000
    ).cast("long")
    return (
        m.select("pos", term_e9.alias("term_e9"))
        .groupBy(F.col("pos").alias("feature_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.round(
                F.sum("term_e9").cast("double") / F.lit(1000000000).cast("double"),
                6,
            ).alias("mi_nats"),
        )
    )


# Fixed linear scorer over the first 4 dims — left-assoc, identical parse
# in both engines: (((x1 - x2) + 0.5*x3) - 0.25*x4). NB the accessor must
# differ per dialect: DuckDB `arr[k]` is 1-based while Spark SQL `arr[k]`
# is 0-based GetArrayItem — the Spark text uses 1-based element_at.


def _score_sql(elem) -> str:
    x = [f"cast({elem(k)} AS DOUBLE)" for k in (1, 2, 3, 4)]
    return f"{x[0]} - {x[1]} + 0.5 * {x[2]} - 0.25 * {x[3]}"


_SCORE_SQL = _score_sql(lambda k: f"embedding[{k}]")  # DuckDB, 1-based
_SCORE_SPARK = _score_sql(lambda k: f"element_at(embedding, {k})")  # 1-based

_LIFT_ORACLE = f"""
WITH scored AS (
  SELECT vec_id,
         -({_SCORE_SQL}) AS ns,
         CASE WHEN label % 3 = 0 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), ranked AS (
  SELECT pos,
         row_number() OVER (ORDER BY ns, vec_id) AS rn,
         cast(count(*) OVER () AS BIGINT) AS n
  FROM scored
), dec AS (
  SELECT cast((rn - 1) * 10 AS BIGINT) // n + 1 AS decile,
         cast(count(*) AS BIGINT) AS n_rows,
         cast(sum(pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY 1
), cum AS (
  SELECT decile, n_rows, n_pos,
         cast(sum(n_rows) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_rows,
         cast(sum(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_pos
  FROM dec
), tot AS (
  SELECT cast(sum(n_rows) AS BIGINT) AS tot_rows,
         cast(sum(n_pos) AS BIGINT) AS tot_pos
  FROM dec
)
SELECT decile, n_rows, n_pos, cum_rows, cum_pos,
       round(cast(cum_pos AS DOUBLE) / cast(tot.tot_pos AS DOUBLE), 6) AS gain,
       round((cast(cum_pos AS DOUBLE) / cast(cum_rows AS DOUBLE))
             / (cast(tot.tot_pos AS DOUBLE) / cast(tot.tot_rows AS DOUBLE)), 6)
         AS lift
FROM cum, tot
"""


@register(
    "ml_lift_gains_deciles",
    oracle=_LIFT_ORACLE,
    tags=("ml", "eval", "window"),
)
def ml_lift_gains_deciles(spark, sf_dir):
    scored = spread(
        table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.expr(f"-({_SCORE_SPARK})").alias("ns"),
            F.when(F.col("label") % 3 == 0, 1).otherwise(0).alias("pos"),
        ),
        "vec_id",
    )
    ranked = two_pass_global_window(scored, ["ns", "vec_id"], out_col="rn")
    n = ranked.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    dec = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("cast((rn - 1) * 10 as bigint) div n + 1").alias("decile"),
            "pos",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    # cumulative over the 10-row decile table: bounded sequence+explode
    # equi-join (cdc_time_travel idiom) instead of a partitionless window
    # or a nested-loop theta join.
    cum = (
        dec.select(
            "n_rows", "n_pos", F.explode(F.expr("sequence(decile, 10)")).alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.sum("n_rows").cast("long").alias("cum_rows"),
            F.sum("n_pos").cast("long").alias("cum_pos"),
        )
    )
    tot = dec.groupBy().agg(
        F.sum("n_rows").cast("long").alias("tot_rows"),
        F.sum("n_pos").cast("long").alias("tot_pos"),
    )
    return (
        dec.join(F.broadcast(cum), "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_rows",
            "n_pos",
            "cum_rows",
            "cum_pos",
            F.round(
                F.col("cum_pos").cast("double") / F.col("tot_pos").cast("double"), 6
            ).alias("gain"),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("cum_rows").cast("double"))
                / (F.col("tot_pos").cast("double") / F.col("tot_rows").cast("double")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Nearest-centroid (Rocchio) classifier + per-class F1 report (r10): the
# missing eval-family piece between the confusion matrix
# (ml_naive_bayes_confusion) and the scalar metrics (AUC/PR/NDCG) — a
# real trained-distributed classifier whose quality report is per-class
# precision/recall/F1.
#
# Train: per-label centroid = per-dimension mean, where the per-dim SUM
# is quantized to int64 micro-units FIRST (the house rule: no
# engine-ordered double sums), so the centroid is count-exact. Both
# engines compute it from the same position-exploded (label, pos, x)
# relation. Predict: d² to each of the |labels| broadcast centroids, with
# each per-dimension term quantized to nano-units before the 64-term sum
# (again: exact int64, order-free), argmin with label-ascending ties.
# Report: confusion counts -> per-class TP/FP/FN -> precision/recall/F1
# with nullif guards (an empty predicted class yields NULL precision,
# never a /0 error — the VWAP lesson).
#
# Scale shape: explode is a bounded 64x fanout (column count, not rows);
# the centroid table is |labels| x 64 rows, broadcast; one groupBy per
# phase. At 100 TB this is the shape you actually run: a linear scan
# against a broadcast model.
# --------------------------------------------------------------------------

_NC_ORACLE = """
WITH x AS (
  SELECT vec_id, label, r.i AS pos,
         cast(embedding[r.i + 1] AS DOUBLE) AS xv
  FROM embeddings, range(64) r(i)
), csum AS (
  SELECT label, pos,
         cast(sum(cast(round(xv * 1000000) AS BIGINT)) AS BIGINT) AS s6,
         cast(count(*) AS BIGINT) AS n
  FROM x GROUP BY label, pos
), cent AS (
  SELECT label AS clabel, pos,
         cast(s6 AS DOUBLE) / cast(n AS DOUBLE) / cast(1000000 AS DOUBLE)
           AS cv
  FROM csum
), d2 AS (
  SELECT x.vec_id, x.label, cent.clabel,
         cast(sum(cast(round((x.xv - cent.cv) * (x.xv - cent.cv)
                             * 1000000000) AS BIGINT)) AS BIGINT) AS d9
  FROM x JOIN cent ON cent.pos = x.pos
  GROUP BY x.vec_id, x.label, cent.clabel
), pred AS (
  SELECT vec_id, label, clabel AS pred FROM (
    SELECT vec_id, label, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY d9, clabel) AS rn
    FROM d2
  ) t WHERE rn = 1
), conf AS (
  SELECT label, pred, cast(count(*) AS BIGINT) AS n FROM pred GROUP BY label, pred
), classes AS (
  SELECT label AS c FROM conf
  UNION
  SELECT pred FROM conf
), per AS (
  SELECT c,
         cast(coalesce((SELECT sum(n) FROM conf WHERE label = c), 0) AS BIGINT)
           AS n_true,
         cast(coalesce((SELECT sum(n) FROM conf
                        WHERE label = c AND pred = c), 0) AS BIGINT) AS tp,
         cast(coalesce((SELECT sum(n) FROM conf
                        WHERE pred = c AND label <> c), 0) AS BIGINT) AS fp,
         cast(coalesce((SELECT sum(n) FROM conf
                        WHERE label = c AND pred <> c), 0) AS BIGINT) AS fn
  FROM classes
)
SELECT c AS label, n_true, tp, fp, fn,
       round(cast(tp AS DOUBLE) / cast(nullif(tp + fp, 0) AS DOUBLE), 6)
         AS precision_,
       round(cast(tp AS DOUBLE) / cast(nullif(tp + fn, 0) AS DOUBLE), 6)
         AS recall_,
       round(cast(2 * tp AS DOUBLE)
             / cast(nullif(2 * tp + fp + fn, 0) AS DOUBLE), 6) AS f1
FROM per
"""


@register(
    "ml_nearest_centroid_f1",
    oracle=_NC_ORACLE,
    tags=("ml", "eval", "embeddings"),
)
def ml_nearest_centroid_f1(spark, sf_dir):
    emb = spread(
        table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
        ),
        "vec_id",
    )
    x = emb.select("vec_id", "label", F.posexplode("e").alias("pos", "xv"))
    csum = x.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("xv") * 1000000).cast("long")).cast("long").alias("s6"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cent = csum.select(
        F.col("label").alias("clabel"),
        "pos",
        (
            F.col("s6").cast("double")
            / F.col("n").cast("double")
            / F.lit(1000000).cast("double")
        ).alias("cv"),
    )
    d2 = (
        x.join(F.broadcast(cent), "pos")
        .select(
            "vec_id",
            "label",
            "clabel",
            F.round((F.col("xv") - F.col("cv")) * (F.col("xv") - F.col("cv")) * 1000000000)
            .cast("long")
            .alias("t9"),
        )
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum("t9").cast("long").alias("d9"))
    )
    pred = (
        d2.groupBy("vec_id", "label")
        .agg(F.min(F.struct("d9", "clabel")).alias("w"))
        .select("label", F.col("w.clabel").alias("pred"))
    )
    conf = pred.groupBy("label", "pred").agg(F.count(F.lit(1)).cast("long").alias("n"))
    classes = (
        conf.select(F.col("label").alias("c"))
        .unionByName(conf.select(F.col("pred").alias("c")))
        .distinct()
    )
    by_true = conf.groupBy(F.col("label").alias("c")).agg(
        F.sum("n").cast("long").alias("n_true"),
        F.sum(F.when(F.col("pred") == F.col("label"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("tp_t"),
    )
    by_pred = conf.groupBy(F.col("pred").alias("c")).agg(
        F.sum(F.when(F.col("label") != F.col("pred"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("fp"),
    )
    per = (
        classes.join(F.broadcast(by_true), "c", "left")
        .join(F.broadcast(by_pred), "c", "left")
        .select(
            "c",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("tp_t", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            (F.coalesce("n_true", F.lit(0)) - F.coalesce("tp_t", F.lit(0))).alias(
                "fn"
            ),
        )
    )
    return per.select(
        F.col("c").alias("label"),
        "n_true",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)).cast("double"),
            6,
        ).alias("precision_"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)).cast("double"),
            6,
        ).alias("recall_"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)).cast(
                "double"
            ),
            6,
        ).alias("f1"),
    )
