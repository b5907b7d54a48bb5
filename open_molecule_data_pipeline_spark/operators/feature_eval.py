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
