"""Bagged decision stumps (r13): the random-forest mechanism —
bootstrap bags, per-bag weak learners, out-of-bag error, majority-vote
ensemble — in the exact-arithmetic histogram-split form of
``ml_decision_stump`` (ml_eval.py).

Bags are DETERMINISTIC bootstraps (the repo's seeded-hash discipline,
sample_bernoulli_hash precedent): row r belongs to bag b iff the first
two md5 nibbles of "r-b" fall under 0xa1 — a 161/256 ~ 63% inclusion
rate, the classic bootstrap's expected distinct coverage (1 - 1/e),
with zero RNG state and identical membership on both engines. The
~37% excluded rows are bag b's OUT-OF-BAG set, giving every stump an
honest holdout (the free generalization estimate bagging is loved
for); the final row evaluates the 5-stump majority vote on all rows.

Scale shape: the bag fan-out is a map-side explode (x B), the per-bag
histogram one map-side-combinable groupBy(bag, bin); split search runs
on the bounded histogram (never the row stream) with the decimal(38,0)
integer-exact Gini score of ml_decision_stump; the 5 chosen stumps ride
as ONE broadcast array column, so both evaluation passes are pure map
passes (zero shuffle beyond their final count aggregations).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread
from .ml_eval import _BIN, _OFF

_N_BAGS = 5
_ENSEMBLE_ROW = 99  # bag id of the majority-vote summary row
_INCL = "a1"  # md5 2-hex-nibble threshold: 161/256 ~ bootstrap's 63%

_BAG_CTES = f"""
pts AS (
  SELECT vec_id,
         (cast(floor(cast(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
          + {_OFF}) // {_BIN} AS b,
         label % 2 AS y
  FROM embeddings
),
bagged AS (
  SELECT p.vec_id, p.b, p.y, bag.bag,
         CASE WHEN substr(md5(cast(p.vec_id AS VARCHAR) || '-'
                          || cast(bag.bag AS VARCHAR)), 1, 2) < '{_INCL}'
              THEN 1 ELSE 0 END AS inb
  FROM pts p, (SELECT unnest(range({_N_BAGS})) AS bag) bag
),
hist AS (
  SELECT bag, b, cast(sum(y) AS BIGINT) AS n1,
         cast(count(*) - sum(y) AS BIGINT) AS n0
  FROM bagged WHERE inb = 1 GROUP BY bag, b
),
tot AS (SELECT bag, sum(n1) AS t1, sum(n0) AS t0 FROM hist GROUP BY bag),
cum AS (
  SELECT a.bag, a.b,
         cast(sum(h.n1) AS BIGINT) AS l1, cast(sum(h.n0) AS BIGINT) AS l0
  FROM hist a JOIN hist h ON h.bag = a.bag AND h.b <= a.b
  GROUP BY a.bag, a.b
),
scored AS (
  SELECT c.bag, c.b, c.l0, c.l1,
         t.t0 - c.l0 AS r0, t.t1 - c.l1 AS r1,
         ((c.l0 * c.l0 + c.l1 * c.l1) * (t.t0 + t.t1 - c.l0 - c.l1)
          + ((t.t0 - c.l0) * (t.t0 - c.l0) + (t.t1 - c.l1) * (t.t1 - c.l1))
            * (c.l0 + c.l1)) AS num,
         (c.l0 + c.l1) * (t.t0 + t.t1 - c.l0 - c.l1) AS den
  FROM cum c JOIN tot t ON t.bag = c.bag
  WHERE (c.l0 + c.l1) > 0 AND (t.t0 + t.t1 - c.l0 - c.l1) > 0
),
stumps AS (
  SELECT bag, b AS split_bin,
         CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS left_class,
         CASE WHEN r1 > r0 THEN 1 ELSE 0 END AS right_class
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY bag
      ORDER BY (num // den) * 1000000 + ((num % den) * 1000000) // den
               DESC, b) AS rn
    FROM scored
  ) t WHERE rn = 1
)
"""

_BAGGED_ORACLE = f"""
WITH {_BAG_CTES},
oob AS (
  SELECT s.bag, cast(s.split_bin AS BIGINT) AS split_bin,
         cast(s.left_class AS BIGINT) AS left_class,
         cast(s.right_class AS BIGINT) AS right_class,
         cast(count(*) AS BIGINT) AS eval_rows,
         cast(sum(CASE WHEN (CASE WHEN g.b <= s.split_bin
                                  THEN s.left_class ELSE s.right_class END)
                        <> g.y THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM bagged g JOIN stumps s ON s.bag = g.bag
  WHERE g.inb = 0
  GROUP BY s.bag, s.split_bin, s.left_class, s.right_class
),
votes AS (
  SELECT p.vec_id, p.y,
         sum(CASE WHEN p.b <= s.split_bin
                  THEN s.left_class ELSE s.right_class END) AS v
  FROM pts p, stumps s
  GROUP BY p.vec_id, p.y
),
ens AS (
  SELECT cast({_ENSEMBLE_ROW} AS BIGINT) AS bag,
         cast(NULL AS BIGINT) AS split_bin,
         cast(NULL AS BIGINT) AS left_class,
         cast(NULL AS BIGINT) AS right_class,
         cast(count(*) AS BIGINT) AS eval_rows,
         cast(sum(CASE WHEN (CASE WHEN 2 * v > {_N_BAGS} THEN 1 ELSE 0 END)
                        <> y THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM votes
)
SELECT cast(bag AS BIGINT) AS bag, split_bin, left_class, right_class,
       eval_rows, errors,
       errors * 1000000 // eval_rows AS err_ppm
FROM (SELECT * FROM oob UNION ALL SELECT * FROM ens) u
"""


def _bagged(spark, sf_dir):
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    pts = e.select(
        "vec_id",
        F.expr(
            f"(cast(floor(cast(embedding[0] as double) * 1000000) as bigint)"
            f" + {_OFF}) div {_BIN}"
        ).alias("b"),
        (F.col("label") % 2).cast("long").alias("y"),
    )
    return pts, pts.select(
        "vec_id",
        "b",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BAGS - 1))).alias("bag"),
    ).withColumn(
        "inb",
        (
            F.substring(
                F.md5(
                    F.concat(
                        F.col("vec_id").cast("string"),
                        F.lit("-"),
                        F.col("bag").cast("string"),
                    )
                ),
                1,
                2,
            )
            < _INCL
        ).cast("int"),
    )


def _stumps(bagged):
    hist = (
        bagged.filter(F.col("inb") == 1)
        .groupBy("bag", "b")
        .agg(
            F.sum("y").alias("n1"),
            (F.count(F.lit(1)) - F.sum("y")).alias("n0"),
        )
    )
    tot = hist.groupBy("bag").agg(
        F.sum("n1").alias("t1"), F.sum("n0").alias("t0")
    )
    a = hist.select(F.col("bag").alias("cbag"), F.col("b").alias("cb"))
    cum = (
        a.join(
            F.broadcast(hist),
            (F.col("bag") == F.col("cbag")) & (F.col("b") <= F.col("cb")),
        )
        .groupBy("cbag", "cb")
        .agg(F.sum("n1").alias("l1"), F.sum("n0").alias("l0"))
    )
    dec = "decimal(38,0)"
    l0d, l1d = F.col("l0").cast(dec), F.col("l1").cast(dec)
    r0d, r1d = F.col("r0").cast(dec), F.col("r1").cast(dec)
    scored = (
        cum.join(F.broadcast(tot), F.col("cbag") == F.col("bag"))
        .withColumn("r0", F.col("t0") - F.col("l0"))
        .withColumn("r1", F.col("t1") - F.col("l1"))
        .filter((F.col("l0") + F.col("l1") > 0) & (F.col("r0") + F.col("r1") > 0))
        .withColumn(
            "num",
            (l0d * l0d + l1d * l1d) * (r0d + r1d)
            + (r0d * r0d + r1d * r1d) * (l0d + l1d),
        )
        .withColumn("den", (l0d + l1d) * (r0d + r1d))
        .withColumn(
            "score_ppm",
            F.expr(
                "cast((num div den) * 1000000"
                "     + ((num % den) * 1000000) div den as long)"
            ),
        )
    )
    ws = W.partitionBy("cbag").orderBy(F.col("score_ppm").desc(), "cb")
    return (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cbag").alias("bag"),
            F.col("cb").cast("long").alias("split_bin"),
            F.when(F.col("l1") > F.col("l0"), 1)
            .otherwise(0)
            .cast("long")
            .alias("left_class"),
            F.when(F.col("r1") > F.col("r0"), 1)
            .otherwise(0)
            .cast("long")
            .alias("right_class"),
        )
    )


@register("ml_bagged_stumps", oracle=_BAGGED_ORACLE, tags=("ml", "agg"))
def ml_bagged_stumps(spark, sf_dir):
    """5 deterministic-bootstrap stumps with per-bag OOB error plus the
    majority-vote ensemble row (bag 99) evaluated on all rows."""
    pts, bagged = _bagged(spark, sf_dir)
    stumps = _stumps(bagged).localCheckpoint(eager=True)

    pred = F.when(
        F.col("b") <= F.col("split_bin"), F.col("left_class")
    ).otherwise(F.col("right_class"))
    oob = (
        bagged.filter(F.col("inb") == 0)
        .join(F.broadcast(stumps), "bag")
        .groupBy("bag", "split_bin", "left_class", "right_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("eval_rows"),
            F.sum((pred != F.col("y")).cast("long"))
            .cast("long")
            .alias("errors"),
        )
    )
    # the 5 stumps ride as ONE broadcast array column; the vote is a
    # per-row fold — zero shuffle before the final 1-row aggregation
    sarr = stumps.agg(
        F.array_sort(
            F.collect_list(
                F.struct("bag", "split_bin", "left_class", "right_class")
            )
        ).alias("st")
    )
    votes = F.expr(
        "aggregate(st, 0L, (acc, s) -> acc +"
        " IF(b <= s.split_bin, s.left_class, s.right_class))"
    )
    ens = (
        pts.crossJoin(F.broadcast(sarr))
        .select(
            "y",
            (
                F.when(votes * 2 > _N_BAGS, F.lit(1)).otherwise(F.lit(0))
                != F.col("y")
            )
            .cast("long")
            .alias("err"),
        )
        .agg(
            F.lit(_ENSEMBLE_ROW).cast("long").alias("bag"),
            F.lit(None).cast("long").alias("split_bin"),
            F.lit(None).cast("long").alias("left_class"),
            F.lit(None).cast("long").alias("right_class"),
            F.count(F.lit(1)).cast("long").alias("eval_rows"),
            F.sum("err").cast("long").alias("errors"),
        )
    )
    out = oob.select(
        F.col("bag").cast("long"),
        "split_bin",
        "left_class",
        "right_class",
        "eval_rows",
        "errors",
    ).unionByName(ens)
    return out.withColumn(
        "err_ppm", F.expr("errors * 1000000 div eval_rows")
    )
