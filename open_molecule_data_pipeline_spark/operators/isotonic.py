"""Isotonic calibration (r13): the PAV (pool-adjacent-violators) fit of
observed positive rate as a NON-DECREASING function of the predicted
score — the standard upgrade over raw reliability bins
(``ml_calibration_bins``) when the calibration curve must be monotone
to be usable as a score->probability map (Zadrozny & Elkan 2002).

PAV is textbook-sequential (merge adjacent violating blocks until
monotone), but over BOUNDED score bins it has a fully DECLARATIVE
closed form — the minimax identity

    iso(k) = max_{i <= k} min_{j >= k} mean(y over bins i..j)

so the whole fit is: one corpus scan into <= 16 (bin, count, positives)
rows, a bounded self-join building all O(B^2) interval means (exact
int sums; ONE IEEE division each — no float summation anywhere), and
two bounded min/max aggregations. No folds, no recursion, no windows;
the oracle runs the identical algebra.

Score and binning reuse the deterministic logistic score of
ml_calibration_bins (stats.py) at 16 bins; the pin test checks the
minimax result against a sequential Python PAV on random block
configurations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_B = 16

_ISO_BINS = f"""
scored AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         cast(round(1 / (1 + exp(-(-0.7 + 0.002 * cast(round(l_discount * 100)
             AS BIGINT) - 0.0002 * cast(l_quantity AS BIGINT)))) * 1000000000)
             AS BIGINT) AS p9
  FROM lineitem
),
bins AS (
  SELECT cast(p9 * {_B} // 1000000000 AS BIGINT) AS bin,
         cast(count(*) AS BIGINT) AS w,
         cast(sum(y) AS BIGINT) AS s
  FROM scored GROUP BY 1
)
"""

_ISO_ORACLE = f"""
WITH {_ISO_BINS},
iv AS (
  SELECT a.bin AS i, b.bin AS j,
         cast(sum(m.s) AS BIGINT) AS s, cast(sum(m.w) AS BIGINT) AS w
  FROM bins a
  JOIN bins b ON b.bin >= a.bin
  JOIN bins m ON m.bin BETWEEN a.bin AND b.bin
  GROUP BY a.bin, b.bin
),
inner_min AS (
  SELECT k.bin AS k, iv.i,
         min(cast(iv.s AS DOUBLE) / cast(iv.w AS DOUBLE)) AS mn
  FROM bins k
  JOIN iv ON iv.i <= k.bin AND iv.j >= k.bin
  GROUP BY k.bin, iv.i
),
fit AS (SELECT k, max(mn) AS iso FROM inner_min GROUP BY k)
SELECT b.bin, b.w AS n, b.s AS positives,
       b.s * 1000000 // b.w AS raw_rate_ppm,
       cast(round(f.iso * 1000000) AS BIGINT) AS iso_rate_ppm
FROM bins b JOIN fit f ON f.k = b.bin
"""


def _isotonic_from_bins(bins):
    """(bin, w, s) -> (bin, n, positives, raw_rate_ppm, iso_rate_ppm)
    via the minimax identity; `bins` has at most a few dozen rows."""
    a = bins.select(F.col("bin").alias("i"))
    b = bins.select(F.col("bin").alias("j"))
    m = bins.select(F.col("bin").alias("mb"), "w", "s")
    iv = (
        a.join(F.broadcast(b), F.col("j") >= F.col("i"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("i")) & (F.col("mb") <= F.col("j")),
        )
        .groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"),
             F.sum("w").cast("long").alias("w"))
    )
    k = bins.select(F.col("bin").alias("k"))
    inner = (
        k.join(
            F.broadcast(iv),
            (F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")),
        )
        .groupBy("k", "i")
        .agg(
            F.min(F.col("s").cast("double") / F.col("w").cast("double"))
            .alias("mn")
        )
    )
    fit = inner.groupBy("k").agg(F.max("mn").alias("iso"))
    return (
        bins.join(F.broadcast(fit), F.col("bin") == F.col("k"))
        .select(
            "bin",
            F.col("w").alias("n"),
            F.col("s").alias("positives"),
            F.expr("s * 1000000 div w").alias("raw_rate_ppm"),
            F.round(F.col("iso") * 1_000_000).cast("long").alias("iso_rate_ppm"),
        )
    )


@register("ml_isotonic_calibration", oracle=_ISO_ORACLE, tags=("ml", "stats"))
def ml_isotonic_calibration(spark, sf_dir):
    """Monotone (PAV) calibration of the deterministic logistic score
    over 16 bins, solved by the declarative minimax identity."""
    li = table(spark, sf_dir, "lineitem")
    eta = (
        F.lit(-0.7)
        + 0.002 * F.round(F.col("l_discount") * 100).cast("long")
        - 0.0002 * F.col("l_quantity").cast("long")
    )
    p9 = F.round((1 / (1 + F.exp(-eta))) * 1_000_000_000).cast("long")
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        p9.alias("p9"),
    )
    bins = scored.select(
        F.expr(f"cast(p9 * {_B} div 1000000000 as bigint)").alias("bin"), "y"
    ).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("y").cast("long").alias("s"),
    )
    return _isotonic_from_bins(bins)
