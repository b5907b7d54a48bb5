"""Distributed as-of join (point-in-time enrichment).

Spark has no native as-of join; the classic scalable construction is
union-then-window: tag right rows 0 and left rows 1, union on (key, time),
then per key take ``last_value(..., ignorenulls)`` over an ordered rows
frame. One shuffle on the key, one in-partition sort — no per-row probing,
no driver loops, and it scales to arbitrarily large sides (unlike a
broadcast lookup table). Skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.key == left.key`` and ``right.time <= left.time``.

    Ties on ``right.time`` resolve to the greatest ``right_tiebreak``.
    Output = all left columns + ``value_cols`` (null when no match).
    """
    lcols = left.columns
    tb = right_tiebreak or right_on
    rtypes = dict(right.dtypes)

    # Values are carried as ONE struct per right row: the struct itself is
    # non-null even when individual value columns are null, so
    # last(ignorenulls) skips only the left-row placeholders — a right row
    # with a legitimately-null value still wins over older rows, and all
    # value columns always come from the same right row.
    vals_type = ", ".join(f"`{c}`: {rtypes[c]}" for c in value_cols)

    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tb).alias("__tb"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtypes[tb]).alias("__tb"),
        F.lit(None).cast(f"struct<{vals_type}>").alias("__vals"),
        *lcols,
    )
    # Order: time, then right-before-left at equal time (<= semantics), then
    # tiebreak so the last right row at a tied time wins deterministically.
    w = (
        W.partitionBy("__key")
        .orderBy("__t", "__side", F.col("__tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = r.unionByName(l).select(
        *lcols,
        F.col("__side"),
        F.last("__vals", ignorenulls=True).over(w).alias("__filled"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__filled.{c}").alias(c) for c in value_cols]
    )
