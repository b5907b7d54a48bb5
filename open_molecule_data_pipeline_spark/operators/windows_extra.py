"""Second window-function batch: ratio-to-report and gaps-and-islands.

- Ratio-to-report is the unordered partition-total window (share of the
  group sum without a self-join back). The partition total uses the
  scaled-integer window sum so the share division is bit-identical.
- Gaps-and-islands finds consecutive-hour activity streaks per user with
  the classic ``bucket - row_number`` trick — pure integer/interval
  arithmetic, one window, one aggregate; no iterative logic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# Ratio-to-report: each order's share of its priority class's total price
# (one month of orders). sum() OVER (PARTITION BY ...) with no ORDER BY is
# the whole-partition frame in both engines.
# --------------------------------------------------------------------------

_SHARE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       round(o_totalprice /
             (cast(sum(cast(round(o_totalprice * 100) AS BIGINT))
                     OVER (PARTITION BY o_orderpriority) AS DOUBLE)
              / cast(100 AS DOUBLE)), 6) AS price_share
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
"""


@register("window_ratio_to_report", oracle=_SHARE_ORACLE, tags=("window", "ratio"))
def window_ratio_to_report(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    w = Window.partitionBy("o_orderpriority")
    total = (
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(w).cast("double")
        / F.lit(100.0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.col("o_totalprice") / total, 6).alias("price_share"),
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: consecutive-hour activity streaks per user. The island
# key (hour - rn * 1h) is constant within a run of consecutive hours;
# row_number is tie-safe because (user_id, hr) is distinct by construction.
# --------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH hrs AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM events
), keyed AS (
  SELECT user_id, hr,
         hr - row_number() OVER (PARTITION BY user_id ORDER BY hr) * INTERVAL 1 HOUR AS island_key
  FROM hrs
)
SELECT user_id, min(hr) AS streak_start, cast(count(*) AS BIGINT) AS streak_hours
FROM keyed
GROUP BY user_id, island_key
"""


@register("window_gaps_islands", oracle=_ISLANDS_ORACLE, tags=("window", "islands"))
def window_gaps_islands(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hrs = e.select(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    keyed = hrs.withColumn(
        "island_key",
        F.col("hr") - F.row_number().over(w) * F.expr("INTERVAL '1' HOUR"),
    )
    return (
        keyed.groupBy("user_id", "island_key")
        .agg(
            F.min("hr").alias("streak_start"),
            F.count(F.lit(1)).alias("streak_hours"),
        )
        .select("user_id", "streak_start", "streak_hours")
    )
