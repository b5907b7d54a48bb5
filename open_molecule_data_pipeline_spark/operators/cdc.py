"""Change-data-capture style operators without a lakehouse format.

MERGE INTO needs Delta/Iceberg jars (not in this runtime); the classic
emulation is anti-join + union: updates win, unmatched current rows
survive. At 100 TB both sides hash-shuffle on the key once — same cost
profile as a real MERGE's find-touched-files phase, minus transactionality
(which the idempotent-output + checkpoint layer provides at job level).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# The "updates" feed is derived deterministically from the data itself so
# the operator is oracle-checkable: every customer with custkey % 10 == 0
# gets a new acctbal and one brand-new customer row appears.

_CDC_ORACLE = """
WITH updates AS (
  SELECT c_custkey, c_name, round(c_acctbal + 1000.0, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT -1 AS c_custkey, 'Customer#new' AS c_name, 0.0 AS c_acctbal
)
SELECT c_custkey, c_name, c_acctbal, is_updated FROM (
  SELECT u.c_custkey, u.c_name, u.c_acctbal, true AS is_updated FROM updates u
  UNION ALL
  SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal,
         false AS is_updated
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
) t
"""


@register("cdc_merge_upsert", oracle=_CDC_ORACLE, tags=("cdc", "merge"))
def cdc_merge_upsert(spark, sf_dir):
    current = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    updates = (
        current.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 2).alias("c_acctbal"),
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, "Customer#new", 0.0)], "c_custkey long, c_name string, c_acctbal double"
            )
        )
    )
    untouched = current.join(updates, "c_custkey", "left_anti")
    return updates.withColumn("is_updated", F.lit(True)).unionByName(
        untouched.withColumn("is_updated", F.lit(False))
    )


# --------------------------------------------------------------------------
# day-over-day retention: of users active on day D, how many were also
# active on D+1. Self-join of the distinct (user, day) activity set.
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT a.day AS day, count(*) AS active_users,
       count(b.user_id) AS retained_next_day
FROM activity a
LEFT JOIN activity b
  ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day
"""


@register("ts_retention_daily", oracle=_RETENTION_ORACLE, tags=("timeseries", "retention"))
def ts_retention_daily(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    a = activity.alias("a")
    b = activity.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.day") == F.col("a.day") + F.expr("INTERVAL 1 DAY")),
            "left",
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count(F.col("b.user_id")).alias("retained_next_day"),
        )
    )
