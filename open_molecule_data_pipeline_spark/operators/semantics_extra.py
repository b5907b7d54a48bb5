"""Semantics-corner coverage: error-tolerant try_* functions, timezone
conversion, outer explosion of empty arrays, and null-safe equality.

These are the behaviors that differ subtly between engines, so each oracle
spells out the exact equivalent algebra (CASE for try_divide, fixed-offset
intervals for timezone shifts, [NULL] injection for explode_outer,
IS NOT DISTINCT FROM for <=>).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# --------------------------------------------------------------------------
# try_cast / try_divide: malformed casts and zero denominators yield NULL
# instead of failing the job — the posture a 100 TB ingest needs (one bad
# row must not kill a stage). DuckDB's TRY_CAST matches; try_divide is
# CASE-guarded division.
# --------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT p_partkey,
       TRY_CAST(p_brand AS DOUBLE) AS brand_as_num,
       TRY_CAST(split_part(p_brand, '#', 2) AS INTEGER) AS brand_num,
       CASE WHEN (p_size - p_size) = 0 THEN NULL
            ELSE p_retailprice / (p_size - p_size) END AS div_zero,
       CASE WHEN p_size = 0 THEN NULL
            ELSE p_retailprice / p_size END AS price_per_size
FROM part
"""


@register("func_try_ops", oracle=_TRY_ORACLE, tags=("scalar", "error-handling"))
def func_try_ops(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("double").alias("brand_as_num"),
        F.split_part("p_brand", F.lit("#"), F.lit(2))
        .try_cast("int")
        .alias("brand_num"),
        F.try_divide("p_retailprice", F.col("p_size") - F.col("p_size")).alias(
            "div_zero"
        ),
        F.try_divide("p_retailprice", "p_size").alias("price_per_size"),
    )


# --------------------------------------------------------------------------
# Timezone conversion with fixed-offset zones (Tokyo +9:00, Kolkata +5:30 —
# no DST, so the oracle is plain interval arithmetic and the comparison
# can't hinge on tzdata versions). Round-trip asserts to/from inversion.
# --------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT event_id,
       ts + INTERVAL 9 HOUR AS tokyo,
       ts + INTERVAL 330 MINUTE AS kolkata,
       ts AS roundtrip
FROM events
"""


@register("func_timezone_convert", oracle=_TZ_ORACLE, tags=("scalar", "date"))
def func_timezone_convert(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return e.select(
        "event_id",
        tokyo.alias("tokyo"),
        F.from_utc_timestamp("ts", "Asia/Kolkata").alias("kolkata"),
        F.to_utc_timestamp(tokyo, "Asia/Tokyo").alias("roundtrip"),
    )


# --------------------------------------------------------------------------
# explode_outer: rows whose array is empty survive with a NULL element
# (plain explode would drop them — silently losing documents in a corpus
# pipeline). DuckDB has no outer unnest, so the oracle injects [NULL].
# --------------------------------------------------------------------------

_EXPLODE_OUTER_ORACLE = """
SELECT doc_id,
       unnest(CASE WHEN longs IS NULL OR len(longs) = 0
                   THEN [NULL] ELSE longs END) AS long_tok
FROM (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> length(t) > 6) AS longs
  FROM documents
) t
"""


@register("func_explode_outer", oracle=_EXPLODE_OUTER_ORACLE, tags=("scalar", "array"))
def func_explode_outer(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    longs = F.expr("filter(split(text, ' '), t -> length(t) > 6)")
    return d.select("doc_id", longs.alias("longs")).select(
        "doc_id", F.explode_outer("longs").alias("long_tok")
    )


# --------------------------------------------------------------------------
# Null-safe equality (<=> / IS NOT DISTINCT FROM) over a status grid that
# contains a genuine NULL: NULL <=> NULL is TRUE, NULL <=> 'F' is FALSE —
# the semantics joins on nullable keys depend on.
# --------------------------------------------------------------------------

_NULL_SAFE_ORACLE = """
WITH s AS (SELECT DISTINCT nullif(o_orderstatus, 'O') AS st FROM orders)
SELECT a.st AS s1, b.st AS s2, a.st IS NOT DISTINCT FROM b.st AS same
FROM s a CROSS JOIN s b
"""


@register("join_null_safe_eq", oracle=_NULL_SAFE_ORACLE, tags=("join", "null"))
def join_null_safe_eq(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    s = o.select(F.nullif("o_orderstatus", F.lit("O")).alias("st")).distinct()
    a, b = s.alias("a"), s.alias("b")
    return a.crossJoin(b).select(
        F.col("a.st").alias("s1"),
        F.col("b.st").alias("s2"),
        F.col("a.st").eqNullSafe(F.col("b.st")).alias("same"),
    )
