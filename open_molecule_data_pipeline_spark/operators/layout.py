"""Multi-dimensional data layout: Z-order (Morton curve) clustering.

At 100 TB, scan pruning is the cheapest query accelerator there is:
parquet row-group min/max stats skip IO, but only if the data is laid out
so each file covers a narrow slice of the filter columns. A sort on one
column prunes that column only; interleaving the bits of two (or more)
columns into a Z-value and range-partitioning on it gives every file a
narrow min/max window on *all* interleaved dimensions at once — the same
technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`.

`zorder_write` is the production operator (range-partition + in-file sort
on the Z-value, then plain parquet). `format_zorder_layout` is the
driver-checked twin: it computes the same Z-values declaratively and
reports per-Z-bucket locality (row count + min/max of both dimensions),
which the DuckDB oracle reproduces bit-for-bit because the curve is pure
integer arithmetic. `tests/test_layout.py` verifies the real write: every
parquet file's row-group stats must span less than half of each
dimension's range — the property that makes 2-D pruning work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_BITS = 8  # 8 bits per dimension -> 16-bit Z-value


def z_value(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int columns.

    Bit i of x lands at Z bit 2i, bit i of y at 2i+1 — plain shift/mask
    arithmetic that whole-stage codegen compiles to JVM longs (and that any
    SQL engine reproduces exactly; no UDF, no float).
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    return z


def _z_sql(x: str, y: str, bits: int = _BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame, cols: tuple[str, str], path: str, n_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of two int columns.

    Range-partitioning on the Z-value gives each output file a contiguous
    Z-range; the within-file sort tightens row-group stats further. The
    Z column itself is dropped — it is a layout device, not data.
    """
    x, y = cols
    (
        df.withColumn("__z", z_value(F.col(x), F.col(y)))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --------------------------------------------------------------------------
# Driver-checked twin: Z-bucket locality report over orders. x/y are the
# low 8 bits of customer key and whole-dollar total price — two independent
# dimensions a warehouse would actually filter on. Bucket = top 6 bits of
# the 16-bit Z-value (64 buckets); min/max per bucket shows each bucket
# confined to a 2-D tile, which is the pruning guarantee.
# --------------------------------------------------------------------------

_X = "(o_custkey % 256)"
_Y = "(cast(floor(o_totalprice) AS BIGINT) % 256)"

_ZORDER_ORACLE = f"""
WITH zed AS (
  SELECT ({_z_sql(_X, _Y)}) AS z, {_X} AS x, {_Y} AS y FROM orders
)
SELECT cast(z >> 10 AS INTEGER) AS z_bucket,
       cast(count(*) AS BIGINT) AS n,
       cast(min(x) AS BIGINT) AS min_x, cast(max(x) AS BIGINT) AS max_x,
       cast(min(y) AS BIGINT) AS min_y, cast(max(y) AS BIGINT) AS max_y
FROM zed
GROUP BY cast(z >> 10 AS INTEGER)
"""


@register("format_zorder_layout", oracle=_ZORDER_ORACLE, tags=("formats", "layout"))
def format_zorder_layout(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 256
    y = F.floor(F.col("o_totalprice")).cast("long") % 256
    zed = o.select(z_value(x, y).alias("z"), x.alias("x"), y.alias("y"))
    return zed.groupBy(
        F.shiftright("z", 10).cast("int").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# --------------------------------------------------------------------------
# Hilbert-curve layout key — the better-locality alternative to the Morton
# (Z-order) key above: the Hilbert curve has NO long diagonal jumps, so
# consecutive key ranges map to tighter spatial bounding boxes (smaller
# min/max column stats per file -> sharper range pruning for 2-D
# predicates; Delta Lake's OPTIMIZE ZORDER moved to Hilbert for exactly
# this reason). The xy2d transform is inherently iterative (each bit level
# rotates/reflects the quadrant frame), which nests badly as a single
# expression — so the 8 levels unroll into a CHAIN of CTE projections
# (linear text, linear plan; Catalyst collapses adjacent projections into
# one whole-stage-codegen map). The SAME generated SQL text runs on Spark
# and DuckDB, so the bit-twiddling cannot drift between engines; the
# per-bucket sum(d) checksum pins every key exactly, and a pytest checks
# the full 256x256 grid against an independent Python reference
# (bijection + unit-step locality).
# --------------------------------------------------------------------------

_HILBERT_N = 256  # order-8 curve: 16-bit keys over a 256x256 grid


def _hilbert_sql() -> str:
    n1 = _HILBERT_N - 1
    ctes = [
        f"""pts AS (
  SELECT event_id,
         (event_id * 37) % {_HILBERT_N} AS x,
         (event_id * 101) % {_HILBERT_N} AS y,
         0 AS d
  FROM events
)"""
    ]
    prev = "pts"
    s = _HILBERT_N // 2
    i = 0
    while s > 0:
        ctes.append(
            f"""lev{i} AS (
  SELECT event_id,
         d + {s * s} * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END) AS d,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n1} - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n1} - x ELSE x END)
              ELSE y END AS y
  FROM (SELECT event_id, x, y, d,
               cast(floor(x / {s}) AS BIGINT) % 2 AS rx,
               cast(floor(y / {s}) AS BIGINT) % 2 AS ry
        FROM {prev}) t
)"""
        )
        prev = f"lev{i}"
        i += 1
        s //= 2
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT cast(floor(l.d / 1024) AS BIGINT) AS bucket,
       cast(count(*) AS BIGINT) AS n_points,
       cast(sum(l.d) AS BIGINT) AS d_sum,
       cast(max(p.x) - min(p.x) AS BIGINT) AS x_extent,
       cast(max(p.y) - min(p.y) AS BIGINT) AS y_extent
FROM {prev} l JOIN pts p ON l.event_id = p.event_id
GROUP BY cast(floor(l.d / 1024) AS BIGINT)
"""


@register("layout_hilbert_key", oracle=_hilbert_sql(), tags=("layout",))
def layout_hilbert_key(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_hilbert_sql())
