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
