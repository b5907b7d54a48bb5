"""Shared helpers for cross-engine (Spark vs DuckDB) deterministic results.

Floating-point aggregates are the main parity hazard: both engines sum
doubles in nondeterministic order, so two runs of ``sum(price)`` can differ
in the last bits and any post-hoc rounding can land on different sides of a
half-way boundary. The testdata's monetary/quantity columns are
fixed-decimal values stored as doubles, so we sum the *scaled integer*
representation (exact in int64) and divide once at the end — a single
correctly-rounded FP op that is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lsum(col: Column | str, scale: int) -> Column:
    """Exact sum of a fixed-precision decimal column stored as double.

    ``scale`` must be 10**d where d >= the column's true decimal digits
    (prices/quantities/discounts: 2; price*(1-disc): 4; with (1+tax): 6).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / float(scale)


def s_lsum(expr: str, scale: int) -> str:
    """SQL twin of :func:`lsum`, valid in both DuckDB and Spark SQL.

    The inner cast defeats DuckDB's HUGEINT sum; the divisor is cast to
    double explicitly because a ``100.0`` literal parses as DECIMAL in both
    dialects, which would produce a decimal result instead of Spark's double.
    """
    return (
        f"(cast(sum(cast(round(({expr}) * {scale}) as bigint)) as bigint)"
        f" / cast({scale} as double))"
    )


def lavg(col: Column | str, scale: int) -> Column:
    """Exact-mean: scaled-integer sum divided by count, same op order as SQL."""
    return lsum(col, scale) / F.count(F.lit(1))


def s_lavg(expr: str, scale: int) -> str:
    return f"({s_lsum(expr, scale)} / count(*))"


def rounded(col: Column, digits: int = 6) -> Column:
    return F.round(col, digits)


def spread(df, *keys):
    """Repartition a coarsely-partitioned input before per-row-heavy compute.

    Small dimension tables often arrive as one parquet file = one partition;
    a shuffle-free projection chain (e.g. per-doc MinHash signatures) then
    runs on a single core no matter how wide the cluster is. One cheap
    round-robin/hash shuffle up front buys full parallelism for the
    expensive map stage. At 100 TB inputs are naturally multi-file, but the
    guard is still correct: repartition only widens, never narrows work.
    """
    try:
        n = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() >= n:
            return df
    except Exception:
        # Spark Connect exposes no sparkContext/rdd, so neither the target
        # width nor the current width is knowable here — skip rather than
        # risk narrowing an already-wide input with a blind repartition.
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)
