"""Table catalog over the driver-provided parquet testdata.

All query builders load tables through :func:`table` so type normalization
(nanosecond timestamps -> microsecond NTZ) happens in exactly one place and
matches what the DuckDB oracle sees (DuckDB truncates parquet NANOS to its
microsecond TIMESTAMP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing timestamp physical types.

    - ``events.ts`` is parquet TIMESTAMP(NANOS): with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a raw long which
      we floor-divide to microseconds — the same truncation DuckDB applies —
      and expose as TIMESTAMP_NTZ.
    - millisecond timestamps (orders/lineitem) already read as TIMESTAMP_NTZ.
    """
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views named exactly like the oracle's DuckDB views."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
