"""General columnar/text file-format IO (beyond the reference's SDF/TSV/NDJSON).

The reference only planned columnar storage ("optional parquet datasets",
reference ``docs/system-plan.md:25-27``); here Parquet is the canonical
internal format with ORC/CSV/JSON/text as interchange formats. All readers
take explicit schemas — never ``inferSchema`` — matching the reference's
declared-schema stance (SURVEY.md §1.3).

Scale notes baked in:
- parquet/orc writers support ``partition_by`` (directory pruning at read)
  and ``bucket_by`` (shuffle-free co-located joins via saveAsTable).
- CSV/JSON are line-splittable uncompressed; gzip inputs parallelize at
  file granularity only — mirror many medium files, not one giant one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (optionally sorted) — joins/aggs on the bucket
    columns then skip the shuffle entirely. The 100 TB answer to repeated
    joins on the same key."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_arrow_ipc(spark, path: str, spark_schema):
    """Read Arrow IPC files (Feather v2 / ``.arrow``) into a DataFrame.

    Spark has no native Arrow-IPC file source; the idiomatic extension is
    the same shape as the WARC reader (``sources/warc.py``): ``binaryFile``
    gives one row per file (file-granular parallelism — IPC files are the
    standard hand-off artifact of Python feature pipelines, usually many
    per dataset), and the payload decodes INSIDE ``mapInPandas`` with
    pyarrow — zero-copy from the IPC buffer to the Arrow batches Spark
    already uses for Python interop, so the only real cost is the
    binaryFile byte slurp (2 GB/file JVM cap, same caveat as WARC).
    ``spark_schema`` declares the projected columns (explicit schemas
    everywhere — SURVEY.md §1.3).
    """
    files = spark.read.format("binaryFile").load(path)
    names = [f.name for f in spark_schema.fields]

    def decode(batches):
        import pyarrow as pa

        for pdf in batches:
            for content in pdf["content"]:
                with pa.ipc.open_file(pa.BufferReader(bytes(content))) as rd:
                    tbl = rd.read_all()
                yield tbl.select(names).to_pandas()

    return files.select("content").mapInPandas(decode, spark_schema)
