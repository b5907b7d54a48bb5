"""Format-surface round-trips beyond the basic matrix: fixed-width records
and RFC-4180-hostile CSV (quoted separators, embedded newlines).

Companions to ``operators/file_formats.py`` (same scratch-dir discipline,
same write → read-back → aggregate → oracle-from-original verdict shape):

- ``format_fixed_width``: mainframe-style fixed-width records — encode
  orders into 43-byte lines with lpad/rpad, write as a text file, read
  back, slice columns with substring arithmetic. Parsers like this are
  pure codegen (no Python), so the scan is as fast as CSV at 100 TB.
- ``format_csv_quoted_multiline``: a field containing the separator, the
  quote char, AND a newline — written through Spark's CSV writer and read
  back with ``multiLine`` — the configuration that silently corrupts data
  when any option is wrong, proven lossless by exact per-row equality
  against the constructed expected value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import s_lsum

_FW_ORACLE = f"""
SELECT o_orderstatus,
       cast(count(*) AS BIGINT) AS n,
       {s_lsum('o_totalprice', 100)} AS sum_price
FROM orders
GROUP BY o_orderstatus
"""


@register("format_fixed_width", oracle=_FW_ORACLE, tags=("formats",))
def format_fixed_width(spark, sf_dir):
    """orders -> 43-byte fixed-width lines -> text file -> substring parse.

    Layout: status[2] orderkey[12, zero-padded] cents[14, zero-padded]
    priority[15, space-padded]. The parse is substring + cast — whole-stage
    codegen end to end.
    """
    from .file_formats import _scratch

    o = table(spark, sf_dir, "orders")
    line = F.concat(
        F.rpad("o_orderstatus", 2, " "),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            14,
            "0",
        ),
        F.rpad("o_orderpriority", 15, " "),
    )
    out = _scratch("fixedwidth", sf_dir)
    o.select(line.alias("value")).write.mode("overwrite").text(str(out))
    back = spark.read.text(str(out)).select(
        F.trim(F.substring("value", 1, 2)).alias("o_orderstatus"),
        F.substring("value", 3, 12).cast("long").alias("o_orderkey"),
        F.substring("value", 15, 14).cast("long").alias("cents"),
        F.trim(F.substring("value", 29, 15)).alias("o_orderpriority"),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents") / 100.0).alias("sum_price"),
    )


_CSV_ML_ORACLE = """
WITH built AS (
  SELECT o_orderkey,
         'a,"b"' || chr(10) || 'line2-' || cast(o_orderkey AS VARCHAR) AS note,
         cast(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT cast(count(*) AS BIGINT) AS n_rows,
       cast(count(*) AS BIGINT) AS n_ok,
       cast(sum(cents) AS BIGINT) AS sum_cents,
       cast(sum(length(note)) AS BIGINT) AS sum_note_chars
FROM built
"""


@register("format_csv_quoted_multiline", oracle=_CSV_ML_ORACLE, tags=("formats",))
def format_csv_quoted_multiline(spark, sf_dir):
    """CSV round-trip where every field holds ',', '"' and '\\n'.

    Written with quote-minimal quoting + doubled-quote escaping (RFC 4180,
    ``escape='"'``) and read back with ``multiLine`` — mismatched options
    here shear rows apart, so n_ok == n_rows is the verdict. multiLine
    note: a multiline-quoted CSV file is NOT line-splittable, Spark falls
    back to one task per file; the write keeps the original partitioning
    so parallelism survives as one-file-per-task.
    """
    from .file_formats import _scratch

    o = table(spark, sf_dir, "orders")
    built = o.select(
        "o_orderkey",
        F.concat(
            F.lit('a,"b"\nline2-'), F.col("o_orderkey").cast("string")
        ).alias("note"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = _scratch("csvml", sf_dir)
    (
        built.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(str(out))
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .schema("o_orderkey long, note string, cents long")
        .csv(str(out))
    )
    expected = F.concat(F.lit('a,"b"\nline2-'), F.col("o_orderkey").cast("string"))
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("note") == expected).cast("long")).alias("n_ok"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.length("note")).alias("sum_note_chars"),
    )
