"""Delimited SMILES table reader (ZINC tranche format).

Parity with the reference's ZINC connector (reference ``zinc.py:174-229``):
configurable delimiter (default tab; None -> any whitespace), configurable
SMILES/identifier column indexes (defaults 0/1), malformed rows skipped
(too few columns or empty fields, ``zinc.py:199-210``), leftover columns
kept as ``metadata["column_<i>"]`` plus ``source_file`` provenance.

Spark-first: ``spark.read.text`` + ``split`` keeps everything in codegen;
``input_file_name()`` replaces the reference's per-record provenance dict.
Plain-text tranches are byte-range-splittable, so one 2 GB tranche parses
across many tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_smiles_table(
    spark: SparkSession,
    paths: str | list[str],
    *,
    source: str = "zinc",
    delimiter: str | None = "\t",
    smiles_column: int = 0,
    identifier_column: int = 1,
) -> DataFrame:
    import re

    # F.split takes a Java regex: literal delimiters are escaped, None means
    # "any whitespace run" (reference zinc.py:70: delimiter None -> str.split()).
    # Python str.split() also discards LEADING whitespace; F.split would emit
    # a leading empty token there and shift every column index, so strip all
    # whitespace (F.trim only strips 0x20 — tabs would slip through) first.
    sep_expr = r"\s+" if delimiter is None else re.escape(delimiter)
    split_src = (
        F.regexp_replace(F.col("value"), r"^\s+|\s+$", "")
        if delimiter is None
        else F.col("value")
    )
    raw = spark.read.text(paths).select(
        F.split(split_src, sep_expr).alias("cols"),
        F.input_file_name().alias("source_file"),
        F.col("value"),
    )
    need = max(smiles_column, identifier_column) + 1
    smiles = F.trim(F.element_at("cols", smiles_column + 1))
    identifier = F.trim(F.element_at("cols", identifier_column + 1))
    # metadata: every extra column, keyed column_<i>, empties dropped —
    # plus source_file provenance (reference zinc.py:212-227).
    extra = F.filter(
        F.transform(
            F.col("cols"),
            lambda c, i: F.when(
                (i != smiles_column) & (i != identifier_column) & (F.trim(c) != ""),
                F.struct(
                    F.concat(F.lit("column_"), i.cast("string")).alias("k"),
                    F.trim(c).alias("v"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    metadata = F.map_concat(
        F.map_from_entries(
            F.when(F.size(extra) > 0, extra).otherwise(
                F.array().cast("array<struct<k:string,v:string>>")
            )
        ),
        F.create_map(F.lit("source_file"), F.col("source_file")),
    )
    return (
        raw.filter(F.trim("value") != "")
        .filter(F.size("cols") >= need)
        .filter((smiles != "") & (identifier != ""))
        .select(
            F.lit(source).alias("source"),
            identifier.alias("identifier"),
            smiles.alias("smiles"),
            metadata.alias("metadata"),
        )
    )
