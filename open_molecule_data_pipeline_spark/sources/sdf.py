"""Distributed SDF (structure-data file) reader.

Behavioral parity with the reference's streaming SDF parser (reference
``ingestion/sdf.py:21-60``): records split on ``$$$$`` delimiter lines;
``>  <TAG>`` property headers; multi-line values joined with newlines and
stripped; gzip handled transparently.

Spark-first design: ``spark.read.option("lineSep", "\\n$$$$\\n").text`` splits
records *inside the scan* — each task parses its own byte range, so a 300 MB
PubChem archive fans out across the cluster instead of streaming through one
Python generator. Property-block parsing runs as an Arrow-batched iterator
(``mapInPandas``): one Python call per record batch, not per record/line.

Note on gzip: .sdf.gz files are not splittable, so parallelism for
compressed archives is one task per file — exactly the reference's
per-archive unit, but with hundreds of archives in flight at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.molecule import normalize_records

# Bare "$$$$" (no surrounding newlines): tolerant of CRLF files and of a
# final record whose "$$$$" lacks a trailing newline — the same inputs the
# reference's per-line `strip() == "$$$$"` check accepted (sdf.py:52). The
# leftover newlines around the delimiter land as blank lines the parser
# already skips; "$$$$" cannot occur inside a well-formed record.
RECORD_SEPARATOR = "$$$$"

_PARSED_SCHEMA = T.StructType(
    [
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)


def parse_sdf_block(block: str) -> dict[str, str]:
    """Property tags from one SDF record's text (reference ``sdf.py:21-44``).

    A property starts at a line beginning with ``>`` whose tag sits between
    the first ``<`` and the following ``>``; its value is every line until
    the next blank line / next property, joined with newlines and stripped.
    """
    props: dict[str, str] = {}
    tag: str | None = None
    buf: list[str] = []

    def flush() -> None:
        nonlocal tag, buf
        if tag is not None:
            props[tag] = "\n".join(buf).strip()
        tag, buf = None, []

    # split on \n only (with \r tolerance): the reference iterates file
    # lines (universal newlines) and Spark's lineSep scan splits on \n —
    # str.splitlines() would additionally split on \x85/  etc.
    for line in block.split("\n"):
        line = line.rstrip("\r")
        stripped = line.strip()
        if stripped.startswith(">"):
            flush()
            lo, hi = line.find("<"), -1
            if lo != -1:
                hi = line.find(">", lo + 1)
            if lo != -1 and hi != -1:
                tag = line[lo + 1 : hi]
            continue
        if tag is not None:
            buf.append(line)
    flush()
    return props


def _parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        mask = pdf["value"].str.strip() != ""
        pdf = pdf[mask]
        yield pd.DataFrame(
            {
                "props": pdf["value"].map(parse_sdf_block),
                "source_file": pdf["file"],
            }
        )


def read_sdf(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse SDF file(s) into ``(props map<string,string>, source_file)``."""
    from ..session import tune_session

    tune_session(spark)  # ships the package to executor Python workers
    raw = (
        spark.read.option("lineSep", RECORD_SEPARATOR)
        .text(paths)
        .select("value", F.input_file_name().alias("file"))
    )
    return raw.mapInPandas(_parse_partition, schema=_PARSED_SCHEMA)


def read_sdf_records(
    spark: SparkSession,
    paths: str | list[str],
    *,
    source: str,
    identifier_tag: str = "PUBCHEM_COMPOUND_CID",
    smiles_tag: str = "PUBCHEM_OPENEYE_ISO_SMILES",
    metadata_tags: list[str] | None = None,
) -> DataFrame:
    """SDF -> canonical molecule records (defaults mirror the reference's
    PubChem connector, ``pubchem.py:56-63``; ChEMBL uses ``ChEMBL_ID`` /
    ``CANONICAL_SMILES``, ``chembl.py:40-47``)."""
    parsed = read_sdf(spark, paths)
    return parsed.select(
        *normalize_records(
            F.col("props"),
            source=source,
            identifier_tag=identifier_tag,
            smiles_tag=smiles_tag,
            metadata_tags=metadata_tags,
        )
    ).filter(F.col("identifier").isNotNull() & (F.col("identifier") != ""))
