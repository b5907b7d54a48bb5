"""Canonical molecule record schema + normalization (reference parity).

The reference's one row type is ``MoleculeRecord{source, identifier, smiles,
metadata}`` (reference ``ingestion/common.py:22-28``); we model it as a flat
DataFrame with a ``map<string,string>`` metadata column (values are strings
in every reference code path — SURVEY.md §1.2).

Chemistry transforms (canonical SMILES, fingerprints) are planned in the
reference (``docs/system-plan.md:24-25``) and exposed here as Arrow-batched
pandas UDFs, gated on RDKit availability since the runtime image may not
ship it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MOLECULE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("identifier", T.StringType(), True),
        T.StructField("smiles", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def normalize_records(
    props: Column,
    *,
    source: str,
    identifier_tag: str,
    smiles_tag: str,
    metadata_tags: list[str] | None = None,
) -> list[Column]:
    """Project a property map into the canonical record columns.

    Mirrors ``_build_record`` (reference ``pubchem.py:220-240``): identifier
    and SMILES are picked by configurable tag and trimmed; every other tag
    lands in metadata (optionally whitelisted); empty-string metadata values
    are dropped (reference ``pubchem.py:234``).
    """
    identifier = F.trim(F.element_at(props, identifier_tag))
    smiles = F.trim(F.element_at(props, smiles_tag))
    reserved = [identifier_tag, smiles_tag]
    keep = (
        (lambda k, v: ~k.isin(*reserved) & (v != F.lit("")) & v.isNotNull())
        if metadata_tags is None
        else (
            lambda k, v: k.isin(*metadata_tags)
            & ~k.isin(*reserved)
            & (v != F.lit(""))
            & v.isNotNull()
        )
    )
    metadata = F.map_filter(props, keep)
    return [
        F.lit(source).alias("source"),
        identifier.alias("identifier"),
        smiles.alias("smiles"),
        metadata.alias("metadata"),
    ]


def rdkit_available() -> bool:
    try:  # pragma: no cover - depends on runtime image
        import rdkit  # noqa: F401

        return True
    except ImportError:
        return False


def with_canonical_smiles(df: DataFrame, col: str = "smiles") -> DataFrame:
    """Add ``canonical_smiles`` via an RDKit pandas UDF (Arrow-batched).

    Raises ``NotImplementedError`` when RDKit is absent — callers opt in
    explicitly, per the reference's planned-but-optional chemistry layer.
    """
    if not rdkit_available():
        raise NotImplementedError(
            "RDKit is not installed in this runtime; canonical-SMILES "
            "normalization is gated off (reference plans it in "
            "docs/system-plan.md:24)."
        )

    import pandas as pd  # local import keeps the module import-light

    @F.pandas_udf(T.StringType())
    def _canon(s: pd.Series) -> pd.Series:  # pragma: no cover - needs rdkit
        from rdkit import Chem

        def one(x):
            if x is None:
                return None
            mol = Chem.MolFromSmiles(x)
            return Chem.MolToSmiles(mol) if mol is not None else None

        return s.map(one)

    return df.withColumn("canonical_smiles", _canon(F.col(col)))


def ngram_fingerprint(col_name: str, *, n: int = 3, bits: int = 256) -> Column:
    """Hash-folded character-n-gram fingerprint of a SMILES column.

    RDKit-free stand-in for Morgan fingerprints (the reference plans real
    chemistry descriptors, ``docs/system-plan.md:24-25``): every character
    n-gram sets one of ``bits`` positions via a crc32-folded hash. Output is
    a sorted array of set bit positions (sparse form) — pure codegen
    expressions, usable for Tanimoto similarity joins at scale.
    """
    # sequence(1, 0) DESCENDS in Spark (it never returns empty), so strings
    # shorter than n would produce phantom grams — keep only exact-n grams.
    grams = F.expr(
        f"filter(transform(sequence(1, greatest(length({col_name}) - {n - 1}, 1)),"
        f" i -> substr({col_name}, i, {n})), g -> length(g) = {n})"
    )
    hashed = F.transform(
        grams, lambda g: F.pmod(F.crc32(g.cast("binary")), F.lit(bits)).cast("int")
    )
    return F.sort_array(F.array_distinct(hashed))


def tanimoto(a: Column, b: Column) -> Column:
    """Tanimoto (Jaccard) similarity of two sparse bit-position arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
