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

import pandas as pd
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


def with_canonical_smiles(
    df: DataFrame, col: str = "smiles", engine: str = "auto"
) -> DataFrame:
    """Add ``canonical_smiles`` via an Arrow-batched pandas UDF.

    ``engine="rdkit"`` uses RDKit (full fidelity; raises when absent);
    ``engine="subset"`` uses the pure-Python documented-subset canonicalizer
    (:mod:`..functions.chem`); ``engine="auto"`` prefers RDKit when
    installed and falls back to the subset engine otherwise, so the
    transform is always executable in this runtime.
    """
    if engine not in ("auto", "rdkit", "subset"):
        raise ValueError(f"unknown canonicalization engine: {engine!r}")
    use_rdkit = engine == "rdkit" or (engine == "auto" and rdkit_available())
    if engine == "rdkit" and not rdkit_available():
        raise NotImplementedError(
            "RDKit is not installed in this runtime; use engine='subset' or "
            "'auto' (reference plans the RDKit layer in docs/system-plan.md:24)."
        )

    if use_rdkit:

        @F.pandas_udf(T.StringType())
        def _canon(s: pd.Series) -> pd.Series:  # pragma: no cover - needs rdkit
            from rdkit import Chem

            def one(x):
                if x is None:
                    return None
                mol = Chem.MolFromSmiles(x)
                return Chem.MolToSmiles(mol) if mol is not None else None

            return s.map(one)

    else:

        @F.pandas_udf(T.StringType())
        def _canon(s: pd.Series) -> pd.Series:
            from .chem import try_canonical_smiles

            return s.map(try_canonical_smiles)

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


# Atom symbols ordered so two-letter symbols match before their one-letter
# prefixes (Cl before C, Br before B); approximate monoisotopic-ish masses.
_ATOM_MASSES = (
    ("Cl", 35.45),
    ("Br", 79.90),
    ("Si", 28.09),
    ("C", 12.011),
    ("N", 14.007),
    ("O", 15.999),
    ("S", 32.06),
    ("P", 30.974),
    ("F", 18.998),
    ("I", 126.90),
)


def smiles_descriptors(df: DataFrame, col: str = "smiles") -> DataFrame:
    """Append heuristic structure descriptors computed from SMILES text.

    RDKit-free approximations (real descriptors are the gated RDKit path,
    :func:`with_canonical_smiles`): per-element atom counts via regex, an
    approximate molecular weight from those counts, ring count from SMILES
    ring-closure digit pairs, and Lipinski-style flags. Deterministic, pure
    codegen — usable as a 100 TB pre-filter before exact chemistry.
    """
    # Bracket expressions ([NH3+], [13C], [Na+]) carry charges, H counts and
    # isotopes whose digits/letters would corrupt naive counting — strip
    # them first (their atoms are excluded from the heuristic counts; the
    # exact path is the RDKit UDF). Then strip two-letter symbols so their
    # one-letter prefixes (C in Cl, B in Br) aren't double-counted.
    base = F.regexp_replace(F.col(col), r"\[[^\]]*\]", "")
    rest = F.regexp_replace(base, "Cl|Br|Si", "")

    def occurrences(src: Column, pat: str) -> Column:
        return (F.length(src) - F.length(F.regexp_replace(src, pat, ""))) / len(pat)

    counts: dict[str, Column] = {}
    for sym, _mass in _ATOM_MASSES:
        if len(sym) == 2:
            counts[sym] = occurrences(base, sym).cast("int")
        else:
            # upper = aliphatic, lower = aromatic spelling of the same atom
            counts[sym] = (
                occurrences(rest, sym) + occurrences(rest, sym.lower())
            ).cast("int")

    mw = None
    for sym, mass in _ATOM_MASSES:
        term = counts[sym].cast("double") * mass
        mw = term if mw is None else mw + term
    # ring closures: each ring contributes two markers — either single
    # digits or %nn two-digit forms (counted separately, then paired)
    no_pct = F.regexp_replace(base, r"%[0-9][0-9]", "")
    pct_markers = (F.length(base) - F.length(no_pct)) / 3
    digit_markers = F.length(no_pct) - F.length(
        F.regexp_replace(no_pct, r"[0-9]", "")
    )
    ring_count = ((digit_markers + pct_markers) / 2).cast("int")
    heavy_atoms = None
    for sym, _mass in _ATOM_MASSES:
        heavy_atoms = counts[sym] if heavy_atoms is None else heavy_atoms + counts[sym]

    return (
        df.withColumn("n_C", counts["C"])
        .withColumn("n_N", counts["N"])
        .withColumn("n_O", counts["O"])
        .withColumn("heavy_atoms", heavy_atoms)
        .withColumn("approx_mw", F.round(mw, 2))
        .withColumn("ring_count", ring_count)
        .withColumn("lipinski_mw_ok", F.round(mw, 2) <= F.lit(500.0))
        # Lipinski HBA is simply N+O count — already in the regex census.
        # (HBD needs the implicit-H valence model and lives on the parser
        # path: operators/chemistry.chem_lipinski_gate.)
        .withColumn("n_hba", counts["N"] + counts["O"])
        .withColumn("lipinski_hba_ok", (counts["N"] + counts["O"]) <= 10)
        .withColumn("druglike_size", heavy_atoms.between(3, 50))
    )
