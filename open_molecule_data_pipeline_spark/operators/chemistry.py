"""Chemistry normalization queries: executable canonical-SMILES path.

The reference plans canonical-SMILES normalization behind RDKit
(``docs/system-plan.md:24``); this runtime has no RDKit, so the driver-
checkable path runs the pure-Python documented-subset canonicalizer
(``functions/chem.py``) through the same Arrow-batched pandas-UDF plumbing
the RDKit engine uses (``functions/molecule.with_canonical_smiles``).

The fixture below is a fixed set of molecules, each spelled several
equivalent ways (different atom orders, branch orders, ring numbering,
redundant bond marks, stripped stereo), plus one malformed entry. The query
canonicalizes every spelling and groups by the canonical form — equivalent
spellings MUST collapse to one row. The expected canonical strings are
literals, so the oracle is a VALUES table and the driver verifies the whole
canonicalization round-trip by hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.molecule import with_canonical_smiles
from ..registry import register

# (group, spelling) — every spelling in a group is the same molecule.
_SPELLINGS = [
    ("ethanol", "CCO"),
    ("ethanol", "OCC"),
    ("ethanol", "C(O)C"),
    ("ethanol", "C(C)O"),
    ("toluene", "Cc1ccccc1"),
    ("toluene", "c1ccccc1C"),
    ("toluene", "c1ccc(C)cc1"),
    ("toluene", "c1cc(C)ccc1"),
    ("aminoethanol", "CC(N)O"),
    ("aminoethanol", "CC(O)N"),
    ("aminoethanol", "OC(C)N"),
    ("aminoethanol", "NC(C)O"),
    ("aminoethanol", "C(C)(N)O"),
    ("kekule_benzene", "C1=CC=CC=C1"),
    ("kekule_benzene", "C=1C=CC=CC=1"),
    ("aspirin", "CC(=O)OC1=CC=CC=C1C(=O)O"),
    ("aspirin", "OC(=O)C1=CC=CC=C1OC(C)=O"),
    ("aspirin", "C1=CC=C(C(=C1)C(=O)O)OC(=O)C"),
    ("ammonium_chloride", "[NH4+].[Cl-]"),
    ("ammonium_chloride", "[Cl-].[NH4+]"),
    ("benzonitrile", "N#Cc1ccccc1"),
    ("benzonitrile", "c1ccccc1C#N"),
    ("butene_stereo", "C/C=C/C"),
    ("butene_stereo", "CC=CC"),
    # explicit single bond between aromatic rings: must stay distinct from
    # the aromatic-bonded spelling (the writer emits '-' explicitly when the
    # parser default for the atom pair would be ':'), and the second ring's
    # closure digit is reused after the first ring closes
    ("biphenyl_single", "c1ccccc1-c1ccccc1"),
    ("biphenyl_single", "c1ccc(-c2ccccc2)cc1"),
    ("biphenyl_aromatic", "c1ccccc1c1ccccc1"),
    ("biphenyl_aromatic", "c1ccc(c2ccccc2)cc1"),
    # fused rings: closure digits overlap, so no reuse — numbering must be
    # invariant to the input's digit choice
    ("naphthalene", "c1ccc2ccccc2c1"),
    ("naphthalene", "c2ccc1ccccc1c2"),
    ("naphthalene", "c1cc2ccccc2cc1"),
    ("malformed", "C1CC"),  # unclosed ring -> NULL canonical
]

# golden canonical forms (asserted order-invariant in tests/test_chem.py)
_CANONICAL_ORACLE = """
SELECT canonical_smiles, cast(n_spellings AS BIGINT) AS n_spellings
FROM (VALUES
  ('CCO', 4),
  ('Cc1ccccc1', 4),
  ('CC(N)O', 5),
  ('C=1C=CC=CC=1', 2),
  ('CC(=O)OC1=CC=CC=C1C(O)=O', 3),
  ('[Cl-].[NH4+]', 2),
  ('C(#N)c1ccccc1', 2),
  ('CC=CC', 2),
  ('c1ccc(cc1)-c1ccccc1', 2),
  ('c1ccc(cc1)c1ccccc1', 2),
  ('c1ccc2ccccc2c1', 3),
  (NULL, 1)
) t(canonical_smiles, n_spellings)
"""


@register("chem_canonical_smiles", oracle=_CANONICAL_ORACLE, tags=("chemistry", "dedup"))
def chem_canonical_smiles(spark, sf_dir):
    df = spark.createDataFrame(_SPELLINGS, "grp string, smiles string")
    canon = with_canonical_smiles(df, engine="subset")
    return canon.groupBy("canonical_smiles").agg(
        F.count(F.lit(1)).alias("n_spellings")
    )


# --------------------------------------------------------------------------
# Fingerprint-Tanimoto similarity pairs: the chemistry flavor of near-dup
# detection (compound library dedup / analog search). Fingerprints are the
# RDKit-free hash-folded char-3-gram bit sets of functions/molecule.py —
# pure codegen — and Tanimoto is set algebra over the sparse bit arrays.
# On this 10-molecule fixture the pair join is a broadcast self-join; at
# library scale the SAME verify stage sits behind an LSH band join on
# fingerprint-bit bands exactly like dedup_minhash_lsh_pairs (fingerprint
# bits ARE a minhash-able set), so cost tracks collisions, never n^2.
# The oracle is a VALUES table derived INDEPENDENTLY (python zlib.crc32
# replication of the fingerprint, not a Spark snapshot) — crc32 has no
# DuckDB twin, so cross-engine recomputation is impossible by construction.
# --------------------------------------------------------------------------

_TANIMOTO_MOLS = [
    ("ethanol", "CCO"),
    ("toluene", "Cc1ccccc1"),
    ("aminoethanol", "CC(N)O"),
    ("aspirin", "CC(=O)OC1=CC=CC=C1C(O)=O"),
    ("benzonitrile", "C(#N)c1ccccc1"),
    ("biphenyl", "c1ccc(cc1)-c1ccccc1"),
    ("naphthalene", "c1ccc2ccccc2c1"),
    ("phenol", "Oc1ccccc1"),
    ("anisole", "COc1ccccc1"),
    ("styrene", "C=Cc1ccccc1"),
]

_TANIMOTO_THRESHOLD = 0.2

_TANIMOTO_ORACLE = """
SELECT * FROM (VALUES
  ('anisole', 'benzonitrile', 0.363636),
  ('anisole', 'biphenyl', 0.307692),
  ('anisole', 'naphthalene', 0.3),
  ('anisole', 'phenol', 0.833333),
  ('anisole', 'styrene', 0.444444),
  ('anisole', 'toluene', 0.571429),
  ('benzonitrile', 'biphenyl', 0.333333),
  ('benzonitrile', 'naphthalene', 0.230769),
  ('benzonitrile', 'phenol', 0.4),
  ('benzonitrile', 'styrene', 0.333333),
  ('benzonitrile', 'toluene', 0.4),
  ('biphenyl', 'naphthalene', 0.2),
  ('biphenyl', 'phenol', 0.333333),
  ('biphenyl', 'styrene', 0.384615),
  ('biphenyl', 'toluene', 0.333333),
  ('naphthalene', 'phenol', 0.333333),
  ('naphthalene', 'styrene', 0.272727),
  ('naphthalene', 'toluene', 0.333333),
  ('phenol', 'styrene', 0.5),
  ('phenol', 'toluene', 0.666667),
  ('styrene', 'toluene', 0.714286)
) t(mol_a, mol_b, tanimoto)
"""


@register(
    "chem_tanimoto_pairs", oracle=_TANIMOTO_ORACLE, tags=("chemistry", "dedup")
)
def chem_tanimoto_pairs(spark, sf_dir):
    from ..functions.molecule import ngram_fingerprint, tanimoto

    mols = spark.createDataFrame(_TANIMOTO_MOLS, "name string, smiles string")
    fps = mols.select("name", ngram_fingerprint("smiles").alias("fp"))
    a = fps.select(F.col("name").alias("mol_a"), F.col("fp").alias("fp_a"))
    b = fps.select(F.col("name").alias("mol_b"), F.col("fp").alias("fp_b"))
    sim = tanimoto(F.col("fp_a"), F.col("fp_b"))
    return (
        a.join(F.broadcast(b), F.col("mol_a") < F.col("mol_b"))
        .select("mol_a", "mol_b", F.round(sim, 6).alias("tanimoto"))
        .filter(F.col("tanimoto") >= _TANIMOTO_THRESHOLD)
    )
