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

import pandas as pd
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


# --------------------------------------------------------------------------
# Atom census (r9): heavy-atom composition + net formal charge per
# spelling, computed two INDEPENDENT ways — the Spark side walks the
# subset-grammar PARSER's atom list (functions/chem.py), the oracle
# re-derives the counts from the raw SMILES text with RE2 regex algebra
# (bracket atoms split out, two-letter elements subtracted from their
# one-letter prefixes since RE2 has no lookahead). Agreement is a
# differential spec check of the parser's atom enumeration on every
# fixture spelling — a tokenizer bug (e.g. counting the 'C' inside 'Cl')
# shows up as a census mismatch even when canonicalization round-trips.
# Charge spec: count of '+' minus '-' inside bracket atoms (the fixture
# subset has no digit-multiplied charges; documented).
# --------------------------------------------------------------------------

_CENSUS_HALOGENS = ("F", "I", "Cl", "Br")


def _census_oracle() -> str:
    values = ",\n  ".join(
        f"('{g}', '{s}')" for g, s in _SPELLINGS if g != "malformed"
    )
    rest_count = "len(regexp_extract_all(rest, '{pat}'))"
    bel = "list_filter(bel, x -> x IN ({els}))"

    def n_elem(upper: str, lower: str) -> str:
        parts = [rest_count.format(pat=upper)]
        if upper == "C":
            parts.append("- " + rest_count.format(pat="Cl"))
        if upper == "B":
            parts.append("- " + rest_count.format(pat="Br"))
        parts.append("+ " + rest_count.format(pat=lower))
        parts.append(
            "+ len(" + bel.format(els=f"'{upper}', '{lower}'") + ")"
        )
        return " ".join(parts)

    halogen = " + ".join(
        rest_count.format(pat=h) for h in _CENSUS_HALOGENS
    ) + " + len(list_filter(bel, x -> x IN ('F', 'I', 'Cl', 'Br')))"
    total = (
        "len(regexp_extract_all(rest, 'Cl|Br|[BCNOPSFI]|[bcnops]')) + len(bel)"
    )
    return f"""
WITH m AS (
  SELECT grp, smiles FROM (VALUES
  {values}
  ) v(grp, smiles)
),
p AS (
  SELECT grp, smiles,
         regexp_replace(smiles, '\\[[^\\]]*\\]', '', 'g') AS rest,
         list_transform(regexp_extract_all(smiles, '\\[[^\\]]*\\]'),
                        b -> regexp_extract(b, '\\[\\d*([A-Za-z][a-z]?)', 1)
         ) AS bel,
         coalesce(list_sum(list_transform(
           regexp_extract_all(smiles, '\\[[^\\]]*\\]'),
           b -> len(regexp_extract_all(b, '\\+'))
                - len(regexp_extract_all(b, '-')))), 0) AS net_charge
  FROM m
)
SELECT grp, smiles,
       cast({n_elem('C', 'c')} AS BIGINT) AS n_c,
       cast({n_elem('N', 'n')} AS BIGINT) AS n_n,
       cast({n_elem('O', 'o')} AS BIGINT) AS n_o,
       cast({n_elem('S', 's')} AS BIGINT) AS n_s,
       cast({halogen} AS BIGINT) AS n_halogen,
       cast({total} - ({n_elem('C', 'c')}) - ({n_elem('N', 'n')})
            - ({n_elem('O', 'o')}) - ({n_elem('S', 's')}) - ({halogen})
            AS BIGINT) AS n_other,
       cast(net_charge AS BIGINT) AS net_charge
FROM p
"""


@register(
    "chem_atom_census", oracle=_census_oracle(), tags=("chemistry",)
)
def chem_atom_census(spark, sf_dir):
    import re as _re

    from ..functions.chem import parse_smiles

    @F.pandas_udf(
        "n_c long, n_n long, n_o long, n_s long, n_halogen long, "
        "n_other long, net_charge long"
    )
    def census(col: pd.Series) -> pd.DataFrame:
        rows = []
        for s in col:
            counts = {"C": 0, "N": 0, "O": 0, "S": 0, "hal": 0, "other": 0}
            charge = 0
            atoms, _ = parse_smiles(s)
            for a in atoms:
                label = a.label
                if label.startswith("["):
                    body = label[1:-1]
                    elem = _re.match(r"\d*([A-Za-z][a-z]?)", body).group(1)
                    charge += body.count("+") - body.count("-")
                else:
                    elem = label
                cap = elem[0].upper() + elem[1:]
                if cap in ("F", "I", "Cl", "Br"):
                    counts["hal"] += 1
                elif cap in ("C", "N", "O", "S"):
                    counts[cap] += 1
                else:
                    counts["other"] += 1
            rows.append(
                (counts["C"], counts["N"], counts["O"], counts["S"],
                 counts["hal"], counts["other"], charge)
            )
        return pd.DataFrame(
            rows,
            columns=["n_c", "n_n", "n_o", "n_s", "n_halogen", "n_other",
                     "net_charge"],
        )

    df = spark.createDataFrame(
        [(g, s) for g, s in _SPELLINGS if g != "malformed"],
        "grp string, smiles string",
    )
    return df.select("grp", "smiles", census("smiles").alias("x")).select(
        "grp", "smiles", "x.*"
    )
