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


# --------------------------------------------------------------------------
# Lipinski rule-of-five gate + substructure alert screen (r10): the
# reference PLANS "Lipinski, PAINS filters" (docs/system-plan.md:22,
# SURVEY.md:163); this closes the row with an executable, oracle-checked
# path. The Spark side derives every descriptor from the subset parser's
# atom/bond lists (functions/chem.py) through an implicit-hydrogen valence
# model:
#   - bracket atoms carry their explicit H count ([NH4+] -> 4, [O-] -> 0);
#   - aliphatic organic-subset atoms get valence - sum(bond orders)
#     (B3 C4 N3 O2 P3 S2, halogens 1; '-'/':' = 1, '=' = 2, '#' = 3),
#     clamped at 0 (hypervalent spellings like N(=O)=O);
#   - aromatic 'c' gets 3 - sum(orders); other aromatic atoms get 0
#     (pyridine-type default; the fixture has no aromatic N/O/S).
# Lipinski descriptors: HBD = hydrogens on N/O, HBA = count of N+O atoms,
# MW from the shared approximate mass table + 1.008 per H, reported as
# integer centi-daltons (no FP tie in the fixture lands near .5). Alerts
# are structural, from the bond list: nitro (N with >=2 O neighbors, >=1
# N=O double), azo (N=N between two non-nitro... any two N), peroxide
# (O-O single). The ORACLE is a hand-derived golden table per molecule
# GROUP (literature formulas: ethanol C2H6O 46.07, aspirin C9H8O4 180.16,
# nitrobenzene C6H5NO2 123.11, ...), joined to every fixture SPELLING with
# the rule flags recomputed in SQL — so the driver checks BOTH the valence
# model against independent chemistry AND that equivalent spellings
# produce identical descriptors (spelling invariance).
# --------------------------------------------------------------------------

_RO5_SPELLINGS = [
    ("ethanol", "CCO"),
    ("ethanol", "OCC"),
    ("toluene", "Cc1ccccc1"),
    ("toluene", "c1ccc(C)cc1"),
    ("aminoethanol", "CC(N)O"),
    ("aminoethanol", "NC(C)O"),
    ("aspirin", "CC(=O)OC1=CC=CC=C1C(=O)O"),
    ("aspirin", "OC(=O)C1=CC=CC=C1OC(C)=O"),
    ("phenol", "Oc1ccccc1"),
    ("phenol", "c1ccc(O)cc1"),
    ("ammonium_chloride", "[NH4+].[Cl-]"),
    ("ammonium_chloride", "[Cl-].[NH4+]"),
    ("nitrobenzene", "c1ccccc1[N+](=O)[O-]"),
    ("nitrobenzene", "O=[N+]([O-])c1ccccc1"),
    ("nitrobenzene", "c1ccccc1N(=O)=O"),
    ("azobenzene", "c1ccccc1N=Nc1ccccc1"),
    ("azobenzene", "c1ccc(N=Nc2ccccc2)cc1"),
    ("hydrogen_peroxide", "OO"),
    ("heptaol", "OCC(O)C(O)C(O)C(O)C(O)CO"),
    ("peg_dimethyl", "CO" + "CCO" * 10 + "C"),
    ("tritetracontane", "C" * 43),
]

# grp -> (hbd, hba, mw_centi, nitro, azo, peroxide): hand-derived from the
# literature formulas with the shared mass table (C 12.011 N 14.007
# O 15.999 Cl 35.45, H 1.008) — NOT a Spark snapshot.
_RO5_GOLDEN = [
    ("ethanol", 1, 1, 4607, 0, 0, 0),            # C2H6O   46.069
    ("toluene", 0, 0, 9214, 0, 0, 0),            # C7H8    92.141
    ("aminoethanol", 3, 2, 6108, 0, 0, 0),       # C2H7NO  61.084
    ("aspirin", 1, 4, 18016, 0, 0, 0),           # C9H8O4 180.159
    ("phenol", 1, 1, 9411, 0, 0, 0),             # C6H6O   94.113
    ("ammonium_chloride", 4, 1, 5349, 0, 0, 0),  # NH4Cl   53.489
    ("nitrobenzene", 0, 3, 12311, 1, 0, 0),      # C6H5NO2 123.111
    ("azobenzene", 0, 2, 18223, 0, 1, 0),        # C12H10N2 182.226
    ("hydrogen_peroxide", 2, 2, 3401, 0, 0, 1),  # H2O2    34.014
    ("heptaol", 7, 7, 21220, 0, 0, 0),           # C7H16O7 212.198
    ("peg_dimethyl", 0, 11, 48660, 0, 0, 0),     # C22H46O11 486.599
    ("tritetracontane", 0, 0, 60518, 0, 0, 0),   # C43H88  605.177
]


def _ro5_oracle() -> str:
    spellings = ",\n  ".join(f"('{g}', '{s}')" for g, s in _RO5_SPELLINGS)
    golden = ",\n  ".join(
        f"('{g}', {h}, {a}, {m}, {ni}, {az}, {px})"
        for g, h, a, m, ni, az, px in _RO5_GOLDEN
    )
    return f"""
WITH sp AS (SELECT * FROM (VALUES
  {spellings}
) v(grp, smiles)),
gd AS (SELECT * FROM (VALUES
  {golden}
) v(grp, hbd, hba, mw_centi, alert_nitro, alert_azo, alert_peroxide))
SELECT sp.grp, sp.smiles,
       cast(hbd AS BIGINT) AS hbd,
       cast(hba AS BIGINT) AS hba,
       cast(mw_centi AS BIGINT) AS mw_centi,
       cast(CASE WHEN mw_centi <= 50000 THEN 1 ELSE 0 END AS BIGINT) AS mw_ok,
       cast(CASE WHEN hbd <= 5 THEN 1 ELSE 0 END AS BIGINT) AS hbd_ok,
       cast(CASE WHEN hba <= 10 THEN 1 ELSE 0 END AS BIGINT) AS hba_ok,
       cast(CASE WHEN mw_centi <= 50000 AND hbd <= 5 AND hba <= 10
            THEN 1 ELSE 0 END AS BIGINT) AS ro5_pass,
       cast(alert_nitro AS BIGINT) AS alert_nitro,
       cast(alert_azo AS BIGINT) AS alert_azo,
       cast(alert_peroxide AS BIGINT) AS alert_peroxide,
       cast(CASE WHEN mw_centi <= 50000 AND hbd <= 5 AND hba <= 10
                  AND alert_nitro + alert_azo + alert_peroxide = 0
            THEN 1 ELSE 0 END AS BIGINT) AS druglike
FROM sp JOIN gd USING (grp)
"""


_RO5_VALENCE = {"B": 3, "C": 4, "N": 3, "O": 2, "P": 3, "S": 2,
                "F": 1, "I": 1, "Cl": 1, "Br": 1, "Si": 4}
_RO5_MASSES = {"C": 12.011, "N": 14.007, "O": 15.999, "S": 32.06,
               "P": 30.974, "F": 18.998, "I": 126.90, "Cl": 35.45,
               "Br": 79.90, "B": 10.81, "Si": 28.09}
_RO5_ORDER = {"-": 1, ":": 1, "=": 2, "#": 3}


def _ro5_descriptors(smiles: str) -> tuple[int, int, int, int, int, int]:
    """(hbd, hba, mw_centi, nitro, azo, peroxide) from the parsed graph."""
    import re as _re

    from ..functions.chem import parse_smiles

    atoms, bonds = parse_smiles(smiles)
    n = len(atoms)
    elem: list[str] = []
    hyd: list[int] = []
    order_sum = [0] * n
    for (a, b), sym in bonds.items():
        order_sum[a] += _RO5_ORDER[sym]
        order_sum[b] += _RO5_ORDER[sym]
    for i, at in enumerate(atoms):
        if at.label.startswith("["):
            body = at.label[1:-1]
            e = _re.match(r"\d*([A-Za-z][a-z]?)", body).group(1)
            e = e[0].upper() + e[1:]
            # H token must follow the element symbol, so the element's own
            # letters never self-match ([OH2] -> 2, [NH4+] -> 4, [O-] -> 0)
            mh = _re.match(r"\d*[A-Za-z][a-z]?H(\d*)", body)
            h = int(mh.group(1) or "1") if mh else 0
        elif at.aromatic:
            e = at.label.upper()
            h = max(0, 3 - order_sum[i]) if at.label == "c" else 0
        else:
            e = at.label
            h = max(0, _RO5_VALENCE.get(e, 0) - order_sum[i])
        elem.append(e)
        hyd.append(h)
    hbd = sum(h for e, h in zip(elem, hyd) if e in ("N", "O"))
    hba = sum(1 for e in elem if e in ("N", "O"))
    mw = sum(_RO5_MASSES.get(e, 0.0) for e in elem) + sum(hyd) * 1.008
    mw_centi = int(round(mw * 100))
    nitro_n: set[int] = set()
    for i in range(n):
        if elem[i] != "N":
            continue
        o_nbrs = [j for j in atoms[i].neighbors if elem[j] == "O"]
        has_double = any(
            bonds[(min(i, j), max(i, j))] == "=" for j in o_nbrs
        )
        if len(o_nbrs) >= 2 and has_double:
            nitro_n.add(i)
    azo = int(any(
        sym == "=" and elem[a] == "N" and elem[b] == "N"
        for (a, b), sym in bonds.items()
    ))
    peroxide = int(any(
        sym == "-" and elem[a] == "O" and elem[b] == "O"
        for (a, b), sym in bonds.items()
    ))
    return hbd, hba, mw_centi, int(bool(nitro_n)), azo, peroxide


@register("chem_lipinski_gate", oracle=_ro5_oracle(), tags=("chemistry", "filter"))
def chem_lipinski_gate(spark, sf_dir):
    @F.pandas_udf(
        "hbd long, hba long, mw_centi long, "
        "alert_nitro long, alert_azo long, alert_peroxide long"
    )
    def ro5(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_ro5_descriptors(s) for s in col],
            columns=["hbd", "hba", "mw_centi",
                     "alert_nitro", "alert_azo", "alert_peroxide"],
        )

    df = spark.createDataFrame(_RO5_SPELLINGS, "grp string, smiles string")
    mw_ok = (F.col("mw_centi") <= 50000).cast("long")
    hbd_ok = (F.col("hbd") <= 5).cast("long")
    hba_ok = (F.col("hba") <= 10).cast("long")
    ro5_pass = ((F.col("mw_centi") <= 50000) & (F.col("hbd") <= 5)
                & (F.col("hba") <= 10))
    alert_free = (
        F.col("alert_nitro") + F.col("alert_azo") + F.col("alert_peroxide")
        == 0
    )
    return (
        df.select("grp", "smiles", ro5("smiles").alias("x"))
        .select("grp", "smiles", "x.*")
        .withColumn("mw_ok", mw_ok)
        .withColumn("hbd_ok", hbd_ok)
        .withColumn("hba_ok", hba_ok)
        .withColumn("ro5_pass", ro5_pass.cast("long"))
        .withColumn("druglike", (ro5_pass & alert_free).cast("long"))
        .select(
            "grp", "smiles", "hbd", "hba", "mw_centi", "mw_ok", "hbd_ok",
            "hba_ok", "ro5_pass", "alert_nitro", "alert_azo",
            "alert_peroxide", "druglike",
        )
    )


# --------------------------------------------------------------------------
# Murcko scaffold extraction (r10): rings + linkers per molecule — the
# standard compound-library clustering key (Bemis & Murcko 1996, basic
# framework variant: iterative terminal-atom pruning; exocyclic =O goes
# with its substituent). The Spark side prunes the PARSED graph and
# re-canonicalizes the surviving induced subgraph through the same
# writer as chem_canonical_smiles, so equivalent spellings provably
# yield one scaffold string. The oracle is a golden table per molecule
# GROUP: ring content hand-verified (aspirin -> the Kekulé benzene,
# phenylbutylamine -> benzene, diphenylmethane/azobenzene keep their
# linkers, acyclic molecules -> NULL), spellings join in so invariance
# is driver-checked. Acyclic -> (NULL, 0).
# --------------------------------------------------------------------------

_MURCKO_SPELLINGS = [
    ("aspirin", "CC(=O)OC1=CC=CC=C1C(=O)O"),
    ("aspirin", "OC(=O)C1=CC=CC=C1OC(C)=O"),
    ("toluene", "Cc1ccccc1"),
    ("toluene", "c1ccc(C)cc1"),
    ("phenol", "Oc1ccccc1"),
    ("phenol", "c1ccc(O)cc1"),
    ("ethanol", "CCO"),
    ("ethanol", "OCC"),
    ("biphenyl", "c1ccccc1-c1ccccc1"),
    ("biphenyl", "c1ccc(-c2ccccc2)cc1"),
    ("diphenylmethane", "c1ccccc1Cc1ccccc1"),
    ("azobenzene", "c1ccccc1N=Nc1ccccc1"),
    ("azobenzene", "c1ccc(N=Nc2ccccc2)cc1"),
    ("phenylbutylamine", "NCCCCc1ccccc1"),
    ("naphthalene", "c1ccc2ccccc2c1"),
    ("naphthalene", "c1cc2ccccc2cc1"),
    ("ammonium_chloride", "[NH4+].[Cl-]"),
    ("dicyclohexylethane", "C1CCCCC1CCC1CCCCC1"),
]

_MURCKO_GOLDEN = [
    ("aspirin", "C=1C=CC=CC=1", 6),
    ("toluene", "c1ccccc1", 6),
    ("phenol", "c1ccccc1", 6),
    ("ethanol", None, 0),
    ("biphenyl", "c1ccc(cc1)-c1ccccc1", 12),
    ("diphenylmethane", "C(c1ccccc1)c1ccccc1", 13),
    ("azobenzene", "N(=Nc1ccccc1)c1ccccc1", 14),
    ("phenylbutylamine", "c1ccccc1", 6),
    ("naphthalene", "c1ccc2ccccc2c1", 10),
    ("ammonium_chloride", None, 0),
    ("dicyclohexylethane", "C1CCC(CC1)CCC1CCCCC1", 14),
]


def _murcko_oracle() -> str:
    spellings = ",\n  ".join(
        f"('{g}', '{s}')" for g, s in _MURCKO_SPELLINGS
    )
    golden = ",\n  ".join(
        "('{}', {}, {})".format(g, "NULL" if sc is None else f"'{sc}'", n)
        for g, sc, n in _MURCKO_GOLDEN
    )
    return f"""
WITH sp AS (SELECT * FROM (VALUES
  {spellings}
) v(grp, smiles)),
gd AS (SELECT * FROM (VALUES
  {golden}
) v(grp, scaffold, n_scaffold_atoms))
SELECT sp.grp, sp.smiles, gd.scaffold,
       cast(gd.n_scaffold_atoms AS BIGINT) AS n_scaffold_atoms
FROM sp JOIN gd USING (grp)
"""


@register(
    "chem_murcko_scaffold",
    oracle=_murcko_oracle(),
    tags=("chemistry", "dedup"),
)
def chem_murcko_scaffold(spark, sf_dir):
    import re as _re

    from ..functions.chem import murcko_scaffold, parse_smiles

    @F.pandas_udf("scaffold string, n_scaffold_atoms long")
    def scaf(col: pd.Series) -> pd.DataFrame:
        rows = []
        for s in col:
            m = murcko_scaffold(s)
            if m is None:
                rows.append((None, 0))
            else:
                rows.append((m, len(parse_smiles(m)[0])))
        return pd.DataFrame(rows, columns=["scaffold", "n_scaffold_atoms"])

    df = spark.createDataFrame(_MURCKO_SPELLINGS, "grp string, smiles string")
    return df.select("grp", "smiles", scaf("smiles").alias("x")).select(
        "grp", "smiles", "x.*"
    )
