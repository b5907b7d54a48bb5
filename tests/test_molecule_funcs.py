"""Chemistry-adjacent functions: fingerprints, Tanimoto, RDKit gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_molecule_data_pipeline_spark.functions.molecule import (
    ngram_fingerprint,
    rdkit_available,
    tanimoto,
    with_canonical_smiles,
)


@pytest.fixture()
def mols(spark):
    rows = [
        ("CID1", "CC(=O)OC1=CC=CC=C1C(=O)O"),  # aspirin
        ("CID2", "CC(=O)OC1=CC=CC=C1C(=O)O"),  # identical
        ("CID3", "CC(=O)NC1=CC=C(O)C=C1"),     # paracetamol (related)
        ("CID4", "C"),                          # methane (unrelated)
    ]
    return spark.createDataFrame(rows, "identifier string, smiles string")


def test_ngram_fingerprint_properties(mols):
    df = mols.withColumn("fp", ngram_fingerprint("smiles"))
    rows = {r.identifier: r.fp for r in df.collect()}
    assert rows["CID1"] == rows["CID2"]  # deterministic
    assert rows["CID1"] != rows["CID3"]
    assert rows["CID1"] == sorted(set(rows["CID1"]))  # sorted distinct
    assert all(0 <= b < 256 for b in rows["CID1"])
    # methane ("C") is shorter than the n-gram size -> empty fingerprint
    assert rows["CID4"] == []


def test_tanimoto_similarity_ordering(mols):
    fp = mols.withColumn("fp", ngram_fingerprint("smiles"))
    a = fp.alias("a")
    b = fp.alias("b")
    pairs = (
        a.join(b, F.col("a.identifier") < F.col("b.identifier"))
        .select(
            F.col("a.identifier").alias("ida"),
            F.col("b.identifier").alias("idb"),
            tanimoto(F.col("a.fp"), F.col("b.fp")).alias("sim"),
        )
        .collect()
    )
    sims = {(r.ida, r.idb): r.sim for r in pairs}
    assert sims[("CID1", "CID2")] == 1.0  # identical molecules
    # related molecule is more similar than the unrelated one
    assert sims[("CID1", "CID3")] > sims[("CID1", "CID4")]
    assert sims[("CID1", "CID4")] == 0.0  # empty fingerprint -> 0, not NaN


def test_rdkit_gating(mols):
    if rdkit_available():  # pragma: no cover - not in this image
        out = with_canonical_smiles(mols, engine="rdkit")
        assert "canonical_smiles" in out.columns
    else:
        with pytest.raises(NotImplementedError, match="RDKit"):
            with_canonical_smiles(mols, engine="rdkit")


@pytest.mark.rdkit
def test_rdkit_engine_full_fidelity(spark):  # pragma: no cover - needs rdkit
    """Runs only where RDKit is installed (auto-skipped here): the rdkit
    engine must reproduce RDKit's own canonical forms, and must agree with
    the subset engine on canonical-EQUIVALENCE (two spellings of the same
    molecule land in the same class under both engines) for molecules
    inside the subset grammar."""
    pytest.importorskip("rdkit")
    from rdkit import Chem

    spellings = ["OCC", "C(C)O", "CCO", "CC(=O)O", "OC(=O)C"]
    df = spark.createDataFrame([(s,) for s in spellings], "smiles string")
    rd = {
        r.smiles: r.canonical_smiles
        for r in with_canonical_smiles(df, engine="rdkit").collect()
    }
    for s in spellings:
        assert rd[s] == Chem.MolToSmiles(Chem.MolFromSmiles(s))
    sub = {
        r.smiles: r.canonical_smiles
        for r in with_canonical_smiles(df, engine="subset").collect()
    }
    # same partition into equivalence classes under both engines
    for a in spellings:
        for b in spellings:
            assert (rd[a] == rd[b]) == (sub[a] == sub[b]), (a, b)


def test_subset_canonicalization_always_executable(mols):
    """engine='auto' must produce canonical SMILES in every runtime: RDKit
    when present, the pure-Python subset engine otherwise."""
    out = with_canonical_smiles(mols).select("smiles", "canonical_smiles")
    rows = {r["smiles"]: r["canonical_smiles"] for r in out.collect()}
    assert rows, "fixture produced no molecules"
    assert all(v is None or isinstance(v, str) for v in rows.values())
    # equivalent spellings collapse through the Spark path too
    from open_molecule_data_pipeline_spark.functions.chem import canonical_smiles

    for smiles, canon in rows.items():
        if canon is not None:
            assert canon == canonical_smiles(smiles)


def test_smiles_descriptors(mols):
    from open_molecule_data_pipeline_spark.functions.molecule import (
        smiles_descriptors,
    )

    out = {r.identifier: r for r in smiles_descriptors(mols).collect()}
    aspirin = out["CID1"]
    # aspirin C9H8O4: 9 carbons, 4 oxygens, 1 ring (one ring-closure pair)
    assert aspirin.n_C == 9
    assert aspirin.n_O == 4
    assert aspirin.n_N == 0
    assert aspirin.ring_count == 1
    assert aspirin.heavy_atoms == 13
    # 9*12.011 + 4*15.999 = 172.1 (heavy atoms only; H excluded by design)
    assert abs(aspirin.approx_mw - (9 * 12.011 + 4 * 15.999)) < 0.01
    assert aspirin.lipinski_mw_ok and aspirin.druglike_size
    methane = out["CID4"]
    assert methane.n_C == 1 and methane.heavy_atoms == 1
    assert not methane.druglike_size  # below the size floor
    paracetamol = out["CID3"]
    assert paracetamol.n_N == 1 and paracetamol.n_C == 8
    # Lipinski HBA = N + O count (r10): aspirin 0+4, paracetamol 1+2
    assert aspirin.n_hba == 4 and aspirin.lipinski_hba_ok
    assert paracetamol.n_hba == 3 and paracetamol.lipinski_hba_ok
