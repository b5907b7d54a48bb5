"""Canonical-SMILES subset engine: invariance, idempotence, error paths.

The core property: every spelling of the same molecular graph must map to
ONE canonical string. Beyond hand-written equivalent spellings, a random
re-speller walks the parsed graph from random starts with random neighbor
orders and random ring-closure numbering — hundreds of distinct spellings
per molecule, all of which must collapse.
"""

from __future__ import annotations

import random

import pytest

from open_molecule_data_pipeline_spark.functions.chem import (
    SmilesError,
    canonical_smiles,
    parse_smiles,
    try_canonical_smiles,
)

EQUIVALENT_GROUPS = [
    ["CCO", "OCC", "C(O)C", "C(C)O"],
    ["Cc1ccccc1", "c1ccccc1C", "c1ccc(C)cc1", "c1cc(C)ccc1"],
    ["CC(N)O", "CC(O)N", "OC(C)N", "NC(C)O", "C(C)(N)O"],
    ["C1=CC=CC=C1", "C=1C=CC=CC=1"],
    [
        "CC(=O)OC1=CC=CC=C1C(=O)O",
        "OC(=O)C1=CC=CC=C1OC(C)=O",
        "C1=CC=C(C(=C1)C(=O)O)OC(=O)C",
    ],
    ["[NH4+].[Cl-]", "[Cl-].[NH4+]"],
    ["N#Cc1ccccc1", "c1ccccc1C#N"],
    ["C/C=C/C", "CC=CC"],  # directional bonds strip to single
    ["[C@H](N)(C)O", "[CH](N)(C)O"],  # tetrahedral marks strip
    ["ClCCBr", "BrCCCl"],
    ["C1CC1", "C2CC2", "C%10CC%10"],
]

DISTINCT = ["CCO", "CCN", "CCC", "c1ccccc1", "C1CCCCC1", "CC(=O)O", "CCOC", "CC=O"]


@pytest.mark.parametrize("group", EQUIVALENT_GROUPS)
def test_equivalent_spellings_collapse(group):
    assert len({canonical_smiles(s) for s in group}) == 1


def test_distinct_molecules_stay_distinct():
    outs = [canonical_smiles(s) for s in DISTINCT]
    assert len(set(outs)) == len(DISTINCT)


def test_idempotent():
    for s in DISTINCT + [g[0] for g in EQUIVALENT_GROUPS]:
        c = canonical_smiles(s)
        assert canonical_smiles(c) == c, s


def _random_spelling(smiles: str, rng: random.Random) -> str:
    """Render a random but equivalent spelling of the parsed graph.

    Pass 1 walks the graph with random starts/neighbor orders, recording
    tree children and ring-closure digits on BOTH endpoints; pass 2 renders
    the string from that structure (same shape as the production writer,
    but randomized instead of rank-ordered).
    """
    atoms, bonds = parse_smiles(smiles)
    n = len(atoms)
    visited: set[int] = set()
    used: set[tuple[int, int]] = set()
    children: dict[int, list[int]] = {i: [] for i in range(n)}
    closures: dict[int, list[tuple[int, str]]] = {i: [] for i in range(n)}
    digits = iter(rng.sample(range(1, 31), 30))

    def walk(u: int) -> None:
        visited.add(u)
        nbrs = list(atoms[u].neighbors)
        rng.shuffle(nbrs)
        for v in nbrs:
            edge = (u, v) if u < v else (v, u)
            if edge in used:
                continue
            used.add(edge)
            if v in visited:
                num = next(digits)
                closures[u].append((num, bonds[edge], v))
                closures[v].append((num, bonds[edge], u))
            else:
                children[u].append(v)
                walk(v)

    order = list(range(n))
    rng.shuffle(order)
    roots = [seed for seed in order if seed not in visited and (walk(seed) or True)]

    def pair_bond(sym: str, a: int, b: int) -> str:
        # omit only the parser default for the pair (mirrors the writer):
        # ':' iff both endpoints aromatic, else '-'
        default = ":" if atoms[a].aromatic and atoms[b].aromatic else "-"
        return "" if sym == default else sym

    def render(u: int) -> str:
        out = [atoms[u].label]
        for num, sym, other in closures[u]:
            b = pair_bond(sym, u, other)
            out.append(b + (str(num) if num <= 9 else f"%{num:02d}"))
        subs = []
        for v in children[u]:
            edge = (u, v) if u < v else (v, u)
            b = pair_bond(bonds[edge], u, v)
            subs.append(b + render(v))
        rng.shuffle(subs)
        for k, sub in enumerate(subs):
            out.append(f"({sub})" if k < len(subs) - 1 else sub)
        return "".join(out)

    parts = [render(r) for r in roots]
    rng.shuffle(parts)
    return ".".join(parts)


@pytest.mark.parametrize(
    "smiles",
    [
        "CC(=O)OC1=CC=CC=C1C(=O)O",  # aspirin
        "Cc1ccccc1",  # toluene
        "C1CCCCC1",  # cyclohexane
        "c1ccc2ccccc2c1",  # naphthalene (fused rings)
        "c1ccccc1-c1ccccc1",  # biphenyl, explicit single inter-ring bond
        "c1ccccc1c1ccccc1",  # biphenyl spelled with aromatic inter-ring bond
        "C1CC2CCC1CC2",  # bicyclooctane (bridged rings, digit reuse)
        "NC(CC(=O)O)C(=O)O",  # aspartic acid (branches)
        "O.CCO.[Na+]",  # multi-component
        "ClC(Br)I",  # halogen soup
    ],
)
def test_random_respellings_collapse(smiles):
    rng = random.Random(20260813)
    expect = canonical_smiles(smiles)
    for _ in range(25):
        variant = _random_spelling(smiles, rng)
        assert canonical_smiles(variant) == expect, variant


@pytest.mark.parametrize(
    "bad",
    ["", "C1CC", "C(C", "CC)", "C..C", "Xy", "[C", "1CC", "%1C", "C=1CC=2"],
)
def test_malformed_raise(bad):
    with pytest.raises(SmilesError):
        canonical_smiles(bad)


def test_try_variant_is_none_safe():
    assert try_canonical_smiles(None) is None
    assert try_canonical_smiles("C1CC") is None
    assert try_canonical_smiles("OCC") == "CCO"


# ---- r10: Lipinski gate valence model (pure-function pins) ----------------

def test_ro5_bracket_hydrogen_counts():
    """Bracket-atom H parsing drives HBD: [NH4+] carries 4, [O-] none, and
    the H token must not self-match the element's own letters."""
    from open_molecule_data_pipeline_spark.operators.chemistry import (
        _ro5_descriptors,
    )

    hbd, hba, mw, ni, az, px = _ro5_descriptors("[NH4+].[Cl-]")
    assert (hbd, hba) == (4, 1)
    hbd, hba, *_ = _ro5_descriptors("[OH2]")  # explicit water
    assert (hbd, hba) == (2, 1)
    hbd, *_ = _ro5_descriptors("C[O-]")  # methoxide: no H on O
    assert hbd == 0


def test_ro5_hypervalent_clamps_to_zero():
    """Neutral nitro spelling N(=O)=O sums bond order 5 > valence 3; the
    implicit-H model must clamp at 0, not go negative."""
    from open_molecule_data_pipeline_spark.operators.chemistry import (
        _ro5_descriptors,
    )

    hbd, hba, mw, nitro, azo, peroxide = _ro5_descriptors("c1ccccc1N(=O)=O")
    assert hbd == 0 and nitro == 1 and azo == 0 and peroxide == 0
    # all three nitrobenzene spellings agree descriptor-for-descriptor
    charged = _ro5_descriptors("c1ccccc1[N+](=O)[O-]")
    assert charged == (hbd, hba, mw, nitro, azo, peroxide)


def test_ro5_alert_exclusivity():
    """Azo needs N=N between two nitrogens; nitro's N=O must not trip it,
    and an ester O-C-O must not read as peroxide (O-O specifically)."""
    from open_molecule_data_pipeline_spark.operators.chemistry import (
        _ro5_descriptors,
    )

    *_, nitro, azo, peroxide = _ro5_descriptors("O=[N+]([O-])c1ccccc1")
    assert (nitro, azo, peroxide) == (1, 0, 0)
    *_, nitro, azo, peroxide = _ro5_descriptors("c1ccccc1N=Nc1ccccc1")
    assert (nitro, azo, peroxide) == (0, 1, 0)
    *_, nitro, azo, peroxide = _ro5_descriptors("CC(=O)OC")  # methyl acetate
    assert (nitro, azo, peroxide) == (0, 0, 0)
    *_, nitro, azo, peroxide = _ro5_descriptors("OO")
    assert (nitro, azo, peroxide) == (0, 0, 1)


def test_ro5_spelling_invariance_full_fixture():
    """Every spelling of a group must yield the identical descriptor tuple
    — the structural claim the driver oracle also checks, pinned here
    without a SparkSession."""
    from open_molecule_data_pipeline_spark.operators.chemistry import (
        _RO5_GOLDEN,
        _RO5_SPELLINGS,
        _ro5_descriptors,
    )

    golden = {g: tuple(rest) for g, *rest in _RO5_GOLDEN}
    for grp, smiles in _RO5_SPELLINGS:
        assert _ro5_descriptors(smiles) == golden[grp], (grp, smiles)
