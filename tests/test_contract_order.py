"""The driver's correctness gate samples the FIRST 50 entries of
``__spark_entry__.queries()`` — these tests pin the properties that make
that window representative: every operator family appears, every sampled
entry has an oracle, and non-contract registry entries stay out."""

from __future__ import annotations

from collections import Counter

from open_molecule_data_pipeline_spark.registry import (
    CONTRACT_ORDER,
    contract_specs,
    load_all,
)

WINDOW = 50

# one representative tag per operator family that must be driver-visible
FAMILY_TAGS = (
    "agg",
    "filter",
    "join",
    "sort",
    "subquery",
    "window",
    "setop",
    "functions",
    "dedup",
    "similarity",
    "text",
    "timeseries",
    "cdc",
    "graph",
    "ml",
    "multimodal",
    "sample",
    "formats",
    "streaming",
    "chemistry",
)


# The round whose driver window CONTRACT_ORDER currently encodes. The
# green-count scan below considers only rounds STRICTLY BEFORE this one:
# the window was planned against that history, and the current round's
# own CORRECTNESS artifact (dropped by the driver mid-round) must not
# retroactively invalidate the window it verified (ADVICE r10). Bump in
# the same commit as each rotation.
WINDOW_ROUND = 16


def _cumulative_green_counts() -> dict[str, int]:
    """query -> green rows across CORRECTNESS files from rounds < WINDOW_ROUND."""
    import glob
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        if int(re.search(r"r(\d+)", Path(path).name).group(1)) >= WINDOW_ROUND:
            continue
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("rows_match") and not row.get("err"):
                    counts[name] = counts.get(name, 0) + 1
    return counts


def test_every_family_driver_visible_or_cumulatively_proven():
    """Every operator family must be in the head-50 window OR already be
    externally proven by >= 2 driver-green rows in past rounds. (r5 spends
    the whole window on never-sampled + changed queries to close cumulative
    coverage; rotated-out family sentinels must carry historical proof.)"""
    specs = contract_specs()
    head = list(specs.values())[:WINDOW]
    seen = {t for spec in head for t in spec.tags}
    rotated_out = [t for t in FAMILY_TAGS if t not in seen]
    green = _cumulative_green_counts()
    unproven = []
    for tag in rotated_out:
        n_green = sum(
            green.get(name, 0)
            for name, spec in specs.items()
            if tag in spec.tags
        )
        if n_green < 2:
            unproven.append((tag, n_green))
    assert not unproven, (
        f"families neither in the driver window nor cumulatively proven: "
        f"{unproven}"
    )


def test_first_window_all_have_oracles():
    head = list(contract_specs().items())[:WINDOW]
    missing = [name for name, spec in head if not spec.oracle]
    assert not missing, f"oracle-less queries inside the driver window: {missing}"


def test_contract_has_no_oracle_less_entries():
    """VERDICT r1 #2: every contract entry must be driver-checkable."""
    missing = [n for n, s in contract_specs().items() if not s.oracle]
    assert not missing, f"contract entries without oracles: {missing}"


def test_registry_has_no_rows_only_queries():
    """VERDICT r4 #6: the last two rows-only listings became verdict
    queries — every registered query is now oracle-checked and exposed."""
    specs = load_all()
    oracle_less = [n for n, s in specs.items() if not s.oracle]
    assert not oracle_less, f"rows-only registry entries: {oracle_less}"
    exposed = set(contract_specs())
    assert "mllib_minhash_pairs" in exposed
    assert "mllib_brp_neighbors" in exposed


def test_contract_order_has_no_duplicates():
    """ADVICE r4: a duplicate silently shifts later entries relative to the
    documented head-50 bookkeeping — contract_specs dedupes, so lint it."""
    dupes = [n for n, c in Counter(CONTRACT_ORDER).items() if c > 1]
    assert not dupes, f"duplicate CONTRACT_ORDER entries: {dupes}"


def test_contract_preserves_all_other_queries():
    specs = load_all()
    expected = {n for n, s in specs.items() if s.contract}
    assert set(contract_specs()) == expected


# Queries whose implementation CHANGED this round: the only
# already-driver-green names allowed inside the head-50 window (re-proof
# slots). Update per round alongside the CONTRACT_ORDER head comment.
CHANGED_THIS_ROUND: set[str] = {
    # r16: louvain.py's driver-side deep-level replay + flattened sweep
    # (VERDICT r15 #1); gif.py's LZW EOI-width fix, mcs gate (ADVICE
    # r15) and decoder-dims aspect router (VERDICT r15 #2); the 14
    # multimodal.py residents (dhash/afp hash builders factored out for
    # the incremental twins, VERDICT r15 #3).
    "graph_louvain_multilevel",
    # r16b: jpeg.py gained DRI/RSTn restart-interval support — the 5
    # baseline-codec residents re-prove the unchanged-path behavior.
    "mm_image_jpeg_decode",
    "mm_image_jpeg_renc_dedup",
    "mm_image_jpeg_color_decode",
    "mm_image_jpeg_color_renc_dedup",
    "mm_image_jpeg_chroma_decode",
    # r16b: jpeg_progressive.py gained per-scan restart support — its 4
    # residents re-prove the unchanged-path behavior.
    "mm_image_jpeg_progressive_decode",
    "mm_image_jpeg_progressive_renc_dedup",
    "mm_image_jpeg_progressive_sa_decode",
    "mm_image_jpeg_progressive_color_decode",
    "mm_image_gif_decode",
    "mm_image_gif_renc_dedup",
    "mm_gif_animation_frames",
    "mm_aspect_bucket_sampling",
    "mm_blob_stats",
    "mm_frame_sample",
    "mm_feature_extract",
    "mm_wav_decode",
    "mm_image_decode",
    "mm_video_frames",
    "mm_audio_frames",
    "mm_pcm_resample",
    "mm_image_resize_nn",
    "mm_image_dhash_neardup",
    "mm_audio_fingerprint_neardup",
    "mm_audio_silence_trim",
    "mm_video_scene_cuts",
    "mm_audio_zcr",
}


def test_window_spends_no_slot_on_unchanged_green_queries():
    """Window policy, codified (amended r10): every head-50 slot must be
    (1) an explicit re-proof of code changed since its last driver row
    (CHANGED_THIS_ROUND), (2) a first-time verification (never
    driver-green), or — only when that backlog leaves slots free — (3) a
    LEAST-PROVEN re-proof: no query outside the window may have a
    strictly lower cumulative green count than any rule-(3) filler
    inside it (maximal marginal verification value; ties broken by the
    curator, oldest-last-green preferred)."""
    green = _cumulative_green_counts()
    specs = contract_specs()
    head = list(specs)[:WINDOW]
    outside = list(specs)[WINDOW:]
    fillers = [n for n in head if green.get(n, 0) > 0 and n not in CHANGED_THIS_ROUND]
    if fillers:
        backlog = [
            n for n in specs
            if green.get(n, 0) == 0 or n in CHANGED_THIS_ROUND
        ]
        assert len(backlog) < WINDOW, (
            f"window has {len(fillers)} re-proof fillers while the "
            f"changed/never-green backlog alone exceeds the window: {backlog}"
        )
        max_filler = max(green[n] for n in fillers)
        min_outside = min(
            (green.get(n, 0) for n in outside if n not in CHANGED_THIS_ROUND),
            default=max_filler,
        )
        assert max_filler <= min_outside, (
            "least-proven rule violated: a filler with green count "
            f"{max_filler} sits in the window while a query with count "
            f"{min_outside} sits outside"
        )


def test_canon_rejects_nested_cells():
    """The local canon must fail on exactly the result shapes the external
    harness rejects (VERDICT r8: the stringify-first canon passed a nested
    query the driver errored on). The driver-parity probe in
    tests/_compare.py sorts RAW columns first — pandas throws TypeError on
    ndarray cells there, same as the driver."""
    import numpy as np
    import pandas as pd
    import pytest

    from ._compare import canon

    flat = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    assert canon(flat) == [("1", "x"), ("2", "y")]

    nested = pd.DataFrame(
        {"a": [np.array(["u", "v"]), np.array(["w"])], "b": [1, 2]}
    )
    with pytest.raises(TypeError):
        canon(nested)


def test_contract_order_is_exhaustive():
    """VERDICT r9 #5: every registered contract query must appear
    EXPLICITLY in CONTRACT_ORDER (positions 51+ are fine). Before r10 the
    registry fell back to registration order for unlisted names — correct,
    but a future addition that forgot the rotation queue could silently
    sit wherever module import order put it. Now omission is a lint
    failure, so placement is always a deliberate decision."""
    specs = load_all()
    listed = set(CONTRACT_ORDER)
    missing = [n for n, s in specs.items() if s.contract and n not in listed]
    assert not missing, (
        f"registered queries absent from CONTRACT_ORDER: {missing} — "
        "add each at an explicit position (head-50 if new this round)"
    )
    # and no phantom names that registration no longer backs
    phantom = [n for n in CONTRACT_ORDER if n not in specs]
    assert not phantom, f"CONTRACT_ORDER names with no registration: {phantom}"
