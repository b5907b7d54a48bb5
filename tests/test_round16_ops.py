"""Round-16 pins: ADVICE r15 GIF codec fixes, Louvain barrier
restructure, real-dims aspect routing, incremental multimodal near-dup,
singleton-start Louvain.

Reference parity note: the reference repo has no codec/graph/multimodal
layer (analysis/__init__.py:1 is a docstring-only scaffold); these pin
engine-side additions only.
"""

from __future__ import annotations

import random

import pytest

from open_molecule_data_pipeline_spark.operators.gif import (
    _N_PAL,
    _fixture_indices,
    _lzw_decode,
    _lzw_encode,
    _palette,
    decode_gif,
    encode_gif,
)


# --------------------------------------------------------------------------
# ADVICE r15 #1: encoder flush-code/EOI width misalignment
# --------------------------------------------------------------------------


def test_lzw_eoi_width_boundary_regression():
    """ADVICE r15 repro: the final in-loop add lands exactly on a
    power-of-two table size, so the decoder widens after reading the
    last data code and expects EOI at width+1.  The encoder must mirror
    that virtual add or EOI is written one bit short."""
    seq = bytes([0, 0, 2, 2, 0, 0, 2, 2, 0, 0, 2, 2, 0, 0, 2, 2, 0, 0, 2])
    assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq


def test_lzw_eoi_boundary_sweep():
    """Adversarial sweep over the exact failure class (short repeated
    patterns near table-size power-of-two boundaries) for every legal
    mcs, plus single-symbol and empty tails where the decoder performs
    NO post-read add (prev is None) and the encoder must not widen."""
    rng = random.Random(1601)
    for mcs in range(2, 9):
        for n in list(range(0, 40)) + [63, 64, 65, 127, 128, 129]:
            alpha = min(3, 1 << mcs)
            seq = bytes(rng.randrange(alpha) for _ in range(n))
            assert _lzw_decode(_lzw_encode(seq, mcs), mcs, n) == seq
    # first-data-code-is-final-code tail: no decoder add, no widening
    for mcs in (2, 8):
        assert _lzw_decode(_lzw_encode(bytes([1]), mcs), mcs, 1) == b"\x01"
        assert _lzw_decode(_lzw_encode(b"", mcs), mcs, 0) == b""


# --------------------------------------------------------------------------
# ADVICE r15 #2: mcs gate tightened to the spec range 2..8
# --------------------------------------------------------------------------


def test_gif_rejects_mcs_above_8():
    """GIF palette indices are bytes, so the spec caps LZW min code
    size at 8; mcs 9-11 previously crashed inside the LZW table init
    with a misleading bytes-range error instead of the gate message."""
    pal = _palette()
    idx = _fixture_indices(2, 0, 8, 8)
    blob = bytearray(encode_gif([(idx, 0)], pal))
    i = 13 + 3 * _N_PAL + 8  # header + GCT + GCE -> image descriptor
    assert blob[i] == 0x2C
    for mcs in (9, 10, 11, 12, 1, 0):
        hacked = bytearray(blob)
        hacked[i + 10] = mcs  # LZW min-code-size byte after descriptor
        with pytest.raises(ValueError, match="illegal LZW min code size"):
            decode_gif(bytes(hacked))
