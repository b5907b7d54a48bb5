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


# --------------------------------------------------------------------------
# VERDICT r15 #3: incremental (batch-vs-corpus) multimodal near-dup
# --------------------------------------------------------------------------


def _is_new(doc_id: int) -> bool:
    import hashlib

    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] == "0"


def _dhash_replay(doc_id: int):
    """Closed-form dHash replay (no codec), mirroring the oracle CTEs."""
    import numpy as np

    base, odd = doc_id // 2, doc_id % 2
    w, h = 16 + base % 5, 16 + base % 3
    j = np.arange(w * h * 3, dtype=np.int64)
    s = base * 100000 + j
    v = ((s * s + s * 7919) // 256 + (odd * (j % 97 == 0)).astype(np.int64)) % 256
    px = v.reshape(h, w, 3)
    ys = (np.arange(8, dtype=np.int64) * h) // 8
    xs = (np.arange(9, dtype=np.int64) * w) // 9
    thumb = px[np.ix_(ys, xs)]
    g = (thumb[:, :, 0] * 299 + thumb[:, :, 1] * 587 + thumb[:, :, 2] * 114) // 1000
    bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).reshape(-1)
    ks = np.arange(64, dtype=np.int64)
    hi = int((bits[ks < 32] << ks[ks < 32]).sum())
    lo = int((bits[ks >= 32] << (ks[ks >= 32] - 32)).sum())
    return hi, lo


def test_mm_dhash_incremental_matches_bruteforce(spark, sf_dir):
    """Brute-force new x corpus replay (closed-form hashes, md5 batch
    split) must equal the banded Spark twin exactly — including the
    hamming value reported at the smallest corpus neighbor."""
    import duckdb

    from open_molecule_data_pipeline_spark.operators.multimodal_incremental import (
        mm_image_dhash_neardup_incremental,
    )
    from open_molecule_data_pipeline_spark.operators.multimodal import _DHASH_T

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    hashes = {d: _dhash_replay(int(d)) for d in ids}
    new = [d for d in ids if _is_new(d)]
    corpus = [d for d in ids if not _is_new(d)]
    assert new and corpus  # the 1/16 slice is non-degenerate
    expect = {}
    for nd in new:
        hi_n, lo_n = hashes[nd]
        best = None
        for cd in sorted(corpus):
            hi_c, lo_c = hashes[cd]
            ham = (hi_n ^ hi_c).bit_count() + (lo_n ^ lo_c).bit_count()
            if ham <= _DHASH_T:
                best = (cd, ham)  # smallest corpus id first in sorted order
                break
        if best is not None:
            expect[nd] = best
    got = {
        r.doc_id: (r.dup_of, r.hamming)
        for r in mm_image_dhash_neardup_incremental(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect  # fixture produces at least one split (2p, 2p+1) pair


def test_mm_afp_incremental_matches_bruteforce(spark, sf_dir):
    """Same discipline for the audio twin: closed-form fingerprints,
    exact (fp, n) equi-pairs across the batch split."""
    import duckdb
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.multimodal_incremental import (
        mm_audio_fingerprint_neardup_incremental,
    )
    from open_molecule_data_pipeline_spark.operators.multimodal import _AFP_FRAMES

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    fps = {}
    for doc_id in ids:
        doc_id = int(doc_id)
        base, odd = doc_id // 2, doc_id % 2
        n = _AFP_FRAMES * (4 + base % 4)
        i = np.arange(n, dtype=np.int64)
        s = base * 100000 + i
        samp = ((s * s) % 1000003) * 31 % 65536 - 32768
        samp = samp + (odd * (i % 89 == 0)).astype(np.int64)
        mag = np.abs(samp)
        e = mag.reshape(_AFP_FRAMES, n // _AFP_FRAMES).sum(axis=1)
        b = (e[:-1] < e[1:]).astype(np.int64)
        fps[doc_id] = (n, int((b << np.arange(_AFP_FRAMES - 1, dtype=np.int64)).sum()))
    new = [d for d in ids if _is_new(d)]
    corpus = [d for d in ids if not _is_new(d)]
    expect = {}
    for nd in new:
        matches = [cd for cd in corpus if fps[cd] == fps[nd]]
        if matches:
            expect[int(nd)] = (min(matches), fps[nd][1])
    got = {
        r.doc_id: (r.dup_of, r.fp)
        for r in mm_audio_fingerprint_neardup_incremental(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect


# --------------------------------------------------------------------------
# VERDICT r15 #2: aspect-bucket router fed by decoder output
# --------------------------------------------------------------------------


def test_aspect_bucket_routes_decoded_dims(spark, sf_dir):
    """Closed-form replay of the integer bucket argmin over the fixture
    dims must match the query, and the query-side dims must come from
    decode_gif (pinned by decoding one doc's payload by hand: doc 22 is
    12x9, an exact 4:3, bucket 1)."""
    import duckdb
    from collections import defaultdict

    from open_molecule_data_pipeline_spark.operators.gif import (
        _AR_BUCKETS,
        _AR_D_PROD,
        _fixture_indices,
        _palette,
        decode_gif,
        encode_gif,
        mm_aspect_bucket_sampling,
    )

    idx = _fixture_indices(22, 0, 12, 9)
    dec = decode_gif(encode_gif([(idx, 0)], _palette()))
    assert (dec["width"], dec["height"]) == (12, 9)
    best = min(
        (abs(12 * d - 9 * n) * (_AR_D_PROD // d), i)
        for i, (n, d) in enumerate(_AR_BUCKETS)
    )
    assert best == (0, 1)  # exact 4:3 -> bucket index 1

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    counts = defaultdict(int)
    for doc_id in ids:
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        _, i = min(
            (abs(w * d - h * n) * (_AR_D_PROD // d), i)
            for i, (n, d) in enumerate(_AR_BUCKETS)
        )
        counts[i] += 1
    rows = mm_aspect_bucket_sampling(spark, sf_dir).collect()
    assert {r.bucket: r.n_images for r in rows} == dict(counts)
    assert sum(counts.values()) == len(ids)  # every image routed once


# --------------------------------------------------------------------------
# VERDICT r15 #4: singleton-start Louvain (O(|V|) community tables)
# --------------------------------------------------------------------------


def test_louvain_singleton_matches_python_replay(spark, sf_dir):
    """The pure-Python sweep replay (singleton init) must reproduce the
    Spark pass exactly: community sizes, total communities, kept-move
    count — and modularity must strictly improve from the singleton
    partition (every kept move has positive gain and the fixture is
    never already converged)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.louvain import (
        _SINGLETON_SWEEPS,
        _py_degrees,
        _py_sweep,
        graph_louvain_singleton,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    edges = {
        (int(s) * 2, int(p) * 2 + 1): 1
        for s, p in zip(t.l_suppkey, t.l_partkey)
    }
    deg = _py_degrees(edges)
    m_val = len(edges)
    c = {n: n for n in deg}
    n_moves = 0
    for _ in range(_SINGLETON_SWEEPS):
        c, kept = _py_sweep(edges, deg, m_val, c)
        n_moves += kept
        if kept == 0:
            break
    sizes = Counter(c.values())
    rows = graph_louvain_singleton(spark, sf_dir).collect()
    r0 = rows[0]
    assert r0.n_moves == n_moves
    assert r0.n_moves > 0
    assert r0.n_communities == len(sizes)
    expect = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.cid, r.n_nodes) for r in rows] == expect
    # strictly positive-gain moves => Q strictly improves from singleton
    assert r0.q_pass_nano > r0.q_init_nano


def test_aspect_batch_formation_matches_replay(spark, sf_dir):
    """Python replay of per-(bucket, shard) batch formation — routing,
    deterministic doc-order slots, fixed batch size, partial-batch
    drops, and the position-weighted packing checksum."""
    from collections import defaultdict

    import duckdb

    from open_molecule_data_pipeline_spark.operators.gif import (
        _AR_BUCKETS,
        _AR_D_PROD,
        _BATCH_SHARDS,
        _BATCH_SIZE,
        mm_aspect_batch_formation,
    )

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    groups = defaultdict(list)
    for doc_id in ids:
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        _, i = min(
            (abs(w * d - h * n) * (_AR_D_PROD // d), i)
            for i, (n, d) in enumerate(_AR_BUCKETS)
        )
        groups[(i, doc_id % _BATCH_SHARDS)].append(doc_id)
    expect = defaultdict(lambda: [0, 0, 0, 0])  # full, packed, dropped, chk
    for (bucket, _shard), docs in groups.items():
        docs.sort()
        for bi in range(0, len(docs), _BATCH_SIZE):
            batch = docs[bi : bi + _BATCH_SIZE]
            e = expect[bucket]
            if len(batch) == _BATCH_SIZE:
                e[0] += 1
                e[1] += _BATCH_SIZE
                e[3] += sum(batch) * (bi // _BATCH_SIZE + 1)
            else:
                e[2] += len(batch)
    got = {
        r.bucket: [r.n_full_batches, r.n_packed, r.n_dropped, r.pack_checksum]
        for r in mm_aspect_batch_formation(spark, sf_dir).collect()
    }
    assert got == {b: list(v) for b, v in expect.items()}
    assert any(v[2] > 0 for v in expect.values())  # drops exercised
    assert any(v[0] > 0 for v in expect.values())  # full batches exercised


# --------------------------------------------------------------------------
# r16 late wave: GIF screen compositing (closes the documented gate)
# --------------------------------------------------------------------------


def test_gif_composite_hand_case():
    """Hand-worked 2x2 screen: full base frame, then a 1x2 rect at
    (0, 1) whose first pixel is transparent — the composited frame must
    show the BASE pixel under the transparent index and the painted
    pixel elsewhere. Palette entry c = (c*5+1, c*11+3, c*23+7) mod 256."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.gif import (
        _palette,
        decode_gif_composited,
        encode_gif_frames,
    )

    base = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    rect = np.array([[7], [5]], dtype=np.uint8)  # at (left=1, top=0)
    blob = encode_gif_frames(
        2,
        2,
        [
            (base, 0, 0, 4, 1, None),
            (rect, 1, 0, 9, 0, 7),  # index 7 transparent
        ],
        _palette(),
    )
    dec = decode_gif_composited(blob)
    assert dec["n_frames"] == 2 and dec["delays_cs"] == [4, 9]
    pal = lambda c: [(c * 5 + 1) % 256, (c * 11 + 3) % 256, (c * 23 + 7) % 256]
    assert dec["frames"][0].tolist() == [[pal(0), pal(1)], [pal(2), pal(3)]]
    # (0,1): rect pixel 7 is transparent -> base pal(1); (1,1): painted 5
    assert dec["frames"][1].tolist() == [[pal(0), pal(1)], [pal(2), pal(5)]]


def test_gif_composite_disposal_semantics():
    """Disposal 2 restores ONLY the frame's rect to the background
    palette entry; disposal 3 restores the pre-frame canvas — pinned by
    a third frame that paints nothing new (a fully transparent rect),
    exposing the canvas each disposal method left behind."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.gif import (
        _palette,
        decode_gif_composited,
        encode_gif_frames,
    )

    pal = lambda c: [(c * 5 + 1) % 256, (c * 11 + 3) % 256, (c * 23 + 7) % 256]
    base = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    probe = np.array([[9, 9], [9, 9]], dtype=np.uint8)  # all transparent

    for disposal, expect in (
        # disposal 2: rect (1,1) restored to background entry pal(0)
        (2, [[pal(1), pal(2)], [pal(3), pal(0)]]),
        # disposal 3: pre-frame canvas -> the base frame everywhere
        (3, [[pal(1), pal(2)], [pal(3), pal(4)]]),
    ):
        blob = encode_gif_frames(
            2,
            2,
            [
                (base, 0, 0, 0, 1, None),
                (np.array([[6]], dtype=np.uint8), 1, 1, 0, disposal, None),
                (probe, 0, 0, 0, 0, 9),
            ],
            _palette(),
        )
        frames = decode_gif_composited(blob)["frames"]
        assert frames[1].tolist() == [[pal(1), pal(2)], [pal(3), pal(6)]]
        assert frames[2].tolist() == expect, f"disposal {disposal}"


def test_gif_composite_matches_independent_replay():
    """The registered fixture (partial rect + per-third-pixel
    transparency + disposal 1/2/3) against a from-scratch numpy replay
    of GIF89a compositing, over 120 docs."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.gif import (
        _COMPOSITE_T,
        _composite_specs,
        _palette,
        decode_gif_composited,
        encode_gif_frames,
    )

    PAL = np.array(_palette(), dtype=np.uint8)
    for doc in range(120):
        w, h = 8 + doc % 9, 8 + doc % 7
        specs = _composite_specs(doc, w, h)
        dec = decode_gif_composited(encode_gif_frames(w, h, specs, _palette()))
        idx0 = specs[0][0]
        idx1, left, top = specs[1][0], specs[1][1], specs[1][2]
        idx2 = specs[2][0]
        out0 = PAL[idx0]
        pre1 = (
            out0.copy()
            if doc % 2 == 0
            else np.broadcast_to(PAL[0], (h, w, 3)).copy()
        )
        out1 = pre1.copy()
        fh, fw = idx1.shape
        sub = out1[top : top + fh, left : left + fw]
        opaque = idx1 != _COMPOSITE_T
        sub[opaque] = PAL[idx1][opaque]
        out2 = pre1.copy()
        out2[0, :] = PAL[idx2[0]]
        for f, exp in enumerate((out0, out1, out2)):
            assert np.array_equal(dec["frames"][f], exp), (doc, f)


def test_decode_gif_extraction_still_gates_partial_frames():
    """The extraction read (decode_gif) keeps its full-raster gate: the
    same composited stream the new decoder accepts must still raise
    NotImplementedError there — the two reads are deliberately split."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.gif import (
        _palette,
        decode_gif,
        decode_gif_composited,
        encode_gif_frames,
    )

    blob = encode_gif_frames(
        4,
        4,
        [
            (np.zeros((4, 4), dtype=np.uint8), 0, 0, 0, 1, None),
            (np.ones((2, 2), dtype=np.uint8), 1, 1, 0, 0, None),
        ],
        _palette(),
    )
    assert decode_gif_composited(blob)["n_frames"] == 2
    with pytest.raises(NotImplementedError, match="compositing"):
        decode_gif(blob)


# --------------------------------------------------------------------------
# r16 late wave: MJPEG-in-AVI decode (AVI demux composed with jpeg.py)
# --------------------------------------------------------------------------


def test_mjpeg_avi_roundtrip_and_frame_order():
    """Two-frame MJPEG AVI through the real demux + JPEG decode path:
    per-frame DC levels reconstruct exactly (pixel = 128 + 4*DC for
    DC-only blocks), '00dc' chunk ids are used, and swapping the frames
    flips the order of the decoded DC levels (what the query's
    (f+1)-weighted sum pins)."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    def jpg(dc):
        blk = [0] * 64
        blk[0] = dc
        return encode_jpeg_baseline([blk], 1, 1)

    avi = encode_avi([jpg(2), jpg(-1)], width=8, height=8, compressed=True)
    assert b"00dc" in avi and b"00db" not in avi
    dec = decode_avi(avi)
    assert (dec["width"], dec["height"], dec["n_frames"]) == (8, 8, 2)
    levels = []
    for payload in dec["frames"]:
        j = decode_jpeg(bytes(payload))
        px = np.asarray(j["pixels"])
        assert px.shape == (8, 8) and int(px.min()) == int(px.max())
        levels.append(int(px[0, 0]))
    assert levels == [128 + 4 * 2, 128 + 4 * -1]
    swapped = decode_avi(
        encode_avi([jpg(-1), jpg(2)], width=8, height=8, compressed=True)
    )
    first = decode_jpeg(bytes(swapped["frames"][0]))
    assert int(np.asarray(first["pixels"])[0, 0]) == 128 - 4


# --------------------------------------------------------------------------
# r16 late wave: streaming batch-formation twin (stateful, multi-batch)
# --------------------------------------------------------------------------


class _FakeGroupState:
    """Minimal GroupState stand-in for the update function's contract."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def test_batch_former_state_carries_partials_across_microbatches():
    """The trainer-state semantics the twin exists to prove: a partial
    batch pending at a rank must carry into the next microbatch and
    complete there, with the checksum term computed against the batch's
    CUMULATIVE 1-based id — identical to the batch query's
    rn//B windowing over the concatenated doc order. Worked example
    (B=8): docs 0..9 arrive as [0..5], then [6..9, 10..13] — batch 1 is
    docs 0..7 formed in update 2, batch 2 never completes (6 pending)."""
    import pandas as pd

    from open_molecule_data_pipeline_spark.operators.gif import (
        _BATCH_SIZE,
        _batch_former_update,
    )

    assert _BATCH_SIZE == 8
    state = _FakeGroupState()
    key = (3, 1)

    def upd(docs):
        return list(
            _batch_former_update(
                key, iter([pd.DataFrame({"doc_id": docs})]), state
            )
        )[0]

    out1 = upd([5, 0, 3, 1, 2, 4])  # arrival permutation within the band
    assert out1.iloc[0].tolist() == [3, 1, 1, 0, 0, 0, 6]
    out2 = upd([9, 6, 8, 7, 13, 10, 12, 11])
    # batch 1 = docs 0..7 (sum 28, id 1); pending = [8..13] (6 docs)
    assert out2.iloc[0].tolist() == [3, 1, 2, 1, 8, 28, 6]
    out3 = upd([14, 15])
    # batch 2 = docs 8..15 (sum 92, id 2): checksum 28*1 + 92*2 = 212
    assert out3.iloc[0].tolist() == [3, 1, 3, 2, 16, 212, 0]


def test_stream_aspect_batch_twin_equals_batch_query(spark, sf_dir):
    """End-to-end: the multi-microbatch streaming run lands exactly the
    batch query's per-bucket report (full batches, packed/dropped
    counts, position-weighted checksum)."""
    from open_molecule_data_pipeline_spark.operators.gif import (
        mm_aspect_batch_formation,
        stream_aspect_batch_twin,
    )

    got = stream_aspect_batch_twin(spark, sf_dir).collect()
    want = mm_aspect_batch_formation(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_mjpeg_renc_pair_bytes_differ_pixels_equal():
    """The dedup premise, pinned at the byte level: a (2p, 2p+1) clip
    pair produces DIFFERENT container bytes (different DQT, different
    entropy streams) yet IDENTICAL decoded frame pixels — and a
    different base clip does not collide."""
    import hashlib

    from open_molecule_data_pipeline_spark.operators.jpeg import decode_jpeg
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        _mjpeg_renc_frames,
        decode_avi,
        encode_avi,
    )

    def clip(doc):
        frames, bw, bh, nf = _mjpeg_renc_frames(doc)
        avi = encode_avi(frames, width=bw * 8, height=bh * 8, compressed=True)
        dec = decode_avi(avi)
        hsh = hashlib.md5()
        for payload in dec["frames"]:
            hsh.update(decode_jpeg(bytes(payload))["pixels"].tobytes())
        return avi, (dec["width"], dec["height"], dec["n_frames"]), hsh.hexdigest()

    for base in (0, 3, 7):
        avi_e, dims_e, dig_e = clip(2 * base)
        avi_o, dims_o, dig_o = clip(2 * base + 1)
        assert avi_e != avi_o
        assert dims_e == dims_o and dig_e == dig_o
    _, _, other = clip(2 * 4)
    assert other != clip(2 * 3)[2]
