"""Round-15 pins: GIF/LZW codec hand-cases and property roundtrips,
incremental SemDeDup and cross-modal alignment numpy replays, and the
headline-swap bookkeeping. (The Louvain Q-restructure is pinned by the
round-14 replay tests, which assert bit-identical Q trajectories.)"""

from __future__ import annotations

import hashlib
import itertools
import random

import numpy as np
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
# LZW
# --------------------------------------------------------------------------


def test_lzw_hand_pin():
    """Hand-worked stream, mcs=2 (clear=4, eoi=5, width=3): indices
    [1,1,1] emit codes 4, 1, 6, 5 — entry 6 = (1,1) is the k+1 special
    case on decode. Little-endian packing: byte0 = 4 | 1<<3 | (6&3)<<6
    = 0x8C, byte1 = (6>>2) | 5<<1 = 0x0B."""
    assert _lzw_encode(bytes([1, 1, 1]), 2) == b"\x8c\x0b"
    assert _lzw_decode(b"\x8c\x0b", 2, 3) == bytes([1, 1, 1])


def test_lzw_roundtrip_random_and_adversarial():
    """Roundtrip across code-width transitions (the GIF discipline, not
    TIFF's early change): random streams plus the two adversarial
    shapes — constant runs (repeated k+1 cases) and strictly growing
    dictionaries (width bumps at 2^w exactly)."""
    rng = random.Random(1507)
    for _ in range(60):
        n = rng.randrange(1, 1500)
        mcs = rng.choice([2, 4, 6, 8])
        seq = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert _lzw_decode(_lzw_encode(seq, mcs), mcs, n) == seq
    for mcs in (2, 6):
        run = bytes([1] * 5000)
        assert _lzw_decode(_lzw_encode(run, mcs), mcs, 5000) == run
        cyc = bytes(itertools.islice(itertools.cycle(range(1 << mcs)), 9000))
        assert _lzw_decode(_lzw_encode(cyc, mcs), mcs, 9000) == cyc


def test_lzw_rejects():
    with pytest.raises(ValueError):  # truncated: no EOI
        _lzw_decode(b"\x8c", 2, 3)
    with pytest.raises(ValueError):  # wrong expected raster size
        _lzw_decode(b"\x8c\x0b", 2, 4)


# --------------------------------------------------------------------------
# GIF container
# --------------------------------------------------------------------------


def test_gif_decode_handbuilt_stream():
    """Byte-level decode pin, independent of encode_gif: a literally
    assembled GIF89a — 3x1 screen, 4-entry GCT, one non-interlaced
    frame whose LZW payload is the hand-pinned stream above."""
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    blob = (
        b"GIF89a"
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x80 | (7 << 4) | 1, 0, 0])  # GCT, 4 entries
        + b"".join(bytes(c) for c in pal)
        + b"\x2c"
        + bytes(4)
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + b"\x00"  # no LCT, not interlaced
        + b"\x02"  # LZW min code size
        + b"\x02\x8c\x0b\x00"  # one 2-byte sub-block + terminator
        + b"\x3b"
    )
    dec = decode_gif(blob)
    assert (dec["width"], dec["height"], dec["n_frames"]) == (3, 1, 1)
    assert dec["frames"][0].tolist() == [[[40, 50, 60]] * 3]
    assert dec["delays_cs"] == [0]


def test_gif_structure_and_roundtrip():
    pal = _palette()
    idx = _fixture_indices(5, 0, 11, 9)
    blob = encode_gif([(idx, 0)], pal)
    assert blob[:6] == b"GIF89a"
    assert int.from_bytes(blob[6:8], "little") == 11
    assert int.from_bytes(blob[8:10], "little") == 9
    assert blob[10] & 0x80 and (blob[10] & 7) == 5  # 64-entry GCT
    assert blob[-1] == 0x3B
    dec = decode_gif(blob)
    assert (dec["frames"][0] == np.array(pal, dtype=np.uint8)[idx]).all()


def test_gif_interlace_changes_bytes_not_pixels():
    """The four-pass row order must alter the stored stream (rows are
    distinct) while the decoder's inverse permutation restores the
    raster exactly — the property the renc-dedup twin rides on."""
    pal = _palette()
    idx = _fixture_indices(3, 0, 9, 12)
    plain = encode_gif([(idx, 0)], pal)
    inter = encode_gif([(idx, 0)], pal, interlace=True)
    assert plain != inter
    a, b = decode_gif(plain), decode_gif(inter)
    assert (a["frames"][0] == b["frames"][0]).all()


def test_gif_palette_rotation_identity():
    """Rotated palette + counter-rotated indices decode to identical
    RGB — the pair construction of mm_image_gif_renc_dedup."""
    pal = _palette()
    idx = _fixture_indices(7, 0, 10, 8)
    want = np.array(pal, dtype=np.uint8)[idx]
    for rot in (1, 13, 63):
        blob = encode_gif([((idx - rot) % _N_PAL, 0)], _palette(rot))
        assert (decode_gif(blob)["frames"][0] == want).all()


def test_gif_animation_frames_and_delays():
    pal = _palette()
    frames = [(_fixture_indices(9, f, 8, 8), 10 + 3 * f) for f in range(3)]
    dec = decode_gif(encode_gif(frames, pal))
    assert dec["n_frames"] == 3
    assert dec["delays_cs"] == [10, 13, 16]
    for f in range(3):
        assert (
            dec["frames"][f] == np.array(pal, dtype=np.uint8)[frames[f][0]]
        ).all()


def test_gif_rejects():
    pal = _palette()
    idx = _fixture_indices(2, 0, 8, 8)
    blob = bytearray(encode_gif([(idx, 0)], pal))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))
    with pytest.raises(ValueError):  # truncated (trailer cut off)
        decode_gif(bytes(blob[:-5]))
    # partial-frame compositing is gated, loudly: shrink the frame.
    # (Structural offset, not index(b"\x2c") — palette bytes can hold
    # 0x2C: header 13 + GCT 192 + GCE 8 puts the descriptor at 213.)
    i = 13 + 3 * 64 + 8
    assert blob[i] == 0x2C
    hacked = bytearray(blob)
    hacked[i + 5] = blob[i + 5] - 1  # frame width != screen width
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(hacked))
    # decode_media dispatch reaches the codec
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    assert decode_media(bytes(blob), "image/gif")["n_frames"] == 1


# --------------------------------------------------------------------------
# Query replays (sf0.001 fixtures)
# --------------------------------------------------------------------------


def _gif_expected(doc_id: int):
    pal = np.array(_palette(), dtype=np.int64)
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    px = pal[_fixture_indices(doc_id, 0, w, h)]
    wt = (
        (np.arange(h, dtype=np.int64) + 1)[:, None]
        * (np.arange(w, dtype=np.int64) + 1)[None, :]
    )
    return (
        w,
        h,
        int(px.sum()),
        int(px.min()),
        int(px.max()),
        int((wt * px.sum(axis=2)).sum()),
    )


def test_gif_decode_query_matches_replay(spark, sf_dir):
    from open_molecule_data_pipeline_spark.operators.gif import (
        mm_image_gif_decode,
    )

    rows = mm_image_gif_decode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        w, h, s, lo, hi, ws = _gif_expected(r.doc_id)
        assert (r.width, r.height, r.n_frames) == (w, h, 1)
        assert (r.sum_px, r.min_px, r.max_px, r.wsum_px) == (s, lo, hi, ws)


def test_gif_renc_dedup_pairs_are_exactly_the_base_families(spark, sf_dir):
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.gif import (
        mm_image_gif_renc_dedup,
    )

    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    fam: dict[tuple, list[int]] = {}
    for d in ids:
        key = (8 + (d // 2) % 9, 8 + (d // 2) % 7, (d // 2) % 64)
        fam.setdefault(key, []).append(d)
    expect = set()
    for members in fam.values():
        for a, b in itertools.combinations(sorted(members), 2):
            expect.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in mm_image_gif_renc_dedup(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect  # fixture exercises the collision path


def test_semdedup_incremental_matches_replay(spark, sf_dir):
    """Numpy replay of the frozen-cell incremental pass: same two-level
    assignment as the r14 full-corpus replay, B from the CORPUS count,
    batch-vs-corpus candidates only."""
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.semdedup import (
        _MAX_B,
        _N_COARSE,
        _SEM_TARGET,
        _TAU2,
        dedup_semdedup_incremental,
    )

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    ids = t.vec_id.to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    E = np.stack(t.embedding.values).astype(np.float64)[order]
    Eraw = np.stack(t.embedding.values)[order]
    is_new = np.array(
        [
            hashlib.md5(str(int(v)).encode()).hexdigest()[0] == "0"
            for v in ids
        ]
    )
    cent_sel = ids < _N_COARSE
    cent, cent_ids, cent_raw = E[cent_sel], ids[cent_sel], Eraw[cent_sel]
    d2 = ((E[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    ca_idx = np.lexsort((cent_ids[None, :].repeat(len(E), 0), d2), axis=1)[
        :, 0
    ]
    m = int((~is_new).sum()) // (_N_COARSE * _SEM_TARGET)
    B = m.bit_length() - 1 if m >= 1 else 0
    assign = np.empty(len(E), dtype=np.int64)
    for j in range(len(E)):
        ca = int(cent_ids[ca_idx[j]])
        bucket = 0
        for d in range(B):
            if Eraw[j, d] > cent_raw[ca_idx[j], d]:
                bucket |= 1 << d
        assign[j] = (ca << _MAX_B) + bucket
    n2 = (E * E).sum(axis=1)
    expect = {}
    for j in np.where(is_new)[0]:
        cands = np.where((assign == assign[j]) & ~is_new)[0]
        dup_of = None
        max_cos = None
        for i in cands:
            dot = float(E[i] @ E[j])
            cos = dot / np.sqrt(n2[i] * n2[j])
            max_cos = cos if max_cos is None else max(max_cos, cos)
            if dot > 0 and dot * dot >= _TAU2 * (n2[i] * n2[j]):
                dup_of = int(ids[i]) if dup_of is None else min(
                    dup_of, int(ids[i])
                )
        expect[int(ids[j])] = (
            int(assign[j]),
            len(cands),
            dup_of,
            None if max_cos is None else round(max_cos * 1_000_000),
            1 if dup_of is None else 0,
        )
    rows = dedup_semdedup_incremental(spark, sf_dir).collect()
    got = {
        r.vec_id: (r.cid, r.n_candidates, r.dup_of, r.max_cos_micro, r.is_kept)
        for r in rows
    }
    assert got == expect
    # the fixture exercises both outcomes
    assert any(v[2] is not None for v in expect.values())
    assert any(v[2] is None for v in expect.values())


def test_crossmodal_alignment_matches_replay(spark, sf_dir):
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.crossmodal import (
        _N_SLICES,
        sim_crossmodal_alignment,
    )
    from open_molecule_data_pipeline_spark.operators.semdedup import _TAU2

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    emb = {
        int(v): np.asarray(e, dtype=np.float64)
        for v, e in zip(t.vec_id, t.embedding)
    }
    stats = {}
    for v, ea in emb.items():
        if v % 2 or v + 1 not in emb:
            continue
        eb = emb[v + 1]
        dot = float(ea @ eb)
        na2, nb2 = float(ea @ ea), float(eb @ eb)
        aligned = 1 if dot > 0 and dot * dot >= _TAU2 * (na2 * nb2) else 0
        cm = round(dot / np.sqrt(na2 * nb2) * 1_000_000)
        s = (v // 2) % _N_SLICES
        n, al, tot, lo, hi = stats.get(s, (0, 0, 0, None, None))
        stats[s] = (
            n + 1,
            al + aligned,
            tot + cm,
            cm if lo is None else min(lo, cm),
            cm if hi is None else max(hi, cm),
        )
    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    expect = {
        s: (n, al, al * 1_000_000 // n, tdiv(tot, n), lo, hi)
        for s, (n, al, tot, lo, hi) in stats.items()
    }
    rows = sim_crossmodal_alignment(spark, sf_dir).collect()
    got = {
        r.slice: (
            r.n_pairs,
            r.n_aligned,
            r.align_rate_ppm,
            r.mean_cos_micro,
            r.min_cos_micro,
            r.max_cos_micro,
        )
        for r in rows
    }
    assert got == expect
    assert len(got) == _N_SLICES


def test_headline_swap_r15():
    """VERDICT r14 #6: the heaviest registered text plan is in the
    headline set; the demoted sibling is out; the cap holds."""
    from open_molecule_data_pipeline_spark.registry import load_all

    import bench

    specs = load_all()
    assert specs["text_kn_fivegram_ppl"].bench
    assert not specs["text_html_strip"].bench
    assert sum(1 for s in specs.values() if s.bench) <= bench.HEADLINE_CAP


def test_quality_classifier_hashed_matches_replay(spark, sf_dir):
    """Pure-Python replay of the hashing-trick scorer: md5-bucketed
    unigram+bigram features, Knuth-mixed weights, exact int64 sums."""
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.quality_classifier import (
        _MIX,
        _N_BUCKETS,
        _W_RANGE,
        text_quality_classifier_hashed,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()

    def wgt(g: str) -> int:
        h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
        return (h % _N_BUCKETS) * _MIX % _W_RANGE - _W_RANGE // 2

    expect = {}
    for doc_id, lang, text in zip(t.doc_id, t.lang, t.text):
        tk = [w for w in text.lower().split(" ") if w]
        grams = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        s = sum(wgt(g) for g in grams)
        n = len(grams)
        mean = 0 if n == 0 else (-((-s) // n) if s < 0 else s // n)
        expect[int(doc_id)] = (
            lang, n, s, mean, 1 if n > 0 and mean >= 0 else 0
        )
    rows = text_quality_classifier_hashed(spark, sf_dir).collect()
    got = {
        r.doc_id: (r.lang, r.n_features, r.w_sum, r.mean_w, r.kept)
        for r in rows
    }
    assert got == expect
    kept = sum(v[4] for v in expect.values())
    assert 0 < kept < len(expect)  # the gate separates the corpus


def test_aspect_bucket_sampling_matches_replay(spark, sf_dir):
    """Exact-integer replay of the aspect router: per doc, argmin of
    |w*d - h*n| * (D/d) over the ladder with lower-index tiebreak."""
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.gif import (
        _AR_BUCKETS,
        _AR_D_PROD,
        mm_aspect_bucket_sampling,
    )

    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    agg = {}
    for doc in ids:
        w, h = 8 + doc % 9, 8 + doc % 7
        best = min(
            (abs(w * d - h * n) * (_AR_D_PROD // d), i, n, d)
            for i, (n, d) in enumerate(_AR_BUCKETS)
        )
        _, i, n, d = best
        ar = w * 1000 // h
        cnt, tot, lo, hi = agg.get((i, n, d), (0, 0, None, None))
        agg[(i, n, d)] = (
            cnt + 1,
            tot + ar,
            ar if lo is None else min(lo, ar),
            ar if hi is None else max(hi, ar),
        )
    expect = {
        k: (c, t // c, lo, hi) for k, (c, t, lo, hi) in agg.items()
    }
    rows = mm_aspect_bucket_sampling(spark, sf_dir).collect()
    got = {
        (r.bucket, r.ar_n, r.ar_d): (
            r.n_images, r.mean_ar_milli, r.min_ar_milli, r.max_ar_milli
        )
        for r in rows
    }
    assert got == expect
    assert len(got) >= 3  # the 8..16 x 8..14 dims spread across buckets


def test_gif_local_color_table_overrides_global():
    """A frame-level Local Color Table must override the GCT: assemble
    a stream whose GCT and LCT disagree and pin the LCT decode."""
    gct = [(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)]
    lct = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    blob = (
        b"GIF89a"
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x80 | (7 << 4) | 1, 0, 0])
        + b"".join(bytes(c) for c in gct)
        + b"\x2c"
        + bytes(4)
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x80 | 1])  # LCT present, 4 entries, not interlaced
        + b"".join(bytes(c) for c in lct)
        + b"\x02"
        + b"\x02\x8c\x0b\x00"  # hand-pinned LZW for indices [1,1,1]
        + b"\x3b"
    )
    dec = decode_gif(blob)
    assert dec["frames"][0].tolist() == [[[40, 50, 60]] * 3]


def test_gif_transparency_flag_decodes_to_opaque_palette_rgb():
    """Documented semantics: GCE transparency is parsed and ignored —
    frames are full rasters, so the transparent index still decodes to
    its stored palette RGB (compositing, where transparency matters, is
    gated). A stream with the flag set must decode identically to one
    without, and still carry its delay."""
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    body = (
        b"\x2c"
        + bytes(4)
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + b"\x00\x02"
        + b"\x02\x8c\x0b\x00"
        + b"\x3b"
    )
    head = (
        b"GIF89a"
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x80 | (7 << 4) | 1, 0, 0])
        + b"".join(bytes(c) for c in pal)
    )
    # GCE: flags bit0 = transparency, transparent index = 1 (the very
    # index the frame uses), delay 7
    gce = b"\x21\xf9\x04\x01" + (7).to_bytes(2, "little") + b"\x01\x00"
    dec = decode_gif(head + gce + body)
    assert dec["frames"][0].tolist() == [[[40, 50, 60]] * 3]
    assert dec["delays_cs"] == [7]


def test_gif_container_roundtrip_other_palette_sizes():
    """Container-level roundtrip at the mcs extremes: a 4-color palette
    (mcs=2) and a 256-color palette (mcs=8, GCT size bits 7)."""
    for n_pal in (4, 256):
        pal = [((c * 7 + 1) % 256, (c * 13 + 5) % 256, (c * 31 + 11) % 256)
               for c in range(n_pal)]
        idx = (np.arange(12 * 9, dtype=np.int64) * 5 % n_pal).astype(
            np.uint8
        ).reshape(9, 12)
        for inter in (False, True):
            dec = decode_gif(encode_gif([(idx, 0)], pal, interlace=inter))
            assert (
                dec["frames"][0] == np.array(pal, dtype=np.uint8)[idx]
            ).all(), (n_pal, inter)


def test_stream_quality_gate_twin_equals_batch_aggregation(spark, sf_dir):
    """The streaming twin must equal the per-lang aggregation of the
    BATCH classifier — same scoring expressions by construction, so any
    divergence is a streaming-path bug (source discovery, stateful agg,
    sink commit)."""
    from pyspark.sql import functions as F

    from open_molecule_data_pipeline_spark.operators.quality_classifier import (
        text_quality_classifier_hashed,
    )
    from open_molecule_data_pipeline_spark.operators.quality_classifier import (
        stream_quality_gate_twin,
    )

    batch = (
        text_quality_classifier_hashed(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("w_sum").cast("long").alias("sum_w"),
        )
    )
    want = {
        r.lang: (r.n_docs, r.n_kept, r.sum_w) for r in batch.collect()
    }
    got = {
        r.lang: (r.n_docs, r.n_kept, r.sum_w)
        for r in stream_quality_gate_twin(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) > 0


def test_paragraphs_incremental_matches_replay(spark, sf_dir):
    """Pure-Python replay of the batch-vs-corpus segment novelty: md5
    doc slice, consecutive 8-token segments (split on ' ' WITHOUT
    empty-filtering — dedup_paragraphs' exact convention), corpus
    distinct set, per-new-doc occurrence counts."""
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.segments import (
        _SEG,
        dedup_paragraphs_incremental,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()

    def segs(text):
        tk = text.split(" ")
        return [
            " ".join(tk[i * _SEG : i * _SEG + _SEG])
            for i in range((len(tk) + _SEG - 1) // _SEG)
        ]

    new = {}
    corpus = set()
    for doc_id, text in zip(t.doc_id, t.text):
        is_new = hashlib.md5(str(int(doc_id)).encode()).hexdigest()[0] == "0"
        if is_new:
            new[int(doc_id)] = segs(text)
        else:
            corpus.update(segs(text))
    expect = {}
    for doc_id, ss in new.items():
        n, seen = len(ss), sum(1 for s in ss if s in corpus)
        expect[doc_id] = (n, seen, (n - seen) * 1_000_000 // n)
    rows = dedup_paragraphs_incremental(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_segments, r.n_seen, r.novelty_ppm) for r in rows}
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # corpus hits exist
    assert any(v[1] < v[0] for v in expect.values())  # novelty exists
