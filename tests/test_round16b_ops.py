"""Round-16b additions: PNG Adam7 interlace + indexed color (PLTE).

Reference parity note: the reference repo has no codec layer (its
``analysis/`` package is a docstring-only scaffold, analysis/__init__.py:1);
these tests pin the PNG specification behaviors directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from open_molecule_data_pipeline_spark.operators.multimodal import (
    _adam7_dims,
    decode_media,
    decode_png,
    encode_png,
)

PAL = [((c * 5 + 1) % 256, (c * 11 + 3) % 256, (c * 23 + 7) % 256) for c in range(64)]


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# ------------------------------------------------------------------
# Adam7 geometry
# ------------------------------------------------------------------


def test_adam7_pass_pixel_partition():
    """The seven passes tile every pixel exactly once, for every size."""
    for w in range(1, 20):
        for h in range(1, 20):
            seen = np.zeros((h, w), dtype=np.int32)
            for x0, y0, dx, dy, pw, ph in _adam7_dims(w, h):
                if pw and ph:
                    seen[y0::dy, x0::dx] += 1
                    assert seen[y0::dy, x0::dx].shape == (ph, pw)
            assert (seen == 1).all(), (w, h)


def test_adam7_small_image_empty_passes():
    """Widths/heights below the pass origin leave that pass EMPTY (no
    scanlines, not even filter bytes) — the spec's small-image rule."""
    dims = _adam7_dims(1, 1)
    assert [(pw, ph) for *_, pw, ph in dims] == [
        (1, 1), (0, 1), (1, 0), (0, 1), (1, 0), (0, 1), (1, 0)
    ]


# ------------------------------------------------------------------
# Interlaced round-trips through the real encoder
# ------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (2, 2), (7, 5), (8, 8), (11, 13), (3, 16)])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_interlaced_roundtrip(shape, ch):
    h, w = shape
    rng = np.random.RandomState(h * 31 + w * 7 + ch)
    img = rng.randint(0, 256, (h, w, ch) if ch > 1 else (h, w)).astype(np.uint8)
    dec = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4], interlace=True))
    assert dec["width"] == w and dec["height"] == h
    exp = img if ch > 1 else img[:, :, None]
    assert (dec["pixels"].reshape(exp.shape) == exp).all()


def test_png_interlaced_vs_sequential_same_pixels():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 10, 3)).astype(np.uint8)
    a = decode_png(encode_png(img, filters=[4, 4, 4], interlace=True))
    b = decode_png(encode_png(img, filters=[0]))
    assert (a["pixels"] == b["pixels"]).all()
    # byte streams differ (different raster serialization)
    assert encode_png(img, interlace=True) != encode_png(img)


def test_png_handbuilt_interlaced_2x2_scatter_order():
    """Spec-pinned pass order for a 2x2 gray image, independent of our
    encoder: pass 1 holds (0,0), pass 6 holds (1,0), pass 7 holds the
    bottom row — passes 2-5 are empty."""
    raw = bytes([0, 10]) + bytes([0, 20]) + bytes([0, 30, 40])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    dec = decode_png(blob)
    assert dec["pixels"][:, :, 0].tolist() == [[10, 20], [30, 40]]


def test_png_interlaced_filters_are_per_pass():
    """Filter type 2 (Up) in the FIRST row of a later pass must see a
    zero prior row (each pass filters as its own image), not the last
    row of the previous pass."""
    # 1x2 gray image: pass 1 -> (0,0), pass 7 -> (0,1)
    raw = bytes([0, 100]) + bytes([2, 7])  # Up filter against implicit zero
    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 0, 0, 0, 1)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(blob)["pixels"][:, :, 0].tolist() == [[100], [7]]


def test_png_interlaced_truncated_idat_fails_loudly():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = encode_png(img, interlace=True)
    # rebuild with the last pass's bytes dropped from the zlib stream
    raw = zlib.decompress(blob[blob.index(b"IDAT") + 4 : blob.rindex(b"IEND") - 8])
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw[:-25]))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(short)


# ------------------------------------------------------------------
# Indexed color (PLTE)
# ------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
def test_png_palette_roundtrip(interlace):
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 64, (6, 9)).astype(np.uint8)
    dec = decode_png(
        encode_png(idx, filters=[2, 4, 0, 3, 1], interlace=interlace, palette=PAL)
    )
    assert dec["channels"] == 3
    assert (dec["pixels"] == np.asarray(PAL, dtype=np.uint8)[idx]).all()


def test_png_palette_vs_truecolor_same_pixels_different_bytes():
    idx = (np.arange(20, dtype=np.int64).reshape(4, 5) * 7 % 64).astype(np.uint8)
    a = encode_png(idx, palette=PAL, interlace=True)
    b = encode_png(np.asarray(PAL, dtype=np.uint8)[idx])
    assert a != b
    assert (decode_png(a)["pixels"] == decode_png(b)["pixels"]).all()


def test_png_indexed_missing_plte_rejected():
    blob = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8), palette=PAL))
    # excise the PLTE chunk (it sits right after the 25-byte IHDR + 8 sig)
    start = bytes(blob).index(b"PLTE") - 4
    (size,) = struct.unpack_from(">I", bytes(blob), start)
    del blob[start : start + 12 + size]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(blob))


def test_png_encode_palette_index_out_of_range_rejected():
    with pytest.raises(ValueError, match="palette index"):
        encode_png(np.full((2, 2), 64, dtype=np.uint8), palette=PAL)


def test_png_decode_palette_index_out_of_range_rejected():
    short_pal = PAL[:8]
    raw = bytes([0, 9])  # index 9 against an 8-entry PLTE
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", bytes(v for rgb in short_pal for v in rgb))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(blob)


def test_png_bad_plte_size_rejected():
    raw = bytes([0, 0])
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x01\x02")  # not a multiple of 3
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(blob)


def test_png_existing_gates_unchanged():
    """depth != 8 and unknown color types still fail loudly, and the
    non-interlaced path still dispatches through decode_media."""
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    ihdr_off = 8 + 8  # sig + chunk header
    blob[ihdr_off + 8] = 16  # bit depth
    body = bytes(blob[ihdr_off : ihdr_off + 13])
    blob[ihdr_off + 13 : ihdr_off + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(blob))
    assert decode_media(encode_png(img), "image/png")["width"] == 2


# ------------------------------------------------------------------
# G.711 + IMA ADPCM WAV decode
# ------------------------------------------------------------------

from open_molecule_data_pipeline_spark.operators.audio_codecs import (  # noqa: E402
    encode_wav_g711,
    encode_wav_ima_adpcm,
    ima_adpcm_encode,
)
from open_molecule_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    IMA_STEPS,
    decode_wav,
    g711_to_linear,
    ima_adpcm_step,
)


def test_g711_known_vectors():
    """Spec reference points: mu-law 0x00 is the negative maximum
    (-32124), both zero codes decode to 0; A-law 0x55/0xD5 are -8/+8
    and 0x2A/0xAA the +-32256 extremes."""
    ulaw = g711_to_linear(np.array([0x00, 0xFF, 0x7F, 0x80]), alaw=False)
    assert ulaw.tolist() == [-32124, 0, 0, 32124]
    alaw = g711_to_linear(np.array([0x55, 0xD5, 0x2A, 0xAA]), alaw=True)
    assert alaw.tolist() == [-8, 8, -32256, 32256]


def test_g711_wav_container_roundtrip():
    codes = np.arange(256, dtype=np.uint8)
    for alaw in (False, True):
        dec = decode_wav(encode_wav_g711(codes, alaw=alaw, sample_rate=16000))
        assert dec["audio_format"] == (6 if alaw else 7)
        assert dec["bits_per_sample"] == 8
        assert dec["sample_rate"] == 16000
        assert dec["n_samples"] == 256
        assert np.array_equal(dec["frames"], g711_to_linear(codes, alaw=alaw))


def test_g711_decode_covers_full_int16_span_monotonically():
    """Within one sign of mu-law, increasing codeword magnitude must
    decode to monotonically decreasing magnitude (codes order inverts)."""
    neg = g711_to_linear(np.arange(0, 128), alaw=False).astype(np.int64)
    assert (np.diff(neg) > 0).all() and neg[0] == -32124 and neg[-1] == 0


def test_ima_adpcm_single_block_matches_step_replay():
    nibs = [(3 * k + 1) % 16 for k in range(17)]  # odd count -> pad nibble
    pred, idx = -1234, 30
    dec = decode_wav(encode_wav_ima_adpcm([(pred, idx, nibs)]))
    assert dec["audio_format"] == 0x11
    expect = [pred]
    p, i = pred, idx
    for nib in nibs:
        p, i = ima_adpcm_step(p, i, nib)
        expect.append(p)
    assert dec["frames"].tolist() == expect
    assert dec["n_samples"] == len(nibs) + 1


def test_ima_adpcm_multi_block_headers_reseed_state():
    """Each block's header predictor/index reseeds the decoder — block 2
    must decode from ITS header, not block 1's final state."""
    nibs_a = [7] * 8
    nibs_b = [2] * 8
    dec = decode_wav(
        encode_wav_ima_adpcm([(1000, 10, nibs_a), (-2000, 88, nibs_b)])
    )
    expect = []
    for pred, idx, nibs in [(1000, 10, nibs_a), (-2000, 88, nibs_b)]:
        expect.append(pred)
        p, i = pred, idx
        for nib in nibs:
            p, i = ima_adpcm_step(p, i, nib)
            expect.append(p)
    assert dec["frames"].tolist() == expect


def test_ima_adpcm_clamps_at_int16_rails_and_index_bounds():
    # all-magnitude nibbles from the top step must clamp, not wrap
    dec = decode_wav(encode_wav_ima_adpcm([(32000, 88, [7] * 6)]))
    assert dec["frames"].max() == 32767
    dec2 = decode_wav(encode_wav_ima_adpcm([(-32000, 88, [15] * 6)]))
    assert dec2["frames"].min() == -32768
    # index floor: descending nibbles at index 0 stay at index 0 (step 7)
    p, i = ima_adpcm_step(0, 0, 0)
    assert i == 0 and p == 0 + (IMA_STEPS[0] >> 3)


def test_ima_adpcm_encoder_reconstruction_tracks_signal():
    t = np.arange(200)
    sig = (6000 * np.sin(t / 9.0) + 2000 * np.sin(t / 3.1)).astype(np.int16)
    nibs = ima_adpcm_encode(sig, 0, 0)
    dec = decode_wav(encode_wav_ima_adpcm([(0, 0, nibs)]))
    recon = dec["frames"][1:].astype(np.int64)  # sample 0 is the seed
    err = np.abs(recon - sig.astype(np.int64))
    # after the adaptive ramp-up the quantizer tracks within ~2 steps
    assert err[20:].max() < 2500
    assert err[20:].mean() < 600


def test_ima_adpcm_rejects_bad_geometry():
    with pytest.raises(ValueError, match="step index"):
        encode_wav_ima_adpcm([(0, 89, [0] * 4)])
    blob = bytearray(encode_wav_ima_adpcm([(0, 0, [0] * 8)]))
    # truncate data so it is no longer block-aligned
    blob[-3:] = b""
    size = len(blob) - 8
    blob[4:8] = struct.pack("<I", size)
    dsize = struct.unpack_from("<I", bytes(blob), blob.index(b"data") + 4)[0]
    blob[blob.index(b"data") + 4 : blob.index(b"data") + 8] = struct.pack(
        "<I", dsize - 3
    )
    with pytest.raises(ValueError, match="block-aligned"):
        decode_wav(bytes(blob))


def test_ima_adpcm_rejects_stereo_and_missing_spb():
    blob = bytearray(encode_wav_ima_adpcm([(0, 0, [0] * 8)]))
    ch_off = blob.index(b"fmt ") + 8 + 2
    blob[ch_off : ch_off + 2] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(blob))
    # fmt chunk truncated to the 16 PCM bytes: samplesPerBlock missing
    blob2 = bytearray(encode_wav_ima_adpcm([(0, 0, [0] * 8)]))
    fmt_off = blob2.index(b"fmt ")
    del blob2[fmt_off + 8 + 16 : fmt_off + 8 + 20]
    blob2[fmt_off + 4 : fmt_off + 8] = struct.pack("<I", 16)
    blob2[4:8] = struct.pack("<I", len(blob2) - 8)
    with pytest.raises(ValueError, match="samplesPerBlock"):
        decode_wav(bytes(blob2))


def test_wav_float_format_still_rejected():
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        encode_wav_pcm16,
    )

    blob = bytearray(encode_wav_pcm16(np.array([1, 2], dtype=np.int16)))
    blob[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(blob))


# ------------------------------------------------------------------
# JPEG restart intervals (DRI / RSTn)
# ------------------------------------------------------------------

from open_molecule_data_pipeline_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_color,
)


def _gray_blocks(seed, n):
    rng = np.random.RandomState(seed)
    return [list(rng.randint(-6, 7, 64)) for _ in range(n)]


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_jpeg_restart_gray_roundtrip(ri):
    blocks = _gray_blocks(ri, 12)
    ref = decode_jpeg(encode_jpeg_baseline(blocks, 4, 3))["pixels"]
    blob = encode_jpeg_baseline(blocks, 4, 3, restart_interval=ri)
    assert (decode_jpeg(blob)["pixels"] == ref).all()
    assert blob != encode_jpeg_baseline(blocks, 4, 3)


@pytest.mark.parametrize("samp,nyb", [("420", 4), ("422", 2), ("444", 1)])
def test_jpeg_restart_color_roundtrip(samp, nyb):
    rng = np.random.RandomState(9)
    mw, mh = 3, 2
    n = mw * mh
    yb = [list(rng.randint(-4, 5, 64)) for _ in range(nyb * n)]
    cb = [list(rng.randint(-3, 4, 64)) for _ in range(n)]
    cr = [list(rng.randint(-3, 4, 64)) for _ in range(n)]
    ref = decode_jpeg(encode_jpeg_color(yb, cb, cr, mw, mh, samp=samp))
    got = decode_jpeg(
        encode_jpeg_color(yb, cb, cr, mw, mh, samp=samp, restart_interval=2)
    )
    assert (got["pixels"] == ref["pixels"]).all()


def test_jpeg_restart_markers_cycle_mod_8():
    """More than 8 restarts must wrap RST7 -> RST0 per the spec."""
    blocks = _gray_blocks(1, 12)
    blob = encode_jpeg_baseline(blocks, 12, 1, restart_interval=1)
    # scan entropy bytes after SOS for restart markers in order
    sos = blob.index(b"\xff\xda")
    seen = []
    i = sos + 2
    while i < len(blob) - 1:
        if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7:
            seen.append(blob[i + 1] - 0xD0)
            i += 2
        else:
            i += 1
    assert seen == [0, 1, 2, 3, 4, 5, 6, 7, 0, 1, 2]


def test_jpeg_restart_dri_segment_written_and_parsed():
    blocks = _gray_blocks(2, 4)
    blob = encode_jpeg_baseline(blocks, 2, 2, restart_interval=2)
    assert b"\xff\xdd\x00\x04\x00\x02" in blob


def test_jpeg_wrong_restart_marker_fails_loudly():
    blocks = _gray_blocks(3, 6)
    blob = bytearray(encode_jpeg_baseline(blocks, 6, 1, restart_interval=2))
    # corrupt the first RSTn's low nibble
    for i in range(len(blob) - 1):
        if blob[i] == 0xFF and blob[i + 1] == 0xD0:
            blob[i + 1] = 0xD5
            break
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(blob))


def test_jpeg_restart_interval_larger_than_image_is_noop_stream():
    """ri >= MCU count emits DRI but no RSTn; decode must still agree."""
    blocks = _gray_blocks(4, 4)
    blob = encode_jpeg_baseline(blocks, 2, 2, restart_interval=100)
    assert not any(
        blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
        for i in range(blob.index(b"\xff\xda") + 2, len(blob) - 2)
    )
    ref = decode_jpeg(encode_jpeg_baseline(blocks, 2, 2))["pixels"]
    assert (decode_jpeg(blob)["pixels"] == ref).all()


# ------------------------------------------------------------------
# Progressive JPEG restart intervals
# ------------------------------------------------------------------

from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (  # noqa: E402
    _AC_P_BITS,
    _AC_P_SYMS,
    _decode_ac_first_scan,
    _encode_ac_first,
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


@pytest.mark.parametrize("ri", [1, 2, 3, 5])
def test_progressive_restart_roundtrip(ri):
    rng = np.random.RandomState(ri)
    blocks = [list(rng.randint(-6, 7, 64)) for _ in range(12)]
    ref = decode_jpeg_progressive(encode_jpeg_progressive(blocks, 4, 3))
    blob = encode_jpeg_progressive(blocks, 4, 3, restart_interval=ri)
    got = decode_jpeg_progressive(blob)
    assert (got["pixels"] == ref["pixels"]).all()
    assert got["n_scans"] == 4
    # the baseline dispatcher route sees the same pixels
    assert (decode_jpeg(blob)["pixels"] == ref["pixels"]).all()


def test_progressive_restart_sparse_eobrun_flush():
    """All-zero AC bands force maximal EOB runs; with restarts the run
    must flush at every boundary and the pixels still match."""
    blocks = [[0] * 64 for _ in range(12)]
    blocks[0][0] = 3
    blocks[7][20] = 2
    ref = decode_jpeg_progressive(encode_jpeg_progressive(blocks, 6, 2))
    for ri in (1, 2, 4):
        got = decode_jpeg_progressive(
            encode_jpeg_progressive(blocks, 6, 2, restart_interval=ri)
        )
        assert (got["pixels"] == ref["pixels"]).all()


def test_progressive_restart_count_resets_per_scan():
    """T.81 E.1.4: the marker count restarts at RST0 in every scan —
    the first restart marker after each SOS must be RST0."""
    blocks = [[0] * 64 for _ in range(6)]
    blob = encode_jpeg_progressive(blocks, 6, 1, restart_interval=2)
    firsts = []
    i = 2
    while i < len(blob) - 1:
        if blob[i] == 0xFF and blob[i + 1] == 0xDA:
            seglen = int.from_bytes(blob[i + 2 : i + 4], "big")
            j = i + 2 + seglen
            while j < len(blob) - 1:
                if blob[j] == 0xFF and 0xD0 <= blob[j + 1] <= 0xD7:
                    firsts.append(blob[j + 1] - 0xD0)
                    break
                if blob[j] == 0xFF and blob[j + 1] not in (0x00,):
                    firsts.append(None)
                    break
                j += 1
            i = j
        i += 1
    assert firsts and all(f == 0 for f in firsts)


def test_progressive_missing_restart_marker_rejected():
    """A DRI promise without markers in the stream must fail loudly,
    not desync."""
    blocks = [[0] * 64 for _ in range(6)]
    blob = bytearray(encode_jpeg_progressive(blocks, 6, 1))
    # splice a DRI(1) right before the first SOS
    sos = bytes(blob).index(b"\xff\xda")
    blob[sos:sos] = b"\xff\xdd\x00\x04\x00\x01"
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_progressive(bytes(blob))


def test_progressive_eob_run_crossing_restart_rejected():
    """An EOB run spanning a restart boundary is spec-invalid; the scan
    decoder must refuse rather than silently resynchronize."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
    )

    blocks = [[0] * 64 for _ in range(4)]  # one EOB4 covers everything
    bw_ = _BitWriter()
    _encode_ac_first(bw_, blocks, 1, 5, 0, 0)  # NO restart flushes
    bw_.flush()
    tbl = {}
    code, k = 0, 0
    for li, cnt in enumerate(_AC_P_BITS):
        for _ in range(cnt):
            tbl[(li + 1, code)] = _AC_P_SYMS[k]
            code += 1
            k += 1
        code <<= 1
    rd = _BitReader(bytes(bw_.out))

    def sym(tab):
        ln, c = 0, 0
        while True:
            c = (c << 1) | rd.bit()
            ln += 1
            s = tab.get((ln, c))
            if s is not None:
                return s
            assert ln <= 16

    out = [[0] * 64 for _ in range(4)]
    with pytest.raises(ValueError, match="restart boundary"):
        _decode_ac_first_scan(rd, sym, tbl, out, 1, 5, 0, ri=2)


# ------------------------------------------------------------------
# 8-bit / 24-bit PCM WAV
# ------------------------------------------------------------------

from open_molecule_data_pipeline_spark.operators.audio_codecs import (  # noqa: E402
    encode_wav_pcm8,
    encode_wav_pcm24,
)


def test_pcm8_unsigned_expansion():
    dec = decode_wav(encode_wav_pcm8([0, 128, 255, 1]))
    assert dec["bits_per_sample"] == 8
    assert dec["frames"].tolist() == [-32768, 0, 32512, -32512]


def test_pcm24_sign_extension_and_order():
    vals = [0, 1, -1, 8388607, -8388608, 123456, -654321]
    dec = decode_wav(encode_wav_pcm24(vals))
    assert dec["bits_per_sample"] == 24
    assert dec["frames"].tolist() == vals
    assert dec["n_samples"] == len(vals)


def test_pcm24_misaligned_data_rejected():
    blob = bytearray(encode_wav_pcm24([5, -5]))
    blob[-1:] = b""
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    doff = bytes(blob).index(b"data")
    dsize = struct.unpack_from("<I", bytes(blob), doff + 4)[0]
    blob[doff + 4 : doff + 8] = struct.pack("<I", dsize - 1)
    with pytest.raises(ValueError, match="multiple of 3"):
        decode_wav(bytes(blob))


# ------------------------------------------------------------------
# BMP 8-bit palettized + BI_RLE8
# ------------------------------------------------------------------

from open_molecule_data_pipeline_spark.operators.bmp_rle import (  # noqa: E402
    _fixture_indices as _bmp_fixture,
    _palette as _bmp_palette,
    encode_bmp_rle8,
)
from open_molecule_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_bmp,
    encode_bmp,
)

BPAL = _bmp_palette()
BPARR = np.asarray(BPAL, dtype=np.uint8)


def _rle8_container(w, h, data, n_colors=64, compression=1, h_sign=1):
    quads = bytearray()
    for r, g, b in BPAL[:n_colors]:
        quads += bytes([b, g, r, 0])
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * h_sign, 1, 8, compression, len(data),
        2835, 2835, n_colors, 0,
    )
    off = 14 + 40 + len(quads)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + info + bytes(quads) + bytes(data)


@pytest.mark.parametrize("shape", [(1, 1), (3, 4), (5, 5), (7, 9), (2, 13)])
def test_bmp_rle8_roundtrip(shape):
    h, w = shape
    idx = _bmp_fixture(h * 31 + w, w, h)
    dec = decode_bmp(encode_bmp_rle8(idx, BPAL))
    assert dec["width"] == w and dec["height"] == h and dec["channels"] == 3
    assert (dec["pixels"] == BPARR[idx]).all()


def test_bmp_rle8_exercises_both_modes():
    """The mixed-regime fixture must emit encoded runs AND absolute
    mode — assert both opcodes appear in the stream."""
    idx = _bmp_fixture(7, 12, 6)
    blob = encode_bmp_rle8(idx, BPAL)
    data = blob[14 + 40 + 64 * 4 :]
    has_run = has_abs = False
    i = 0
    while i + 1 < len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:
            has_run = True
        elif v >= 3:
            has_abs = True
            i += v + (v & 1)
        elif v == 2:
            i += 2
    assert has_run and has_abs


def test_bmp_rle8_handbuilt_all_opcodes():
    """Hand-assembled stream with encoded run, absolute (odd length ->
    word pad), EOL, delta skip, and EOB — spec semantics pinned
    independent of our encoder. Delta-skipped cells keep index 0."""
    data = (
        bytes([4, 5])            # bottom row: 4x index 5
        + b"\x00\x00"            # EOL
        + bytes([0, 3, 1, 2, 3, 0])  # absolute [1,2,3] + pad byte
        + bytes([1, 9])          # then one 9
        + b"\x00\x00"            # EOL
        + bytes([0, 2, 1, 0])    # delta: skip 1 right
        + bytes([3, 7])          # 3x index 7
        + b"\x00\x01"            # EOB
    )
    dec = decode_bmp(_rle8_container(4, 3, data))
    exp_idx = np.array([[0, 7, 7, 7], [1, 2, 3, 9], [5, 5, 5, 5]])
    assert (dec["pixels"] == BPARR[exp_idx]).all()


def test_bmp_8bit_uncompressed_stride_pad():
    """Uncompressed 8-bit rows pad to 4-byte stride; w=5 forces 3 pad
    bytes per row. Bottom-up order."""
    rows = [bytes([1, 2, 3, 4, 5]) + b"\x00\x00\x00",
            bytes([6, 7, 8, 9, 10]) + b"\x00\x00\x00"]
    data = rows[0] + rows[1]  # stream row 0 = image bottom
    dec = decode_bmp(_rle8_container(5, 2, data, compression=0))
    exp_idx = np.array([[6, 7, 8, 9, 10], [1, 2, 3, 4, 5]])
    assert (dec["pixels"] == BPARR[exp_idx]).all()


def test_bmp_rle8_error_gates():
    with pytest.raises(ValueError, match="overflows"):
        decode_bmp(_rle8_container(3, 2, bytes([5, 1]) + b"\x00\x01"))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(_rle8_container(3, 2, bytes([3, 1, 0, 0])))
    with pytest.raises(ValueError, match="bottom-up"):
        decode_bmp(_rle8_container(3, 2, bytes([3, 1]) + b"\x00\x01", h_sign=-1))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(_rle8_container(3, 2, bytes([0, 2])))
    # palette index past clr_used fails loudly
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp(_rle8_container(3, 1, bytes([3, 60]) + b"\x00\x01", n_colors=16))
    with pytest.raises(ValueError, match="index out of range"):
        encode_bmp_rle8(np.full((2, 2), 64, np.uint8), BPAL)


def test_bmp_24bit_path_unchanged():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (6, 5, 3)).astype(np.uint8)
    dec = decode_bmp(encode_bmp(img))
    assert (dec["pixels"] == img).all()
