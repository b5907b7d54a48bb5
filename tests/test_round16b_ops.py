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
