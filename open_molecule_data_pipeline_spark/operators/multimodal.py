"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a ``binary``
column (or a pointer to object storage) next to typed metadata; run decode /
feature-extraction as Arrow-batched ``mapInPandas`` so each Python call
processes a whole record batch. The actual media codecs aren't in this
container, so the decode step is a clearly marked stub
(:func:`decode_media`), while the Spark-side plumbing — schema, batch
shape, UDF signature, partitioning — is real and tested.

The testdata has no binary column, so blobs are synthesized from
``documents.text`` (utf-8 bytes) — the plumbing is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread

FEATURE_BUCKETS = 16


def encode_wav_pcm16(samples, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Build a canonical RIFF/WAVE container around 16-bit PCM samples."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<IHHIIHH",
        16,  # fmt chunk size (PCM)
        1,  # audio format: PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 16 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# --------------------------------------------------------------------------
# Companding / ADPCM expansion (the non-PCM WAV format tags a crawl
# actually carries: G.711 telephony captures and IMA ADPCM voice blocks).
# Both decoders are the exact integer recurrences of the specs — G.711
# per the standard segment/mantissa expansion, IMA per the DVI/IMA
# step-table state machine — so oracle twins can replay them
# arithmetically (G.711 in closed form, ADPCM via a recursive CTE).
# --------------------------------------------------------------------------

# DVI/IMA ADPCM quantizer step table (89 entries) and index adjustments.
IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def g711_to_linear(codes, alaw: bool):
    """Vectorized G.711 codeword -> int16 expansion (mu-law unless
    ``alaw``), the standard segment/mantissa integer formulas."""
    import numpy as np

    c = np.asarray(codes, dtype=np.int64)
    if alaw:
        a = c ^ 0x55
        seg = (a >> 4) & 7
        man = a & 0xF
        t = np.where(
            seg == 0,
            man * 16 + 8,
            (man * 16 + 0x108) << np.maximum(seg - 1, 0),
        )
        lin = np.where(a & 0x80, t, -t)
    else:
        u = 255 - c  # == ~c for a byte
        t = ((u & 0xF) * 8 + 0x84) << ((u >> 4) & 7)
        lin = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return lin.astype(np.int16)


def ima_adpcm_step(pred: int, idx: int, nib: int):
    """One IMA state transition: (predictor, step index) x nibble ->
    the next (predictor, step index). Diff uses the PRE-update step."""
    step = IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_ADJUST[nib & 7]))
    return pred, idx


def _ima_adpcm_decode_blocks(data: bytes, block_align: int, spb: int):
    """Decode mono IMA ADPCM blocks: each ``block_align``-byte block is a
    4-byte header (int16 seed predictor — emitted as the block's first
    sample — uint8 step index, reserved) followed by packed nibbles, low
    nibble first; ``spb`` samples come out of each block, trailing pad
    nibbles ignored."""
    import struct

    import numpy as np

    if block_align < 5 or spb < 1 or spb > 1 + (block_align - 4) * 2:
        raise ValueError("bad IMA ADPCM block geometry")
    if len(data) % block_align:
        raise ValueError("IMA ADPCM data is not block-aligned")
    out = []
    for base in range(0, len(data), block_align):
        pred, idx, _rsvd = struct.unpack_from("<hBB", data, base)
        if idx > 88:
            raise ValueError("IMA ADPCM step index out of range")
        out.append(pred)
        emitted = 1
        for k in range((block_align - 4) * 2):
            if emitted == spb:
                break
            byte = data[base + 4 + k // 2]
            nib = (byte >> 4) if k % 2 else (byte & 0xF)
            pred, idx = ima_adpcm_step(pred, idx, nib)
            out.append(pred)
            emitted += 1
    return np.asarray(out, dtype=np.int16)


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload: pure byte arithmetic, no codec library.
    Walks the chunk list (tolerates extra chunks like LIST/fact) and
    expands PCM-16, G.711 mu-law/A-law (format tags 7/6), or mono IMA
    ADPCM (tag 0x11) to the int16 sample array."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    fmt_body = b""
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format == 1 and bits == 16:
        frames = np.frombuffer(data, dtype="<i2")
    elif audio_format == 1 and bits == 8:
        # 8-bit PCM is UNSIGNED per the WAV spec; expand to int16 span
        frames = (
            (np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128) << 8
        ).astype(np.int16)
    elif audio_format == 1 and bits == 24:
        if len(data) % 3:
            raise ValueError("24-bit PCM data length not a multiple of 3")
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        frames = np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.int32)
    elif audio_format in (6, 7) and bits == 8:
        frames = g711_to_linear(
            np.frombuffer(data, dtype=np.uint8), alaw=(audio_format == 6)
        )
    elif audio_format == 0x11 and bits == 4:
        if n_channels != 1:
            raise ValueError("IMA ADPCM decode supports mono only")
        if len(fmt_body) < 20:
            raise ValueError("IMA ADPCM fmt chunk is missing samplesPerBlock")
        (spb,) = struct.unpack_from("<H", fmt_body, 18)
        frames = _ima_adpcm_decode_blocks(data, block_align, spb)
    else:
        raise ValueError(f"unsupported WAV encoding: format={audio_format} bits={bits}")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "audio_format": audio_format,
        "n_samples": len(frames) // n_channels,
        "frames": frames,
    }


# --------------------------------------------------------------------------
# Image codecs — pure stdlib (zlib + byte arithmetic), no pillow required.
# PNG covers the compressed-container path (zlib streams, per-row filters
# 0-4 incl. Paeth prediction); BMP and PPM cover the raw-raster paths.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass geometry: (x0, y0, dx, dy). A pass over a W x H image is a
# ceil((W-x0)/dx) x ceil((H-y0)/dy) reduced image; passes that come out
# empty in either dimension contribute NO scanlines (not even filter
# bytes) — the spec's small-image rule, and the part most hand-rolled
# decoders get wrong.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(w: int, h: int):
    """Per-pass (x0, y0, dx, dy, pw, ph) for a W x H image."""
    return [
        (x0, y0, dx, dy, max(0, (w - x0 + dx - 1) // dx),
         max(0, (h - y0 + dy - 1) // dy))
        for x0, y0, dx, dy in _ADAM7
    ]


def _filter_scanlines(arr, bpp: int, filters, row_base: int) -> bytes:
    """Filter an (N, stride) int32 scanline block per the spec; the prior
    row resets at the block boundary (each Adam7 pass filters as its own
    image). ``row_base`` keeps the filter-type cycle global across passes
    so interlaced fixtures still exercise every filter type."""
    import numpy as np

    raw = bytearray()
    n, stride = arr.shape
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(n):
        row = arr[y]
        ftype = 0 if filters is None else int(
            filters[(row_base + y) % len(filters)]
        )
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, dtype=np.int32), prior[:-bpp]])
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prior
        elif ftype == 3:
            filt = row - (left + prior) // 2
        elif ftype == 4:
            filt = row - _paeth(left, prior, up_left)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        raw.append(ftype)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prior = row
    return bytes(raw)


def encode_png(pixels, filters=None, interlace=False, palette=None) -> bytes:
    """8-bit PNG from an (H, W, 3|4) RGB(A) or (H, W) grayscale array —
    or, with ``palette`` (a list of RGB triples), an (H, W) index array
    written as color type 3 with a PLTE chunk.

    ``filters`` optionally gives the per-row filter type (0-4); default is
    filter 0 everywhere. Non-zero filters are applied exactly per the spec,
    so a round-trip exercises the decoder's full unfilter matrix.
    ``interlace=True`` writes the seven Adam7 passes, each filtered as its
    own reduced image.
    """
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if palette is not None:
        if arr.ndim != 2:
            raise ValueError("palette PNG expects an (H, W) index array")
        if int(arr.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        arr = arr[:, :, None]
        color_type, ch = 3, 1
    else:
        if arr.ndim == 2:
            arr = arr[:, :, None]
        color_type = {1: 0, 3: 2, 4: 6}[arr.shape[2]]
        ch = arr.shape[2]
    h, w = arr.shape[:2]
    flat = arr.astype(np.int32)
    raw = bytearray()
    if interlace:
        row_base = 0
        for x0, y0, dx, dy, pw, ph in _adam7_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            sub = flat[y0::dy, x0::dx].reshape(ph, pw * ch)
            raw.extend(_filter_scanlines(sub, ch, filters, row_base))
            row_base += ph
    else:
        raw.extend(
            _filter_scanlines(flat.reshape(h, w * ch), ch, filters, 0)
        )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw), 6)) + chunk(b"IEND", b"")


def _paeth(left, up, up_left):
    """Paeth predictor, vectorized over a scanline."""
    import numpy as np

    p = left + up - up_left
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
    )


def _unfilter_scanlines(raw: bytes, off: int, n_rows: int, stride: int, bpp: int):
    """Unfilter ``n_rows`` scanlines of ``stride`` bytes starting at byte
    ``off`` (each row led by its filter-type byte); the prior row starts
    zero — one Adam7 pass (or the whole non-interlaced image) per call.
    Returns the (n_rows, stride) int32 block and the offset past it."""
    import numpy as np

    if off + n_rows * (stride + 1) > len(raw):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((n_rows, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(n_rows):
        ftype = raw[off]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).astype(np.int32)
        off += stride + 1
        if ftype == 0:
            recon = row
        elif ftype == 2:
            recon = (row + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential in x; walk pixel groups
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                left = recon[x - bpp : x] if x else np.zeros(bpp, dtype=np.int32)
                up = prior[x : x + bpp]
                up_left = (
                    prior[x - bpp : x] if x else np.zeros(bpp, dtype=np.int32)
                )
                seg = row[x : x + bpp]
                if ftype == 1:
                    recon[x : x + bpp] = (seg + left) % 256
                elif ftype == 3:
                    recon[x : x + bpp] = (seg + (left + up) // 2) % 256
                else:
                    recon[x : x + bpp] = (seg + _paeth(left, up, up_left)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prior = recon
    return out, off


def decode_png(payload: bytes) -> dict:
    """Parse an 8-bit PNG (gray / RGB / RGBA / indexed, sequential or
    Adam7-interlaced): chunk walk, zlib inflate, per-row unfilter (types
    0-4), pass scatter, PLTE indirection. Returns header fields plus the
    (H, W, C) uint8 pixel array (indexed images come back as decoded RGB,
    ``channels`` reporting the 3 output channels)."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    off = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while off + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, off + 8 + size)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if size % 3 or not 3 <= size <= 768:
                raise ValueError("bad PLTE chunk size")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        off += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG: depth={depth} comp={comp} interlace={interlace}"
        )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("indexed PNG is missing its PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    if interlace == 0:
        stride = w * channels
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        block, _ = _unfilter_scanlines(raw, 0, h, stride, bpp)
        samples = block
    else:
        samples = np.zeros((h, w * channels), dtype=np.int32)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            block, pos = _unfilter_scanlines(raw, pos, ph, pw * channels, bpp)
            sub = block.reshape(ph, pw, channels)
            view = samples.reshape(h, w, channels)
            view[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ValueError("PNG data length mismatch")
    pixels = samples.astype(np.uint8).reshape(h, w, channels)
    if color_type == 3:
        if int(pixels.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        pixels = plte[pixels[:, :, 0]]
        channels = 3
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "bit_depth": depth,
        "pixels": pixels,
    }


def encode_bmp(pixels) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("BMP encoder takes (H, W, 3) RGB")
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.extend(arr[y, :, ::-1].tobytes())  # RGB -> BGR
        rows.extend(b"\x00" * pad)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + bytes(rows)


def _bmp_rle8_rows(payload: bytes, off: int, w: int, h: int):
    """Decode a BI_RLE8 stream into an (h, w) index array in BOTTOM-UP
    row order (the only legal order for RLE BMPs). Encoded runs,
    absolute mode (word-aligned), end-of-line (0,0), end-of-bitmap
    (0,1) and delta (0,2,dx,dy — skipped cells keep index 0) per the
    spec; running past the raster fails loudly."""
    import numpy as np

    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    while off + 1 < len(payload):
        n, v = payload[off], payload[off + 1]
        off += 2
        if n > 0:  # encoded run
            if y >= h or x + n > w:
                raise ValueError("RLE8 run overflows the raster")
            idx[y, x : x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return idx
        elif v == 2:  # delta
            if off + 2 > len(payload):
                raise ValueError("truncated RLE8 delta")
            x += payload[off]
            y += payload[off + 1]
            off += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta overflows the raster")
        else:  # absolute mode: v literal bytes, word-aligned
            if y >= h or x + v > w or off + v > len(payload):
                raise ValueError("RLE8 absolute run overflows the raster")
            idx[y, x : x + v] = np.frombuffer(payload, np.uint8, v, off)
            x += v
            off += v + (v & 1)
    raise ValueError("RLE8 stream missing end-of-bitmap")


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER BMP: 24-bit uncompressed (either row
    order) or 8-bit palettized, uncompressed or BI_RLE8 (bottom-up, the
    only legal RLE order). Palettized images decode through the BGRA
    color table to (H, W, 3) RGB."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bits = struct.unpack_from("<HH", payload, 26)
    compression, _img_size, _xp, _yp, clr_used = struct.unpack_from(
        "<IIiiI", payload, 30
    )
    h = abs(h_signed)
    if hdr_size < 40 or (bits, compression) not in ((24, 0), (8, 0), (8, 1)):
        raise ValueError(
            f"unsupported BMP: header={hdr_size} bits={bits} "
            f"compression={compression}"
        )
    if bits == 24:
        stride = (w * 3 + 3) & ~3
        rows = []
        for i in range(h):
            y = (h - 1 - i) if h_signed > 0 else i  # bottom-up vs top-down
            row = np.frombuffer(payload, np.uint8, w * 3, data_off + y * stride)
            rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
        pixels = np.stack(rows)
        return {
            "width": w, "height": h, "channels": 3, "bit_depth": 8,
            "pixels": pixels,
        }
    # 8-bit palettized: BGRA color table right after the info header
    n_colors = clr_used or 256
    pal_off = 14 + hdr_size
    pal = np.frombuffer(
        payload, np.uint8, n_colors * 4, pal_off
    ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA quads -> RGB
    if compression == 1:
        if h_signed < 0:
            raise ValueError("RLE8 BMPs must be bottom-up")
        idx = _bmp_rle8_rows(payload, data_off, w, h)[::-1]  # -> top-down
    else:
        stride = (w + 3) & ~3
        lines = []
        for i in range(h):
            y = (h - 1 - i) if h_signed > 0 else i
            lines.append(np.frombuffer(payload, np.uint8, w, data_off + y * stride))
        idx = np.stack(lines)
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("BMP palette index out of range")
    return {
        "width": w, "height": h, "channels": 3, "bit_depth": 8,
        "pixels": pal[idx],
    }


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary P6 PPM with maxval 255 (whitespace/comment tolerant)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, off = [], 2
    while len(fields) < 3:
        while off < len(payload) and payload[off : off + 1].isspace():
            off += 1
        if payload[off : off + 1] == b"#":  # comment to end of line
            off = payload.index(b"\n", off) + 1
            continue
        start = off
        while off < len(payload) and not payload[off : off + 1].isspace():
            off += 1
        fields.append(int(payload[start:off]))
    off += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pixels = np.frombuffer(payload, np.uint8, w * h * 3, off).reshape(h, w, 3)
    return {"width": w, "height": h, "channels": 3, "bit_depth": 8, "pixels": pixels}


# --------------------------------------------------------------------------
# Video container (AVI/RIFF) demux — frame SPLITTING, not codec decode.
# The 100 TB pattern for video is exactly this split: demux the container
# into per-frame byte ranges JVM/Arrow-side, and hand the (rare) frames
# that need pixel decode to a codec stage. Frame-payload decode of
# inter-frame codecs (H.26x/VP9/AV1) stays honestly gated on pyav;
# MJPEG payloads decode pure-stdlib through the engine's own baseline
# JPEG codec (mm_video_mjpeg_decode below).
# --------------------------------------------------------------------------


def encode_avi(
    frames,
    width: int = 16,
    height: int = 8,
    fps: int = 25,
    compressed: bool = False,
) -> bytes:
    """Minimal spec-shaped AVI: RIFF('AVI ') with LIST hdrl (avih main
    header) and LIST movi holding one stream-0 chunk per frame
    (word-aligned) — '00db' uncompressed, '00dc' when ``compressed``
    (the chunk id an MJPEG stream uses)."""
    import struct

    frames = [bytes(f) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,
        0,
        0,  # flags
        len(frames),  # dwTotalFrames
        0,
        1,  # dwStreams
        0,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    hdrl = b"hdrl" + chunk(b"avih", avih)
    frame_tag = b"00dc" if compressed else b"00db"
    movi = b"movi" + b"".join(chunk(frame_tag, f) for f in frames)
    body = chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi(payload: bytes) -> dict:
    """Demux an AVI container: chunk-walk the RIFF tree, read the avih
    header, and return the raw frame payloads from the movi list ('00db'
    uncompressed / '00dc' compressed stream-0 chunks). No codec decode."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = total = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, total
        off = 0
        while off + 8 <= len(buf):
            cid = buf[off : off + 4]
            (size,) = struct.unpack_from("<I", buf, off + 4)
            body = buf[off + 8 : off + 8 + size]
            if cid == b"LIST":
                list_type = body[:4]
                if list_type in (b"hdrl", b"movi", b"strl"):
                    walk(body[4:])
            elif cid == b"avih":
                fields = struct.unpack_from("<10I", body, 0)
                total, width, height = fields[4], fields[8], fields[9]
            elif cid in (b"00db", b"00dc"):
                frames.append(body)
            off += 8 + size + (size & 1)  # chunks are word-aligned

    walk(payload[12:])
    if width is None:
        raise ValueError("missing avih header")
    if total is not None and total != len(frames):
        raise ValueError(f"avih declares {total} frames, movi holds {len(frames)}")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_media(payload: bytes, media_type: str):
    """Decode a media payload. WAV/RIFF PCM, PNG, BMP and PPM decode
    natively, and AVI demuxes to per-frame byte payloads (pure
    stdlib+numpy, see the codec functions above); video frame-payload
    codecs are not in this runtime and stay gated — a deployment wires
    pyav behind the same signature."""
    if media_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)
    if media_type == "image/png":
        return decode_png(payload)
    if media_type in ("image/jpeg", "image/jpg"):
        from .jpeg import decode_jpeg  # baseline-sequential grayscale

        return decode_jpeg(payload)
    if media_type == "image/gif":
        from .gif import decode_gif  # GIF87a/89a incl. interlace, frames

        return decode_gif(payload)
    if media_type in ("image/bmp", "image/x-ms-bmp"):
        return decode_bmp(payload)
    if media_type in ("image/x-portable-pixmap", "image/x-ppm"):
        return decode_ppm(payload)
    if media_type in ("video/x-msvideo", "video/avi"):
        return decode_avi(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this runtime; "
        "install pyav for video frame decode"
    )


def extract_features_batch(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake feature extractor (byte histogram, 16 buckets).

    Stands in for a real embedding model; exercises the exact Arrow batch
    path a real extractor uses (bytes in, fixed-width float vector out).
    """
    import numpy as np

    feats = []
    for blob in payload:
        arr = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(arr % FEATURE_BUCKETS, minlength=FEATURE_BUCKETS)
        total = max(len(arr), 1)
        feats.append((hist / total).astype("float64").tolist())
    return pd.DataFrame({"features": feats})


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def featurize(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """blob -> feature vector via mapInPandas (one Python call per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = extract_features_batch(pdf[blob_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": pdf[blob_col].str.len().astype("int32"),
                    "features": out["features"].values,
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# binary column statistics — pure JVM ops over binary payloads, oracle-
# checked (DuckDB encode() builds the same utf-8 blob).
# --------------------------------------------------------------------------

_BLOB_ORACLE = """
SELECT doc_id,
       cast(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS digest
FROM documents
"""
# (DuckDB 1.0 md5 only binds VARCHAR; over a utf-8 payload md5(text) equals
# md5 of the encoded bytes, which is what Spark computes on the binary col.)


@register("mm_blob_stats", oracle=_BLOB_ORACLE, tags=("multimodal",))
def mm_blob_stats(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("digest"),
    )


# --------------------------------------------------------------------------
# frame sampling — fixed-stride chunking of a payload (video-frame shape:
# one row per sampled frame). Chunk boundaries are byte offsets, md5 per
# frame; explode(sequence) keeps it in codegen.
# --------------------------------------------------------------------------

_FRAME_SIZE = 64

_FRAMES_ORACLE = f"""
SELECT doc_id, frame_idx,
       md5(substr(text, frame_idx * {_FRAME_SIZE} + 1, {_FRAME_SIZE})) AS frame_digest
FROM (
  SELECT doc_id, text,
         unnest(range(cast(ceil(length(text) / {_FRAME_SIZE}.0) AS BIGINT))) AS frame_idx
  FROM documents
) t
"""


@register("mm_frame_sample", oracle=_FRAMES_ORACLE, tags=("multimodal",))
def mm_frame_sample(spark, sf_dir):
    # empty/null text would hit Spark's descending sequence(0,-1) (it never
    # returns empty) and emit phantom frames; the oracle's range(0) is empty
    d = spread(table(spark, sf_dir, "documents"), "doc_id").filter(
        F.length("text") > 0
    )
    n_frames = F.ceil(F.length("text") / float(_FRAME_SIZE)).cast("long")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias(
                "frame_idx"
            ),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.md5(
                F.expr(f"substr(text, frame_idx * {_FRAME_SIZE} + 1, {_FRAME_SIZE})")
            ).alias("frame_digest"),
        )
    )


# --------------------------------------------------------------------------
# feature extraction through the real mapInPandas path (Python batch UDF).
# The byte-histogram features are exact integer counts divided once in
# double, so the oracle recomputes them character-wise (testdata text is
# ASCII: byte values == code points) and the driver gets full hash parity
# through the Arrow batch path.
# --------------------------------------------------------------------------

_FEATURE_ORACLE = f"""
SELECT doc_id,
       cast(length(text) AS INTEGER) AS n_bytes,
       round(len(list_filter(range(length(text)),
                             i -> ascii(substr(text, cast(i + 1 AS INTEGER), 1)) % {FEATURE_BUCKETS} = 0))
             / cast(greatest(length(text), 1) AS DOUBLE), 6) AS f0,
       round(len(list_filter(range(length(text)),
                             i -> ascii(substr(text, cast(i + 1 AS INTEGER), 1)) % {FEATURE_BUCKETS} = {FEATURE_BUCKETS - 1}))
             / cast(greatest(length(text), 1) AS DOUBLE), 6) AS f15
FROM documents
"""


@register("mm_feature_extract", oracle=_FEATURE_ORACLE, tags=("multimodal",))
def mm_feature_extract(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    feats = featurize(d)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", FEATURE_BUCKETS), 6).alias("f15"),
    )


# --------------------------------------------------------------------------
# WAV round-trip through the real decode path. Each doc_id gets a
# deterministic PCM-16 signal (closed-form samples, no RNG), encoded into a
# real RIFF/WAVE container and decoded back by decode_media inside one
# Arrow-batched mapInPandas stage. The output is integer header fields +
# exact integer sample stats, so the oracle recomputes them from the same
# closed form — full hash parity across an encode+parse of real bytes.
# --------------------------------------------------------------------------

_WAV_RATE = 8000

_WAV_ORACLE = f"""
SELECT doc_id,
       cast({_WAV_RATE} AS INTEGER) AS sample_rate,
       cast(count(*) AS BIGINT) AS n_samples,
       cast(min(samp) AS BIGINT) AS min_s,
       cast(max(samp) AS BIGINT) AS max_s,
       cast(sum(samp) AS BIGINT) AS sum_s
FROM (
  SELECT doc_id, ((doc_id * 31 + i * 7) % 65536) - 32768 AS samp
  FROM (SELECT doc_id, unnest(range(50 + doc_id % 50)) AS i FROM documents) g
) s
GROUP BY doc_id
"""


@register("mm_wav_decode", oracle=_WAV_ORACLE, tags=("multimodal", "audio"))
def mm_wav_decode(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
            T.StructField("sum_s", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 50 + doc_id % 50
                idx = np.arange(n, dtype=np.int64)
                samples = ((doc_id * 31 + idx * 7) % 65536) - 32768
                blob = encode_wav_pcm16(samples, sample_rate=_WAV_RATE)
                dec = decode_media(bytes(blob), "audio/wav")
                frames = dec["frames"].astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        dec["sample_rate"],
                        dec["n_samples"],
                        int(frames.min()),
                        int(frames.max()),
                        int(frames.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "min_s",
                    "max_s",
                    "sum_s",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# PNG round-trip through the real image-decode path. Each doc_id gets a
# deterministic RGB image (closed-form pixel values, no RNG), encoded into
# a real PNG — the per-row filter type cycles through all five spec
# filters, so the decoder's whole unfilter matrix (incl. Paeth) sits on the
# driver-checked path — and decoded back by decode_media inside one
# Arrow-batched mapInPandas stage. Output is integer header fields + exact
# integer pixel stats; the oracle recomputes them from the same closed form.
# --------------------------------------------------------------------------

_IMG_ORACLE = """
SELECT doc_id,
       cast(w AS INTEGER) AS width,
       cast(h AS INTEGER) AS height,
       cast(3 AS INTEGER) AS channels,
       cast(sum((doc_id * 7 + j * 5) % 256) AS BIGINT) AS sum_px,
       cast(min((doc_id * 7 + j * 5) % 256) AS BIGINT) AS min_px,
       cast(max((doc_id * 7 + j * 5) % 256) AS BIGINT) AS max_px
FROM (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         unnest(range((8 + doc_id % 9) * (8 + doc_id % 7) * 3)) AS j
  FROM documents
) g
GROUP BY doc_id, w, h
"""


@register("mm_image_decode", oracle=_IMG_ORACLE, tags=("multimodal", "image"))
def mm_image_decode(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                j = np.arange(w * h * 3, dtype=np.int64)
                img = ((doc_id * 7 + j * 5) % 256).astype(np.uint8).reshape(h, w, 3)
                blob = encode_png(img, filters=[0, 1, 2, 3, 4])
                dec = decode_media(bytes(blob), "image/png")
                px = dec["pixels"].astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        dec["channels"],
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "sum_px",
                    "min_px",
                    "max_px",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# AVI round-trip through the real container demux path. Each doc_id gets a
# deterministic frame sequence (closed-form byte values), muxed into a real
# AVI container and demuxed back by decode_media inside one Arrow-batched
# mapInPandas stage — one output row per frame with exact integer byte
# stats, recomputed by the oracle from the same closed form. This is the
# container-split half of video handling; frame-payload codec decode stays
# gated (see decode_media).
# --------------------------------------------------------------------------

_VIDEO_ORACLE = """
SELECT doc_id,
       cast(k AS INTEGER) AS frame_idx,
       cast(32 + (doc_id + k) % 17 AS INTEGER) AS frame_len,
       cast(sum((doc_id * 13 + k * 7 + i * 3) % 256) AS BIGINT) AS sum_b,
       cast(min((doc_id * 13 + k * 7 + i * 3) % 256) AS BIGINT) AS min_b,
       cast(max((doc_id * 13 + k * 7 + i * 3) % 256) AS BIGINT) AS max_b
FROM (
  SELECT doc_id, k, unnest(range(32 + (doc_id + k) % 17)) AS i
  FROM (SELECT doc_id, unnest(range(3 + doc_id % 5)) AS k FROM documents) f
) g
GROUP BY doc_id, k
"""


@register("mm_video_frames", oracle=_VIDEO_ORACLE, tags=("multimodal", "video"))
def mm_video_frames(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_len", T.IntegerType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("min_b", T.LongType()),
            T.StructField("max_b", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                frames = []
                for k in range(3 + doc_id % 5):
                    n = 32 + (doc_id + k) % 17
                    i = np.arange(n, dtype=np.int64)
                    frames.append(
                        ((doc_id * 13 + k * 7 + i * 3) % 256)
                        .astype(np.uint8)
                        .tobytes()
                    )
                dec = decode_media(encode_avi(frames), "video/x-msvideo")
                for k, frame in enumerate(dec["frames"]):
                    arr = np.frombuffer(frame, dtype=np.uint8).astype(np.int64)
                    rows.append(
                        (doc_id, k, len(frame), int(arr.sum()), int(arr.min()), int(arr.max()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_len", "sum_b", "min_b", "max_b"],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# MJPEG-in-AVI decode (r16): the one video codec this runtime CAN decode
# pure-stdlib, because an MJPEG frame payload IS a baseline JPEG and the
# engine already carries the full baseline decoder (jpeg.py). Each doc
# muxes 2 + doc_id % 3 closed-form coefficient JPEGs into '00dc'
# (compressed) stream chunks; the query demuxes the container and runs
# every frame through the real JPEG path — marker parse, canonical
# Huffman, entropy decode with DC prediction, dequant, IDCT — inside one
# Arrow-batched mapInPandas stage. This narrows the pyav video gate to
# inter-frame codecs (H.26x/VP9/AV1); the decoded dims are asserted
# against the avih header, so container metadata and codec output are
# cross-checked per clip. The closed-form oracle reuses the DC/AC(4,4)
# pixel identities mm_image_jpeg_decode pins, extended per frame; the
# (f+1)-weighted pixel sum catches any frame-order slip in the demux.
# --------------------------------------------------------------------------

_MJPEG_ORACLE = """
WITH per_block AS (
  SELECT doc_id, f, i,
         (doc_id + 3*i + 5*f) % 5 - 2 AS dc,
         (doc_id + i + 2*f) % 3 - 1 AS ac
  FROM (
    SELECT doc_id, f,
           unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS i
    FROM (
      SELECT doc_id, unnest(range(2 + doc_id % 3)) AS f FROM documents
    ) fr
  ) g
), per_frame AS (
  SELECT doc_id, f,
         sum(64 * (128 + 4 * dc)) AS fsum,
         min(128 + 4 * dc - 2 * abs(ac)) AS fmin,
         max(128 + 4 * dc + 2 * abs(ac)) AS fmax
  FROM per_block GROUP BY doc_id, f
)
SELECT doc_id,
       cast(2 + doc_id % 3 AS INTEGER) AS n_frames,
       cast((2 + doc_id % 3) * 8 AS INTEGER) AS width,
       cast((1 + doc_id % 2) * 8 AS INTEGER) AS height,
       cast(sum((f + 1) * fsum) AS BIGINT) AS wsum_px,
       cast(min(fmin) AS BIGINT) AS min_px,
       cast(max(fmax) AS BIGINT) AS max_px,
       cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 3 - 1) AS BIGINT)
         AS px00_f0
FROM per_frame
GROUP BY doc_id
"""


@register(
    "mm_video_mjpeg_decode",
    oracle=_MJPEG_ORACLE,
    tags=("multimodal", "video", "image"),
)
def mm_video_mjpeg_decode(spark, sf_dir):
    """Full MJPEG clip decode: AVI demux composed with the baseline JPEG
    codec, one output row per clip with exact integer pixel stats over
    all frames ((f+1)-weighted sum pins frame order; decoded SOF dims
    asserted equal to the avih header dims)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("wsum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
            T.StructField("px00_f0", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg, encode_jpeg_baseline

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
                nf = 2 + doc_id % 3
                frames = []
                for f in range(nf):
                    blocks = []
                    for i in range(bw * bh):
                        blk = [0] * 64
                        blk[0] = (doc_id + 3 * i + 5 * f) % 5 - 2
                        blk[4 * 8 + 4] = (doc_id + i + 2 * f) % 3 - 1
                        blocks.append(blk)
                    frames.append(encode_jpeg_baseline(blocks, bw, bh))
                avi = encode_avi(
                    frames, width=bw * 8, height=bh * 8, compressed=True
                )
                dec = decode_media(avi, "video/x-msvideo")
                wsum, mn, mx, px00 = 0, None, None, None
                for f, payload in enumerate(dec["frames"]):
                    jpg = decode_jpeg(bytes(payload))
                    if (jpg["width"], jpg["height"]) != (
                        dec["width"],
                        dec["height"],
                    ):
                        raise ValueError(
                            "SOF dims disagree with the avih header"
                        )
                    px = jpg["pixels"].astype("int64")
                    wsum += (f + 1) * int(px.sum())
                    fmin, fmax = int(px.min()), int(px.max())
                    mn = fmin if mn is None else min(mn, fmin)
                    mx = fmax if mx is None else max(mx, fmax)
                    if f == 0:
                        px00 = int(px[0, 0])
                rows.append(
                    (
                        doc_id,
                        len(dec["frames"]),
                        dec["width"],
                        dec["height"],
                        wsum,
                        mn,
                        mx,
                        px00,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Decode-normalized MJPEG clip dedup (r16): the VIDEO member of the
# re-encode dedup ladder. Clip pairs (2p, 2p+1) share every frame's
# dequantized coefficients, but the odd clip re-encodes each frame with
# a halved quant table and doubled values — byte-different streams,
# pixel-identical after decode, so a container- or payload-hash dedup
# misses them. The engine demuxes and decodes every frame and digests
# the concatenated frame pixels (one md5 per clip), then equi-joins on
# (dims, n_frames, digest) — the same constant-width-row hash join the
# image renc dedups proved linear at scale. The oracle groups clips on
# the closed-form dequantized coefficient string over (frame, block) —
# pixel equality is equivalent per frame via the same invertible s-sign
# Hadamard argument as mm_image_jpeg_renc_dedup (jpeg.py).
# --------------------------------------------------------------------------

_MJPEG_RENC_ORACLE = """
WITH coef AS (
  SELECT doc_id, bw, bh, nf,
         string_agg(cast(32*(m%25-12) AS VARCHAR) || ':' ||
                    cast(16*((m//25)%13-6) AS VARCHAR), ',' ORDER BY f, i) AS key
  FROM (
    SELECT doc_id, bw, bh, nf, f, i, (s0*s0 + 7919*s0) // 256 AS m
    FROM (
      SELECT doc_id, bw, bh, nf, f, i,
             ((doc_id // 2) * 100000 + f * 4096 + i) % 2147483647 AS s0
      FROM (
        SELECT doc_id, bw, bh, nf, f, unnest(range(bw*bh)) AS i
        FROM (
          SELECT doc_id, 2 + (doc_id//2) % 3 AS bw, 1 + (doc_id//2) % 2 AS bh,
                 2 + (doc_id//2) % 3 AS nf,
                 unnest(range(2 + (doc_id//2) % 3)) AS f
          FROM documents
        ) g0
      ) g1
    ) g2
  ) g3
  GROUP BY doc_id, bw, bh, nf
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, cast(a.nf AS INTEGER) AS n_frames
FROM coef a JOIN coef b
  ON a.bw = b.bw AND a.bh = b.bh AND a.nf = b.nf
     AND a.key = b.key AND a.doc_id < b.doc_id
"""


def _mjpeg_renc_frames(doc_id: int):
    """Fixture: (2p, 2p+1) clips share per-frame dequantized
    coefficients; the odd clip halves the quant table and doubles the
    quantized values (the jpeg.py _renc_blocks discipline per frame)."""
    from .jpeg import encode_jpeg_baseline

    base, odd = doc_id // 2, doc_id % 2
    bw, bh = 2 + base % 3, 1 + base % 2
    nf = 2 + base % 3
    scale = 2 if odd else 1
    qtable = [32 // scale] + [16 // scale] * 63
    frames = []
    for f in range(nf):
        blocks = []
        for i in range(bw * bh):
            s0 = (base * 100000 + f * 4096 + i) % 2147483647
            m = (s0 * s0 + 7919 * s0) // 256
            blk = [0] * 64
            blk[0] = (m % 25 - 12) * scale
            blk[4 * 8 + 4] = ((m // 25) % 13 - 6) * scale
            blocks.append(blk)
        frames.append(encode_jpeg_baseline(blocks, bw, bh, qtable=qtable))
    return frames, bw, bh, nf


@register(
    "mm_video_mjpeg_renc_dedup",
    oracle=_MJPEG_RENC_ORACLE,
    tags=("multimodal", "video", "dedup"),
)
def mm_video_mjpeg_renc_dedup(spark, sf_dir):
    """Decode-normalized near-dup pairs of byte-different MJPEG clips:
    demux + per-frame JPEG decode inside the Arrow batch, md5 over the
    concatenated frame pixels, equi-join on (dims, n_frames, digest)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("nf", T.IntegerType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                frames, bw, bh, nf = _mjpeg_renc_frames(doc_id)
                dec = decode_avi(
                    encode_avi(
                        frames, width=bw * 8, height=bh * 8, compressed=True
                    )
                )
                hsh = hashlib.md5()
                for payload in dec["frames"]:
                    hsh.update(decode_jpeg(bytes(payload))["pixels"].tobytes())
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        dec["n_frames"],
                        hsh.hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    hashes = d.mapInPandas(run, schema=schema)
    a = hashes.select(F.col("doc_id").alias("doc_a"), "w", "h", "nf", "digest")
    b = hashes.select(F.col("doc_id").alias("doc_b"), "w", "h", "nf", "digest")
    return (
        a.join(b, ["w", "h", "nf", "digest"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.col("nf").alias("n_frames"))
    )


# --------------------------------------------------------------------------
# Audio-style framing: fixed-size overlapping byte windows (64-byte frame,
# 32-byte hop) over the payload — the chunk layout a feature extractor
# consumes. Pure JVM (sequence + posexplode-free offset math + substring on
# binary); one output row per frame. The oracle frames the same utf-8 text
# as VARCHAR (testdata text is ASCII, so byte and char offsets coincide,
# and DuckDB's md5 binds VARCHAR only).
# --------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_HOP = 32

_FRAMES_BYTES_ORACLE = f"""
SELECT doc_id,
       cast(off // {FRAME_HOP} AS INTEGER) AS frame_idx,
       cast(length(substring(text, off + 1, {FRAME_BYTES})) AS INTEGER) AS frame_len,
       md5(substring(text, off + 1, {FRAME_BYTES})) AS frame_digest
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(cast(length(text) AS BIGINT) - {FRAME_BYTES}, 0), {FRAME_HOP})) AS off
  FROM documents
) framed
"""


@register("mm_audio_frames", oracle=_FRAMES_BYTES_ORACLE, tags=("multimodal", "framing"))
def mm_audio_frames(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    n = F.octet_length(blob).cast("bigint")
    offsets = F.sequence(
        F.lit(0).cast("bigint"),
        F.greatest(n - FRAME_BYTES, F.lit(0).cast("bigint")),
        F.lit(FRAME_HOP).cast("bigint"),
    )
    framed = d.select(
        "doc_id", blob.alias("blob"), F.explode(offsets).alias("off")
    )
    frame = F.expr(f"substring(blob, off + 1, {FRAME_BYTES})")
    return framed.select(
        "doc_id",
        (F.col("off") / FRAME_HOP).cast("int").alias("frame_idx"),
        F.octet_length(frame).alias("frame_len"),
        F.md5(frame).alias("frame_digest"),
    )


# --------------------------------------------------------------------------
# PCM resample (decimation x2): decode -> numpy stride slice -> stats, the
# simplest real resampling kernel (anti-alias filtering is a conv away,
# same plumbing). Runs through the same Arrow-batched mapInPandas path as
# mm_wav_decode; the oracle is the closed form of the decimated synthetic
# signal (every even-index sample), so the whole decode+resample round-trip
# is value-checked, not just row-counted.
# --------------------------------------------------------------------------

_DECIM = 2

_RESAMPLE_ORACLE = f"""
SELECT doc_id,
       cast({_WAV_RATE} // {_DECIM} AS INTEGER) AS out_rate,
       cast(count(*) AS BIGINT) AS n_out,
       cast(min(samp) AS BIGINT) AS min_s,
       cast(max(samp) AS BIGINT) AS max_s,
       cast(sum(samp) AS BIGINT) AS sum_s
FROM (
  SELECT doc_id,
         ((doc_id * 31 + ({_DECIM} * i) * 7) % 65536) - 32768 AS samp
  FROM (
    SELECT doc_id,
           unnest(range((50 + doc_id % 50 + {_DECIM} - 1) // {_DECIM}))  AS i
    FROM documents
  ) g
) s
GROUP BY doc_id
"""


@register(
    "mm_pcm_resample",
    oracle=_RESAMPLE_ORACLE,
    tags=("multimodal", "audio"),
    bench=True,
)
def mm_pcm_resample(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("out_rate", T.IntegerType()),
            T.StructField("n_out", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
            T.StructField("sum_s", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 50 + doc_id % 50
                idx = np.arange(n, dtype=np.int64)
                samples = ((doc_id * 31 + idx * 7) % 65536) - 32768
                blob = encode_wav_pcm16(samples, sample_rate=_WAV_RATE)
                dec = decode_media(bytes(blob), "audio/wav")
                out = dec["frames"].astype(np.int64)[::_DECIM]
                rows.append(
                    (
                        doc_id,
                        dec["sample_rate"] // _DECIM,
                        int(out.size),
                        int(out.min()),
                        int(out.max()),
                        int(out.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "out_rate",
                    "n_out",
                    "min_s",
                    "max_s",
                    "sum_s",
                ],
            )

    d = spread(table(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    return d.mapInPandas(run, schema)


# --------------------------------------------------------------------------
# Nearest-neighbor image resize: the canonical vision-preprocessing map
# (decode -> resize -> per-image features) as one Arrow-batched mapInPandas
# stage. Each doc's closed-form PNG (same fixture family as
# mm_image_decode) is REALLY decoded, resized to a fixed 6x5 thumbnail
# with integer nearest-neighbor index maps (floor(dst * src / dst_dim) —
# pure int arithmetic, so the oracle can replay it exactly), and reduced
# to integer stats including a position-weighted checksum that pins every
# resized pixel's VALUE AND POSITION. Batch shape: one input row per image,
# decode+resize vectorized per row in numpy — no per-pixel Python.
# --------------------------------------------------------------------------

_RESIZE_W, _RESIZE_H = 6, 5

_RESIZE_ORACLE = f"""
SELECT doc_id,
       cast({_RESIZE_W} AS INTEGER) AS width,
       cast({_RESIZE_H} AS INTEGER) AS height,
       cast(sum(v) AS BIGINT) AS sum_px,
       cast(sum((k + 1) * v) AS BIGINT) AS checksum
FROM (
  SELECT doc_id, k,
         (doc_id * 7
          + (((k // ({_RESIZE_W} * 3)) * h // {_RESIZE_H} * w
              + ((k % ({_RESIZE_W} * 3)) // 3) * w // {_RESIZE_W}) * 3
             + k % 3) * 5) % 256 AS v
  FROM (
    SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           unnest(range({_RESIZE_W} * {_RESIZE_H} * 3)) AS k
    FROM documents
  ) g
) px
GROUP BY doc_id
"""


@register("mm_image_resize_nn", oracle=_RESIZE_ORACLE, tags=("multimodal", "image"))
def mm_image_resize_nn(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        w2, h2 = _RESIZE_W, _RESIZE_H
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                j = np.arange(w * h * 3, dtype=np.int64)
                img = (
                    ((doc_id * 7 + j * 5) % 256).astype(np.uint8).reshape(h, w, 3)
                )
                blob = encode_png(img, filters=[0, 1, 2, 3, 4])
                dec = decode_media(bytes(blob), "image/png")
                px = dec["pixels"]
                ys = (np.arange(h2, dtype=np.int64) * h) // h2
                xs = (np.arange(w2, dtype=np.int64) * w) // w2
                thumb = px[np.ix_(ys, xs)].astype(np.int64)  # (h2, w2, 3)
                flat = thumb.reshape(-1)
                k = np.arange(flat.size, dtype=np.int64)
                rows.append(
                    (
                        doc_id,
                        w2,
                        h2,
                        int(flat.sum()),
                        int(((k + 1) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_px", "checksum"],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Image near-duplicate detection via perceptual difference hash (dHash) —
# the vision-side member of the dedup ladder (text gets MinHash/SimHash;
# images get perceptual hashes). Pipeline per image, all integer ops so
# the oracle can replay it exactly: real PNG decode -> integer Rec.601
# grayscale ((299r + 587g + 114b) // 1000) -> 9x8 nearest-neighbor
# thumbnail (the same floor(dst*src/dim) index map as mm_image_resize_nn)
# -> 64 brightness-gradient bits (g[y,x] < g[y,x+1]) packed into two
# int64 halves. Candidate pairs come from FOUR 16-bit band chunks
# (pigeonhole: hamming <= 3 forces at least one equal band — the same
# banded-LSH shape as the text ladder, but with a DETERMINISTIC
# completeness guarantee at the verify threshold); verification is
# bit_count(xor) on the halves, JVM-side. The fixture makes doc pairs
# (2p, 2p+1) share a base image with a sparse +1 pixel perturbation, so
# true near-dups exist; the oracle brute-forces all pairs from the SAME
# closed-form hashes, proving the banded path has zero false negatives at
# the threshold. Scale: hashes are 16 bytes/image; the band join is an
# equi-join on 16-bit chunks — cost tracks collisions, never all-pairs.
# --------------------------------------------------------------------------

_DHASH_T = 3  # max hamming distance; <= 3 guarantees band-completeness


def _dhash_hashes_cte() -> str:
    """WITH-body CTE chain (docs..hashes) yielding per-doc (hi, lo)
    dHash halves — shared by the full-corpus oracle and the
    incremental batch-vs-corpus twin (multimodal_incremental.py) so the
    two ladders cannot drift."""
    # closed-form replay: v(c) at thumbnail position = fixture pixel value
    # middle-square pixel scramble: v = ((s^2 + 7919 s) // 256) % 256 with
    # s = base*1e5 + pixel index — NONLINEAR in base, so cross-base images
    # are pseudo-random (hamming ~ 32) and exactly the intended (2p, 2p+1)
    # pairs are near-dups. Two earlier fixtures failed the sf0.1 scale
    # check: a linear gradient made EVERY pair collide, and an LCG without
    # bit mixing is linear in base, leaving exact-duplicate base classes —
    # both produced quadratic pair growth.
    s = "(base * 100000 + (((y * h) // 8 * w + (x * w) // 9) * 3 + c))"
    px = (
        f"(({s} * {s} + {s} * 7919) // 256"
        " + CASE WHEN odd = 1 AND ((((y * h) // 8 * w + (x * w)"
        " // 9) * 3 + c) % 97) = 0 THEN 1 ELSE 0 END) % 256"
    )
    return f"""docs AS (
  SELECT doc_id, doc_id // 2 AS base, cast(doc_id % 2 AS BIGINT) AS odd,
         16 + (doc_id // 2) % 5 AS w, 16 + (doc_id // 2) % 3 AS h
  FROM documents
),
pos AS (
  SELECT doc_id, base, odd, w, h,
         unnest(range(72)) AS k9
  FROM docs
),
gray AS (
  SELECT doc_id, k9 // 9 AS y, k9 % 9 AS x,
         (({px.replace("c", "0")}) * 299
          + ({px.replace("c", "1")}) * 587
          + ({px.replace("c", "2")}) * 114) // 1000 AS g
  FROM (SELECT doc_id, base, odd, w, h, k9, k9 // 9 AS y, k9 % 9 AS x
        FROM pos) p
),
bits AS (
  SELECT doc_id, y * 8 + x AS bitk,
         CASE WHEN g < lead(g) OVER (PARTITION BY doc_id, y ORDER BY x)
              THEN 1 ELSE 0 END AS b
  FROM gray QUALIFY x < 8
),
hashes AS (
  SELECT doc_id,
         cast(sum(CASE WHEN bitk < 32
                       THEN b * cast(pow(2, bitk) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS hi,
         cast(sum(CASE WHEN bitk >= 32
                       THEN b * cast(pow(2, bitk - 32) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS lo
  FROM bits GROUP BY doc_id
)"""


def _dhash_oracle() -> str:
    return f"""
WITH {_dhash_hashes_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
            AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= {_DHASH_T}
"""


def _dhash_hashes(spark, sf_dir):
    """Per-doc dHash halves (doc_id, hi, lo) through the REAL PNG
    codec — the shared front half of the full-corpus near-dup and its
    incremental batch-vs-corpus twin."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("hi", T.LongType()),
            T.StructField("lo", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                base, odd = doc_id // 2, doc_id % 2
                w, h = 16 + base % 5, 16 + base % 3
                j = np.arange(w * h * 3, dtype=np.int64)
                s = base * 100000 + j
                v = ((s * s + s * 7919) // 256 + (odd * (j % 97 == 0)).astype(np.int64)) % 256
                img = v.astype(np.uint8).reshape(h, w, 3)
                blob = encode_png(img, filters=[0, 1, 2, 3, 4])
                dec = decode_media(bytes(blob), "image/png")
                px = dec["pixels"].astype(np.int64)
                ys = (np.arange(8, dtype=np.int64) * h) // 8
                xs = (np.arange(9, dtype=np.int64) * w) // 9
                thumb = px[np.ix_(ys, xs)]
                g = (
                    thumb[:, :, 0] * 299 + thumb[:, :, 1] * 587 + thumb[:, :, 2] * 114
                ) // 1000
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).reshape(-1)
                ks = np.arange(64, dtype=np.int64)
                hi = int((bits[ks < 32] << ks[ks < 32]).sum())
                lo = int((bits[ks >= 32] << (ks[ks >= 32] - 32)).sum())
                rows.append((doc_id, hi, lo))
            yield pd.DataFrame(rows, columns=["doc_id", "hi", "lo"])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


def _dhash_chunks(hashes):
    """Explode (hi, lo) into the four 16-bit LSH band chunks
    (pigeonhole: hamming <= _DHASH_T forces at least one equal band)."""
    return hashes.select(
        "doc_id",
        "hi",
        "lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("hi") % 65536).alias("c")),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.col("hi") / 65536).cast("long").alias("c"),
                ),
                F.struct(F.lit(2).alias("band"), (F.col("lo") % 65536).alias("c")),
                F.struct(
                    F.lit(3).alias("band"),
                    (F.col("lo") / 65536).cast("long").alias("c"),
                ),
            )
        ).alias("bc"),
    ).select("doc_id", "hi", "lo", "bc.band", "bc.c")


@register("mm_image_dhash_neardup", oracle=_dhash_oracle(), tags=("multimodal", "image", "dedup"))
def mm_image_dhash_neardup(spark, sf_dir):
    hashes = _dhash_hashes(spark, sf_dir)
    chunks = _dhash_chunks(hashes)

    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
        "band",
        "c",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
        "band",
        "c",
    )
    cand = (
        a.join(b, ["band", "c"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= _DHASH_T)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# Audio near-duplicate detection via frame-energy fingerprints — the
# audio member of the perceptual-dedup triad (text: MinHash/SimHash;
# image: mm_image_dhash_neardup; audio: this). Per clip, all integer ops:
# real WAV encode -> RIFF decode -> 16 equal frames -> sum-of-|amplitude|
# energy per frame -> 15 energy-gradient bits (e[f] < e[f+1]) packed into
# one int. Clips pair by EXACT fingerprint equality (groupBy on the
# 15-bit signature + clip length — a plain hash shuffle of 2-int rows, the
# cheapest possible dedup join). The fixture gives (2p, 2p+1) clip pairs a
# shared middle-square pseudo-random base signal with a sparse +1
# perturbation; energies absorb the perturbation, so true pairs keep equal
# fingerprints while cross-base signatures are ~uniform over 2^15. The
# oracle replays the integer signal closed-form. Scale: fingerprints are
# O(1) per clip; the pair join is an equi-join on the signature.
# --------------------------------------------------------------------------

# 32 frames -> 31-bit fingerprints: at 16 frames the 15-bit space measured
# x30 pair growth at 10x docs (cross-base collisions); 31 bits puts the
# birthday term below 1 pair at 5e4 clips per length class
_AFP_FRAMES = 32


def _afp_fps_cte() -> str:
    """WITH-body CTE chain (docs..fps) yielding per-clip (n, fp)
    frame-energy fingerprints — shared by the full-corpus oracle and
    the incremental twin (multimodal_incremental.py)."""
    # prime-modulus scramble: (s^2 mod 1000003)*31 mod 65536 — the power-of-2
    # middle-square variant left cross terms divisible by 64 (quasi-linear in
    # base), measuring x14 pair growth at 10x clips; the prime break makes
    # cross-base fingerprints ~uniform (measured ~4% accidental pairs at 10k)
    s = "(base * 100000 + i)"
    samp = f"(({s} * {s}) % 1000003) * 31 % 65536 - 32768"
    pert = "CASE WHEN odd = 1 AND i % 89 = 0 THEN 1 ELSE 0 END"
    return f"""docs AS (
  SELECT doc_id, doc_id // 2 AS base, cast(doc_id % 2 AS BIGINT) AS odd,
         {_AFP_FRAMES} * (4 + (doc_id // 2) % 4) AS n
  FROM documents
),
samples AS (
  SELECT doc_id, n, i,
         abs(({samp}) + ({pert})) AS mag,
         i // (n // {_AFP_FRAMES}) AS frame
  FROM (SELECT doc_id, base, odd, n, unnest(range(n)) AS i FROM docs) g
),
energies AS (
  SELECT doc_id, frame, cast(sum(mag) AS BIGINT) AS e
  FROM samples GROUP BY doc_id, frame
),
bits AS (
  SELECT doc_id, frame AS f,
         CASE WHEN e < lead(e) OVER (PARTITION BY doc_id ORDER BY frame)
              THEN 1 ELSE 0 END AS b
  FROM energies QUALIFY f < {_AFP_FRAMES} - 1
),
fps AS (
  SELECT s.doc_id, d.n,
         cast(sum(b * cast(pow(2, f) AS BIGINT)) AS BIGINT) AS fp
  FROM bits s JOIN docs d ON s.doc_id = d.doc_id
  GROUP BY s.doc_id, d.n
)"""


def _afp_oracle() -> str:
    return f"""
WITH {_afp_fps_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp
FROM fps a JOIN fps b ON a.fp = b.fp AND a.n = b.n AND a.doc_id < b.doc_id
"""


def _afp_fps(spark, sf_dir):
    """Per-clip fingerprints (doc_id, n, fp) through the REAL WAV
    codec — the shared front half of the full-corpus near-dup and its
    incremental batch-vs-corpus twin."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        nf = _AFP_FRAMES
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                base, odd = doc_id // 2, doc_id % 2
                n = nf * (4 + base % 4)
                i = np.arange(n, dtype=np.int64)
                s = base * 100000 + i
                samp = ((s * s) % 1000003) * 31 % 65536 - 32768
                samp = samp + (odd * (i % 89 == 0)).astype(np.int64)
                blob = encode_wav_pcm16(samp.astype(np.int16))
                dec = decode_media(bytes(blob), "audio/wav")
                mag = np.abs(dec["frames"].astype(np.int64))
                e = mag.reshape(nf, n // nf).sum(axis=1)
                b = (e[:-1] < e[1:]).astype(np.int64)
                fp = int((b << np.arange(nf - 1, dtype=np.int64)).sum())
                rows.append((doc_id, n, fp))
            yield pd.DataFrame(rows, columns=["doc_id", "n", "fp"])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


@register(
    "mm_audio_fingerprint_neardup",
    oracle=_afp_oracle(),
    tags=("multimodal", "audio", "dedup"),
)
def mm_audio_fingerprint_neardup(spark, sf_dir):
    fps = _afp_fps(spark, sf_dir)
    a = fps.select(
        F.col("doc_id").alias("doc_a"), F.col("n"), F.col("fp")
    )
    b = fps.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        F.col("fp").alias("fp_b"),
    )
    return (
        a.join(b, (a.fp == b.fp_b) & (a.n == b.n_b))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp")
    )


# --------------------------------------------------------------------------
# Silence trimming — the standard audio-corpus preprocessing step (drop
# leading/trailing low-energy runs before feature extraction). Each doc
# gets a closed-form PCM signal with a forced-silent head (doc_id % 10
# samples) and tail (doc_id % 5), plus interior samples that may also dip
# under the threshold — the trim must only strip the EDGES, which is what
# distinguishes it from a filter. Real WAV encode/decode inside one
# Arrow-batched mapInPandas stage; the oracle recomputes first/last loud
# indexes from the same closed form. Docs that are entirely silent trim to
# zero kept samples (n_kept = 0) rather than disappearing.
# --------------------------------------------------------------------------

_SIL_T = 100  # |sample| <= threshold counts as silence

_SILENCE_ORACLE = f"""
WITH samp AS (
  SELECT doc_id, n, i,
         CASE WHEN i < doc_id % 10 OR i >= n - (doc_id % 5) THEN 0
              ELSE ((doc_id * 131 + i * 17) % 4001) - 2000 END AS s
  FROM (
    SELECT doc_id, 80 + doc_id % 40 AS n,
           unnest(range(80 + doc_id % 40)) AS i
    FROM documents
  ) g
),
loud AS (
  SELECT doc_id,
         min(CASE WHEN abs(s) > {_SIL_T} THEN i END) AS first_loud,
         max(CASE WHEN abs(s) > {_SIL_T} THEN i END) AS last_loud
  FROM samp GROUP BY doc_id
)
SELECT sp.doc_id,
       cast(max(sp.n) AS BIGINT) AS n_samples,
       cast(coalesce(max(l.first_loud), max(sp.n)) AS BIGINT) AS n_trim_lead,
       cast(CASE WHEN max(l.last_loud) IS NULL THEN 0
                 ELSE max(sp.n) - 1 - max(l.last_loud) END AS BIGINT)
         AS n_trim_tail,
       cast(CASE WHEN max(l.last_loud) IS NULL THEN 0
                 ELSE max(l.last_loud) - max(l.first_loud) + 1 END AS BIGINT)
         AS n_kept,
       cast(coalesce(sum(CASE WHEN i >= l.first_loud AND i <= l.last_loud
                              THEN sp.s END), 0) AS BIGINT) AS sum_kept
FROM samp sp JOIN loud l ON l.doc_id = sp.doc_id
GROUP BY sp.doc_id
"""


@register(
    "mm_audio_silence_trim", oracle=_SILENCE_ORACLE, tags=("multimodal", "audio")
)
def mm_audio_silence_trim(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_trim_lead", T.LongType()),
            T.StructField("n_trim_tail", T.LongType()),
            T.StructField("n_kept", T.LongType()),
            T.StructField("sum_kept", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 80 + doc_id % 40
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 131 + i * 17) % 4001) - 2000
                s[i < doc_id % 10] = 0
                if doc_id % 5:
                    s[i >= n - (doc_id % 5)] = 0
                blob = encode_wav_pcm16(s.astype(np.int16))
                dec = decode_media(bytes(blob), "audio/wav")
                x = dec["frames"].astype(np.int64)
                loud = np.abs(x) > _SIL_T
                if loud.any():
                    first = int(np.argmax(loud))
                    last = int(n - 1 - np.argmax(loud[::-1]))
                    kept = x[first : last + 1]
                    rows.append(
                        (doc_id, n, first, n - 1 - last, len(kept), int(kept.sum()))
                    )
                else:
                    rows.append((doc_id, n, n, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_trim_lead",
                    "n_trim_tail",
                    "n_kept",
                    "sum_kept",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Scene-cut detection — the first step of video frame sampling for
# training data (sample one frame per shot instead of per stride). Each
# doc gets a fixed-size frame sequence with scene changes injected every 4
# frames (scene id drives the pixel formula; a small per-frame jitter
# keeps within-scene diffs non-zero); frames ride through a real AVI
# container (encode_avi -> RIFF chunk walk) inside one Arrow-batched
# mapInPandas stage. Cut score = mean absolute byte difference between
# consecutive frames (x1000, integer); a cut is score > threshold. The
# oracle recomputes the differences from the closed form — so a demuxer
# that misaligns frame payloads by even one byte fails the hash.
# --------------------------------------------------------------------------

_SCENE_LEN = 48  # bytes per frame
_SCENE_T = 40000  # cut threshold, mean-abs-diff x1000

_SCENE_ORACLE = f"""
WITH px AS (
  SELECT doc_id, k, i,
         (doc_id * 13 + (k // 4) * 97 + i * 3 + (k % 2)) % 256 AS b
  FROM (
    SELECT doc_id, k, unnest(range({_SCENE_LEN})) AS i
    FROM (SELECT doc_id, unnest(range(8 + doc_id % 5)) AS k FROM documents) f
  ) g
),
diffs AS (
  SELECT cur.doc_id, cur.k AS frame_idx,
         cast(sum(abs(cur.b - prv.b)) * 1000 // {_SCENE_LEN} AS BIGINT)
           AS diff_milli
  FROM px cur JOIN px prv
    ON prv.doc_id = cur.doc_id AND prv.k = cur.k - 1 AND prv.i = cur.i
  GROUP BY cur.doc_id, cur.k
)
SELECT doc_id, frame_idx, diff_milli,
       CASE WHEN diff_milli > {_SCENE_T} THEN 1 ELSE 0 END AS is_cut
FROM diffs
"""


@register("mm_video_scene_cuts", oracle=_SCENE_ORACLE, tags=("multimodal", "video"))
def mm_video_scene_cuts(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("diff_milli", T.LongType()),
            T.StructField("is_cut", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                i = np.arange(_SCENE_LEN, dtype=np.int64)
                frames = [
                    ((doc_id * 13 + (k // 4) * 97 + i * 3 + (k % 2)) % 256)
                    .astype(np.uint8)
                    .tobytes()
                    for k in range(8 + doc_id % 5)
                ]
                dec = decode_media(encode_avi(frames), "video/x-msvideo")
                arrs = [
                    np.frombuffer(fr, dtype=np.uint8).astype(np.int64)
                    for fr in dec["frames"]
                ]
                for k in range(1, len(arrs)):
                    d = int(np.abs(arrs[k] - arrs[k - 1]).sum()) * 1000 // _SCENE_LEN
                    rows.append((doc_id, k, d, 1 if d > _SCENE_T else 0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "diff_milli", "is_cut"]
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Audio zero-crossing rate (r12) — the classic cheap speech/music/noise
# discriminator an audio-corpus pipeline computes right after decode (high
# ZCR ~ fricatives/noise, low ~ voiced speech/tones): per clip, count sign
# transitions ((s[i-1] < 0) != (s[i] < 0), zero counted non-negative) over
# the real WAV decode path, report the count and an exact-integer ppm rate
# (crossings * 1e6 // (n - 1)). Same fixture and Arrow-batched shape as
# ``mm_wav_decode``; the oracle replays the closed-form PCM signal.
# --------------------------------------------------------------------------

_ZCR_ORACLE = """
SELECT doc_id,
       cast(n AS BIGINT) AS n_samples,
       cast(sum(CASE WHEN ((doc_id * 31 + (i - 1) * 7) % 65536 - 32768 < 0)
                      <> ((doc_id * 31 + i * 7) % 65536 - 32768 < 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS crossings,
       cast(sum(CASE WHEN ((doc_id * 31 + (i - 1) * 7) % 65536 - 32768 < 0)
                      <> ((doc_id * 31 + i * 7) % 65536 - 32768 < 0)
                THEN 1 ELSE 0 END) * 1000000 // (n - 1) AS BIGINT)
         AS zcr_ppm
FROM (
  SELECT doc_id, 50 + doc_id % 50 AS n,
         unnest(range(1, 50 + doc_id % 50)) AS i
  FROM documents
) g
GROUP BY doc_id, n
"""


@register("mm_audio_zcr", oracle=_ZCR_ORACLE, tags=("multimodal", "audio"))
def mm_audio_zcr(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("crossings", T.LongType()),
            T.StructField("zcr_ppm", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 50 + doc_id % 50
                idx = np.arange(n, dtype=np.int64)
                samples = ((doc_id * 31 + idx * 7) % 65536) - 32768
                blob = encode_wav_pcm16(samples, sample_rate=_WAV_RATE)
                dec = decode_media(bytes(blob), "audio/wav")
                fr = dec["frames"].astype(np.int64)
                neg = fr < 0
                crossings = int((neg[:-1] != neg[1:]).sum())
                rows.append(
                    (
                        doc_id,
                        dec["n_samples"],
                        crossings,
                        crossings * 1000000 // (dec["n_samples"] - 1),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "crossings", "zcr_ppm"]
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)
