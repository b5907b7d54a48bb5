"""Baseline JPEG codec (pure stdlib + numpy) + decode query (r12,
VERDICT r11 #3 / carried r10 #7): real crawls are JPEG-heavy, so the
multimodal decode boundary gains a baseline-sequential JPEG decoder
next to PNG/BMP/PPM (multimodal.py).

Decoder (:func:`decode_jpeg`) is a complete baseline implementation for
grayscale (1 component, 1x1) and — since r13 — YCbCr 4:2:0 color
(3 components, Y 2x2 / chroma 1x1): marker parse (APPn/DQT/DHT/SOF0/
SOS, multiple quant + Huffman tables), canonical Huffman table
construction from DHT bits/values, entropy decode with byte un-stuffing
(per-component DC prediction, AC run/size, EOB, ZRL), interleaved MCU
scan, zigzag -> natural dequantization, float64 2-D IDCT, level shift +
clamp, JFIF replication chroma upsampling, libjpeg fixed-point integer
YCbCr->RGB. Progressive scans and other sampling layouts are out of
scope (the encoders below never emit them; a foreign file fails
loudly).

Encoder (:func:`encode_jpeg_baseline`) writes a spec-valid single-
component JFIF file from QUANTIZED coefficient blocks — coefficient-
domain input makes lossy JPEG exactly round-trippable, which is what
lets a driver oracle exist at all: the decoded image of a block whose
only nonzero coefficients are DC = a and AC(4,4) = b is the closed form

    pixel(x, y) = clamp(round(128 + a*qDC/8 + s(x)*s(y)*b*qAC/8))

with s = [+,-,-,+,+,-,-,+] (the (4,4) cosine basis sign pattern), since
cos((2x+1)*4*pi/16) = s(x)/sqrt(2). With qDC/qAC multiples of 8 the
target is an exact integer and the float64 IDCT lands within 1e-12 of
it — rounding is stable. The entropy layer still runs the full real
path (DC categories incl. negative diffs, a >15 zero run to the (4,4)
zigzag slot exercising ZRL, EOB, byte stuffing).

Huffman tables are generated canonically over the complete baseline
alphabet (DC categories 0-11 at 4 bits; EOB + ZRL + all 160 (run,size)
AC symbols at 8 bits) — valid per the spec (strictly fewer symbols than
codes at each length, so the all-ones code stays unused) and exercised
end-to-end since the decoder builds its tables from the DHT segment,
never from shared constants.

``mm_image_jpeg_decode`` follows the multimodal convention: a
deterministic coefficient image per doc_id, encoded to a real JPEG and
decoded back inside ONE Arrow-batched ``mapInPandas`` stage; output is
exact integer pixel stats plus a probe pixel, recomputed by the oracle
from the closed form above. At 100 TB this stage's shape is the real
one: binary column in, Arrow batches through a vectorized decode, no
driver involvement, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread


def _zigzag_order() -> list[int]:
    """Natural (row*8+col) index for each zigzag position, per T.81."""
    order: list[int] = []
    for s in range(15):
        rs = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        order.extend(r * 8 + (s - r) for r in rs)
    return order


ZIGZAG = _zigzag_order()

# quant table (natural order): DC step 32, everything else 16 — multiples
# of 8 so DC-only / (4,4)-only blocks decode to exact integers (docstring)
_QTABLE = [32] + [16] * 63
_DC_Q, _AC44_Q = _QTABLE[0], _QTABLE[4 * 8 + 4]
# chroma quant table (color path): DC step 40 — a DIFFERENT multiple of 8
# so the two DQT tables are distinguishable end to end
_QTABLE_C = [40] + [16] * 63

# libjpeg-style fixed-point YCbCr->RGB constants (x65536); the decoder
# and both closed-form oracles share these exact integers, with floor
# semantics (numpy >>16 == DuckDB BIGINT // 65536, both floor)
_FIX_R_CR = 91881  # 1.40200
_FIX_G_CB = 22554  # 0.34414
_FIX_G_CR = 46802  # 0.71414
_FIX_B_CB = 116130  # 1.77200

# canonical Huffman alphabets: symbol order IS the code order
_DC_SYMS = list(range(12))  # categories 0..11, all 4-bit codes
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, (run,size) — 162 symbols, all 8-bit codes
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMS)  # BITS index 3 == code length 4
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # code length 8


def _build_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for li, n in enumerate(bits):
        for _ in range(n):
            codes[syms[k]] = (code, li + 1)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_SYMS)
_AC_CODES = _build_codes(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc, self._n = 0, 0

    def flush(self) -> None:
        while self._n:
            self.put(1, 1)  # pad with 1s per spec

    def restart(self, n: int) -> None:
        """Byte-align (1-padded) and emit RSTn — the spec's restart
        marker between entropy-coded segments."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(bw_: "_BitWriter", blk, pred: int) -> int:
    """Entropy-encode one quantized block (natural order) against the
    module's canonical tables; returns the new DC predictor."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    t = _category(diff)
    code, ln = _DC_CODES[t]
    bw_.put(code, ln)
    if t:
        bw_.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if blk[ZIGZAG[k]]), default=0)
    for k in range(1, last_nz + 1):
        v = int(blk[ZIGZAG[k]])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bw_.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES[(run << 4) | s]
        bw_.put(code, ln)
        bw_.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODES[0x00]
        bw_.put(code, ln)
    return pred


def _dqt_segment(qtable, table_id: int) -> bytes:
    """One DQT segment (Pq=0) with values in zigzag order."""
    return (
        b"\xff\xdb"
        + (67).to_bytes(2, "big")
        + bytes([table_id])
        + bytes(qtable[ZIGZAG[k]] for k in range(64))
    )


def _dht_segments(table_ids=(0,)) -> bytes:
    """DC+AC DHT segments for each requested table id (same canonical
    bits/values for every id — legal, and the decoder always rebuilds
    its tables from the DHT segment, never from shared constants)."""
    out = bytearray()
    for tid in table_ids:
        for cls, bits, syms in ((0, _DC_BITS, _DC_SYMS), (1, _AC_BITS, _AC_SYMS)):
            out += b"\xff\xc4" + (3 + 16 + len(syms)).to_bytes(2, "big")
            out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
    return bytes(out)


_JFIF_APP0 = (
    b"\xff\xe0"
    + (16).to_bytes(2, "big")
    + b"JFIF\x00\x01\x01\x00"
    + (1).to_bytes(2, "big")
    + (1).to_bytes(2, "big")
    + b"\x00\x00"
)


def _dri_segment(ri: int) -> bytes:
    return b"\xff\xdd" + (4).to_bytes(2, "big") + ri.to_bytes(2, "big")


def encode_jpeg_baseline(
    blocks, bw: int, bh: int, qtable=None, restart_interval: int = 0
) -> bytes:
    """Encode quantized-coefficient ``blocks`` (bw*bh arrays of 64 ints,
    natural order, raster block order) as a grayscale baseline JFIF.
    ``qtable`` (natural order) defaults to the module table — passing a
    different one re-encodes the same image at a different quantization
    (the re-encode dedup fixture relies on this). ``restart_interval``
    (in MCUs = blocks here), when nonzero, writes a DRI segment and
    RST0-7 markers with DC-predictor resets — the camera-JPEG layout."""
    qtable = _QTABLE if qtable is None else qtable
    assert len(blocks) == bw * bh
    out = bytearray(b"\xff\xd8")  # SOI
    out += _JFIF_APP0
    out += _dqt_segment(qtable, 0)
    # SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    h, w = bh * 8, bw * 8
    out += b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x01" + b"\x01\x11\x00"
    out += _dht_segments((0,))
    if restart_interval:
        out += _dri_segment(restart_interval)
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    bw_ = _BitWriter()
    pred = 0
    rst = 0
    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
            pred = 0
        pred = _encode_block(bw_, blk, pred)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_SAMP_GEOM = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}  # -> (hy, vy)


def encode_jpeg_color(
    y_blocks, cb_blocks, cr_blocks, mw: int, mh: int,
    qtab_y=None, qtab_c=None, samp: str = "420", restart_interval: int = 0,
) -> bytes:
    """Encode a YCbCr baseline JFIF from quantized-coefficient blocks.

    ``samp`` picks the chroma layout (r14 extension; default keeps the
    r13 4:2:0 behavior): "420" -> Y 2x2 (4 luma blocks per 16x16 MCU in
    TL, TR, BL, BR raster), "422" -> Y 2x1 (2 luma blocks per 16x8 MCU),
    "444" -> Y 1x1 (1 luma block per 8x8 MCU); chroma is always one
    Cb + one Cr block per MCU. Luma uses quant table 0 and Huffman
    tables 0, chroma table 1 / Huffman tables 1 — so the decoder's
    multi-table DQT/DHT paths are exercised end to end."""
    qtab_y = _QTABLE if qtab_y is None else qtab_y
    qtab_c = _QTABLE_C if qtab_c is None else qtab_c
    hy, vy = _SAMP_GEOM[samp]
    n_mcu = mw * mh
    assert len(y_blocks) == hy * vy * n_mcu
    assert len(cb_blocks) == len(cr_blocks) == n_mcu
    out = bytearray(b"\xff\xd8")  # SOI
    out += _JFIF_APP0
    out += _dqt_segment(qtab_y, 0)
    out += _dqt_segment(qtab_c, 1)
    # SOF0: 8-bit, 3 components — Y (hy x vy) sampling qt0, Cb/Cr 1x1 qt1
    h, w = mh * 8 * vy, mw * 8 * hy
    out += b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x03" + b"\x01" + bytes([(hy << 4) | vy]) + b"\x00"
    out += b"\x02\x11\x01" + b"\x03\x11\x01"
    out += _dht_segments((0, 1))
    if restart_interval:
        out += _dri_segment(restart_interval)
    # SOS: 3 components — Y tables 0/0, chroma tables 1/1
    out += b"\xff\xda" + (12).to_bytes(2, "big")
    out += b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00"
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    nyb = hy * vy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        for k in range(nyb):
            preds[0] = _encode_block(bw_, y_blocks[nyb * m + k], preds[0])
        preds[1] = _encode_block(bw_, cb_blocks[m], preds[1])
        preds[2] = _encode_block(bw_, cr_blocks[m], preds[2])
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                assert self.data[self.pos] == 0x00, "marker inside scan"
                self.pos += 1
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, n: int) -> None:
        """Consume an expected RSTn: drop the current byte's unread pad
        bits, then the two marker bytes. A pad-only byte never exists
        (the encoder only pads a byte that carries real bits), so after
        the drop the read head sits exactly on the marker."""
        self._acc, self._n = 0, 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError(f"expected restart marker RST{n & 7}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coeffs):
    import numpy as np

    x = np.arange(8)
    basis = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    basis[0, :] *= 1 / np.sqrt(2)  # row u, col x: 0.5*C(u)*cos(...)
    return basis.T @ coeffs @ basis


def decode_jpeg(payload: bytes) -> dict:
    """Baseline-sequential JPEG decode: grayscale (1 component, 1x1) or
    YCbCr 4:2:0 color (3 components, Y 2x2 / chroma 1x1). Color output
    adds ``planes`` (pre-conversion Y/Cb/Cr, chroma NOT upsampled) next
    to the fixed-point-converted RGB ``pixels`` — decode-normalized
    dedup digests the planes, skipping the lossy RGB rounding entirely.
    Progressive scans and other sampling layouts fail loudly."""
    import numpy as np

    assert payload[:2] == b"\xff\xd8", "not a JPEG (SOI missing)"
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    ri = 0  # restart interval in MCUs (DRI); 0 = no restart markers
    comps: list[tuple[int, int, int, int]] = []  # (id, hsamp, vsamp, tq)
    scan: list[tuple[int, int]] = []  # per scan component: (td, ta)
    while pos < len(payload):
        assert payload[pos] == 0xFF, "marker expected"
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if 0xE0 <= m <= 0xEF or m == 0xFE:
            pass  # APPn / comment
        elif m == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                pq, t = seg[o] >> 4, seg[o] & 15
                assert pq == 0, "only 8-bit quant tables"
                zz = list(seg[o + 1 : o + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qt[t] = nat
                o += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(seg):
                cls, t = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                syms = list(seg[o + 17 : o + 17 + n])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for li, cnt in enumerate(bits):
                    for _ in range(cnt):
                        table[(li + 1, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, t)] = table
                o += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            assert seg[0] == 8, "8-bit precision only"
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                (
                    seg[6 + 3 * i],
                    seg[7 + 3 * i] >> 4,
                    seg[7 + 3 * i] & 15,
                    seg[8 + 3 * i],
                )
                for i in range(nc)
            ]
        elif m == 0xC2:  # SOF2 — r14: route to the progressive decoder
            from .jpeg_progressive import decode_jpeg_progressive

            return decode_jpeg_progressive(payload)
        elif m in (0xC1, 0xC3):
            raise NotImplementedError("non-baseline JPEG (extended/lossless)")
        elif m == 0xDD:  # DRI
            ri = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = [(seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15) for i in range(ns)]
            pos += seglen
            break
        pos += seglen
    assert w and h and comps and scan, "incomplete JPEG header"
    assert len(scan) == len(comps), "scan/frame component mismatch"
    rd = _BitReader(payload[pos:])

    def sym(tab):
        ln, code = 0, 0
        while True:
            code = (code << 1) | rd.bit()
            ln += 1
            s = tab.get((ln, code))
            if s is not None:
                return s
            assert ln <= 16, "invalid Huffman stream"

    def decode_block(ci: int, pred: int):
        """One 8x8 block of component ci -> (uint8 pixel block, new pred)."""
        dc_tab, ac_tab = huff[(0, scan[ci][0])], huff[(1, scan[ci][1])]
        q = qt[comps[ci][3]]
        zz = [0] * 64
        t = sym(dc_tab)
        pred += _extend(rd.bits(t), t)
        zz[0] = pred
        k = 1
        while k <= 63:
            s = sym(ac_tab)
            if s == 0x00:
                break
            if s == 0xF0:
                k += 16
                continue
            k += s >> 4
            zz[k] = _extend(rd.bits(s & 15), s & 15)
            k += 1
        coeffs = np.zeros((8, 8), dtype=np.float64)
        for k in range(64):
            coeffs[ZIGZAG[k] // 8][ZIGZAG[k] % 8] = zz[k] * q[ZIGZAG[k]]
        px = np.clip(np.round(_idct_block(coeffs) + 128), 0, 255)
        return px.astype(np.uint8), pred

    if len(comps) == 1:
        assert comps[0][1:3] == (1, 1), "grayscale must be 1x1 sampling"
        bw_, bh_ = (w + 7) // 8, (h + 7) // 8
        img = np.zeros((bh_ * 8, bw_ * 8), dtype=np.uint8)
        pred = 0
        rst = 0
        for bi in range(bw_ * bh_):
            if ri and bi and bi % ri == 0:
                rd.restart(rst)
                rst = (rst + 1) & 7
                pred = 0
            px, pred = decode_block(0, pred)
            r, c = (bi // bw_) * 8, (bi % bw_) * 8
            img[r : r + 8, c : c + 8] = px
        return {
            "width": w,
            "height": h,
            "channels": 1,
            "pixels": img[:h, :w],
        }

    # YCbCr with chroma 1x1 and Y sampling (hy, vy) in {(2,2) 4:2:0,
    # (2,1) 4:2:2, (1,1) 4:4:4}; anything else (4:1:1, 4-component
    # CMYK, ...) still fails loudly rather than decoding to garbage.
    if (
        len(comps) != 3
        or comps[1][1:3] != (1, 1)
        or comps[2][1:3] != (1, 1)
        or comps[0][1:3] not in ((2, 2), (2, 1), (1, 1))
    ):
        raise NotImplementedError(
            "only grayscale (1x1) and YCbCr 4:2:0/4:2:2/4:4:4 "
            "(Y 2x2|2x1|1x1, chroma 1x1) sampling"
        )
    hy, vy = comps[0][1:3]
    mcw, mch = 8 * hy, 8 * vy  # MCU pixel dims
    mx, my = (w + mcw - 1) // mcw, (h + mch - 1) // mch
    yp = np.zeros((my * mch, mx * mcw), dtype=np.uint8)
    cbp = np.zeros((my * 8, mx * 8), dtype=np.uint8)
    crp = np.zeros((my * 8, mx * 8), dtype=np.uint8)
    preds = [0, 0, 0]
    rst = 0
    for m in range(mx * my):
        if ri and m and m % ri == 0:
            rd.restart(rst)
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        r0, c0 = (m // mx) * mch, (m % mx) * mcw
        for k in range(hy * vy):  # luma raster inside the MCU
            px, preds[0] = decode_block(0, preds[0])
            rr, cc = r0 + (k // hy) * 8, c0 + (k % hy) * 8
            yp[rr : rr + 8, cc : cc + 8] = px
        px, preds[1] = decode_block(1, preds[1])
        cbp[(r0 // vy) : (r0 // vy) + 8, (c0 // hy) : (c0 // hy) + 8] = px
        px, preds[2] = decode_block(2, preds[2])
        crp[(r0 // vy) : (r0 // vy) + 8, (c0 // hy) : (c0 // hy) + 8] = px
    # JFIF simple (replication) upsampling — vy-fold vertical, hy-fold
    # horizontal (4:2:2 replicates horizontally ONLY; 4:4:4 not at
    # all) — then libjpeg fixed-point YCbCr->RGB: every term integer,
    # >>16 is an exact floor shared with the SQL oracle's // 65536
    yv = yp.astype(np.int64)
    cb = np.repeat(np.repeat(cbp, vy, 0), hy, 1).astype(np.int64) - 128
    cr = np.repeat(np.repeat(crp, vy, 0), hy, 1).astype(np.int64) - 128
    r = yv + ((_FIX_R_CR * cr + 32768) >> 16)
    g = yv - ((_FIX_G_CB * cb + _FIX_G_CR * cr + 32768) >> 16)
    b = yv + ((_FIX_B_CB * cb + 32768) >> 16)
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    ch, cw = (h + vy - 1) // vy, (w + hy - 1) // hy
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "sampling": {(2, 2): "420", (2, 1): "422", (1, 1): "444"}[(hy, vy)],
        "pixels": rgb[:h, :w],
        "planes": {
            "y": yp[:h, :w],
            "cb": cbp[:ch, :cw],
            "cr": crp[:ch, :cw],
        },
    }


def synth_coeff_blocks(doc_id: int):
    """Deterministic per-doc coefficient image (closed form, no RNG):
    block i carries DC = a_i in -2..2 and AC(4,4) = b_i in -1..1."""
    bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
    blocks = []
    for i in range(bw * bh):
        blk = [0] * 64
        blk[0] = (doc_id + 3 * i) % 5 - 2
        blk[4 * 8 + 4] = (doc_id + i) % 3 - 1
        blocks.append(blk)
    return blocks, bw, bh


_JPEG_ORACLE = """
SELECT doc_id,
       cast((2 + doc_id % 3) * 8 AS INTEGER) AS width,
       cast((1 + doc_id % 2) * 8 AS INTEGER) AS height,
       cast(sum(64 * (128 + 4 * ((doc_id + 3 * i) % 5 - 2))) AS BIGINT)
         AS sum_px,
       cast(min(128 + 4 * ((doc_id + 3 * i) % 5 - 2)
                    - 2 * abs((doc_id + i) % 3 - 1)) AS BIGINT) AS min_px,
       cast(max(128 + 4 * ((doc_id + 3 * i) % 5 - 2)
                    + 2 * abs((doc_id + i) % 3 - 1)) AS BIGINT) AS max_px,
       cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 3 - 1) AS BIGINT)
         AS px00
FROM (
  SELECT doc_id,
         unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS i
  FROM documents
) g
GROUP BY doc_id
"""


@register(
    "mm_image_jpeg_decode", oracle=_JPEG_ORACLE, tags=("multimodal", "image")
)
def mm_image_jpeg_decode(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
            T.StructField("px00", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                blocks, bw, bh = synth_coeff_blocks(doc_id)
                blob = encode_jpeg_baseline(blocks, bw, bh)
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int(px[0, 0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "sum_px",
                    "min_px",
                    "max_px",
                    "px00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Decode-normalized dedup of re-encoded JPEGs (r12): the JPEG feed into
# the image-dedup ladder. Docs pair as (2p, 2p+1): both carry the SAME
# underlying image, but the odd file is re-encoded with a halved quant
# table and doubled coefficients — byte-level different (different DQT,
# different entropy stream), pixel-level identical after decode. A
# blob-hash dedup misses such pairs; this operator decodes inside the
# Arrow batch, digests the normalized pixel array (md5, 16 bytes/image)
# and equi-joins on (dims, digest) — the cheapest possible dedup join, a
# plain hash shuffle of constant-width rows, linear at 100 TB.
#
# The oracle needs no pixels: over this fixture, pixel equality is
# EQUIVALENT to dequantized-coefficient equality — the four s-sign
# classes of the (DC,(4,0)-less) basis give pixel values through an
# invertible (Hadamard) system, so it groups docs on the closed-form
# dequantized coefficient string instead. Both engines therefore compute
# the same partition of docs through entirely different machinery (real
# codec vs closed form) — a decode-correctness check disguised as a
# dedup query.
# --------------------------------------------------------------------------

_RENC_ORACLE = """
WITH coef AS (
  SELECT doc_id, bw, bh,
         string_agg(
           cast(32 * (m % 25 - 12) AS VARCHAR) || ':'
             || cast(16 * ((m // 25) % 13 - 6) AS VARCHAR),
           ',' ORDER BY i) AS key
  FROM (
    SELECT doc_id, bw, bh, i,
           (s0 * s0 + 7919 * s0) // 256 AS m
    FROM (
      SELECT doc_id, bw, bh, i,
             ((doc_id // 2) * 100000 + i) % 2147483647 AS s0
      FROM (
        SELECT doc_id,
               2 + (doc_id // 2) % 3 AS bw,
               1 + (doc_id // 2) % 2 AS bh,
               unnest(range((2 + (doc_id // 2) % 3)
                            * (1 + (doc_id // 2) % 2))) AS i
        FROM documents
      ) g
    ) g2
  ) g3
  GROUP BY doc_id, bw, bh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(a.bw * a.bh AS INTEGER) AS n_blocks
FROM coef a
JOIN coef b
  ON a.bw = b.bw AND a.bh = b.bh AND a.key = b.key
     AND a.doc_id < b.doc_id
"""


def _renc_blocks(doc_id: int):
    """Fixture: (2p, 2p+1) share dequantized coefficients; the odd file
    uses a halved quant table with doubled quantized values."""
    base, odd = doc_id // 2, doc_id % 2
    bw, bh = 2 + base % 3, 1 + base % 2
    scale = 2 if odd else 1
    qtable = [32 // scale] + [16 // scale] * 63
    blocks = []
    for i in range(bw * bh):
        s0 = (base * 100000 + i) % 2147483647
        m = (s0 * s0 + 7919 * s0) // 256
        blk = [0] * 64
        blk[0] = (m % 25 - 12) * scale
        blk[4 * 8 + 4] = ((m // 25) % 13 - 6) * scale
        blocks.append(blk)
    return blocks, bw, bh, qtable


@register(
    "mm_image_jpeg_renc_dedup",
    oracle=_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_jpeg_renc_dedup(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                blocks, bw, bh, qtable = _renc_blocks(doc_id)
                blob = encode_jpeg_baseline(blocks, bw, bh, qtable=qtable)
                dec = decode_media(bytes(blob), "image/jpeg")
                digest = hashlib.md5(dec["pixels"].tobytes()).hexdigest()
                rows.append((doc_id, dec["width"], dec["height"], digest))
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h", "digest"])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    hashes = d.mapInPandas(run, schema=schema)
    a = hashes.select(
        F.col("doc_id").alias("doc_a"), "w", "h", "digest"
    )
    b = hashes.select(
        F.col("doc_id").alias("doc_b"), "w", "h", "digest"
    )
    return (
        a.join(b, ["w", "h", "digest"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            ((F.col("w") / 8) * (F.col("h") / 8)).cast("int").alias("n_blocks"),
        )
    )


# --------------------------------------------------------------------------
# Color (YCbCr 4:2:0) decode query (r13, VERDICT r12 #2): the last gap
# between the multimodal dedup ladder and real-crawl images — crawls are
# overwhelmingly color JPEG. The coefficient-fixture trick extends per
# channel: each Y block carries DC=a and AC(4,4)=b (exact-int IDCT as in
# the grayscale docstring), each chroma block DC=c and AC(4,4)=d, so the
# pre-conversion planes are closed-form. Chroma is NOT flat — the AC term
# rides through the 2x2 replication upsample, so the upsampling path is
# exercised in the VALUE domain, not just shape. RGB then goes through
# the libjpeg fixed-point integer conversion (constants above), which the
# oracle mirrors with BIGINT // 65536 (both floor). Coefficient ranges
# keep every channel inside [97, 159] — clamp-free, so the closed form
# is exact.
#
# Per-MCU sums: the AC(4,4) basis sign pattern s(x)s(y) splits the 8x8
# chroma plane into 32 "+" and 32 "-" positions; each chroma pixel covers
# 4 full-res pixels, so e.g. sum(R) over one MCU = sum_Y + 128*(f(u+) +
# f(u-)) with u± = 5*crdc ± 2*crac and f the fixed-point Cr->R term.
# --------------------------------------------------------------------------


def synth_color_blocks(doc_id: int):
    """Deterministic per-doc 4:2:0 coefficient image (closed form):
    MCU j's four Y blocks carry DC=(doc_id+3j+k)%5-2, AC44=(doc_id+j+k)%3-1;
    chroma DCs/ACs use shifted seeds so Cb != Cr from MCU 0 on."""
    mw, mh = 1 + doc_id % 3, 1 + doc_id % 2
    yb, cbb, crb = [], [], []
    for j in range(mw * mh):
        for k in range(4):
            blk = [0] * 64
            blk[0] = (doc_id + 3 * j + k) % 5 - 2
            blk[4 * 8 + 4] = (doc_id + j + k) % 3 - 1
            yb.append(blk)
        cb = [0] * 64
        cb[0] = (doc_id + 2 * j + 1) % 5 - 2
        cb[4 * 8 + 4] = (doc_id + j + 2) % 3 - 1
        cbb.append(cb)
        cr = [0] * 64
        cr[0] = (doc_id + 3 * j + 3) % 5 - 2
        cr[4 * 8 + 4] = (doc_id + 2 * j + 1) % 3 - 1
        crb.append(cr)
    return yb, cbb, crb, mw, mh


_COLOR_ORACLE = """
WITH mj AS (
  SELECT doc_id, 1 + doc_id % 3 AS mw, 1 + doc_id % 2 AS mh,
         unnest(range((1 + doc_id % 3) * (1 + doc_id % 2))) AS j
  FROM documents
),
ysum AS (
  SELECT doc_id, j,
         sum(64 * (128 + 4 * ((doc_id + 3 * j + k) % 5 - 2))) AS ys
  FROM (SELECT doc_id, j, unnest([0, 1, 2, 3]) AS k FROM mj) yk
  GROUP BY doc_id, j
),
ch AS (
  SELECT doc_id, j,
    5 * ((doc_id + 2*j + 1) % 5 - 2) + 2 * ((doc_id + j + 2) % 3 - 1) AS vp,
    5 * ((doc_id + 2*j + 1) % 5 - 2) - 2 * ((doc_id + j + 2) % 3 - 1) AS vm,
    5 * ((doc_id + 3*j + 3) % 5 - 2) + 2 * ((doc_id + 2*j + 1) % 3 - 1) AS up,
    5 * ((doc_id + 3*j + 3) % 5 - 2) - 2 * ((doc_id + 2*j + 1) % 3 - 1) AS um
  FROM mj
),
per_mcu AS (
  SELECT y.doc_id, y.ys, c.vp, c.vm, c.up, c.um
  FROM ysum y JOIN ch c ON y.doc_id = c.doc_id AND y.j = c.j
)
SELECT doc_id,
  cast(16 * (1 + doc_id % 3) AS INTEGER) AS width,
  cast(16 * (1 + doc_id % 2) AS INTEGER) AS height,
  -- every fixed-point term is offset by +1024*65536 before the integer
  -- division and re-centered after: the numerator is then non-negative,
  -- so DuckDB's truncating // equals the decoder's floor (>>16) exactly
  cast(sum(ys + 128 * (((91881*up + 32768 + 67108864) // 65536 - 1024)
                       + ((91881*um + 32768 + 67108864) // 65536 - 1024)))
       AS BIGINT) AS sum_r,
  cast(sum(ys - 128 * (((22554*vp + 46802*up + 32768 + 67108864) // 65536
                        - 1024)
                       + ((22554*vm + 46802*um + 32768 + 67108864) // 65536
                          - 1024)))
       AS BIGINT) AS sum_g,
  cast(sum(ys + 128 * (((116130*vp + 32768 + 67108864) // 65536 - 1024)
                       + ((116130*vm + 32768 + 67108864) // 65536 - 1024)))
       AS BIGINT) AS sum_b,
  cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 3 - 1)
       + (91881 * (5 * ((doc_id + 3) % 5 - 2) + 2 * ((doc_id + 1) % 3 - 1))
          + 32768 + 67108864) // 65536 - 1024 AS BIGINT) AS r00,
  cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 3 - 1)
       - ((22554 * (5 * ((doc_id + 1) % 5 - 2) + 2 * ((doc_id + 2) % 3 - 1))
           + 46802 * (5 * ((doc_id + 3) % 5 - 2) + 2 * ((doc_id + 1) % 3 - 1))
           + 32768 + 67108864) // 65536 - 1024) AS BIGINT) AS g00,
  cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 3 - 1)
       + (116130 * (5 * ((doc_id + 1) % 5 - 2) + 2 * ((doc_id + 2) % 3 - 1))
          + 32768 + 67108864) // 65536 - 1024 AS BIGINT) AS b00
FROM per_mcu
GROUP BY doc_id
"""


@register(
    "mm_image_jpeg_color_decode",
    oracle=_COLOR_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_color_decode(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("r00", T.LongType()),
            T.StructField("g00", T.LongType()),
            T.StructField("b00", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                yb, cbb, crb, mw, mh = synth_color_blocks(doc_id)
                blob = encode_jpeg_color(yb, cbb, crb, mw, mh)
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(px[0, 0, 0]),
                        int(px[0, 0, 1]),
                        int(px[0, 0, 2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "sum_r", "sum_g", "sum_b", "r00", "g00", "b00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Decode-normalized dedup over COLOR re-encodes (r13): the color sibling
# of mm_image_jpeg_renc_dedup. Docs pair as (2p, 2p+1) carrying the same
# underlying image; the odd file is re-encoded with BOTH quant tables
# halved and quantized coefficients doubled — different DQTs, different
# entropy streams, identical dequantized coefficients, hence identical
# decoded planes. The digest normalizes on the PRE-conversion Y/Cb/Cr
# planes (not RGB): plane equality <=> dequantized-coefficient equality
# by the same per-plane DC/AC-recoverability argument as grayscale
# (clamp-free ranges), while RGB adds only a deterministic function on
# top. The oracle groups docs on the closed-form dequantized coefficient
# string — both engines compute the same partition through entirely
# different machinery.
# --------------------------------------------------------------------------

_COLOR_RENC_ORACLE = """
WITH d AS (
  SELECT doc_id, doc_id // 2 AS base, 1 + (doc_id // 2) % 2 AS mw
  FROM documents
),
yk AS (
  SELECT doc_id, base, mw, j, unnest([0, 1, 2, 3]) AS k
  FROM (SELECT doc_id, base, mw, unnest(range(mw)) AS j FROM d) jj
),
ystr AS (
  SELECT doc_id, base, mw, j,
         string_agg(cast(32 * (m % 25 - 12) AS VARCHAR) || ':'
                    || cast(16 * ((m // 25) % 13 - 6) AS VARCHAR),
                    ',' ORDER BY k) AS ys
  FROM (
    SELECT doc_id, base, mw, j, k, (s0 * s0 + 7919 * s0) // 256 AS m
    FROM (SELECT *, (base * 100000 + 4 * j + k) % 2147483647 AS s0 FROM yk) q
  ) q2
  GROUP BY doc_id, base, mw, j
),
mcu AS (
  SELECT doc_id, mw, j,
         ys || '|' || cast(40 * (m1 % 17 - 8) AS VARCHAR)
            || ':' || cast(16 * ((m1 // 17) % 9 - 4) AS VARCHAR)
            || ':' || cast(40 * ((m1 // 153) % 17 - 8) AS VARCHAR)
            || ':' || cast(16 * ((m1 // 2601) % 9 - 4) AS VARCHAR) AS mstr
  FROM (
    SELECT doc_id, mw, j, ys, (s1 * s1 + 7919 * s1) // 256 AS m1
    FROM (SELECT *, (base * 100000 + 977 * j + 31) % 2147483647 AS s1
          FROM ystr) q
  ) q2
),
keyed AS (
  SELECT doc_id, mw, string_agg(mstr, ';' ORDER BY j) AS key
  FROM mcu GROUP BY doc_id, mw
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(a.mw AS INTEGER) AS n_mcu
FROM keyed a
JOIN keyed b ON a.mw = b.mw AND a.key = b.key AND a.doc_id < b.doc_id
"""


def _color_renc_blocks(doc_id: int):
    """Color re-encode fixture: (2p, 2p+1) share dequantized coefficients;
    the odd file halves BOTH quant tables and doubles quantized values.
    Seeds squared-mix like the grayscale fixture; ranges keep every plane
    clamp-free (Y in [68,188], chroma in [80,176])."""
    base, odd = doc_id // 2, doc_id % 2
    mw, mh = 1 + base % 2, 1
    scale = 2 if odd else 1
    qt_y = [32 // scale] + [16 // scale] * 63
    qt_c = [40 // scale] + [16 // scale] * 63
    yb, cbb, crb = [], [], []
    for j in range(mw * mh):
        for k in range(4):
            s0 = (base * 100000 + 4 * j + k) % 2147483647
            m = (s0 * s0 + 7919 * s0) // 256
            blk = [0] * 64
            blk[0] = (m % 25 - 12) * scale
            blk[4 * 8 + 4] = ((m // 25) % 13 - 6) * scale
            yb.append(blk)
        s1 = (base * 100000 + 977 * j + 31) % 2147483647
        m1 = (s1 * s1 + 7919 * s1) // 256
        cb = [0] * 64
        cb[0] = (m1 % 17 - 8) * scale
        cb[4 * 8 + 4] = ((m1 // 17) % 9 - 4) * scale
        cbb.append(cb)
        cr = [0] * 64
        cr[0] = ((m1 // 153) % 17 - 8) * scale
        cr[4 * 8 + 4] = ((m1 // 2601) % 9 - 4) * scale
        crb.append(cr)
    return yb, cbb, crb, mw, mh, qt_y, qt_c


@register(
    "mm_image_jpeg_color_renc_dedup",
    oracle=_COLOR_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_jpeg_color_renc_dedup(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                yb, cbb, crb, mw, mh, qt_y, qt_c = _color_renc_blocks(doc_id)
                blob = encode_jpeg_color(
                    yb, cbb, crb, mw, mh, qtab_y=qt_y, qtab_c=qt_c
                )
                dec = decode_media(bytes(blob), "image/jpeg")
                pl = dec["planes"]
                digest = hashlib.md5(
                    pl["y"].tobytes() + pl["cb"].tobytes() + pl["cr"].tobytes()
                ).hexdigest()
                rows.append((doc_id, dec["width"], dec["height"], digest))
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h", "digest"])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    hashes = d.mapInPandas(run, schema=schema)
    a = hashes.select(F.col("doc_id").alias("doc_a"), "w", "h", "digest")
    b = hashes.select(F.col("doc_id").alias("doc_b"), "w", "h", "digest")
    return (
        a.join(b, ["w", "h", "digest"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("w") / 16).cast("int").alias("n_mcu"),
        )
    )


# --------------------------------------------------------------------------
# Chroma-subsampling matrix decode (r14, VERDICT r13 #5): real crawls
# are not all 4:2:0 — libjpeg writes 4:2:2 and 4:4:4 routinely, and the
# r13 decoder REJECTED those (the pinned gate at the sampling check), so
# the image dedup ladder skipped that fraction. The decoder now handles
# Y sampling 2x2 / 2x1 / 1x1 with chroma 1x1; this query decodes a
# per-doc MIX of all three layouts (samp = doc_id % 3) in one pass, the
# shape of a real crawl partition.
#
# Same coefficient-fixture oracle trick as the 4:2:0 query, generalized
# by the replication factor rep = hy*vy (4 / 2 / 1): each chroma pixel
# covers rep full-res pixels, so the per-MCU nonlinear term scales as
# rep * 32 * (f(u+) + f(u-)) — the horizontal-only replication of 4:2:2
# and the no-op upsample of 4:4:4 fall out of the same algebra. Luma
# block count per MCU is also rep, so sum_Y and the chroma term vary
# together across modes — a mode-mislabeled decode cannot cancel out.
# Coefficient ranges stay clamp-free ([91, 165] worst case).
# --------------------------------------------------------------------------

_CHROMA_SAMPS = ("420", "422", "444")  # doc_id % 3 picks the layout


def synth_chroma_blocks(doc_id: int):
    """Deterministic per-doc coefficient image in the doc's sampling
    mode: mw MCUs wide, 1 tall; per MCU j the rep luma blocks carry
    DC=(doc_id+3j+k)%5-2 / AC44=(doc_id+j+k)%3-1 and chroma reuses the
    4:2:0 fixture's seed shifts (Cb != Cr from MCU 0 on)."""
    samp = _CHROMA_SAMPS[doc_id % 3]
    hy, vy = _SAMP_GEOM[samp]
    rep = hy * vy
    mw = 1 + doc_id % 2
    yb, cbb, crb = [], [], []
    for j in range(mw):
        for k in range(rep):
            blk = [0] * 64
            blk[0] = (doc_id + 3 * j + k) % 5 - 2
            blk[4 * 8 + 4] = (doc_id + j + k) % 3 - 1
            yb.append(blk)
        cb = [0] * 64
        cb[0] = (doc_id + 2 * j + 1) % 5 - 2
        cb[4 * 8 + 4] = (doc_id + j + 2) % 3 - 1
        cbb.append(cb)
        cr = [0] * 64
        cr[0] = (doc_id + 3 * j + 3) % 5 - 2
        cr[4 * 8 + 4] = (doc_id + 2 * j + 1) % 3 - 1
        crb.append(cr)
    return yb, cbb, crb, mw, 1, samp


_CHROMA_ORACLE = """
WITH base AS (
  SELECT doc_id,
         doc_id % 3 AS m3,
         CASE doc_id % 3 WHEN 2 THEN 1 ELSE 2 END AS hy,
         CASE doc_id % 3 WHEN 0 THEN 2 ELSE 1 END AS vy,
         1 + doc_id % 2 AS mw
  FROM documents
),
mj AS (
  SELECT doc_id, m3, hy, vy, hy * vy AS rep, mw,
         unnest(range(mw)) AS j
  FROM base
),
ysum AS (
  SELECT doc_id, j,
         sum(64 * (128 + 4 * ((doc_id + 3 * j + k) % 5 - 2))) AS ys
  FROM (SELECT doc_id, j, unnest(range(rep)) AS k FROM mj) yk
  GROUP BY doc_id, j
),
ch AS (
  SELECT doc_id, j, rep,
    5 * ((doc_id + 2*j + 1) % 5 - 2) + 2 * ((doc_id + j + 2) % 3 - 1) AS vp,
    5 * ((doc_id + 2*j + 1) % 5 - 2) - 2 * ((doc_id + j + 2) % 3 - 1) AS vm,
    5 * ((doc_id + 3*j + 3) % 5 - 2) + 2 * ((doc_id + 2*j + 1) % 3 - 1) AS up,
    5 * ((doc_id + 3*j + 3) % 5 - 2) - 2 * ((doc_id + 2*j + 1) % 3 - 1) AS um
  FROM mj
),
per_mcu AS (
  SELECT y.doc_id, y.ys, c.rep, c.vp, c.vm, c.up, c.um
  FROM ysum y JOIN ch c ON y.doc_id = c.doc_id AND y.j = c.j
),
agg AS (
  SELECT doc_id,
    cast(sum(ys + rep * 32 *
             (((91881*up + 32768 + 67108864) // 65536 - 1024)
              + ((91881*um + 32768 + 67108864) // 65536 - 1024)))
         AS BIGINT) AS sum_r,
    cast(sum(ys - rep * 32 *
             (((22554*vp + 46802*up + 32768 + 67108864) // 65536 - 1024)
              + ((22554*vm + 46802*um + 32768 + 67108864) // 65536
                 - 1024)))
         AS BIGINT) AS sum_g,
    cast(sum(ys + rep * 32 *
             (((116130*vp + 32768 + 67108864) // 65536 - 1024)
              + ((116130*vm + 32768 + 67108864) // 65536 - 1024)))
         AS BIGINT) AS sum_b
  FROM per_mcu GROUP BY doc_id
)
SELECT b.doc_id,
  cast(CASE b.m3 WHEN 0 THEN 420 WHEN 1 THEN 422 ELSE 444 END AS INTEGER)
    AS samp,
  cast(b.mw * 8 * b.hy AS INTEGER) AS width,
  cast(8 * b.vy AS INTEGER) AS height,
  a.sum_r, a.sum_g, a.sum_b,
  cast(128 + 4 * (b.doc_id % 5 - 2) + 2 * (b.doc_id % 3 - 1)
       + (91881 * (5 * ((b.doc_id + 3) % 5 - 2)
                   + 2 * ((b.doc_id + 1) % 3 - 1))
          + 32768 + 67108864) // 65536 - 1024 AS BIGINT) AS r00,
  cast(128 + 4 * (b.doc_id % 5 - 2) + 2 * (b.doc_id % 3 - 1)
       - ((22554 * (5 * ((b.doc_id + 1) % 5 - 2)
                    + 2 * ((b.doc_id + 2) % 3 - 1))
           + 46802 * (5 * ((b.doc_id + 3) % 5 - 2)
                      + 2 * ((b.doc_id + 1) % 3 - 1))
           + 32768 + 67108864) // 65536 - 1024) AS BIGINT) AS g00,
  cast(128 + 4 * (b.doc_id % 5 - 2) + 2 * (b.doc_id % 3 - 1)
       + (116130 * (5 * ((b.doc_id + 1) % 5 - 2)
                    + 2 * ((b.doc_id + 2) % 3 - 1))
          + 32768 + 67108864) // 65536 - 1024 AS BIGINT) AS b00
FROM base b JOIN agg a ON a.doc_id = b.doc_id
"""


@register(
    "mm_image_jpeg_chroma_decode",
    oracle=_CHROMA_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_chroma_decode(spark, sf_dir):
    """Decode a mixed 4:2:0 / 4:2:2 / 4:4:4 crawl partition in one
    Arrow-batched pass; per-doc RGB channel sums + the (0,0) pixel."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("samp", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("r00", T.LongType()),
            T.StructField("g00", T.LongType()),
            T.StructField("b00", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                yb, cbb, crb, mw, mh, samp = synth_chroma_blocks(doc_id)
                blob = encode_jpeg_color(yb, cbb, crb, mw, mh, samp=samp)
                dec = decode_media(bytes(blob), "image/jpeg")
                assert dec["sampling"] == samp, (dec["sampling"], samp)
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        int(samp),
                        dec["width"],
                        dec["height"],
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(px[0, 0, 0]),
                        int(px[0, 0, 1]),
                        int(px[0, 0, 2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "samp", "width", "height",
                    "sum_r", "sum_g", "sum_b", "r00", "g00", "b00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Restart intervals (r16 gate closure). DRI/RSTn is the camera-JPEG
# entropy layout — the stream splits into independently decodable
# segments with DC-predictor resets, which is also what makes REAL
# parallel JPEG decode possible at scale. Restarts change bytes, never
# pixels, so the decode query reuses the closed-form oracle verbatim
# and the dedup twin pairs restart/no-restart encodes of the same
# raster.
# --------------------------------------------------------------------------


@register(
    "mm_image_jpeg_restart_decode",
    oracle=_JPEG_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_restart_decode(spark, sf_dir):
    """Same coefficient fixture as ``mm_image_jpeg_decode`` but encoded
    with a per-doc DRI of 1 + doc_id % 4 MCUs — RST cycling, predictor
    resets and the byte-aligned marker scan sit on the checked path;
    the decoded pixels (and so the oracle) are unchanged because
    restarts live entirely in the entropy layer."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
            T.StructField("px00", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                blocks, bw, bh = synth_coeff_blocks(doc_id)
                blob = encode_jpeg_baseline(
                    blocks, bw, bh, restart_interval=1 + doc_id % 4
                )
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int(px[0, 0]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# Decoded-pixel equality key: the fixture's coefficients depend on the
# pair base through mod 5 (DC), mod 3 (AC + block-grid width) and mod 2
# (grid height), so two bases give identical rasters iff they agree
# mod lcm(5,3,2) = 30 — the oracle's pk join. The odd doc of each
# (2p, 2p+1) pair interleaves RSTn markers: different bytes, identical
# pixels.
_JPEG_RST_RENC_ORACLE = """
WITH k AS (
  SELECT doc_id, (doc_id // 2) % 30 AS pk,
         2 + (doc_id // 2) % 3 AS bw, 1 + (doc_id // 2) % 2 AS bh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(a.bw * 8 AS INTEGER) AS w, cast(a.bh * 8 AS INTEGER) AS h
FROM k a
JOIN k b ON a.pk = b.pk AND a.doc_id < b.doc_id
"""


@register(
    "mm_image_jpeg_restart_renc_dedup",
    oracle=_JPEG_RST_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_jpeg_restart_renc_dedup(spark, sf_dir):
    """Digest-dedup over decoded pixels: every (2p, 2p+1) doc pair
    encodes the same coefficient raster without / with restart markers
    (DRI = 1 + p % 4) and must collide on the decode-normalized
    digest."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .multimodal import decode_media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                base, odd = doc_id // 2, doc_id % 2
                blocks, bw, bh = synth_coeff_blocks(base)
                blob = encode_jpeg_baseline(
                    blocks, bw, bh,
                    restart_interval=(1 + base % 4) if odd else 0,
                )
                dec = decode_media(bytes(blob), "image/jpeg")
                digest = hashlib.md5(dec["pixels"].tobytes()).hexdigest()
                rows.append((doc_id, bw * 8, bh * 8, digest))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    hashes = d.mapInPandas(run, schema=schema)
    a = hashes.select(F.col("doc_id").alias("doc_a"), "w", "h", "digest")
    b = hashes.select(F.col("doc_id").alias("doc_b"), "w", "h", "digest")
    return (
        a.join(b, ["w", "h", "digest"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "w", "h")
    )
