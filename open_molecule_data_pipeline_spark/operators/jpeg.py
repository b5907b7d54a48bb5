"""Baseline JPEG codec (pure stdlib + numpy) + decode query (r12,
VERDICT r11 #3 / carried r10 #7): real crawls are JPEG-heavy, so the
multimodal decode boundary gains a baseline-sequential JPEG decoder
next to PNG/BMP/PPM (multimodal.py).

Decoder (:func:`decode_jpeg`) is a complete baseline-grayscale
implementation: marker parse (APPn/DQT/DHT/SOF0/SOS), canonical Huffman
table construction from DHT bits/values, entropy decode with byte
un-stuffing (DC prediction, AC run/size, EOB, ZRL), zigzag -> natural
dequantization, float64 2-D IDCT, level shift + clamp. Chroma
subsampling / progressive scans are out of scope (the encoder below
never emits them; a foreign progressive file fails loudly).

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


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg_baseline(blocks, bw: int, bh: int, qtable=None) -> bytes:
    """Encode quantized-coefficient ``blocks`` (bw*bh arrays of 64 ints,
    natural order, raster block order) as a grayscale baseline JFIF.
    ``qtable`` (natural order) defaults to the module table — passing a
    different one re-encodes the same image at a different quantization
    (the re-encode dedup fixture relies on this)."""
    qtable = _QTABLE if qtable is None else qtable
    assert len(blocks) == bw * bh
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00"
    out += (1).to_bytes(2, "big") + (1).to_bytes(2, "big") + b"\x00\x00"
    # DQT: Pq=0/Tq=0, values in zigzag order
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
    out += bytes(qtable[ZIGZAG[k]] for k in range(64))
    # SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    h, w = bh * 8, bw * 8
    out += b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x01" + b"\x01\x11\x00"
    # DHT: DC class 0 id 0, AC class 1 id 0
    for cls, bits, syms in ((0, _DC_BITS, _DC_SYMS), (1, _AC_BITS, _AC_SYMS)):
        out += b"\xff\xc4" + (3 + 16 + len(syms)).to_bytes(2, "big")
        out += bytes([cls << 4]) + bytes(bits) + bytes(syms)
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
    bw_ = _BitWriter()
    pred = 0
    for blk in blocks:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        t = _category(diff)
        code, ln = _DC_CODES[t]
        bw_.put(code, ln)
        if t:
            bw_.put(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max(
            (k for k in range(1, 64) if blk[ZIGZAG[k]]), default=0
        )
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


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coeffs):
    import numpy as np

    x = np.arange(8)
    basis = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    basis[0, :] *= 1 / np.sqrt(2)  # row u, col x: 0.5*C(u)*cos(...)
    return basis.T @ coeffs @ basis


def decode_jpeg(payload: bytes) -> dict:
    """Baseline-sequential grayscale JPEG decode (see module docstring)."""
    import numpy as np

    assert payload[:2] == b"\xff\xd8", "not a JPEG (SOI missing)"
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    tq = td = ta = 0
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
            assert seg[5] == 1, "grayscale (1 component) only"
            assert seg[7] == 0x11, "1x1 sampling only"
            tq = seg[8]
        elif m in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("non-baseline JPEG (progressive?)")
        elif m == 0xDA:  # SOS — entropy data follows
            assert seg[0] == 1
            td, ta = seg[2] >> 4, seg[2] & 15
            pos += seglen
            break
        pos += seglen
    assert w and h and tq in qt, "incomplete JPEG header"
    q = qt[tq]
    dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
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

    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    img = np.zeros((bh_ * 8, bw_ * 8), dtype=np.uint8)
    pred = 0
    for bi in range(bw_ * bh_):
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
        r, c = (bi // bw_) * 8, (bi % bw_) * 8
        img[r : r + 8, c : c + 8] = px.astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "channels": 1,
        "pixels": img[:h, :w],
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
