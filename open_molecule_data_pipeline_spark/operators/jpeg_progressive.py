"""Progressive JPEG codec + decode/dedup queries (r14, VERDICT r13 #5).

Real crawls contain a meaningful progressive fraction that the r12/r13
baseline decoder rejected (`jpeg.py`'s pinned SOF gate), so the image
dedup ladder skipped those files. This module implements the
progressive-DCT (SOF2) entropy layer for grayscale:

- **Spectral selection**: each AC scan carries a zigzag band
  [Ss, Se]; coefficients accumulate across scans into one
  coefficient image that dequantizes/IDCTs exactly once at the end.
- **Successive approximation for DC**: the first DC scan sends
  ``dc >> Al`` (arithmetic shift, per T.81 G.1.2.1) diff-coded like
  baseline; each refinement scan appends the next lower bit
  (``coef |= bit << Al`` — exact for negatives in two's complement).
- **EOB runs (EOBn)**: AC scans code runs of end-of-band blocks
  as ``(r << 4)`` symbols with ``r`` extension bits — the decoder's
  ``eobrun = (1 << r) - 1 + bits(r)`` covers the current block plus
  ``eobrun`` following blocks, exactly libjpeg's accounting. ZRL and
  (run, size) value coding inside a band match baseline.

The canonical 4-scan script the encoder emits (DC/2 -> DC LSB ->
AC band 1-5 -> AC band 6-63) exercises every path: the 1-5 band of the
coefficient fixtures is all-zero, so scan 3 is a single maximal EOBRUN
over the whole image, while the (4,4) coefficient sits at zigzag index
39 — 33 zeros past Ss=6, forcing two ZRLs before its (run, size) code.

- **Successive approximation for AC** (r14b): first scans transport
  ``|coef| / 2^Al`` (toward-zero point transform); refinement scans
  mirror libjpeg jd/jcphuff exactly — size-1 run codes newly-signify
  coefficients with a sign bit, every nonzero-history coefficient
  passed reads one magnitude correction bit (including inside ZRLs and
  EOB runs, whose buffered bits ride behind the next emitted symbol),
  and the refinement EOBRUN counter includes the current block.

Progressive color landed r14c (``encode_jpeg_progressive_color`` /
the generalized scan walk); restart intervals landed r16b — DRI is
parsed, RST0-7 live inside each scan's entropy stream (the scan-end
scanner skips them), the marker count restarts at RST0 per scan
(T.81 E.1.4), DC predictors reset at every marker, and an EOB run
reaching a restart boundary fails loudly (the spec forbids it; the
encoder flushes before each marker). The 4-scan grayscale encoder
takes ``restart_interval``; the SA and color encoders never emit
restarts (their decodes still accept them via the shared scan
decoders). The baseline ``decode_jpeg`` dispatches SOF2 files here,
so ``decode_media`` callers get progressive support transparently.

Scale shape: identical to every other codec in the ladder — one
Arrow-batched ``mapInPandas`` decode boundary, per-partition linear,
no shuffle, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread
from .jpeg import (
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_codes,
    _category,
    _DC_BITS,
    _DC_CODES,
    _DC_SYMS,
    _dqt_segment,
    _extend,
    _idct_block,
    _JFIF_APP0,
    _QTABLE,
    encode_jpeg_baseline,
    synth_coeff_blocks,
)

# the 4-scan script: (Ss, Se, Ah, Al)
_SCAN_SCRIPT = ((0, 0, 0, 1), (0, 0, 1, 0), (1, 5, 0, 0), (6, 63, 0, 0))

# progressive AC alphabet = baseline's (EOB, ZRL, 160 run/size codes)
# PLUS the EOBn symbols (r<<4, r = 1..14) baseline never uses — 176
# symbols, all 8-bit canonical codes (strictly fewer than 255, legal)
_AC_P_SYMS = (
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_P_BITS = [0] * 16
_AC_P_BITS[7] = len(_AC_P_SYMS)  # code length 8
_AC_P_CODES = _build_codes(_AC_P_BITS, _AC_P_SYMS)


def _dht_segments_progressive(table_ids=(0,)) -> bytes:
    """DC (baseline alphabet) + AC (EOBn-extended) DHT segments for each
    requested table id."""
    out = bytearray()
    for tid in table_ids:
        for cls, bits, syms in (
            (0, _DC_BITS, _DC_SYMS),
            (1, _AC_P_BITS, _AC_P_SYMS),
        ):
            out += b"\xff\xc4" + (3 + 16 + len(syms)).to_bytes(2, "big")
            out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
    return bytes(out)


def _shift_toward_zero(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al rounding toward zero."""
    return v >> al if v >= 0 else -((-v) >> al)


def _encode_dc_first(bw_: _BitWriter, blocks, al: int, ri: int = 0) -> None:
    pred = 0
    rst = 0
    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
            pred = 0
        v = int(blk[0]) >> al  # arithmetic shift per spec
        diff = v - pred
        pred = v
        t = _category(diff)
        code, ln = _DC_CODES[t]
        bw_.put(code, ln)
        if t:
            bw_.put(diff if diff > 0 else diff + (1 << t) - 1, t)


def _encode_dc_refine(bw_: _BitWriter, blocks, al: int, ri: int = 0) -> None:
    rst = 0
    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
        bw_.put((int(blk[0]) >> al) & 1, 1)


def _encode_ac_first(
    bw_: _BitWriter, blocks, ss: int, se: int, al: int, ri: int = 0
):
    eobrun = 0
    rst = 0

    def flush() -> None:
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = _AC_P_CODES[r << 4]
        bw_.put(code, ln)
        if r:
            bw_.put(eobrun - (1 << r), r)
        eobrun = 0

    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            flush()  # an EOB run must not cross a restart boundary
            bw_.restart(rst)
            rst = (rst + 1) & 7
        band = {
            k: _shift_toward_zero(int(blk[ZIGZAG[k]]), al)
            for k in range(ss, se + 1)
        }
        nz = [k for k, v in band.items() if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for k in range(ss, max(nz) + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _AC_P_CODES[0xF0]
                bw_.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = _AC_P_CODES[(run << 4) | s]
            bw_.put(code, ln)
            bw_.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if max(nz) < se:
            eobrun = 1
    flush()


def encode_jpeg_progressive(
    blocks, bw: int, bh: int, qtable=None, restart_interval: int = 0
) -> bytes:
    """Encode quantized-coefficient ``blocks`` (grayscale, raster order)
    as a progressive (SOF2) JFIF using the 4-scan script above.
    ``restart_interval`` (in blocks = MCUs for 1x1) writes a DRI
    segment and per-scan RST0-7 cycles — the marker count restarts at
    RST0 in every scan per T.81 E.1.4, predictors and EOB runs reset."""
    qtable = _QTABLE if qtable is None else qtable
    assert len(blocks) == bw * bh
    out = bytearray(b"\xff\xd8")
    out += _JFIF_APP0
    out += _dqt_segment(qtable, 0)
    h, w = bh * 8, bw * 8
    out += b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"  # SOF2
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x01" + b"\x01\x11\x00"
    out += _dht_segments_progressive()
    if restart_interval:
        from .jpeg import _dri_segment

        out += _dri_segment(restart_interval)
    for ss, se, ah, al in _SCAN_SCRIPT:
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00"
        out += bytes([ss, se, (ah << 4) | al])
        bw_ = _BitWriter()
        if ss == 0:
            assert se == 0, "DC scan must be Ss=Se=0"
            if ah == 0:
                _encode_dc_first(bw_, blocks, al, restart_interval)
            else:
                _encode_dc_refine(bw_, blocks, al, restart_interval)
        else:
            assert ah == 0, "encoder emits no AC refinement scans"
            _encode_ac_first(bw_, blocks, ss, se, al, restart_interval)
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_progressive(payload: bytes) -> dict:
    """Decode a progressive (SOF2) JPEG — grayscale or YCbCr color with
    chroma 1x1 and Y sampling 2x2 / 2x1 / 1x1: accumulate quantized
    coefficients across every scan (interleaved DC scans in MCU order,
    non-interleaved AC scans in each component's own block raster),
    then dequantize + IDCT once."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    ri = 0  # restart interval (DRI); counted in MCUs / blocks per scan
    comps: list[tuple[int, int, int, int]] = []
    scans: list = []  # (comp_specs, (ss, se, ah, al), entropy bytes)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:
            break
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if 0xE0 <= m <= 0xEF or m == 0xFE:
            pass
        elif m == 0xDB:
            o = 0
            while o < len(seg):
                pq, t = seg[o] >> 4, seg[o] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quant tables")
                zz = list(seg[o + 1 : o + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qt[t] = nat
                o += 65
        elif m == 0xC4:
            o = 0
            while o < len(seg):
                cls, t = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                syms = list(seg[o + 17 : o + 17 + n])
                tbl: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for li, cnt in enumerate(bits):
                    for _ in range(cnt):
                        tbl[(li + 1, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, t)] = tbl
                o += 17 + n
        elif m == 0xC2:
            if seg[0] != 8:
                raise ValueError("8-bit precision only")
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
        elif m in (0xC0, 0xC1, 0xC3):
            raise NotImplementedError("not a progressive (SOF2) stream")
        elif m == 0xDD:  # DRI
            ri = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:
            ns = seg[0]
            cspecs = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cid
                )
                cspecs.append(
                    (ci, seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15)
                )
            o = 1 + 2 * ns
            ss, se = seg[o], seg[o + 1]
            ah, al = seg[o + 2] >> 4, seg[o + 2] & 15
            pos += seglen
            # entropy data runs to the next true marker (0xFF followed
            # by anything but the 0x00 stuffing byte); RST0-7 belong to
            # THIS scan's entropy stream, not the marker walk
            end = pos
            while end < len(payload) - 1:
                nxt = payload[end + 1]
                if (
                    payload[end] == 0xFF
                    and nxt != 0x00
                    and not 0xD0 <= nxt <= 0xD7
                ):
                    break
                end += 1
            scans.append((cspecs, (ss, se, ah, al), payload[pos:end]))
            pos = end
            continue
        pos += seglen
    if not (w and h and comps and scans):
        raise ValueError("incomplete progressive JPEG")
    if len(comps) == 1:
        if comps[0][1:3] != (1, 1):
            raise NotImplementedError("grayscale must be 1x1 sampling")
    elif (
        len(comps) != 3
        or comps[1][1:3] != (1, 1)
        or comps[2][1:3] != (1, 1)
        or comps[0][1:3] not in ((2, 2), (2, 1), (1, 1))
    ):
        raise NotImplementedError(
            "progressive: grayscale (1x1) or YCbCr with chroma 1x1 and "
            "Y 2x2|2x1|1x1 only"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    grids = [(mx * c[1], my * c[2]) for c in comps]  # (blocks across, down)
    coef = [
        [[0] * 64 for _ in range(gw * gh)] for gw, gh in grids
    ]

    for cspecs, (ss, se, ah, al), data in scans:
        rd = _BitReader(data)

        def sym(tab):
            ln, code = 0, 0
            while True:
                code = (code << 1) | rd.bit()
                ln += 1
                s = tab.get((ln, code))
                if s is not None:
                    return s
                if ln > 16:
                    raise ValueError("invalid Huffman stream")

        if ss == 0:  # DC scan — interleaved MCU order (or single comp)
            if se != 0:
                raise ValueError("DC scan must be Ss=Se=0")
            preds = [0] * len(cspecs)
            rst = 0  # the RSTn count restarts at 0 in every scan
            for m in range(mx * my):
                if ri and m and m % ri == 0:
                    rd.restart(rst)
                    rst = (rst + 1) & 7
                    preds = [0] * len(cspecs)
                mr, mc = m // mx, m % mx
                for si, (ci, td, _ta) in enumerate(cspecs):
                    hi, vi = comps[ci][1], comps[ci][2]
                    # single-comp scans traverse the comp grid 1:1 with
                    # the MCU loop only when hi == vi == 1 (true for all
                    # supported single-comp cases: grayscale, chroma)
                    if len(cspecs) == 1 and (hi, vi) != (1, 1):
                        raise NotImplementedError(
                            "non-interleaved DC scan for sampled comp"
                        )
                    for kr in range(vi):
                        for kc in range(hi):
                            bidx = (mr * vi + kr) * grids[ci][0] + (
                                mc * hi + kc
                            )
                            blk = coef[ci][bidx]
                            if ah == 0:
                                t = sym(huff[(0, td)])
                                preds[si] += _extend(rd.bits(t), t)
                                blk[0] = preds[si] << al
                            else:
                                blk[0] |= rd.bit() << al
        else:  # AC scan — non-interleaved, one component
            if len(cspecs) != 1:
                raise ValueError("AC scans must be non-interleaved")
            ci, _td, ta = cspecs[0]
            ac_tab = huff[(1, ta)]
            blocks = coef[ci]
            if ah != 0:
                _decode_ac_refine_scan(
                    rd, sym, ac_tab, blocks, ss, se, al, ri
                )
            else:
                _decode_ac_first_scan(
                    rd, sym, ac_tab, blocks, ss, se, al, ri
                )

    def comp_plane(ci):
        gw, gh = grids[ci]
        q = qt[comps[ci][3]]
        img = np.zeros((gh * 8, gw * 8), dtype=np.uint8)
        for b in range(gw * gh):
            coeffs = np.zeros((8, 8), dtype=np.float64)
            for k in range(64):
                coeffs[k // 8][k % 8] = coef[ci][b][k] * q[k]
            px = np.clip(np.round(_idct_block(coeffs) + 128), 0, 255)
            r, c = (b // gw) * 8, (b % gw) * 8
            img[r : r + 8, c : c + 8] = px.astype(np.uint8)
        return img

    if len(comps) == 1:
        img = comp_plane(0)
        return {
            "width": w,
            "height": h,
            "channels": 1,
            "progressive": True,
            "n_scans": len(scans),
            "pixels": img[:h, :w],
        }
    hy, vy = comps[0][1], comps[0][2]
    yp, cbp, crp = comp_plane(0), comp_plane(1), comp_plane(2)
    yv = yp.astype(np.int64)
    cb = np.repeat(np.repeat(cbp, vy, 0), hy, 1).astype(np.int64) - 128
    cr = np.repeat(np.repeat(crp, vy, 0), hy, 1).astype(np.int64) - 128
    from .jpeg import _FIX_B_CB, _FIX_G_CB, _FIX_G_CR, _FIX_R_CR

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
        "progressive": True,
        "n_scans": len(scans),
        "pixels": rgb[:h, :w],
        "planes": {
            "y": yp[:h, :w],
            "cb": cbp[:ch, :cw],
            "cr": crp[:ch, :cw],
        },
    }


def _decode_ac_first_scan(rd, sym, ac_tab, blocks, ss, se, al, ri=0):
    """AC first scan (Ah=0) over a component's blocks in raster order."""
    eobrun = 0
    rst = 0
    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            if eobrun > 0:
                raise ValueError("EOB run crosses a restart boundary")
            rd.restart(rst)
            rst = (rst + 1) & 7
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            s = sym(ac_tab)
            r, sz = s >> 4, s & 15
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1 + (rd.bits(r) if r else 0)
                break
            k += r
            blk[ZIGZAG[k]] = _extend(rd.bits(sz), sz) << al
            k += 1


def _decode_ac_refine_scan(rd, sym, ac_tab, blocks, ss, se, al, ri=0):
    """AC refinement scan — libjpeg jdphuff.c decode_mcu_AC_refine,
    exactly: size-1 run codes newly-signify a zero-history coefficient
    (sign bit 1 = +2^Al); every nonzero-history coefficient passed —
    including inside ZRLs and EOB runs — reads one correction bit; the
    EOBRUN counter here INCLUDES the current block."""
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    rst = 0
    for i, blk in enumerate(blocks):
        if ri and i and i % ri == 0:
            if eobrun > 0:
                raise ValueError("EOB run crosses a restart boundary")
            rd.restart(rst)
            rst = (rst + 1) & 7
        k = ss
        if eobrun == 0:
            while k <= se:
                s = sym(ac_tab)
                r, sz = s >> 4, s & 15
                val = 0
                if sz == 0:
                    if r != 15:
                        eobrun = (1 << r) + (rd.bits(r) if r else 0)
                        break
                    # r == 15: ZRL — skip 16 zero-history slots
                else:
                    if sz != 1:
                        raise ValueError("refinement size must be 1")
                    val = p1 if rd.bit() else m1
                while k <= se:
                    c = blk[ZIGZAG[k]]
                    if c != 0:
                        if rd.bit() and (c & p1) == 0:
                            blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0 and k <= se:
                    blk[ZIGZAG[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                c = blk[ZIGZAG[k]]
                if c != 0:
                    if rd.bit() and (c & p1) == 0:
                        blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1


# --------------------------------------------------------------------------
# Progressive decode query: the baseline grayscale fixture encoded
# through the 4-scan progressive script must decode to the SAME pixels
# (coefficients are what both codecs transport), so the oracle is the
# baseline closed form plus the scan count — the driver row pins the
# whole multi-scan reassembly end to end.
# --------------------------------------------------------------------------

_PROG_ORACLE = """
SELECT doc_id,
       cast((2 + doc_id % 3) * 8 AS INTEGER) AS width,
       cast((1 + doc_id % 2) * 8 AS INTEGER) AS height,
       cast(4 AS INTEGER) AS n_scans,
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
    "mm_image_jpeg_progressive_decode",
    oracle=_PROG_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_progressive_decode(spark, sf_dir):
    """Decode per-doc progressive (SOF2, 4-scan) JPEGs in one
    Arrow-batched pass; exact pixel stats + probe pixel + scan count."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_scans", T.IntegerType()),
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
                blob = encode_jpeg_progressive(blocks, bw, bh)
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(dec["n_scans"]),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int(px[0, 0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_scans",
                    "sum_px", "min_px", "max_px", "px00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Baseline-vs-progressive re-encode dedup: docs pair as (2p, 2p+1)
# carrying the SAME coefficient image — the even file baseline, the odd
# file progressive. Byte-level completely different (SOF0 vs SOF2, one
# entropy stream vs four scans), pixel-level identical — the exact
# situation a crawl presents when a site re-exports its images
# progressively. Blob-hash dedup misses every pair; the
# decode-normalized digest catches them all. The oracle groups docs on
# the closed-form dequantized coefficient string (the r12 oracle trick —
# pixel equality <=> coefficient equality on this clamp-free fixture).
# --------------------------------------------------------------------------

_PROG_RENC_ORACLE = """
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


def _prog_renc_blocks(doc_id: int):
    """Fixture: (2p, 2p+1) share quantized coefficients; parity only
    picks the CODEC (even -> baseline, odd -> progressive)."""
    base = doc_id // 2
    bw, bh = 2 + base % 3, 1 + base % 2
    blocks = []
    for i in range(bw * bh):
        s0 = (base * 100000 + i) % 2147483647
        m = (s0 * s0 + 7919 * s0) // 256
        blk = [0] * 64
        blk[0] = m % 25 - 12
        blk[4 * 8 + 4] = (m // 25) % 13 - 6
        blocks.append(blk)
    return blocks, bw, bh


@register(
    "mm_image_jpeg_progressive_renc_dedup",
    oracle=_PROG_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_jpeg_progressive_renc_dedup(spark, sf_dir):
    """Pairs of byte-different baseline/progressive re-encodes matched
    by decode-normalized pixel digest; the cheapest dedup join (hash
    shuffle of constant-width rows)."""
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
                blocks, bw, bh = _prog_renc_blocks(doc_id)
                if doc_id % 2:
                    blob = encode_jpeg_progressive(blocks, bw, bh)
                else:
                    blob = encode_jpeg_baseline(blocks, bw, bh)
                dec = decode_media(bytes(blob), "image/jpeg")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        hashlib.md5(
                            dec["pixels"].tobytes()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h", "digest"])

    from pyspark.sql import functions as F

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    sig = d.mapInPandas(run, schema=schema)
    a = sig.select(
        F.col("doc_id").alias("doc_a"), "w", "h",
        F.col("digest").alias("dg"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), "w", "h",
        F.col("digest").alias("dg"),
    )
    return (
        a.join(b, ["w", "h", "dg"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            ((F.col("w") * F.col("h")) / 64).cast("int").alias("n_blocks"),
        )
    )


# --------------------------------------------------------------------------
# Full successive approximation (r14b): AC-refinement ENCODER + the
# 6-scan script libjpeg-shaped progressive files actually use —
# DC/2 -> DC LSB -> both AC bands at Al=1 -> both AC bands refined to
# Al=0. The refinement encoder mirrors jcphuff.c encode_mcu_AC_refine:
# newly-significant coefficients (shifted magnitude == 1) emit
# (run, 1) codes with a sign bit; already-significant ones buffer one
# magnitude correction bit each, flushed after the next symbol (ZRL,
# newly-significant, or EOBn); trailing runs fold into a carried
# EOBRUN whose buffered correction bits ride behind the EOBn code.
# --------------------------------------------------------------------------

_SA_SCAN_SCRIPT = (
    (0, 0, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
)


def _encode_ac_refine(bw_: _BitWriter, blocks, ss: int, se: int, al: int):
    eobrun = 0
    pending: list[int] = []  # correction bits carried with the EOBRUN

    def emit_eobrun() -> None:
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = _AC_P_CODES[r << 4]
            bw_.put(code, ln)
            if r:
                bw_.put(eobrun - (1 << r), r)
            eobrun = 0
        for bit in pending:
            bw_.put(bit, 1)
        pending = []

    for blk in blocks:
        ks = list(range(ss, se + 1))
        absv = [abs(int(blk[ZIGZAG[k]])) >> al for k in ks]
        eob = ss - 1  # position of the last newly-significant coeff
        for i, k in enumerate(ks):
            if absv[i] == 1:
                eob = k
        r = 0
        br: list[int] = []  # correction bits buffered within the block
        for i, k in enumerate(ks):
            temp = absv[i]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                emit_eobrun()
                code, ln = _AC_P_CODES[0xF0]
                bw_.put(code, ln)
                r -= 16
                for bit in br:
                    bw_.put(bit, 1)
                br = []
            if temp > 1:  # already significant: buffer the next bit
                br.append(temp & 1)
                continue
            emit_eobrun()  # newly significant
            code, ln = _AC_P_CODES[(r << 4) | 1]
            bw_.put(code, ln)
            bw_.put(0 if int(blk[ZIGZAG[k]]) < 0 else 1, 1)
            for bit in br:
                bw_.put(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 900:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive_sa(blocks, bw: int, bh: int, qtable=None) -> bytes:
    """Encode with the full 6-scan successive-approximation script
    (spectral selection AND AC refinement — the libjpeg-shaped file)."""
    qtable = _QTABLE if qtable is None else qtable
    assert len(blocks) == bw * bh
    out = bytearray(b"\xff\xd8")
    out += _JFIF_APP0
    out += _dqt_segment(qtable, 0)
    h, w = bh * 8, bw * 8
    out += b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x01" + b"\x01\x11\x00"
    out += _dht_segments_progressive()
    for ss, se, ah, al in _SA_SCAN_SCRIPT:
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00"
        out += bytes([ss, se, (ah << 4) | al])
        bw_ = _BitWriter()
        if ss == 0:
            if ah == 0:
                _encode_dc_first(bw_, blocks, al)
            else:
                _encode_dc_refine(bw_, blocks, al)
        elif ah == 0:
            _encode_ac_first(bw_, blocks, ss, se, al)
        else:
            _encode_ac_refine(bw_, blocks, ss, se, al)
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# SA decode query: a wider-amplitude fixture (AC44 in -3..3) so the
# refinement scans exercise BOTH paths across docs — |AC| >= 2 arrives
# in the Al=1 first scan and receives a CORRECTION bit in the refine
# scan, |AC| == 1 shifts to zero at Al=1 and is NEWLY SIGNIFIED by the
# refine scan itself. Same closed form as the baseline oracle (AC sums
# vanish per block; amp = 2*|b| at qAC = 16).
# --------------------------------------------------------------------------


def synth_sa_blocks(doc_id: int):
    """DC = (doc_id+3i)%5-2, AC(4,4) = (doc_id+i)%7-3 per block i."""
    bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
    blocks = []
    for i in range(bw * bh):
        blk = [0] * 64
        blk[0] = (doc_id + 3 * i) % 5 - 2
        blk[4 * 8 + 4] = (doc_id + i) % 7 - 3
        blocks.append(blk)
    return blocks, bw, bh


_SA_ORACLE = """
SELECT doc_id,
       cast((2 + doc_id % 3) * 8 AS INTEGER) AS width,
       cast((1 + doc_id % 2) * 8 AS INTEGER) AS height,
       cast(6 AS INTEGER) AS n_scans,
       cast(sum(64 * (128 + 4 * ((doc_id + 3 * i) % 5 - 2))) AS BIGINT)
         AS sum_px,
       cast(min(128 + 4 * ((doc_id + 3 * i) % 5 - 2)
                    - 2 * abs((doc_id + i) % 7 - 3)) AS BIGINT) AS min_px,
       cast(max(128 + 4 * ((doc_id + 3 * i) % 5 - 2)
                    + 2 * abs((doc_id + i) % 7 - 3)) AS BIGINT) AS max_px,
       cast(128 + 4 * (doc_id % 5 - 2) + 2 * (doc_id % 7 - 3) AS BIGINT)
         AS px00
FROM (
  SELECT doc_id,
         unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS i
  FROM documents
) g
GROUP BY doc_id
"""


@register(
    "mm_image_jpeg_progressive_sa_decode",
    oracle=_SA_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_progressive_sa_decode(spark, sf_dir):
    """Decode per-doc 6-scan successive-approximation progressive JPEGs
    (AC refinement scans included) in one Arrow-batched pass."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_scans", T.IntegerType()),
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
                blocks, bw, bh = synth_sa_blocks(doc_id)
                blob = encode_jpeg_progressive_sa(blocks, bw, bh)
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(dec["n_scans"]),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int(px[0, 0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_scans",
                    "sum_px", "min_px", "max_px", "px00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Progressive COLOR (r14c): the full crawl shape — SOF2 YCbCr with
# interleaved DC scans (MCU order, per-component predictors) and
# non-interleaved AC scans, one per component, traversing that
# component's own block raster (NOT MCU order — for sampled Y these
# differ, which is exactly the layout subtlety T.81 A.2 prescribes).
# The 8-scan script: interleaved DC/2 -> interleaved DC LSB -> AC
# first at Al=1 per component (Y, Cb, Cr) -> AC refinement to Al=0 per
# component. Works for every chroma layout the baseline decoder
# accepts (4:2:0 / 4:2:2 / 4:4:4).
# --------------------------------------------------------------------------


def _y_raster_order(y_blocks, mw, mh, hy, vy):
    """Reorder MCU-major luma blocks into the component block raster."""
    gw = mw * hy
    out = [None] * (gw * mh * vy)
    nyb = hy * vy
    for m in range(mw * mh):
        mr, mc = m // mw, m % mw
        for k in range(nyb):
            kr, kc = k // hy, k % hy
            out[(mr * vy + kr) * gw + (mc * hy + kc)] = y_blocks[
                nyb * m + k
            ]
    return out


def encode_jpeg_progressive_color(
    y_blocks, cb_blocks, cr_blocks, mw: int, mh: int,
    samp: str = "420", qtab_y=None, qtab_c=None,
) -> bytes:
    """Encode a YCbCr progressive (SOF2) JFIF from quantized-coefficient
    blocks (same inputs as ``jpeg.encode_jpeg_color``) with the 8-scan
    interleaved-DC / per-component-AC successive-approximation script."""
    from .jpeg import _QTABLE_C, _SAMP_GEOM

    qtab_y = _QTABLE if qtab_y is None else qtab_y
    qtab_c = _QTABLE_C if qtab_c is None else qtab_c
    hy, vy = _SAMP_GEOM[samp]
    n_mcu = mw * mh
    nyb = hy * vy
    assert len(y_blocks) == nyb * n_mcu
    assert len(cb_blocks) == len(cr_blocks) == n_mcu
    out = bytearray(b"\xff\xd8")
    out += _JFIF_APP0
    out += _dqt_segment(qtab_y, 0)
    out += _dqt_segment(qtab_c, 1)
    h, w = mh * 8 * vy, mw * 8 * hy
    out += b"\xff\xc2" + (17).to_bytes(2, "big") + b"\x08"  # SOF2, 3 comps
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x03" + b"\x01" + bytes([(hy << 4) | vy]) + b"\x00"
    out += b"\x02\x11\x01" + b"\x03\x11\x01"
    out += _dht_segments_progressive((0, 1))

    def sos(comps_bytes, ss, se, ah, al):
        ns = len(comps_bytes) // 2
        seg = bytes([ns]) + comps_bytes + bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (2 + len(seg)).to_bytes(2, "big") + seg

    # scans 1-2: interleaved DC (per-comp predictors, MCU order)
    for ah, al in ((0, 1), (1, 0)):
        out += sos(b"\x01\x00\x02\x11\x03\x11", 0, 0, ah, al)
        bw_ = _BitWriter()
        preds = [0, 0, 0]
        for m in range(n_mcu):
            for ci, blks, per in (
                (0, y_blocks, nyb),
                (1, cb_blocks, 1),
                (2, cr_blocks, 1),
            ):
                for k in range(per):
                    blk = blks[per * m + k]
                    if ah == 0:
                        v = int(blk[0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        code, ln = _DC_CODES[t]
                        bw_.put(code, ln)
                        if t:
                            bw_.put(
                                diff if diff > 0 else diff + (1 << t) - 1, t
                            )
                    else:
                        bw_.put((int(blk[0]) >> al) & 1, 1)
        bw_.flush()
        out += bw_.out
    # scans 3-8: per-component AC first (Al=1) then AC refine (Al=0),
    # each over the component's own block raster
    y_raster = _y_raster_order(y_blocks, mw, mh, hy, vy)
    comp_scans = (
        (b"\x01\x00", y_raster),
        (b"\x02\x11", cb_blocks),
        (b"\x03\x11", cr_blocks),
    )
    for refine in (False, True):
        for cb_hdr, blks in comp_scans:
            out += sos(cb_hdr, 1, 63, 1 if refine else 0, 0 if refine else 1)
            bw_ = _BitWriter()
            if refine:
                _encode_ac_refine(bw_, blks, 1, 63, 0)
            else:
                _encode_ac_first(bw_, blks, 1, 63, 1)
            bw_.flush()
            out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive color decode query: the r14 mixed-sampling fixture
# (420/422/444 by doc) pushed through the 8-scan progressive color
# script must reproduce the SAME closed-form channel sums as the
# baseline chroma query — one driver row pins interleaved-DC MCU
# traversal, per-component AC rasters (MCU-order != raster-order for
# sampled Y), successive approximation, and all three upsample paths.
# --------------------------------------------------------------------------

from .jpeg import _CHROMA_ORACLE, synth_chroma_blocks  # noqa: E402

_PROG_COLOR_ORACLE = f"""
SELECT q.*, cast(8 AS INTEGER) AS n_scans FROM ({_CHROMA_ORACLE}) q
"""


@register(
    "mm_image_jpeg_progressive_color_decode",
    oracle=_PROG_COLOR_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_progressive_color_decode(spark, sf_dir):
    """Decode per-doc progressive COLOR JPEGs (8-scan interleaved-DC /
    per-component-AC script, mixed 4:2:0/4:2:2/4:4:4) in one
    Arrow-batched pass."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("samp", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_scans", T.IntegerType()),
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
                blob = encode_jpeg_progressive_color(
                    yb, cbb, crb, mw, mh, samp=samp
                )
                dec = decode_media(bytes(blob), "image/jpeg")
                assert dec["sampling"] == samp and dec["progressive"]
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        int(samp),
                        dec["width"],
                        dec["height"],
                        int(dec["n_scans"]),
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
                    "doc_id", "samp", "width", "height", "n_scans",
                    "sum_r", "sum_g", "sum_b", "r00", "g00", "b00",
                ],
            )

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


@register(
    "mm_image_jpeg_progressive_restart_decode",
    oracle=_PROG_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_jpeg_progressive_restart_decode(spark, sf_dir):
    """Same 4-scan progressive fixture as
    ``mm_image_jpeg_progressive_decode`` but encoded with a per-doc DRI
    of 1 + doc_id % 3 blocks (r16b gate closure): per-scan RST0-7
    cycles, DC-predictor resets, and the EOBRUN flush-before-restart
    discipline all sit on the checked path; the oracle is unchanged
    because restarts live entirely in the entropy layer."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_scans", T.IntegerType()),
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
                blob = encode_jpeg_progressive(
                    blocks, bw, bh, restart_interval=1 + doc_id % 3
                )
                dec = decode_media(bytes(blob), "image/jpeg")
                px = dec["pixels"].astype("int64")
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(dec["n_scans"]),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int(px[0, 0]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)
