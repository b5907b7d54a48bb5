"""G.711 (mu-law / A-law) + IMA ADPCM WAV queries.

The WAV decode path (multimodal.py) shipped PCM-16 only; real crawl
audio also carries the telephony format tags — G.711 companding (tags
7/6) and DVI/IMA ADPCM voice blocks (tag 0x11). ``decode_wav`` now
expands all three, and these queries put the new paths on the
exact-integer oracle surface:

- G.711 is a STATELESS per-byte expansion, so its oracle is the
  standard segment/mantissa formula in closed-form SQL (bit ops).
- IMA ADPCM is a STATEFUL recurrence (predictor + step index walk a
  quantizer table per nibble), so its oracle replays the exact state
  machine in DuckDB with a recursive CTE over the step table — the
  same sequential dependency the Spark side isolates inside one
  Arrow-batched ``mapInPandas`` stage (per-doc state never crosses a
  row boundary, so the operator stays embarrassingly parallel at any
  corpus size; only the ~90-entry step table is replicated).

Reference parity: the reference repo has no audio layer (its
``analysis/`` package is a docstring-only scaffold,
analysis/__init__.py:1); this follows the G.711 and IMA/DVI ADPCM
specifications directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread
from .multimodal import (
    IMA_STEPS,
    decode_media,
    ima_adpcm_step,
)

# --------------------------------------------------------------------------
# Encoders (container builders + the IMA compressor, used by tests)
# --------------------------------------------------------------------------


def _wav_container(fmt_body: bytes, data: bytes) -> bytes:
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_wav_g711(codes, alaw: bool, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE container around raw G.711 codewords (format tag 6 for
    A-law, 7 for mu-law; 8 bits/sample, mono)."""
    import struct

    import numpy as np

    data = np.asarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 6 if alaw else 7, 1, sample_rate, sample_rate, 1, 8
    )
    return _wav_container(fmt, data)


def encode_wav_ima_adpcm(blocks, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE container around mono IMA ADPCM blocks (format tag 0x11).

    ``blocks`` is a list of ``(seed_predictor, seed_index, nibbles)``;
    every block must carry the same nibble count (the fmt chunk's
    samplesPerBlock covers all blocks). Nibbles pack low-first; an odd
    count pads the final high nibble with zero (ignored on decode).
    """
    import struct

    n_nib = len(blocks[0][2])
    if any(len(nibs) != n_nib for _, _, nibs in blocks):
        raise ValueError("IMA ADPCM blocks must have a uniform nibble count")
    block_align = 4 + (n_nib + 1) // 2
    spb = n_nib + 1
    data = bytearray()
    for pred, idx, nibs in blocks:
        if not 0 <= idx <= 88:
            raise ValueError("IMA ADPCM step index out of range")
        data += struct.pack("<hBB", pred, idx, 0)
        for k in range(0, n_nib, 2):
            lo = nibs[k] & 0xF
            hi = (nibs[k + 1] & 0xF) if k + 1 < n_nib else 0
            data.append(lo | (hi << 4))
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    return _wav_container(fmt, bytes(data))


def ima_adpcm_encode(samples, pred: int, idx: int):
    """Compress int16 samples to IMA nibbles from a (pred, idx) seed —
    the standard successive-approximation quantizer, state-advanced with
    the same :func:`ima_adpcm_step` the decoder runs."""
    nibbles = []
    for s in samples:
        step = IMA_STEPS[idx]
        diff = int(s) - pred
        nib = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        pred, idx = ima_adpcm_step(pred, idx, nib)
        nibbles.append(nib)
    return nibbles


# --------------------------------------------------------------------------
# G.711 decode query: even docs mu-law, odd docs A-law, closed-form
# codeword streams; the oracle is the exact expansion formula in SQL.
# --------------------------------------------------------------------------

_CODE = "((doc_id * 13 + j * 11) % 256)"

_ULAW_S = (
    f"(CASE WHEN (255 - {_CODE}) >= 128 "
    f"THEN 132 - (((255 - {_CODE}) % 16) * 8 + 132) * (1 << (((255 - {_CODE}) // 16) % 8)) "
    f"ELSE (((255 - {_CODE}) % 16) * 8 + 132) * (1 << (((255 - {_CODE}) // 16) % 8)) - 132 "
    f"END)"
)

_ALAW_S = (
    f"(CASE WHEN xor({_CODE}, 85) >= 128 THEN 1 ELSE -1 END * "
    f"(CASE WHEN (xor({_CODE}, 85) // 16) % 8 = 0 "
    f"THEN (xor({_CODE}, 85) % 16) * 16 + 8 "
    f"WHEN (xor({_CODE}, 85) // 16) % 8 = 1 "
    f"THEN (xor({_CODE}, 85) % 16) * 16 + 264 "
    f"ELSE ((xor({_CODE}, 85) % 16) * 16 + 264) * (1 << ((xor({_CODE}, 85) // 16) % 8 - 1)) "
    f"END))"
)

_G711_ORACLE = f"""
SELECT doc_id, codec,
       cast(count(*) AS BIGINT) AS n_samples,
       cast(min(s) AS BIGINT) AS min_s,
       cast(max(s) AS BIGINT) AS max_s,
       cast(sum(s) AS BIGINT) AS sum_s,
       cast(sum((j + 1) * s) AS BIGINT) AS wsum_s
FROM (
  SELECT doc_id, codec, j,
         CASE WHEN codec = 'ulaw' THEN {_ULAW_S} ELSE {_ALAW_S} END AS s
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
           unnest(range(40 + doc_id % 40)) AS j
    FROM documents
  ) g
) x
GROUP BY doc_id, codec
"""


@register(
    "mm_audio_g711_decode",
    oracle=_G711_ORACLE,
    tags=("multimodal", "audio"),
)
def mm_audio_g711_decode(spark, sf_dir):
    """Decode each doc's closed-form G.711 codeword stream through the
    real WAV container path (format tag 7 on even docs, 6 on odd); the
    position-weighted wsum_s catches any sample-order slip."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("codec", T.StringType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
            T.StructField("sum_s", T.LongType()),
            T.StructField("wsum_s", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 40 + doc_id % 40
                j = np.arange(n, dtype=np.int64)
                codes = (doc_id * 13 + j * 11) % 256
                alaw = bool(doc_id % 2)
                blob = encode_wav_g711(codes, alaw=alaw)
                dec = decode_media(bytes(blob), "audio/wav")
                s = dec["frames"].astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        "alaw" if alaw else "ulaw",
                        dec["n_samples"],
                        int(s.min()),
                        int(s.max()),
                        int(s.sum()),
                        int(((j + 1) * s).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# IMA ADPCM decode query. The oracle replays the decoder's state machine
# in DuckDB: a recursive CTE advances every doc's (predictor, index)
# one nibble per iteration, joining the inlined 89-entry step table on
# the PRE-update index — exactly :func:`ima_adpcm_step`.
# --------------------------------------------------------------------------

_STEP_VALUES = ", ".join(f"({i}, {s})" for i, s in enumerate(IMA_STEPS))

_ADPCM_ORACLE = f"""
WITH RECURSIVE
params AS (
  SELECT doc_id,
         32 + doc_id % 33 AS n,
         ((doc_id * 97) % 4001) - 2000 AS pred0,
         doc_id % 89 AS idx0
  FROM documents
),
steps(i, st) AS (SELECT * FROM (VALUES {_STEP_VALUES}) v(i, st)),
dec(doc_id, j, pred, idx) AS (
  SELECT doc_id, 0, pred0, idx0 FROM params
  UNION ALL
  SELECT q.doc_id, q.j + 1,
         greatest(-32768, least(32767,
           q.pred + CASE WHEN q.nib >= 8 THEN -q.diff ELSE q.diff END)),
         greatest(0, least(88, q.idx +
           CASE q.nib % 8 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                          WHEN 7 THEN 8 ELSE -1 END))
  FROM (
    SELECT d.doc_id, d.j, d.pred, d.idx,
           (d.doc_id * 7 + d.j * 5) % 16 AS nib,
           (s.st >> 3)
           + CASE WHEN ((d.doc_id * 7 + d.j * 5) % 16) % 2 = 1
                  THEN s.st >> 2 ELSE 0 END
           + CASE WHEN (((d.doc_id * 7 + d.j * 5) % 16) // 2) % 2 = 1
                  THEN s.st >> 1 ELSE 0 END
           + CASE WHEN (((d.doc_id * 7 + d.j * 5) % 16) // 4) % 2 = 1
                  THEN s.st ELSE 0 END AS diff
    FROM dec d
    JOIN steps s ON s.i = d.idx
    JOIN params p ON p.doc_id = d.doc_id
    WHERE d.j < p.n
  ) q
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_samples,
       cast(min(pred) AS BIGINT) AS min_s,
       cast(max(pred) AS BIGINT) AS max_s,
       cast(sum(pred) AS BIGINT) AS sum_s,
       cast(arg_max(pred, j) AS BIGINT) AS last_s
FROM dec
GROUP BY doc_id
"""


@register(
    "mm_audio_adpcm_decode",
    oracle=_ADPCM_ORACLE,
    tags=("multimodal", "audio"),
)
def mm_audio_adpcm_decode(spark, sf_dir):
    """Decode each doc's closed-form IMA ADPCM nibble stream (seeded
    predictor/step-index header, single block) through the real WAV
    container path; last_s pins the full state walk, not just the
    sample multiset."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
            T.StructField("sum_s", T.LongType()),
            T.StructField("last_s", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 32 + doc_id % 33
                nibs = [(doc_id * 7 + j * 5) % 16 for j in range(n)]
                pred0 = ((doc_id * 97) % 4001) - 2000
                idx0 = doc_id % 89
                blob = encode_wav_ima_adpcm([(pred0, idx0, nibs)])
                dec = decode_media(bytes(blob), "audio/wav")
                s = dec["frames"].astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        dec["n_samples"],
                        int(s.min()),
                        int(s.max()),
                        int(s.sum()),
                        int(s[-1]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Non-16-bit PCM depths (format tag 1, bits 8 / 24): the remaining PCM
# layouts a crawl carries. Both are stateless byte layouts — unsigned
# offset bytes and 3-byte little-endian two's complement — so the
# oracle is closed-form integer SQL like G.711.
# --------------------------------------------------------------------------


def encode_wav_pcm8(codes, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE around UNSIGNED 8-bit PCM bytes (mono)."""
    import struct

    import numpy as np

    data = np.asarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    return _wav_container(fmt, data)


def encode_wav_pcm24(samples, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE around signed 24-bit little-endian PCM samples (mono)."""
    import struct

    import numpy as np

    v = np.asarray(samples, dtype=np.int64) & 0xFFFFFF
    data = bytearray()
    for x in v:
        data += bytes([int(x) & 0xFF, (int(x) >> 8) & 0xFF, (int(x) >> 16) & 0xFF])
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 3, 3, 24)
    return _wav_container(fmt, bytes(data))


# even docs: 8-bit unsigned bytes c = (doc_id*19 + j*23) % 256 expanded
# to ((c - 128) << 8); odd docs: 24-bit samples built from the SAME
# closed form spread across three byte lanes, sign-extended.
_B0 = "((doc_id * 19 + j * 23) % 256)"
_B1 = "((doc_id * 29 + j * 31) % 256)"
_B2 = "((doc_id * 37 + j * 41) % 256)"

_PCM_DEPTHS_ORACLE = f"""
SELECT doc_id, bits,
       cast(count(*) AS BIGINT) AS n_samples,
       cast(min(s) AS BIGINT) AS min_s,
       cast(max(s) AS BIGINT) AS max_s,
       cast(sum(s) AS BIGINT) AS sum_s,
       cast(sum((j + 1) * s) AS BIGINT) AS wsum_s
FROM (
  SELECT doc_id, bits, j,
         CASE WHEN bits = 8 THEN ({_B0} - 128) * 256
              ELSE CASE WHEN {_B0} + {_B1} * 256 + {_B2} * 65536 >= 8388608
                        THEN {_B0} + {_B1} * 256 + {_B2} * 65536 - 16777216
                        ELSE {_B0} + {_B1} * 256 + {_B2} * 65536 END
         END AS s
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 24 END AS bits,
           unnest(range(30 + doc_id % 50)) AS j
    FROM documents
  ) g
) x
GROUP BY doc_id, bits
"""


@register(
    "mm_audio_pcm_depths_decode",
    oracle=_PCM_DEPTHS_ORACLE,
    tags=("multimodal", "audio"),
)
def mm_audio_pcm_depths_decode(spark, sf_dir):
    """Decode closed-form 8-bit (even docs) and 24-bit (odd docs) PCM
    streams through the real WAV container path; wsum_s pins sample
    order, the 24-bit fixture crosses the sign boundary by
    construction."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("bits", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("min_s", T.LongType()),
            T.StructField("max_s", T.LongType()),
            T.StructField("sum_s", T.LongType()),
            T.StructField("wsum_s", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                n = 30 + doc_id % 50
                j = np.arange(n, dtype=np.int64)
                if doc_id % 2 == 0:
                    bits = 8
                    blob = encode_wav_pcm8((doc_id * 19 + j * 23) % 256)
                else:
                    bits = 24
                    v = (
                        ((doc_id * 19 + j * 23) % 256)
                        | (((doc_id * 29 + j * 31) % 256) << 8)
                        | (((doc_id * 37 + j * 41) % 256) << 16)
                    )
                    blob = encode_wav_pcm24(v)
                dec = decode_media(bytes(blob), "audio/wav")
                s = dec["frames"].astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        bits,
                        dec["n_samples"],
                        int(s.min()),
                        int(s.max()),
                        int(s.sum()),
                        int(((j + 1) * s).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)
