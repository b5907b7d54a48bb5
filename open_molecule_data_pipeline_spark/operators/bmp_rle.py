"""BMP 8-bit palettized + BI_RLE8 queries (gate closure).

``decode_bmp`` (multimodal.py) shipped 24-bit uncompressed only; the
classic screenshot/icon BMPs a crawl carries are 8-bit palettized,
often RLE8-compressed. The decoder now handles both (color-table
indirection, encoded runs, absolute mode with word alignment, EOL/EOB,
delta skips), and these queries put the paths on the exact-integer
oracle surface with the same fixture family as the GIF/PNG ladder.

The fixture alternates row regimes so BOTH RLE modes sit on the
checked path: even rows hold runs of three (encoded mode), odd rows
change every pixel (absolute mode, incl. the odd-length word pad).

Reference parity: the reference repo has no multimodal layer (its
``analysis/`` package is a docstring-only scaffold,
analysis/__init__.py:1); this follows the BITMAPINFOHEADER/BI_RLE8
specification directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread
from .multimodal import decode_bmp, encode_bmp

_N_PAL = 64


def _palette(rot: int = 0):
    """Same closed-form palette family as the GIF/PNG fixtures."""
    return [
        (((c + rot) % _N_PAL * 5 + 1) % 256,
         ((c + rot) % _N_PAL * 11 + 3) % 256,
         ((c + rot) % _N_PAL * 23 + 7) % 256)
        for c in range(_N_PAL)
    ]


def encode_bmp_rle8(indices, palette) -> bytes:
    """8-bit palettized BMP with BI_RLE8 compression (bottom-up, the
    only legal RLE order). Repeats of >= 2 become encoded runs; literal
    stretches of >= 3 go through absolute mode (word-aligned), shorter
    ones as encoded singles — so both modes appear in any mixed
    raster."""
    import struct

    import numpy as np

    arr = np.asarray(indices, dtype=np.uint8)
    h, w = arr.shape
    if int(arr.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y]
        i = 0
        while i < w:
            run = 1
            while i + run < w and row[i + run] == row[i] and run < 255:
                run += 1
            if run >= 2:
                data += bytes([run, row[i]])
                i += run
                continue
            k = i  # literal stretch: up to the next >= 2 repeat
            while k < w and k - i < 255:
                if k + 1 < w and row[k + 1] == row[k]:
                    break
                k += 1
            lit = row[i:k]
            if len(lit) >= 3:
                data += bytes([0, len(lit)]) + lit.tobytes()
                if len(lit) & 1:
                    data.append(0)  # absolute mode is word-aligned
            else:
                for v in lit:
                    data += bytes([1, v])
            i = k
        if y > 0:
            data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    quads = bytearray()
    for r, g, b in palette:
        quads += bytes([b, g, r, 0])  # BGRA
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835,
        len(palette), 0,
    )
    off = 14 + 40 + len(quads)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + info + bytes(quads) + bytes(data)


# --------------------------------------------------------------------------
# Fixture: even rows runs-of-three (encoded mode), odd rows per-pixel
# change (absolute mode); the closed form is SQL-expressible with the
# usual palette arithmetic.
# --------------------------------------------------------------------------

_IDX = (
    "(CASE WHEN (j // w) % 2 = 1 "
    "THEN ({s}) * 3 + (j // w) * 5 + (j % w) * 7 "
    "ELSE ({s}) * 3 + (j // w) * 5 + ((j % w) // 3) * 7 END) % 64"
)


def _px_cols(s: str) -> str:
    e = _IDX.format(s=s)
    return (
        f"(({e}) * 5 + 1) % 256 AS r, "
        f"(({e}) * 11 + 3) % 256 AS g, "
        f"(({e}) * 23 + 7) % 256 AS b"
    )


def _fixture_indices(seed: int, w: int, h: int):
    import numpy as np

    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    runs = (seed * 3 + y * 5 + (x // 3) * 7) % _N_PAL
    lit = (seed * 3 + y * 5 + x * 7) % _N_PAL
    return np.where(y % 2 == 1, lit, runs).astype(np.uint8)


_BMP_RLE_ORACLE = f"""
SELECT doc_id,
       cast(w AS INTEGER) AS width,
       cast(h AS INTEGER) AS height,
       cast(sum(r + g + b) AS BIGINT) AS sum_px,
       cast(min(least(r, g, b)) AS BIGINT) AS min_px,
       cast(max(greatest(r, g, b)) AS BIGINT) AS max_px,
       cast(sum((j // w + 1) * (j % w + 1) * (r + g + b)) AS BIGINT)
         AS wsum_px
FROM (
  SELECT doc_id, w, h, j, {_px_cols("doc_id")}
  FROM (
    SELECT doc_id, 5 + doc_id % 8 AS w, 4 + doc_id % 6 AS h,
           unnest(range((5 + doc_id % 8) * (4 + doc_id % 6))) AS j
    FROM documents
  ) g0
) px
GROUP BY doc_id, w, h
"""


@register(
    "mm_image_bmp_rle8_decode",
    oracle=_BMP_RLE_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_bmp_rle8_decode(spark, sf_dir):
    """Round-trip each doc's mixed-regime index raster through the real
    RLE8 codec; the position-weighted wsum_px pins the bottom-up row
    unwind and every EOL boundary."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("min_px", T.LongType()),
            T.StructField("max_px", T.LongType()),
            T.StructField("wsum_px", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        pal = _palette()
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                w, h = 5 + doc_id % 8, 4 + doc_id % 6
                idx = _fixture_indices(doc_id, w, h)
                dec = decode_bmp(encode_bmp_rle8(idx, pal))
                px = dec["pixels"].astype(np.int64)
                wt = (
                    (np.arange(h, dtype=np.int64) + 1)[:, None]
                    * (np.arange(w, dtype=np.int64) + 1)[None, :]
                )
                rows.append(
                    (
                        doc_id,
                        dec["width"],
                        dec["height"],
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        int((wt * px.sum(axis=2)).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    return d.mapInPandas(run, schema=schema)


# Decoded-RGB equality: the index raster depends on the pair base only
# through base*3 mod 64 (3 invertible), so bases collide iff equal
# mod 64 with matching dims — the (w, h, pk) join, as in the GIF/PNG
# twins. The odd doc re-encodes the same raster RLE8-palettized with a
# rotated color table + counter-rotated indices; the even doc is
# 24-bit uncompressed: different pixel format, different bytes,
# identical pixels.
_BMP_RENC_ORACLE = """
WITH k AS (
  SELECT doc_id,
         5 + (doc_id // 2) % 8 AS w,
         4 + (doc_id // 2) % 6 AS h,
         (doc_id // 2) % 64 AS pk
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(a.w AS INTEGER) AS w, cast(a.h AS INTEGER) AS h
FROM k a
JOIN k b
  ON a.w = b.w AND a.h = b.h AND a.pk = b.pk AND a.doc_id < b.doc_id
"""


@register(
    "mm_image_bmp_rle8_renc_dedup",
    oracle=_BMP_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_bmp_rle8_renc_dedup(spark, sf_dir):
    """Digest-dedup over decoded BMP pixels: every (2p, 2p+1) doc pair
    stores the same raster as 24-bit-uncompressed vs RLE8-palettized
    (rotated table, counter-rotated indices) and must collide on the
    decode-normalized digest."""
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

        import numpy as np

        pal0 = np.asarray(_palette(), dtype=np.uint8)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                base, odd = doc_id // 2, doc_id % 2
                w, h = 5 + base % 8, 4 + base % 6
                idx = _fixture_indices(base, w, h)
                if odd:
                    rot = 1 + base % 63
                    blob = encode_bmp_rle8(
                        (idx.astype(np.int64) - rot) % _N_PAL, _palette(rot)
                    )
                else:
                    blob = encode_bmp(pal0[idx])
                dec = decode_bmp(blob)
                digest = hashlib.md5(dec["pixels"].tobytes()).hexdigest()
                rows.append((doc_id, w, h, digest))
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
