"""PNG Adam7-interlace + indexed-color queries (gate closures).

``decode_png`` (multimodal.py) shipped with two documented rejection
gates: Adam7 interlace (``interlace=1``) and indexed color (type 3,
PLTE). Both are common in real crawls — interlaced thumbnails and
palette screenshots/pixel art — so r16 closes them the same way r16
closed the GIF compositing gate: spec-level support in the one shared
codec, then queries that put the new paths on the exact-integer oracle
surface.

Fixture family mirrors the GIF ladder (gif.py): closed-form pixels so
the DuckDB oracle recomputes the decoded raster arithmetically, tiny
per-doc dimensions chosen to sweep the Adam7 edge cases (widths/heights
below 8 leave some of the seven passes EMPTY — the spec's small-image
rule, and the branch most decoders get wrong).

Reference parity: the reference repo has no multimodal layer (its
``analysis/`` package is a docstring-only scaffold,
analysis/__init__.py:1); this follows the PNG specification directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ._util import spread
from .multimodal import decode_png, encode_png

_N_PAL = 64


def _palette(rot: int = 0):
    """Same closed-form palette family as the GIF fixtures (gif.py)."""
    return [
        (((c + rot) % _N_PAL * 5 + 1) % 256,
         ((c + rot) % _N_PAL * 11 + 3) % 256,
         ((c + rot) % _N_PAL * 23 + 7) % 256)
        for c in range(_N_PAL)
    ]


# --------------------------------------------------------------------------
# Adam7 decode: truecolor fixture, w/h in 1..13 x 1..11 so every doc
# leaves a different subset of the seven passes empty; the
# position-weighted wsum_px catches any pass-scatter slip a plain sum
# would miss.
# --------------------------------------------------------------------------

_PX = "(({s}) * 3 + (j // w) * 17 + (j % w) * 7 + {c} * 29) % 256"

_PNG_ILACE_ORACLE = f"""
SELECT doc_id,
       cast(w AS INTEGER) AS width,
       cast(h AS INTEGER) AS height,
       cast(sum(r + g + b) AS BIGINT) AS sum_px,
       cast(min(least(r, g, b)) AS BIGINT) AS min_px,
       cast(max(greatest(r, g, b)) AS BIGINT) AS max_px,
       cast(sum((j // w + 1) * (j % w + 1) * (r + g + b)) AS BIGINT)
         AS wsum_px
FROM (
  SELECT doc_id, w, h, j,
         {_PX.format(s="doc_id", c=0)} AS r,
         {_PX.format(s="doc_id", c=1)} AS g,
         {_PX.format(s="doc_id", c=2)} AS b
  FROM (
    SELECT doc_id, 1 + doc_id % 13 AS w, 1 + doc_id % 11 AS h,
           unnest(range((1 + doc_id % 13) * (1 + doc_id % 11))) AS j
    FROM documents
  ) g0
) px
GROUP BY doc_id, w, h
"""


def _fixture_rgb(seed: int, w: int, h: int):
    """(H, W, 3) uint8 raster matching _PX / the oracle closed form."""
    import numpy as np

    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((seed * 3 + y * 17 + x * 7 + c * 29) % 256).astype(np.uint8)


@register(
    "mm_image_png_interlace_decode",
    oracle=_PNG_ILACE_ORACLE,
    tags=("multimodal", "image"),
)
def mm_image_png_interlace_decode(spark, sf_dir):
    """Round-trip each doc's closed-form RGB raster through the real PNG
    codec with Adam7 interlacing and all five filter types cycling
    across the pass scanlines."""
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

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                w, h = 1 + doc_id % 13, 1 + doc_id % 11
                img = _fixture_rgb(doc_id, w, h)
                blob = encode_png(img, filters=[0, 1, 2, 3, 4], interlace=True)
                dec = decode_png(blob)
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


# --------------------------------------------------------------------------
# Indexed-vs-truecolor re-encode dedup. Decoded-RGB equality key: pixel
# j stores pal[(p*3 + j*7) % 64], so two docs collide iff their bases
# agree mod 64 (3 is invertible mod 64) and dims match — the oracle's
# (w, h, p % 64) join. The odd doc of each (2p, 2p+1) pair writes the
# SAME raster as an interlaced type-3 PNG with a rotated PLTE and
# counter-rotated indices: different chunk layout, different bytes,
# identical pixels — the pair survives only if PLTE indirection AND the
# Adam7 scatter decode exactly.
# --------------------------------------------------------------------------

_PNG_RENC_ORACLE = """
WITH k AS (
  SELECT doc_id,
         4 + (doc_id // 2) % 9 AS w,
         4 + (doc_id // 2) % 7 AS h,
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
    "mm_image_png_palette_renc_dedup",
    oracle=_PNG_RENC_ORACLE,
    tags=("multimodal", "image", "dedup"),
)
def mm_image_png_palette_renc_dedup(spark, sf_dir):
    """Digest-dedup over decoded PNG pixels: every (2p, 2p+1) doc pair
    encodes the same raster as truecolor-sequential vs
    indexed-interlaced and must collide on the decode-normalized
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

        import numpy as np

        pal0 = np.asarray(_palette(), dtype=np.uint8)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].values:
                doc_id = int(doc_id)
                base, odd = doc_id // 2, doc_id % 2
                w, h = 4 + base % 9, 4 + base % 7
                j = np.arange(w * h, dtype=np.int64)
                idx = ((base * 3 + j * 7) % _N_PAL).reshape(h, w)
                if odd:
                    rot = 1 + base % 63
                    blob = encode_png(
                        ((idx - rot) % _N_PAL).astype(np.uint8),
                        filters=[2, 4, 0, 3, 1],
                        interlace=True,
                        palette=_palette(rot),
                    )
                else:
                    blob = encode_png(pal0[idx], filters=[0, 1, 2, 3, 4])
                dec = decode_png(blob)
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
