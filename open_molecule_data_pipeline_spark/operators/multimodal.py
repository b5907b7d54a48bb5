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


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Decode an image/audio/video payload. STUB: media libraries are not
    available in this runtime; a deployment wires pillow/ffmpeg here."""
    raise NotImplementedError(
        f"no codec for {media_type!r} in this runtime; "
        "install pillow/torchaudio/pyav and replace this stub"
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
