"""Incremental (batch-vs-corpus) multimodal near-dup (VERDICT r15 #3):
dedupe a NEW batch of images/audio clips against the existing corpus
without rescoring the corpus against itself — the nightly-crawl shape,
mirroring the r15 text twins (dedup_incremental.py:57, semdedup.py
incremental section, segments.py incremental paragraphs).

The "new batch" is the same deterministic 1/16 md5 doc slice the text
ladder uses (``substr(md5(doc_id), 1, 1) = '0'``), so batch membership
is reproducible in DuckDB. Hash construction is IMPORTED from
multimodal.py (``_dhash_hashes``/``_afp_fps`` and their oracle CTE
twins) so the full-corpus and incremental ladders cannot drift.

Scale shape (100 TB): per-doc hashes are O(1) bytes; the candidate
join is new-batch band/fingerprint keys EQUI-JOINED against the corpus
index — cost tracks batch size and band collisions, never
corpus x corpus, and the corpus side never self-joins. In a real
deployment the corpus hash index is a persisted table; here both sides
derive from the same fixture scan, which only adds the (shared) hash
cost.

Reference parity: the reference repo has no multimodal or dedup layer
(analysis/__init__.py:1 is a docstring-only scaffold); this is an
engine-side addition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from .multimodal import (
    _DHASH_T,
    _afp_fps,
    _afp_fps_cte,
    _dhash_chunks,
    _dhash_hashes,
    _dhash_hashes_cte,
)

_IS_NEW_SQL = "substr(md5(cast(doc_id AS VARCHAR)), 1, 1) = '0'"


def _is_new_col():
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"


# --------------------------------------------------------------------------
# Image: new-batch dHash bands equi-join the corpus band index; verified
# pairs (hamming <= _DHASH_T, exact bit_count on the halves) report each
# new image's smallest corpus neighbor. The oracle brute-forces
# new x corpus from the SAME closed-form hashes, proving the banded path
# keeps the zero-false-negative guarantee on the batch-vs-corpus split.
# --------------------------------------------------------------------------

_DHASH_INC_ORACLE = f"""
WITH {_dhash_hashes_cte()},
tagged AS (
  SELECT doc_id, hi, lo, {_IS_NEW_SQL} AS is_new FROM hashes
)
SELECT n.doc_id,
       cast(min(c.doc_id) AS BIGINT) AS dup_of,
       cast(arg_min(bit_count(xor(n.hi, c.hi)) + bit_count(xor(n.lo, c.lo)),
                    c.doc_id) AS INTEGER) AS hamming
FROM tagged n
JOIN tagged c
  ON n.is_new AND NOT c.is_new
 AND bit_count(xor(n.hi, c.hi)) + bit_count(xor(n.lo, c.lo)) <= {_DHASH_T}
GROUP BY n.doc_id
"""


@register(
    "mm_image_dhash_neardup_incremental",
    oracle=_DHASH_INC_ORACLE,
    tags=("multimodal", "image", "dedup", "incremental"),
)
def mm_image_dhash_neardup_incremental(spark, sf_dir):
    """Nightly image-crawl dedup: each new-batch image's nearest
    (smallest-id) corpus near-duplicate at hamming <= _DHASH_T."""
    chunks = _dhash_chunks(_dhash_hashes(spark, sf_dir))
    is_new = _is_new_col()
    newb = chunks.filter(is_new).select(
        F.col("doc_id").alias("new_doc"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
        "band",
        "c",
    )
    corp = chunks.filter(~is_new).select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
        "band",
        "c",
    )
    cand = (
        newb.join(corp, ["band", "c"])
        .select("new_doc", "corpus_doc", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= _DHASH_T)
        .groupBy(F.col("new_doc").alias("doc_id"))
        .agg(
            F.min("corpus_doc").cast("long").alias("dup_of"),
            F.min_by("hamming", "corpus_doc").cast("int").alias("hamming"),
        )
    )


# --------------------------------------------------------------------------
# Audio: new-batch fingerprints equi-join the corpus fingerprint index on
# the exact (fp, n) signature — the cheapest possible incremental dedup
# join (2-int keys).
# --------------------------------------------------------------------------

_AFP_INC_ORACLE = f"""
WITH {_afp_fps_cte()},
tagged AS (
  SELECT doc_id, n, fp, {_IS_NEW_SQL} AS is_new FROM fps
)
SELECT n2.doc_id, cast(min(c.doc_id) AS BIGINT) AS dup_of, n2.fp
FROM tagged n2
JOIN tagged c
  ON n2.fp = c.fp AND n2.n = c.n AND n2.is_new AND NOT c.is_new
GROUP BY n2.doc_id, n2.fp
"""


@register(
    "mm_audio_fingerprint_neardup_incremental",
    oracle=_AFP_INC_ORACLE,
    tags=("multimodal", "audio", "dedup", "incremental"),
)
def mm_audio_fingerprint_neardup_incremental(spark, sf_dir):
    """Nightly audio-crawl dedup: each new clip's smallest corpus
    neighbor with an identical (fingerprint, length) signature."""
    fps = _afp_fps(spark, sf_dir)
    is_new = _is_new_col()
    newb = fps.filter(is_new).select(
        F.col("doc_id").alias("new_doc"), "n", "fp"
    )
    corp = fps.filter(~is_new).select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("n").alias("n_c"),
        F.col("fp").alias("fp_c"),
    )
    return (
        newb.join(
            corp,
            (newb.fp == corp.fp_c) & (newb.n == corp.n_c),
        )
        .groupBy(F.col("new_doc").alias("doc_id"), "fp")
        .agg(F.min("corpus_doc").cast("long").alias("dup_of"))
        .select("doc_id", "dup_of", "fp")
    )
