"""Incremental (batch-vs-corpus) dedup (split from training_extra.py
r13, hygiene only): dedupe a NEW batch against the existing corpus
without rescoring the corpus against itself — the nightly-ingest
shape. The new batch's MinHash band keys equi-join the corpus band
index; cost tracks the batch size and band collisions, never
corpus x corpus. Reuses the deterministic md5 primitives of dedup.py,
so DuckDB reproduces them exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import N_BANDS, _minhash_sig_df


# --------------------------------------------------------------------------
# Incremental dedup: the "new batch" is the deterministic 1/16 md5 slice of
# documents (stands in for tonight's ingest); every new doc that shares a
# MinHash band with any corpus doc is flagged with its smallest banded
# corpus neighbor. The corpus never joins itself.
# --------------------------------------------------------------------------

# sigs CTE and band expressions are imported from dedup.py so the two
# ladders cannot drift apart.
from .dedup import _SIG_DUCK_CTE  # noqa: E402

_INCREMENTAL_ORACLE = f"""
WITH sigs AS ({_SIG_DUCK_CTE}),
bands AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT doc_id,
           unnest([{', '.join(str(b) for b in range(N_BANDS))}]) AS band_id,
           unnest([{', '.join(f'md5(sig_{2 * b} || sig_{2 * b + 1})' for b in range(N_BANDS))}]) AS band_key
    FROM sigs
  ) u
),
tagged AS (
  SELECT *, substr(md5(cast(doc_id AS VARCHAR)), 1, 1) = '0' AS is_new
  FROM bands
)
SELECT n.doc_id, cast(min(c.doc_id) AS BIGINT) AS dup_of
FROM tagged n
JOIN tagged c
  ON n.band_id = c.band_id AND n.band_key = c.band_key
 AND n.is_new AND NOT c.is_new
GROUP BY n.doc_id
"""


@register(
    "dedup_incremental_batch",
    oracle=_INCREMENTAL_ORACLE,
    tags=("dedup", "minhash", "incremental"),
)
def dedup_incremental_batch(spark, sf_dir):
    sigs = _minhash_sig_df(spark, sf_dir)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(F.col(f"sig_{2 * b}"), F.col(f"sig_{2 * b + 1}"))
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_entries).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    newb = bands.filter(is_new).select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_key"
    )
    corp = bands.filter(~is_new).select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    return (
        newb.join(corp, ["band_id", "band_key"])
        .groupBy(F.col("new_doc").alias("doc_id"))
        .agg(F.min("corpus_doc").alias("dup_of"))
    )
