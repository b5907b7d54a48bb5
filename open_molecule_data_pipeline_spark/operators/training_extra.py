"""Training-corpus mixing and incremental-dedup operators.

Two production shapes a 100 TB pipeline runs constantly:

- **Temperature-weighted source mixing** (`sample_temperature_mix`):
  down-weight head sources with rate ∝ (n_source / n_max)^0.5 — the
  standard multinomial temperature trick for corpus balance. Sampling is a
  deterministic md5-nibble Bernoulli (no RNG state, same rows every run /
  engine); rates are quantized to 16ths so the keep predicate is a plain
  lexicographic hex compare in both engines (floor() not round(): floor of
  an IEEE-exact double is engine-stable, round's half-way rule is not).
- **Incremental dedup** (`dedup_incremental_batch`): dedupe a NEW batch
  against the existing corpus without rescoring the corpus against itself
  — the nightly-ingest shape. The new batch's MinHash band keys equi-join
  the corpus band index (in production: the persisted band table, cf.
  `sim_ivf_persisted` for the partitioned-index pattern); cost tracks the
  batch size and band collisions, never corpus x corpus.

Both reuse the deterministic md5-based primitives of `dedup.py` /
`sample_bernoulli_hash`, so DuckDB reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import N_BANDS, _minhash_sig_df

_ALPHA_DOC = "rate_k = floor(16 * sqrt(n_source / n_max))"  # alpha = 0.5

_TEMPERATURE_ORACLE = """
WITH counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
m AS (SELECT max(n) AS mx FROM counts),
rated AS (
  SELECT source, n,
         cast(floor(16 * sqrt(n / cast(m.mx AS DOUBLE))) AS INTEGER) AS rate_k
  FROM counts, m
),
kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN rated r ON d.source = r.source
  WHERE substr(md5(cast(d.doc_id AS VARCHAR)), 1, 1)
        < substr('0123456789abcdefg', r.rate_k + 1, 1)
  GROUP BY d.source
)
SELECT r.source,
       cast(r.n AS BIGINT) AS n_total,
       cast(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       r.rate_k
FROM rated r LEFT JOIN kept k ON r.source = k.source
"""


@register(
    "sample_temperature_mix",
    oracle=_TEMPERATURE_ORACLE,
    tags=("sample", "training"),
)
def sample_temperature_mix(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("mx"))
    rated = counts.crossJoin(F.broadcast(mx)).select(
        "source",
        "n",
        F.floor(
            16 * F.sqrt(F.col("n") / F.col("mx").cast("double"))
        ).cast("int").alias("rate_k"),
    )
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thresh = F.substring(F.lit("0123456789abcdefg"), F.col("rate_k") + 1, 1)
    kept = (
        d.join(F.broadcast(rated), "source")
        .filter(nibble < thresh)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rated.join(F.broadcast(kept), "source", "left").select(
        "source",
        F.col("n").cast("long").alias("n_total"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        "rate_k",
    )


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


# --------------------------------------------------------------------------
# Nucleus (top-p) corpus selection: per language, keep the highest-quality
# documents until their cumulative mass reaches p of the language total —
# the "quality nucleus" cut used to skim the best slice of a crawl (quality
# proxy here: n_chars; in production a model score column, same plan). The
# keep predicate 2 * mass_before < total is pure int64 — no float
# thresholds to disagree on. The running sum partitions by lang; at real
# scale the same two-pass rewrite as two_pass_global_window applies within
# each language (range-partition on the sort key, broadcast per-partition
# offsets), which keeps any one task's window bounded.
# --------------------------------------------------------------------------

_TOPP_NUM = 1  # p = _TOPP_NUM / _TOPP_DEN of total mass per language
_TOPP_DEN = 2

_NUCLEUS_ORACLE = f"""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(n_chars) OVER (PARTITION BY lang) AS total,
         count(*) OVER (PARTITION BY lang) AS n_total
  FROM documents
)
SELECT lang,
       cast(n_total AS BIGINT) AS n_docs,
       cast(count(*) AS BIGINT) AS n_selected,
       cast(sum(n_chars) AS BIGINT) AS chars_selected,
       round(sum(n_chars) * 100.0 / total, 6) AS pct_of_mass
FROM ranked
WHERE (cum - n_chars) * {_TOPP_DEN} < total * {_TOPP_NUM}
GROUP BY lang, total, n_total
"""


@register(
    "sample_nucleus_topp", oracle=_NUCLEUS_ORACLE, tags=("sample", "training")
)
def sample_nucleus_topp(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w_run = (
        W.partitionBy("lang")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("lang")
    ranked = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w_run).alias("cum"),
        F.sum("n_chars").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_total"),
    )
    kept = ranked.filter(
        (F.col("cum") - F.col("n_chars")) * _TOPP_DEN
        < F.col("total") * _TOPP_NUM
    )
    return kept.groupBy("lang", "total", "n_total").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_chars").alias("chars_selected"),
        F.round(F.sum("n_chars") * 100.0 / F.col("total"), 6).alias(
            "pct_of_mass"
        ),
    ).select(
        "lang",
        F.col("n_total").alias("n_docs"),
        "n_selected",
        "chars_selected",
        "pct_of_mass",
    )
