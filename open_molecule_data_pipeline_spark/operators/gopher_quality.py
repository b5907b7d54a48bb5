"""Gopher repetition signals (r14 stretch): the MassiveText/Gopher
repetition filters (Rae et al. 2021, Table A1) the quality ladder was
missing — ``text_quality_score`` covers the length/symbol heuristics,
but the REPETITION family (duplicate n-gram fraction, top-n-gram
coverage, duplicate line fraction) is the half that actually catches
boilerplate-looped and generation-degenerate documents.

Per-document signals, all exact token-count ratios in integer ppm
(truncating div, numerators non-negative):

- ``dup{2,3}_ppm``   — fraction of n-gram OCCURRENCES whose n-gram
                       appears more than once in the doc (n = 2, 3)
- ``top{2,3}_ppm``   — fraction of the doc's tokens covered by the
                       single most frequent n-gram (count * n / tokens)
- ``dupseg_ppm``     — duplicate aligned 3-token segment fraction (the
                       single-line fixture's "duplicate line" stand-in,
                       the ``dedup_boilerplate_lines`` convention)

A document is FLAGGED when any signal crosses its Gopher threshold
(0.20 / 0.18 duplicate-fraction, 0.20 / 0.18 top-coverage, 0.30
duplicate-line). The report aggregates per language: doc counts,
flagged counts, and exact mean signals.

Plan shape (100 TB): ONE explode builds a unified (n, gram) stream for
both n-gram orders AND the segments (a single array concat map-side —
no triple scan), one map-side-combinable groupBy((doc, n, gram)) count,
one per-(doc, n) partial agg, one bounded per-lang rollup. Everything
after the gram count is doc-cardinality, never occurrence-cardinality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

_SEG = 3  # aligned-segment width (dedup_boilerplate_lines convention)

# Gopher Table A1 thresholds, in ppm
_T_DUP2, _T_DUP3 = 200_000, 180_000
_T_TOP2, _T_TOP3 = 200_000, 180_000
_T_DUPSEG = 300_000

_GOPHER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, 2 AS n,
         array_to_string(tk[i.i : i.i + 1], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) i
  WHERE len(tk) >= 2
  UNION ALL
  SELECT doc_id, 3,
         array_to_string(tk[i.i : i.i + 2], ' ')
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) i
  WHERE len(tk) >= 3
  UNION ALL
  SELECT doc_id, 0,
         array_to_string(tk[{_SEG} * i.i + 1 : {_SEG} * i.i + {_SEG}], ' ')
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0,
                cast(floor((len(tk) - 1) / {_SEG}) AS INTEGER))) AS i) i
  WHERE len(tk[{_SEG} * i.i + 1 : {_SEG} * i.i + {_SEG}]) = {_SEG}
),
gc AS (
  SELECT doc_id, n, g, cast(count(*) AS BIGINT) AS c
  FROM grams GROUP BY doc_id, n, g
),
per AS (
  SELECT doc_id, n,
         cast(sum(c) AS BIGINT) AS total,
         cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
         cast(max(c) AS BIGINT) AS top
  FROM gc GROUP BY doc_id, n
),
sig AS (
  SELECT t.doc_id, t.lang,
         cast(len(t.tk) AS BIGINT) AS n_tok,
         coalesce((SELECT dup_occ * 1000000 // total FROM per
                   WHERE per.doc_id = t.doc_id AND n = 2 AND total > 0), 0)
           AS dup2_ppm,
         coalesce((SELECT top * 2 * 1000000 // len(t.tk) FROM per
                   WHERE per.doc_id = t.doc_id AND n = 2), 0) AS top2_ppm,
         coalesce((SELECT dup_occ * 1000000 // total FROM per
                   WHERE per.doc_id = t.doc_id AND n = 3 AND total > 0), 0)
           AS dup3_ppm,
         coalesce((SELECT top * 3 * 1000000 // len(t.tk) FROM per
                   WHERE per.doc_id = t.doc_id AND n = 3), 0) AS top3_ppm,
         coalesce((SELECT dup_occ * 1000000 // total FROM per
                   WHERE per.doc_id = t.doc_id AND n = 0 AND total > 0), 0)
           AS dupseg_ppm
  FROM toks t
),
flagged AS (
  SELECT lang, dup2_ppm, top2_ppm, dup3_ppm, top3_ppm, dupseg_ppm,
         CASE WHEN dup2_ppm > {_T_DUP2} OR dup3_ppm > {_T_DUP3}
                OR top2_ppm > {_T_TOP2} OR top3_ppm > {_T_TOP3}
                OR dupseg_ppm > {_T_DUPSEG}
              THEN 1 ELSE 0 END AS flag
  FROM sig
)
SELECT lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(flag) AS BIGINT) AS n_flagged,
       cast(sum(dup2_ppm) // count(*) AS BIGINT) AS mean_dup2_ppm,
       cast(sum(top2_ppm) // count(*) AS BIGINT) AS mean_top2_ppm,
       cast(sum(dup3_ppm) // count(*) AS BIGINT) AS mean_dup3_ppm,
       cast(sum(top3_ppm) // count(*) AS BIGINT) AS mean_top3_ppm,
       cast(sum(dupseg_ppm) // count(*) AS BIGINT) AS mean_dupseg_ppm
FROM flagged
GROUP BY lang
"""


@register(
    "text_gopher_repetition",
    oracle=_GOPHER_ORACLE,
    tags=("text", "quality", "training"),
)
def text_gopher_repetition(spark, sf_dir):
    """Per-language Gopher repetition report: doc counts, flagged
    counts, and mean duplicate/top n-gram + duplicate-segment ppm."""
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tk = F.expr("filter(split(text, ' '), x -> length(x) > 0)")
    base = d.select("doc_id", "lang", tk.alias("tk"), F.size(tk).alias("nt"))

    # one unified (n, gram) array built map-side, one explode
    g2 = F.expr(
        "transform(arrays_zip(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        " slice(tk, 2, greatest(size(tk) - 1, 0))),"
        " p -> struct(2 as n, concat_ws(' ', p['0'], p['1']) as g))"
    )
    g3 = F.expr(
        "transform(arrays_zip(slice(tk, 1, greatest(size(tk) - 2, 0)),"
        " slice(tk, 2, greatest(size(tk) - 2, 0)),"
        " slice(tk, 3, greatest(size(tk) - 2, 0))),"
        " p -> struct(3 as n, concat_ws(' ', p['0'], p['1'], p['2']) as g))"
    )
    segs = F.expr(
        f"transform(filter(transform("
        f"sequence(0, greatest(floor((size(tk) - 1) / {_SEG}), 0)),"
        f" i -> slice(tk, {_SEG} * int(i) + 1, {_SEG})),"
        f" s -> size(s) = {_SEG}),"
        " s -> struct(0 as n, concat_ws(' ', s) as g))"
    )
    grams = base.select(
        "doc_id",
        F.explode(F.concat(g2, g3, segs)).alias("p"),
    ).select("doc_id", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
    gc = grams.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = gc.groupBy("doc_id", "n").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_occ"),
        F.max("c").cast("long").alias("top"),
    )
    # pivot the three n-classes into per-doc columns (doc-cardinality)
    pick = lambda n, expr: F.max(F.when(F.col("n") == n, expr))  # noqa: E731
    wide = per.groupBy("doc_id").agg(
        pick(2, F.expr("dup_occ * 1000000 div total")).alias("dup2_ppm"),
        pick(2, F.col("top") * 2).alias("top2_cnt"),
        pick(3, F.expr("dup_occ * 1000000 div total")).alias("dup3_ppm"),
        pick(3, F.col("top") * 3).alias("top3_cnt"),
        pick(0, F.expr("dup_occ * 1000000 div total")).alias("dupseg_ppm"),
    )
    sig = (
        base.select("doc_id", "lang", F.col("nt").cast("long").alias("nt"))
        .join(wide, "doc_id", "left")
        .select(
            "lang",
            F.coalesce("dup2_ppm", F.lit(0)).cast("long").alias("dup2_ppm"),
            F.coalesce(
                F.expr("top2_cnt * 1000000 div nt"), F.lit(0)
            )
            .cast("long")
            .alias("top2_ppm"),
            F.coalesce("dup3_ppm", F.lit(0)).cast("long").alias("dup3_ppm"),
            F.coalesce(
                F.expr("top3_cnt * 1000000 div nt"), F.lit(0)
            )
            .cast("long")
            .alias("top3_ppm"),
            F.coalesce("dupseg_ppm", F.lit(0))
            .cast("long")
            .alias("dupseg_ppm"),
        )
    )
    flag = (
        (F.col("dup2_ppm") > _T_DUP2)
        | (F.col("dup3_ppm") > _T_DUP3)
        | (F.col("top2_ppm") > _T_TOP2)
        | (F.col("top3_ppm") > _T_TOP3)
        | (F.col("dupseg_ppm") > _T_DUPSEG)
    ).cast("long")
    mean = lambda c: F.expr(f"sum({c}) div count(1)").cast("long").alias(  # noqa: E731
        f"mean_{c}"
    )
    return sig.withColumn("flag", flag).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("flag").cast("long").alias("n_flagged"),
        mean("dup2_ppm"),
        mean("top2_ppm"),
        mean("dup3_ppm"),
        mean("top3_ppm"),
        mean("dupseg_ppm"),
    )
