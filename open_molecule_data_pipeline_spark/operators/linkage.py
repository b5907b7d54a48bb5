"""Fuzzy record linkage (entity resolution): blocked candidate generation
plus edit-distance verification, the dedup pattern for *structured* records
(names, addresses) rather than long documents.

The shape every production ER system uses at scale:

1. derive a deterministic "dirty" twin of each customer name (one digit
   deleted at an md5-chosen position — simulating typos / OCR drops),
2. BLOCK: equi-join dirty records to clean records on a stable blocking
   key (here the last 4 name characters, which the perturbation never
   touches) — candidate cost tracks block sizes, never |dirty| x |clean|,
3. VERIFY: exact Levenshtein on the candidates only,
4. pick the best match per dirty record (min distance, tie-break key).

At 100 TB the blocking key domain must grow with the data (real systems
use several independent blocking passes — phonetic keys, q-gram LSH); the
equi-join here is the same plan at any scale, and the verify cost is
bounded by candidate count, not corpus size. The per-record top-1 window
partitions on the (high-cardinality) dirty key, so no task sees more than
one block's candidates.

Everything is integer / string algebra (md5-derived positions, Levenshtein
distances), so Spark and DuckDB agree bit-for-bit with no float hazards.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

# delete one digit at position 10 + (first md5 nibble mod 5) — positions
# 10..14 of 'Customer#DDDDDDDDD', so the last-4-char blocking key survives.
_LINKAGE_ORACLE = """
WITH clean AS (
  SELECT c_custkey, c_name, right(c_name, 4) AS blk FROM customer
),
dirty AS (
  SELECT c_custkey AS true_key,
         substr(c_name, 1, 9 + (strpos('0123456789abcdef',
                                       substr(md5(c_name), 1, 1)) - 1) % 5)
         || substr(c_name, 11 + (strpos('0123456789abcdef',
                                        substr(md5(c_name), 1, 1)) - 1) % 5)
           AS dirty_name
  FROM customer
),
cand AS (
  SELECT d.true_key, d.dirty_name, c.c_custkey, c.c_name,
         levenshtein(d.dirty_name, c.c_name) AS lev
  FROM dirty d JOIN clean c ON right(d.dirty_name, 4) = c.blk
  WHERE levenshtein(d.dirty_name, c.c_name) <= 2
),
best AS (
  SELECT true_key, c_custkey, lev,
         row_number() OVER (PARTITION BY true_key
                            ORDER BY lev, c_custkey) AS rn
  FROM cand
)
SELECT lev,
       cast(count(*) AS BIGINT) AS n_matched,
       cast(sum(CASE WHEN c_custkey = true_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM best WHERE rn = 1
GROUP BY lev
ORDER BY lev
"""


@register("dedup_fuzzy_linkage", oracle=_LINKAGE_ORACLE, tags=("dedup", "join"))
def dedup_fuzzy_linkage(spark, sf_dir):
    cust = spread(table(spark, sf_dir, "customer"), "c_custkey")
    clean = cust.select(
        "c_custkey", "c_name", F.substring(F.col("c_name"), -4, 4).alias("blk")
    )
    dirty = cust.select(
        F.col("c_custkey").alias("true_key"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + (instr('0123456789abcdef', "
                   "substr(md5(c_name), 1, 1)) - 1) % 5)"),
            F.expr("substr(c_name, 11 + (instr('0123456789abcdef', "
                   "substr(md5(c_name), 1, 1)) - 1) % 5)"),
        ).alias("dirty_name"),
    )
    cand = (
        dirty.join(
            clean,
            F.substring(F.col("dirty_name"), -4, 4) == F.col("blk"),
        )
        .withColumn("lev", F.levenshtein("dirty_name", "c_name"))
        .filter(F.col("lev") <= 2)
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("true_key").orderBy("lev", "c_custkey")
        ),
    ).filter(F.col("rn") == 1)
    return (
        best.groupBy("lev")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum((F.col("c_custkey") == F.col("true_key")).cast("long")).alias(
                "n_correct"
            ),
        )
        .orderBy("lev")
    )


# --------------------------------------------------------------------------
# Trigram-blocked fuzzy vocabulary search (r9): spell-correct / fuzzy-find
# probe terms against the corpus vocabulary. The classic search shape:
# 1. VOCAB: distinct corpus tokens (Heaps-law-small relative to the
#    corpus, but data-dependent — it shuffles, never broadcasts).
# 2. BLOCK: candidates are (probe, word) pairs sharing >= 1 character
#    TRIGRAM — an equi-join of the word-trigram stream against the probe
#    trigram table (a few dozen literal rows, broadcast by construction).
#    Cost tracks trigram collisions, never |probes| x |vocab|.
# 3. VERIFY: exact levenshtein <= 2 on the candidates only.
# 4. RANK: top-3 per probe by (distance, word).
# The operator is DEFINED as trigram-blocked (both engines compute the
# same candidate set, so blocked-out true matches — possible for edit
# distance 2 on words this short — are excluded by contract on both
# sides; production systems add a length band and multiple gram sizes to
# drive recall up). Words under 3 chars have no trigrams and cannot be
# found — documented, same on both engines.
# --------------------------------------------------------------------------

_FUZZY_PROBES = ("tabel", "valu", "windoow", "colum", "jion")


def _probe_grams() -> list[tuple[str, str]]:
    pairs = []
    for p in _FUZZY_PROBES:
        for i in range(len(p) - 2):
            pairs.append((p, p[i : i + 3]))
    return sorted(set(pairs))


def _fuzzy_oracle() -> str:
    values = ", ".join(f"('{p}', '{g}')" for p, g in _probe_grams())
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
),
vg AS (
  SELECT w, substr(w, i.i, 3) AS g
  FROM vocab, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) i
  WHERE len(w) >= 3
),
probes(p, g) AS (VALUES {values}),
cand AS (
  SELECT DISTINCT probes.p, vg.w FROM probes JOIN vg ON vg.g = probes.g
),
scored AS (
  SELECT p, w, cast(levenshtein(p, w) AS INTEGER) AS dist
  FROM cand WHERE levenshtein(p, w) <= 2
)
SELECT p AS probe, w AS word, dist
FROM (
  SELECT p, w, dist,
         row_number() OVER (PARTITION BY p ORDER BY dist, w) AS rn
  FROM scored
) t WHERE rn <= 3
"""


@register(
    "text_fuzzy_vocab_search",
    oracle=_fuzzy_oracle(),
    tags=("text", "fuzzy", "join"),
)
def text_fuzzy_vocab_search(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .filter(F.length("w") >= 3)
    )
    vg = vocab.select(
        "w",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 2), i -> substring(w, i, 3))")
        ).alias("g"),
    )
    probes = spark.createDataFrame(_probe_grams(), "p string, g string")
    cand = vg.join(F.broadcast(probes), "g").select("p", "w").distinct()
    scored = cand.withColumn("dist", F.levenshtein("p", "w")).filter(
        F.col("dist") <= 2
    )
    w = W.partitionBy("p").orderBy("dist", "w")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("p").alias("probe"), F.col("w").alias("word"), "dist")
    )
