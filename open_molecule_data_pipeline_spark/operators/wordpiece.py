"""Greedy longest-match subword tokenization (r10): the WordPiece/
SentencePiece APPLY mechanism, completing the tokenizer family next to
the BPE merge-fold (corpus_ops.py: train/batched-train/encode-apply).

BPE segments by replaying merge rules; WordPiece segments by repeatedly
taking the LONGEST vocabulary piece that prefixes the remainder — a
different machine, and the one most serving stacks run at inference.

``text_wordpiece_apply``:
- vocabulary = every distinct character in the corpus (so segmentation
  can never dead-end) ∪ the top-32 substrings of length 2–4 by corpus
  frequency (deterministic (freq desc, piece asc) TakeOrdered — the
  stand-in for a trained vocab, same convention as pq.py's codebook);
- the vocabulary rides as ONE broadcast array column; per word, an
  ``aggregate`` fold over ``sequence(1, length(word))`` consumes the
  longest matching prefix each step (progress ≥ 1 char/step since all
  single chars are in-vocab, so length(word) steps always suffice). The
  longest prefix is a nested fold over the vocab array — whole-stage
  codegen, zero Python, O(len·|vocab|) per word with |vocab| constant;
- equal-length prefix ties cannot exist (two distinct equal-length
  prefixes of one string are impossible), so the fold's first-seen-wins
  and the oracle's ORDER BY length DESC pick the same piece.

The oracle mirrors the greedy loop as a recursive CTE (per-word state
(rest, n_pieces), one step per recursion level), over the identically
trained vocabulary — an exact cross-engine check of an iterative
string algorithm. Output: per-lang word/piece counts and pieces-per-
word, the number a tokenizer swap is judged by.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread

TOP_PIECES = 32

_WP_ORACLE = f"""
WITH RECURSIVE
words AS (
  SELECT row_number() OVER () AS wid, lang, w FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
  ) t WHERE length(w) > 0
),
chars AS (
  SELECT DISTINCT p FROM (
    SELECT unnest(string_split_regex(w, '')) AS p FROM words
  ) t WHERE length(p) > 0
),
poss AS (
  SELECT unnest(range(1, (SELECT max(length(w)) + 1 FROM words))) AS i
),
lens AS (SELECT unnest(range(2, 5)) AS l),
subs AS (
  SELECT substr(w, poss.i, lens.l) AS p
  FROM words, lens, poss
  WHERE poss.i + lens.l - 1 <= length(w)
),
top AS (
  SELECT p FROM (SELECT p, count(*) AS c FROM subs GROUP BY p)
  ORDER BY c DESC, p LIMIT {TOP_PIECES}
),
vocab AS (
  SELECT DISTINCT p FROM (
    SELECT p FROM chars UNION ALL SELECT p FROM top
  )
),
seg AS (
  SELECT wid, w AS rest, 0 AS np FROM words
  UNION ALL
  SELECT wid,
         substr(rest, length((SELECT p FROM vocab
                              WHERE starts_with(rest, p)
                              ORDER BY length(p) DESC, p LIMIT 1)) + 1),
         np + 1
  FROM seg WHERE length(rest) > 0
),
final AS (
  SELECT wid, np FROM seg WHERE length(rest) = 0
)
SELECT words.lang,
       cast(count(*) AS BIGINT) AS n_words,
       cast(sum(final.np) AS BIGINT) AS n_pieces,
       round(cast(sum(final.np) AS DOUBLE) / cast(count(*) AS DOUBLE), 6)
         AS pieces_per_word
FROM final JOIN words USING (wid)
GROUP BY words.lang
"""


@register(
    "text_wordpiece_apply",
    oracle=_WP_ORACLE,
    tags=("text", "training"),
)
def text_wordpiece_apply(spark, sf_dir):
    d = spread(table(spark, sf_dir, "documents").select("lang", "text"), "lang")
    words = d.select("lang", F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") > 0
    )
    chars = (
        words.select(F.explode(F.split("w", "")).alias("p"))
        .filter(F.length("p") > 0)
        .distinct()
    )
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(2, 4), l ->"
                " CASE WHEN length(w) >= l THEN"
                "   transform(sequence(1, length(w) - l + 1), s -> substring(w, s, l))"
                " ELSE array() END))"
            )
        ).alias("p")
    )
    top = (
        subs.groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "p")
        .limit(TOP_PIECES)
        .select("p")
    )
    vocab = chars.unionByName(top).distinct()
    vlist = vocab.groupBy().agg(F.array_sort(F.collect_list("p")).alias("vocab"))
    seg = words.crossJoin(F.broadcast(vlist)).select(
        "lang",
        F.expr(
            """
            aggregate(
              sequence(1, length(w)),
              named_struct('rest', w, 'np', cast(0 as int)),
              (acc, i) -> if(length(acc.rest) = 0, acc,
                named_struct(
                  'rest', substring(acc.rest,
                     length(aggregate(vocab, '', (b, p) ->
                       if(length(p) > length(b) and startswith(acc.rest, p),
                          p, b))) + 1),
                  'np', acc.np + 1)),
              acc -> acc.np)
            """
        ).alias("np"),
    )
    return seg.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("np").cast("long").alias("n_pieces"),
        F.round(
            F.sum("np").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("pieces_per_word"),
    )
