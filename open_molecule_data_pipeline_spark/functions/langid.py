"""Character n-gram language identification (profile-based).

The production-shape variant of the stopword scorer in
``operators/text.py``: rank languages by overlap between a document's
character-bigram frequency profile and small per-language reference
profiles. Pure Spark array/map expressions — no Python in the per-row path,
so it runs inside codegen and scales linearly.

Profiles below are tiny illustrative bigram sets for latin-script
languages; a deployment would learn them from labeled corpora. The operator
is registered rows-only (scores are deterministic but the profile tables
are engine-internal, not worth mirroring in oracle SQL given
text.text_langid_stopword already oracle-checks the scoring pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Characteristic bigrams (lowercase, space-padded boundaries dropped).
PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an"),
    "de": ("en", "er", "ch", "de", "ei"),
    "es": ("de", "la", "os", "el", "es"),
    "fr": ("le", "de", "es", "en", "re"),
}


def _bigrams(col_name: str) -> Column:
    """All character bigrams of a lowercased string column, as an array."""
    lowered = f"lower({col_name})"
    return F.expr(
        f"filter(transform(sequence(1, greatest(length({lowered}) - 1, 1)),"
        f" i -> substr({lowered}, i, 2)), g -> length(g) = 2)"
    )


def score_languages(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-language bigram-hit counts and an argmax prediction."""
    grams = _bigrams(text_col).alias("__grams")
    scored = df.withColumn("__grams", grams)
    for lang, profile in PROFILES.items():
        hits = F.size(
            F.filter(F.col("__grams"), lambda g: g.isin(*profile))
        )
        scored = scored.withColumn(f"score_{lang}", hits)

    langs = list(PROFILES)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, lang).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.withColumn("lang_pred_ngram", best).drop("__grams")
