"""MLlib-backed LSH variants (MinHashLSH / BucketedRandomProjectionLSH).

The hand-rolled LSH in ``dedup.py``/``similarity.py`` is oracle-checkable;
these MLlib estimators are the library-grade alternative with
``approxSimilarityJoin``/``approxNearestNeighbors``. MLlib's internal hash
seeds aren't reproducible in SQL, so these stay OUT of the driver contract
(``contract=False``; the pytest suite runs them rows-only) — the
oracle-checked LSH path is the hand-rolled one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import spread


def _doc_vectors(spark, sf_dir):
    """Documents -> sparse vocabulary-index vectors for MinHashLSH."""
    from pyspark.ml.feature import CountVectorizer, Tokenizer

    d = spread(table(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    tokens = Tokenizer(inputCol="text", outputCol="words").transform(d)
    cv = CountVectorizer(
        inputCol="words", outputCol="features", binary=True, minDF=1.0
    ).fit(tokens)
    return cv.transform(tokens).select("doc_id", "features")


@register("mllib_minhash_pairs", oracle=None, tags=("dedup", "mllib"), contract=False)
def mllib_minhash_pairs(spark, sf_dir):
    from pyspark.ml.feature import MinHashLSH

    vecs = _doc_vectors(spark, sf_dir)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=42
    ).fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@register("mllib_brp_neighbors", oracle=None, tags=("similarity", "mllib"), contract=False)
def mllib_brp_neighbors(spark, sf_dir):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=3,
        seed=42,
    ).fit(e)
    pairs = model.approxSimilarityJoin(e, e, 1.2, distCol="euclid_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("euclid_dist", 6).alias("euclid_dist"),
        )
    )
