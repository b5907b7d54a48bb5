"""Round-12 operator pins: Unigram-LM trainer Viterbi fold semantics and
the hybrid-RRF arm-overlap eval invariants."""

from __future__ import annotations

import pyspark.sql.functions as F


def _viterbi(spark, vocab_lpq: dict[str, int], word: str):
    """Run the trainer's forward + backtrace fold expressions on one word
    with an explicit vocabulary — the DP in isolation."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        _BWD_EXPR,
        _FWD_EXPR,
    )

    df = spark.createDataFrame([(word,)], "w string").withColumn(
        "vm",
        F.map_from_entries(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"), F.lit(q).cast("long").alias("lpq")
                    )
                    for p, q in vocab_lpq.items()
                ]
            )
        ),
    )
    row = (
        df.withColumn("bests", F.expr(_FWD_EXPR))
        .withColumn("pieces", F.expr(_BWD_EXPR))
        .collect()[0]
    )
    return list(row.bests), list(row.pieces)


def test_unigram_viterbi_picks_max_likelihood_split(spark):
    """Hand-worked DP: with lp(a)=-1.0, lp(b)=-2.0, lp(ab)=-1.5 (micro
    units), "aab" must segment as [a][ab] (score -2.5e6), beating
    [a][a][b] (-4.0e6) — and the forward table must be the hand
    computation exactly."""
    vm = {"a": -1_000_000, "b": -2_000_000, "ab": -1_500_000}
    bests, pieces = _viterbi(spark, vm, "aab")
    assert bests == [0, -1_000_000, -2_000_000, -2_500_000]
    # backtrace emits end -> start
    assert pieces == ["ab", "a"]


def test_unigram_viterbi_tie_takes_longest_piece(spark):
    """Exact-integer tie ([a][a] vs [aa], both -4.0e6): the backtrace's
    achiever rule picks the LONGEST length, mirroring the oracle's
    max(l) over achievers — the determinism the cross-engine hash
    depends on."""
    vm = {"a": -2_000_000, "aa": -4_000_000}
    bests, pieces = _viterbi(spark, vm, "aa")
    assert bests == [0, -2_000_000, -4_000_000]
    assert pieces == ["aa"]


def test_unigram_train_em_bookkeeping(spark, sf_dir):
    """One EM round on the real corpus: every emitted piece carries a
    seed log-prob (it came from the seed vocab), counts are positive,
    delta is the literal difference, and log-probs are valid (< 0)."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        text_unigram_lm_train,
    )

    rows = text_unigram_lm_train(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.n > 0
        assert r.seed_lpq < 0 and r.new_lpq < 0
        assert r.delta_lpq == r.new_lpq - r.seed_lpq
    # ranked by count desc
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_hybrid_overlap_counts_are_consistent(spark, sf_dir):
    """Every fused result comes from at least one arm, so
    n_from_dense + n_from_sparse - n_both == n_out, and top-5 overlaps
    are bounded by pool membership counts."""
    from open_molecule_data_pipeline_spark.operators.retrieval import (
        text_hybrid_rrf_arm_overlap,
    )

    rows = text_hybrid_rrf_arm_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_from_dense + r.n_from_sparse - r.n_both == r.n_out
        assert 0 <= r.overlap_dense5 <= r.n_from_dense
        assert 0 <= r.overlap_sparse5 <= r.n_from_sparse
        assert abs(r.frac_dense5 - r.overlap_dense5 / 5) < 1e-9
