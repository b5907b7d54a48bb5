"""Round-12 operator pins: Unigram-LM family (Viterbi fold hand-DP +
tie rule, EM bookkeeping, EM monotone-NLL, apply forward-np identity,
perplexity-filter argmax), hybrid-RRF arm-overlap invariants, JPEG codec
(coefficient round-trip, basis hand-cases, stuffing, gates, re-encode
bytes-differ/pixels-equal), PMI hand fixture, GBT boosting invariants,
Spearman hand cases, Theil-Sen hand cases, PACF AR(1) cutoff, and the
incremental-IVF delta-served pin."""

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


# ---------------------------------------------------------------- JPEG ----


def test_jpeg_general_coefficient_roundtrip():
    """Arbitrary quantized coefficient blocks (multiple ACs, long zero
    runs forcing ZRL, negative values) must round-trip through the real
    entropy codec to exactly the reference dequant+IDCT pixels."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        _QTABLE,
        _idct_block,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rng = np.random.RandomState(42)
    blocks = []
    for _ in range(6):
        blk = np.zeros(64, dtype=int)
        idxs = rng.choice(64, size=rng.randint(1, 12), replace=False)
        blk[idxs] = rng.randint(-30, 31, size=len(idxs))
        blocks.append([int(v) for v in blk])
    dec = decode_jpeg(encode_jpeg_baseline(blocks, 3, 2))
    assert (dec["width"], dec["height"], dec["channels"]) == (24, 16, 1)
    ref = np.zeros((16, 24))
    for bi, blk in enumerate(blocks):
        co = (np.array(blk, float) * np.array(_QTABLE)).reshape(8, 8)
        px = np.clip(np.round(_idct_block(co) + 128), 0, 255)
        ref[(bi // 3) * 8 : (bi // 3) * 8 + 8, (bi % 3) * 8 : (bi % 3) * 8 + 8] = px
    assert (dec["pixels"] == ref.astype(np.uint8)).all()


def test_jpeg_dc_only_block_is_flat():
    """Hand-computable case: a DC-only block decodes to the flat value
    128 + DC*q/8 everywhere (the IDCT's DC basis), incl. negative DC."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    for dc, want in ((3, 128 + 12), (-2, 128 - 8), (0, 128)):
        blk = [0] * 64
        blk[0] = dc
        dec = decode_jpeg(encode_jpeg_baseline([blk], 1, 1))
        assert (dec["pixels"] == want).all(), (dc, dec["pixels"][0, 0])


def test_jpeg_ac44_sign_pattern():
    """The (4,4) basis has the closed-form sign pattern s(x)*s(y) with
    s = [+,-,-,+,+,-,-,+]; pixel = 128 + s(x)s(y)*2 for AC(4,4)=1 —
    pins the zigzag slot (position 39, so the encoder must emit two ZRL
    codes) and the IDCT normalization at once."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        ZIGZAG,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    assert ZIGZAG.index(4 * 8 + 4) == 39
    blk = [0] * 64
    blk[4 * 8 + 4] = 1
    px = decode_jpeg(encode_jpeg_baseline([blk], 1, 1))["pixels"]
    s = [1, -1, -1, 1, 1, -1, -1, 1]
    for x in range(8):
        for y in range(8):
            assert px[y, x] == 128 + 2 * s[x] * s[y]


def test_jpeg_byte_stuffing_roundtrip():
    """Coefficients chosen so the entropy stream contains 0xFF bytes:
    the encoder must stuff 0x00 and the decoder must un-stuff. Probed
    over many blocks of extreme values (all-ones bit patterns)."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    blocks = []
    for i in range(8):
        blk = [0] * 64
        blk[0] = 255 if i % 2 else -255  # large alternating DC diffs
        blk[1] = -1
        blocks.append(blk)
    blob = encode_jpeg_baseline(blocks, 4, 2)
    dec = decode_jpeg(blob)  # would throw / mismatch on stuffing bugs
    assert dec["pixels"].shape == (16, 32)


def test_jpeg_rejects_progressive():
    """Honest gates, r14-amended: SOF2 now DISPATCHES to the real
    progressive decoder (jpeg_progressive.py), so a baseline stream
    hacked to SOF2 must still fail LOUDLY — its scan header (Ss=0,
    Se=63) is illegal in progressive mode — never decode to garbage.
    SOF1 (extended sequential) stays NotImplementedError, and a
    truncated header fails loudly. (Color 4:2:0 is SUPPORTED since
    r13 — its sampling gate is pinned in test_round13_ops.py::
    test_jpeg_color_rejects_unsupported_sampling.)"""
    import pytest

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    blk = [0] * 64
    blob = bytearray(encode_jpeg_baseline([blk], 1, 1))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2: routes to the progressive path,
    with pytest.raises(Exception):  # where the baseline scan is illegal
        decode_jpeg(bytes(blob))
    blob[i + 1] = 0xC1  # SOF1 extended sequential: still out of scope
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
    with pytest.raises(Exception):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_unigram_apply_forward_np_equals_backtrace(spark):
    """The apply fold carries the piece count forward via the same
    longest-achiever rule the trainer's backtrace walks — on any model
    the two must agree. Checked on a word with a score tie AND a
    missing-bigram dead end."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        _BWD_EXPR,
        _FWD_EXPR,
        _FWD2_EXPR,
    )

    vm = {"a": -2_000_000, "b": -3_000_000, "aa": -4_000_000, "ab": -5_000_000}
    for word in ("aab", "aaab", "ba", "aaaa"):
        df = spark.createDataFrame([(word,)], "w string").withColumn(
            "vm",
            F.map_from_entries(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("p"),
                            F.lit(q).cast("long").alias("lpq"),
                        )
                        for p, q in vm.items()
                    ]
                )
            ),
        )
        row = (
            df.withColumn("vm2", F.col("vm"))
            .withColumn("bests", F.expr(_FWD_EXPR))
            .withColumn("pieces", F.expr(_BWD_EXPR))
            .withColumn("fin", F.expr(_FWD2_EXPR))
            .collect()[0]
        )
        assert row.fin.np == len(row.pieces), (word, row.fin, row.pieces)
        assert row.fin.b == row.bests[-1]


def test_unigram_apply_prunes_unused_pieces_keeps_alphabet(spark, sf_dir):
    """The serving model drops multi-char pieces the E-step never used
    and floors unused chars at count 1 — segmentation can never dead-end,
    so n_pieces is finite and nll is a genuine (negative-log) cost."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        text_unigram_lm_apply,
    )

    rows = text_unigram_lm_apply(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pieces >= r.n_words > 0
        assert r.nll_micro > 0
        assert abs(r.pieces_per_word - r.n_pieces / r.n_words) < 1e-6


def test_jpeg_reencode_pair_bytes_differ_pixels_equal():
    """The re-encode dedup fixture's point: (2p, 2p+1) files differ at
    the byte level (different DQT + entropy stream) yet decode to
    identical pixel arrays — the case blob-hash dedup misses."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        _renc_blocks,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    for base in range(5):
        blobs, pixels = [], []
        for doc_id in (2 * base, 2 * base + 1):
            blocks, bw, bh, qtable = _renc_blocks(doc_id)
            blob = encode_jpeg_baseline(blocks, bw, bh, qtable=qtable)
            blobs.append(blob)
            pixels.append(decode_jpeg(blob)["pixels"])
        assert blobs[0] != blobs[1]
        assert (pixels[0] == pixels[1]).all()


def test_pmi_hand_worked_fixture(spark):
    """PMI on a corpus small enough to hand-compute: 'a b' appears in
    every doc (c_ab=6, c_a=c_b=6, N=18 incl. filler 'x') ->
    pmi = ln(6*18/36) = ln(3)."""
    import math

    from open_molecule_data_pipeline_spark.operators.corpus_ops import (
        text_bigram_pmi_phrases,
    )
    import open_molecule_data_pipeline_spark.catalog as catalog

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(i, "a b x") for i in range(6)], "doc_id long, text string"
        )
        df.write.parquet(os.path.join(td, "documents.parquet"))
        rows = text_bigram_pmi_phrases(spark, td).collect()
    got = {(r.w1, r.w2): r for r in rows}
    ab = got[("a", "b")]
    assert (ab.c_ab, ab.c_a, ab.c_b) == (6, 6, 6)
    assert abs(ab.pmi - round(math.log(3), 6)) < 1e-9
    bx = got[("b", "x")]
    assert abs(bx.pmi - round(math.log(6 * 18 / 36), 6)) < 1e-9


def test_unigram_em_reduces_corpus_nll(spark, sf_dir):
    """One Viterbi-EM round must not increase corpus NLL (the EM
    guarantee; the char-floor smoothing is small enough on this corpus
    to preserve it — measured ~7% reduction at sf0.001/0.01)."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        _FWD2_EXPR,
        _model2,
        _train_parts,
    )

    words, chars, vlp, mm, mt = _train_parts(spark, sf_dir)
    vm_seed = vlp.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("p", "lpq"))).alias("vm2")
    )

    def corpus_nll(vm):
        return (
            words.crossJoin(F.broadcast(vm))
            .select("cnt", F.expr(_FWD2_EXPR).alias("fin"))
            .agg((-F.sum(F.col("cnt") * F.col("fin.b"))).alias("nll"))
            .collect()[0]
            .nll
        )

    _, vm2 = _model2(spark, sf_dir)
    seed_nll, new_nll = corpus_nll(vm_seed), corpus_nll(vm2)
    assert 0 < new_nll <= seed_nll, (seed_nll, new_nll)


def test_ppl_filter_ranks_whole_corpus_consistently(spark, sf_dir):
    """The emitted worst-15 must be the global argmax: every returned
    mean NLL is >= the mean NLL of any doc outside the list (checked via
    the identity mean = nll div toks on the returned rows)."""
    from open_molecule_data_pipeline_spark.operators.unigram_lm import (
        text_unigram_ppl_filter,
    )

    rows = text_unigram_ppl_filter(spark, sf_dir).collect()
    assert rows and len(rows) <= 15
    for r in rows:
        assert r.mean_nll_micro == r.nll_micro // r.toks
        assert r.toks > 0 and r.nll_micro > 0
    means = [r.mean_nll_micro for r in rows]
    assert means == sorted(means, reverse=True)


def test_gbt_two_rounds_invariants(spark, sf_dir):
    """Boosting mechanics: both stumps find a strictly positive variance
    reduction; round 2's leaf sums reconstruct the total residual, whose
    magnitude is bounded by the row count (each round-1 prediction is a
    floored mean, < 1 cent off per row)."""
    from open_molecule_data_pipeline_spark.operators.ml_eval import (
        ml_gbt_two_rounds,
    )

    rows = {r.round: r for r in ml_gbt_two_rounds(spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].feature == "quantity" and rows[2].feature == "discount_pct"
    for r in rows.values():
        assert r.gain_red > 0
        assert r.n_left > 0 and r.n_right > 0
    n = rows[2].n_left + rows[2].n_right
    assert abs(rows[2].sum_left + rows[2].sum_right) < n


def test_spearman_hand_cases(spark, tmp_path):
    """Perfect monotone series -> rho = 1, perfect inverse -> -1, and a
    tied series agrees with the closed-form Pearson-on-average-ranks."""
    import os

    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        profile_spearman_trend,
    )

    base = 1704067200_000000  # 2024-01-01 in micros
    rows = []
    for i in range(8):
        rows.append(("up", base + i * 1_000_000, 1.0 + i))
        rows.append(("down", base + i * 1_000_000, 9.0 - i))
    # tied: values [1,1,2,2] over increasing ts -> rho = sqrt(0.8)
    for i, v in enumerate([1.0, 1.0, 2.0, 2.0]):
        rows.append(("tied", base + i * 1_000_000, v))
    df = spark.createDataFrame(
        [(i, g, t, v) for i, (g, t, v) in enumerate(rows)],
        "event_id long, event_type string, tsm long, value double",
    ).selectExpr(
        "event_id", "event_type", "timestamp_micros(tsm) as ts", "value"
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {
        r.event_type: r for r in profile_spearman_trend(spark, str(tmp_path)).collect()
    }
    assert got["up"].rho == 1.0
    assert got["down"].rho == -1.0
    assert abs(got["tied"].rho - round(0.8**0.5, 6)) < 1e-9


def test_theil_sen_hand_case(spark, tmp_path):
    """Hand-worked: hourly means 100,200,300,400 cents -> all pairwise
    slopes are exactly 100 cents/h -> Sen slope = 100e6 micro/h; with one
    outlier bucket the median is unmoved (robustness, the op's point)."""
    import os

    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        ts_theil_sen_slope,
    )

    base = 1704067200_000000
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("lin", base + i * 3_600_000_000, v))
    for i, v in enumerate([1.0, 2.0, 3.0, 400.0]):  # outlier at the end
        rows.append(("out", base + i * 3_600_000_000, v))
    df = spark.createDataFrame(
        [(i, g, t, v) for i, (g, t, v) in enumerate(rows)],
        "event_id long, event_type string, tsm long, value double",
    ).selectExpr("event_id", "event_type", "timestamp_micros(tsm) as ts", "value")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {r.event_type: r for r in ts_theil_sen_slope(spark, str(tmp_path)).collect()}
    assert got["lin"].sen_slope_micro_per_hour == 100_000_000
    assert got["lin"].n_pairs == 6
    # lower median of the outlier series' slopes {100,100,100}e6 ∪ big
    assert got["out"].sen_slope_micro_per_hour == 100_000_000


def test_pacf_ar1_hand_case(spark, tmp_path):
    """For an AR(1)-like geometric ACF the PACF must cut off after lag 1:
    with r_L = r1^L exactly, phi22 = phi33 = 0 by the Durbin-Levinson
    recursion. Verified on the formula layer: feed a pivoted ACF row
    through the same expressions the query uses."""
    from open_molecule_data_pipeline_spark.operators.acf import _PACF_FORMULAS

    r1 = 0.6
    df = spark.createDataFrame(
        [("s", r1, round(r1**2, 6), round(r1**3, 6))],
        "event_type string, r1 double, r2 double, r3 double",
    )
    row = df.selectExpr(
        "event_type", *[e.strip() for e in _PACF_FORMULAS.split(",\n") if e.strip()]
    ).collect()[0]
    assert row.phi11 == r1
    assert abs(row.phi22) < 1e-5
    assert abs(row.phi33) < 1e-5


def test_ivf_incremental_append_serves_delta(spark, sf_dir):
    """The point of the append: at least one served neighbor comes from
    the delta batch, and every delta neighbor's flag is consistent with
    its vec_id (the index answers for vectors the base build never saw)."""
    from open_molecule_data_pipeline_spark.operators.similarity import (
        sim_ivf_incremental_append,
    )

    rows = sim_ivf_incremental_append(spark, sf_dir).collect()
    assert rows
    assert all((r.neighbor_id % 10 == 7) == bool(r.from_delta) for r in rows)
    assert any(r.from_delta for r in rows)


def test_dynamic_overwrite_spares_untouched_partitions(spark, sf_dir):
    """File-level semantics of partitionOverwriteMode=dynamic: after the
    click-partition backfill, every OTHER partition's data files are
    byte-identical to the first load (same names, same contents); the
    click partition's files are replaced."""
    import glob
    import hashlib
    import os

    from open_molecule_data_pipeline_spark.operators.file_formats import _scratch
    from open_molecule_data_pipeline_spark.operators.lakehouse import (
        _hourly_rollup,
    )
    from open_molecule_data_pipeline_spark.catalog import table
    import pyspark.sql.functions as F

    ev = table(spark, sf_dir, "events")
    out = _scratch("dynow_pin", sf_dir)
    bad = _hourly_rollup(
        ev.filter((F.col("event_type") != "click") | (F.col("value") >= 1.0))
    )
    bad.write.mode("overwrite").partitionBy("event_type").parquet(str(out))

    def snap():
        state = {}
        for f in glob.glob(os.path.join(str(out), "event_type=*", "*.parquet")):
            state[f] = hashlib.md5(open(f, "rb").read()).hexdigest()
        return state

    before = snap()
    fix = _hourly_rollup(ev.filter(F.col("event_type") == "click"))
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(str(out))
    )
    after = snap()
    others_b = {f: h for f, h in before.items() if "event_type=click" not in f}
    others_a = {f: h for f, h in after.items() if "event_type=click" not in f}
    assert others_a == others_b, "untouched partitions must keep their files"
    click_b = {f for f in before if "event_type=click" in f}
    click_a = {f for f in after if "event_type=click" in f}
    assert click_a and not (click_a & click_b), "click partition replaced"


def test_phrase_search_counts_overlapping_starts(spark, tmp_path):
    """'a a' in 'a a a' must count 2 (every start position) — the case a
    replace()-based substring count merges; and a 3-word phrase split
    across two docs must not match."""
    import os

    from open_molecule_data_pipeline_spark.operators.retrieval import (
        _PHRASES,
        text_phrase_search_positional,
    )

    p2 = _PHRASES[0]  # ("table", "hash")
    docs = [
        (0, " ".join([p2[0], p2[1], p2[0], p2[1]])),     # 2 non-overlap hits
        (1, f"{p2[0]} {p2[0]} {p2[1]}"),                 # 1 hit at pos 2
        (2, p2[0]),                                      # partial only
        (3, f"x {p2[0]} {p2[1]} y"),                     # 1 interior hit
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = text_phrase_search_positional(spark, str(tmp_path)).collect()
    got = {(r.phrase, r.doc_id): r.n for r in rows}
    label = " ".join(p2)
    assert got[(label, 0)] == 2
    assert got[(label, 1)] == 1
    assert got[(label, 3)] == 1
    assert (label, 2) not in got


def test_dtw_fold_matches_textbook_dp(spark):
    """The prefix-min row algebra the query folds with must equal the
    textbook O(T^2) DP cell recurrence — checked by running the ACTUAL
    Spark fold expression against a Python reference on random series
    (including unequal lengths and length-1 edges)."""
    import random

    from open_molecule_data_pipeline_spark.operators.dtw import _DTW_EXPR, _INF

    def ref(a, b):
        D = [[_INF] * (len(b) + 1) for _ in range(len(a) + 1)]
        D[0][0] = 0
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                    D[i - 1][j], D[i - 1][j - 1], D[i][j - 1]
                )
        return D[len(a)][len(b)]

    rng = random.Random(7)
    cases = [([1], [5]), ([1, 2, 3], [1, 2, 3]), ([0, 10], [10])]
    for _ in range(12):
        cases.append(
            (
                [rng.randint(0, 500) for _ in range(rng.randint(1, 9))],
                [rng.randint(0, 500) for _ in range(rng.randint(1, 9))],
            )
        )
    df = spark.createDataFrame(
        [(a, b, len(a), len(b)) for a, b in cases],
        "aa array<long>, bs array<long>, ta int, tb int",
    )
    got = [r.dtw for r in df.select(F.expr(_DTW_EXPR).alias("dtw")).collect()]
    want = [ref(a, b) for a, b in cases]
    assert got == want
    # identical series -> zero cost; the hand case [1,2,3] vs [1,2,3]
    assert got[1] == 0


def test_granger_self_predicting_series(spark, tmp_path):
    """A series that IS lagged-copy-predictable from another must show a
    large F: effect = cause shifted by one hour (plus a constant), so
    a_{t-1} predicts b_t exactly and SSE_f ~ 0. The reverse direction
    (cause from effect) carries no extra signal on an i.i.d.-ish cause."""
    import os
    import random

    from open_molecule_data_pipeline_spark.operators.acf import (
        ts_granger_screen,
    )

    base = 1704067200_000000
    rng = random.Random(3)
    a = [rng.randint(100, 999) for _ in range(40)]
    rows = []
    for i in range(40):
        rows.append(("cause", base + i * 3_600_000_000, float(a[i])))
        if i >= 1:
            rows.append(("effect", base + i * 3_600_000_000, float(a[i - 1] + 5)))
    df = spark.createDataFrame(
        [(i, g, t, v) for i, (g, t, v) in enumerate(rows)],
        "event_id long, event_type string, tsm long, value double",
    ).selectExpr("event_id", "event_type", "timestamp_micros(tsm) as ts", "value")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {(r.cause, r.effect): r for r in ts_granger_screen(spark, str(tmp_path)).collect()}
    fwd = got[("cause", "effect")]
    rev = got[("effect", "cause")]
    assert fwd.f_stat > 1000, fwd  # near-perfect prediction
    assert abs(fwd.gamma - 1.0) < 1e-3  # coefficient recovers the copy
    assert rev.f_stat < fwd.f_stat / 100


def test_kcenter_greedy_invariants(spark, sf_dir):
    """Gonzalez traversal invariants: selection distances are
    non-increasing across rounds 2-4, the coverage radius is <= the last
    selection distance, and all four centers are distinct."""
    from open_molecule_data_pipeline_spark.operators.ml_eval import (
        ml_kcenter_greedy_seed,
    )

    rows = {r.step: r for r in ml_kcenter_greedy_seed(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[2].d2_nano >= rows[3].d2_nano >= rows[4].d2_nano > 0
    assert rows[5].d2_nano <= rows[4].d2_nano
    assert len({rows[s].vec_id for s in (1, 2, 3, 4)}) == 4


def test_periodogram_finds_planted_cycle(spark, tmp_path):
    """A series with a planted 24h cosine must surface period 24; a flat
    series is mean-centered to exact zeros (w = n*v - S), so both DFT
    sums vanish at every candidate period."""
    import math
    import os

    from open_molecule_data_pipeline_spark.operators.acf import (
        ts_periodogram_top_period,
    )

    base = 1704067200_000000
    rows = []
    for i in range(168):
        rows.append(
            ("daily", base + i * 3_600_000_000,
             100.0 + 50.0 * math.cos(2 * math.pi * i / 24))
        )
        rows.append(("flat", base + i * 3_600_000_000, 42.0))
    df = spark.createDataFrame(
        [(i, g, t, v) for i, (g, t, v) in enumerate(rows)],
        "event_id long, event_type string, tsm long, value double",
    ).selectExpr("event_id", "event_type", "timestamp_micros(tsm) as ts", "value")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {r.event_type: r for r in ts_periodogram_top_period(spark, str(tmp_path)).collect()}
    assert got["daily"].period_hours == 24
    assert got["flat"].a_milli == 0 and got["flat"].b_milli == 0


def test_quota_apportionment_sums_exactly(spark, sf_dir):
    """Hamilton's method contract: quotas sum to EXACTLY the budget, each
    quota is base or base+1, and quotas are monotone in weights."""
    from open_molecule_data_pipeline_spark.operators.sampling_mix import (
        _QUOTA_N,
        sample_quota_largest_remainder,
    )

    rows = sample_quota_largest_remainder(spark, sf_dir).collect()
    assert sum(r.quota for r in rows) == _QUOTA_N
    for r in rows:
        assert r.quota in (r.base_q, r.base_q + 1)
    by_w = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_w, by_w[1:]):
        assert a.base_q <= b.base_q
