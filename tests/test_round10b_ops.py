"""Edge-semantics pins for the late-r10 operators (inference stats,
feature eval, HITS, changepoint, IVFADC). Oracle parity is covered by
test_oracle_parity; these pin contracts an engines-drift-together bug
would not catch, via independent recomputation or hand-worked fixtures."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _events_pdf(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_welch_ttest_matches_independent_formula(spark, sf_dir):
    """Recompute Welch's t and the Satterthwaite df from the parquet with
    plain Python (exact int sums, float64 scalars) — an implementation
    that shares no code with either engine."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        _GROUP_A,
        _GROUP_B,
        profile_welch_ttest,
    )

    pdf = _events_pdf(sf_dir)
    got = profile_welch_ttest(spark, sf_dir).collect()[0]

    stats = {}
    for g in (_GROUP_A, _GROUP_B):
        v = [int(round(x * 100)) for x in pdf[pdf.event_type == g].value]
        n, s, q = len(v), sum(v), sum(x * x for x in v)
        m = s / n / 100.0
        var = (q - s * s / n) / (n - 1) / 1e4
        stats[g] = (n, m, var)
    (n1, m1, v1), (n2, m2, v2) = stats[_GROUP_A], stats[_GROUP_B]
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))

    assert (got.n1, got.n2) == (n1, n2)
    assert got.t_stat == round(t, 6)
    assert got.welch_df == round(df, 3)
    # df must land strictly between min(n)-1 and n1+n2-2 (Welch's bound)
    assert min(n1, n2) - 1 <= got.welch_df <= n1 + n2 - 2


def test_ks_matches_independent_ecdf(spark, sf_dir):
    """Exact-integer KS recomputed with a dict-based ECDF sweep."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        _GROUP_A,
        _GROUP_B,
        profile_ks_twosample,
    )

    pdf = _events_pdf(sf_dir)
    a = sorted(int(round(x * 100)) for x in pdf[pdf.event_type == _GROUP_A].value)
    b = sorted(int(round(x * 100)) for x in pdf[pdf.event_type == _GROUP_B].value)
    na, nb = len(a), len(b)
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    run, best, best_v = 0, -1, None
    for v in sorted(set(a) | set(b)):
        run += ca.get(v, 0) * nb - cb.get(v, 0) * na
        if abs(run) > best:
            best, best_v = abs(run), v
    got = profile_ks_twosample(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (na, nb)
    assert got.ks_num == best
    assert got.ks_at_value == round(best_v / 100.0, 2)
    assert 0.0 <= got.ks_stat <= 1.0


def test_ks_identical_samples_is_zero(spark):
    """D must be exactly 0 when the two populations are the same multiset
    (every prefix difference cancels)."""
    import open_molecule_data_pipeline_spark.operators.inference_stats as m

    rows = [(i, t, float(i % 7)) for i in range(42) for t in ("click", "purchase")]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        got = m.profile_ks_twosample(spark, "x").collect()[0]
    finally:
        m.table = orig
    assert got.ks_num == 0 and got.ks_stat == 0.0


def test_mutual_info_zero_for_constant_and_ln4_for_separating(spark):
    """dim0 constant -> MI exactly 0; dim1 perfectly separating 4 balanced
    labels across the 4 bins -> MI == ln(4) (maximum possible)."""
    import open_molecule_data_pipeline_spark.operators.feature_eval as m

    rows = []
    sep = {0: -0.2, 1: -0.05, 2: 0.05, 3: 0.5}  # bins 0,1,2,3
    for i in range(16):
        lbl = i % 4
        rows.append((i, [0.0, sep[lbl], 0.0, 0.0], lbl))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.feature_idx: r for r in m.ml_mutual_info_rank(spark, "x").collect()}
    finally:
        m.table = orig
    assert out[0].mi_nats == 0.0 and out[0].n_cells == 4  # 1 bin x 4 labels
    assert out[1].mi_nats == round(math.log(4), 6) and out[1].n_cells == 4


def test_lift_gains_decile_invariants(spark, sf_dir):
    from open_molecule_data_pipeline_spark.operators.feature_eval import (
        ml_lift_gains_deciles,
    )

    rows = sorted(
        ml_lift_gains_deciles(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    total = sum(r.n_rows for r in rows)
    # equal-count cut: sizes differ by at most 1
    assert max(r.n_rows for r in rows) - min(r.n_rows for r in rows) <= 1
    last = rows[-1]
    assert last.cum_rows == total
    assert last.cum_pos == sum(r.n_pos for r in rows)
    assert last.gain == 1.0 and last.lift == 1.0
    # cumulative columns are consistent running sums
    for i, r in enumerate(rows):
        assert r.cum_rows == sum(x.n_rows for x in rows[: i + 1])
        assert r.cum_pos == sum(x.n_pos for x in rows[: i + 1])
    # gains are monotone nondecreasing
    assert all(rows[i].gain <= rows[i + 1].gain for i in range(9))


def test_hits_hand_computed(spark):
    """u1->{A}, u2->{A,B}: a1 = (A:2, B:1); h1 = (u1:2, u2:3);
    a2 = (A: h(u1)+h(u2) = 5, B: h(u2) = 3). Duplicate events must not
    double-count an edge."""
    import open_molecule_data_pipeline_spark.operators.graph_rank as m

    rows = [(1, 1, "A"), (2, 2, "A"), (3, 2, "B"), (4, 2, "B")]  # dup u2->B
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.event_type: r for r in m.graph_hits_authorities(spark, "x").collect()}
    finally:
        m.table = orig
    assert out["A"].in_degree == 2 and out["A"].authority_raw == 5
    assert out["B"].in_degree == 1 and out["B"].authority_raw == 3
    assert out["A"].authority_norm == 1.0
    assert out["B"].authority_norm == 0.6


def test_changepoint_finds_injected_level_shift(spark):
    """50 points at 10.0 then 50 at 20.0: the SSE-minimizing split is
    exactly k=50 with sse_split == 0 and sse_gain == the full SSE."""
    import open_molecule_data_pipeline_spark.operators.changepoint as m

    rows = [
        (i, "a", f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", 10.0 if i < 50 else 20.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        got = m.ts_changepoint_binseg(spark, "x").collect()[0]
    finally:
        m.table = orig
    assert got.n_points == 100
    assert got.split_k == 50
    assert got.sse_split == 0.0
    # total SSE of the 10/20 split series: n/4 * (diff_e2)^2 / 1e4 = 2500000/1e4...
    # exact: sum (v - 15)^2 = 100 * 25 = 2500 (in value units)
    assert got.sse_gain == 2500.0


def test_ivfpq_topk_shape_and_ordering(spark, sf_dir):
    from open_molecule_data_pipeline_spark.operators.ivfpq import (
        N_QUERIES,
        sim_ivfpq_adc_topk,
    )

    rows = sim_ivfpq_adc_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        assert all(r.neighbor_id != q for r in rs)
        assert all(r.adc_dist >= 0 for r in rs)
        assert rs[0].adc_dist <= rs[1].adc_dist <= rs[2].adc_dist


def test_ivfpq_candidates_come_from_probed_cells(spark, sf_dir):
    """Every returned neighbor's coarse cell must be one of its query's
    NPROBE probed cells — the IVF pruning contract (a bug that scored all
    cells would still pass shape checks)."""
    import open_molecule_data_pipeline_spark.operators.ivfpq as m

    v = m._vectors(spark, sf_dir)
    cent = m._centroids(v)
    d2c = F.round(F.expr(m._D2.format(a="e", b="ce")), 6)
    cd = v.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cent_id", d2c.alias("d2c")
    )
    assign = {
        r.vec_id: r.w.cent_id
        for r in cd.groupBy("vec_id")
        .agg(F.min(F.struct("d2c", "cent_id")).alias("w"))
        .collect()
    }
    from pyspark.sql import Window as W

    wq = W.partitionBy("vec_id").orderBy("d2c", "cent_id")
    mx = max(assign)
    probed: dict[int, set] = {}
    for r in (
        cd.filter(F.col("vec_id") >= mx - (m.N_QUERIES - 1))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= m.NPROBE)
        .collect()
    ):
        probed.setdefault(r.vec_id, set()).add(r.cent_id)
    for r in m.sim_ivfpq_adc_topk(spark, sf_dir).collect():
        assert assign[r.neighbor_id] in probed[r.query_id], (
            r.query_id,
            r.neighbor_id,
        )


def test_anova_f_matches_independent_formula(spark, sf_dir):
    """One-way F recomputed groupwise with plain Python from the parquet."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        profile_anova_oneway,
    )

    pdf = _events_pdf(sf_dir)
    groups = {}
    for g, sub in pdf.groupby("event_type"):
        v = [int(round(x * 100)) for x in sub.value]
        groups[g] = (len(v), sum(v), sum(x * x for x in v))
    k = len(groups)
    nn = sum(n for n, _, _ in groups.values())
    ss = sum(s for _, s, _ in groups.values())
    qq = sum(q for _, _, q in groups.values())
    tt = sum(round(s * s / n) for n, s, _ in groups.values())
    ssb = tt - ss * ss / nn
    ssw = qq - tt
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    got = profile_anova_oneway(spark, sf_dir).collect()[0]
    assert (got.n_groups, got.n_total) == (k, nn)
    assert got.f_stat == round(f, 6)
    assert 0.0 <= got.eta_sq <= 1.0
    # the identity SST = SSB + SSW must hold to rounding
    assert abs(got.ss_between + got.ss_within - (qq - ss * ss / nn) / 1e4) < 1e-2


def test_acf_constant_shift_series(spark):
    """A pure alternating series (+1, -1, ...) has acf(1) == -1 - 1/(n-1)
    ... rather than pin closed forms, pin the two structural contracts:
    lag-L pair count is n - L, and a strictly alternating series yields
    negative acf at lag 1 and positive at lag 2."""
    import open_molecule_data_pipeline_spark.operators.acf as m

    rows = [
        (i, "a", f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00",
         1.0 if i % 2 == 0 else -1.0)
        for i in range(60)
    ]
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F2.col("ts").cast("timestamp_ntz"))
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.lag: r for r in m.ts_acf_lags(spark, "x").collect()}
    finally:
        m.table = orig
    assert out[1].n_pairs == 59 and out[2].n_pairs == 58 and out[3].n_pairs == 57
    assert out[1].acf < -0.9
    assert out[2].acf > 0.9
    assert out[3].acf < -0.9


def test_adamic_adar_discounts_hub_middles(spark, sf_dir):
    """Every returned pair must be non-adjacent, have n_common >= 1, and
    its aa_ppm must equal the sum over actual common neighbors of
    round(1e6/ln(deg)) — recomputed via an independent pandas walk."""
    import math as _math

    import open_molecule_data_pipeline_spark.operators.graph_metrics as m

    edges = {(r.u, r.v) for r in m._edges(spark, sf_dir).collect()}
    nbrs: dict[int, set] = {}
    for u, vv in edges:
        nbrs.setdefault(u, set()).add(vv)
        nbrs.setdefault(vv, set()).add(u)
    got = m.graph_adamic_adar(spark, sf_dir).collect()
    assert got, "no candidate pairs at this sf"
    for r in got:
        assert (r.a, r.c) not in edges and (r.c, r.a) not in edges
        common = nbrs[r.a] & nbrs[r.c]
        assert len(common) == r.n_common >= 1
        expect = sum(round(1e6 / _math.log(len(nbrs[z]))) for z in common)
        assert r.aa_ppm == expect


def test_source_kl_nonnegative_and_identical_source_is_zero(spark):
    """KL >= 0 always (Gibbs), and a 'source' whose token distribution
    IS the corpus distribution scores (near-)zero while a disjoint-token
    source scores strictly higher."""
    import open_molecule_data_pipeline_spark.operators.corpus_weights as m

    rows = (
        [(i, "a b c d", "x", "en", 7) for i in range(8)]
        + [(100 + i, "a b c d", "y", "en", 7) for i in range(8)]
        + [(200 + i, "zz zz zz zz", "z", "en", 11) for i in range(2)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.source: r for r in m.text_source_kl_divergence(spark, "x").collect()}
    finally:
        m.table = orig
    # x and y are identical slices of the blend; z is disjoint
    assert out["x"].kl_nats == out["y"].kl_nats
    assert all(r.kl_nats >= 0 for r in out.values())
    assert out["z"].kl_nats > out["x"].kl_nats
    assert out["x"].n_vocab == out["z"].n_vocab == 5  # shared vocab grid


def test_clustering_depth_separates_layouts(spark, sf_dir):
    """The sorted layout must be (near-)perfectly clustered while the
    hashed layout must be fully overlapped — the metric's whole point."""
    from open_molecule_data_pipeline_spark.operators.skipping import (
        _N_FILES,
        layout_clustering_depth,
    )

    out = {r.layout: r for r in layout_clustering_depth(spark, sf_dir).collect()}
    srt, hsh = out["sorted"], out["hashed"]
    assert srt.n_files == hsh.n_files == _N_FILES
    # hashed: every file spans ~the full value range -> all overlap all
    assert hsh.avg_depth == float(_N_FILES)
    assert hsh.min_depth == hsh.max_depth == _N_FILES
    # sorted: adjacent files may share a boundary value, nothing more
    assert srt.max_depth <= 3
    assert srt.avg_depth < 2.0
    assert srt.min_depth >= 1


def test_mannwhitney_matches_independent_ranksum(spark, sf_dir):
    """U recomputed with a plain-Python average-rank walk; also pin the
    identities U_A + U_B == n_A·n_B and AUC == U_A/(n_A·n_B)."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        _GROUP_A,
        _GROUP_B,
        profile_mannwhitney_u,
    )

    pdf = _events_pdf(sf_dir)
    a = [int(round(x * 100)) for x in pdf[pdf.event_type == _GROUP_A].value]
    b = [int(round(x * 100)) for x in pdf[pdf.event_type == _GROUP_B].value]
    pooled = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    # average ranks in doubled units
    r2a = 0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        r2 = (i + 1) + j  # 2 * avg(1-based ranks i+1..j)
        r2a += sum(r2 for k in range(i, j) if pooled[k][1] == "a")
        i = j
    u2a = r2a - len(a) * (len(a) + 1)
    got = profile_mannwhitney_u(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.u2_a == u2a
    assert got.u2_a + got.u2_b == 2 * len(a) * len(b)
    assert got.auc == round(u2a / (2 * len(a) * len(b)), 6)


def test_nearest_centroid_f1_confusion_identities(spark, sf_dir):
    """Σ tp+fn == corpus size (every row has one true class), Σ tp+fp ==
    corpus size (every row gets one prediction), and each F1 is the
    harmonic mean of its own precision/recall."""
    from open_molecule_data_pipeline_spark.operators.feature_eval import (
        ml_nearest_centroid_f1,
    )

    rows = ml_nearest_centroid_f1(spark, sf_dir).collect()
    n = sum(r.n_true for r in rows)
    assert sum(r.tp + r.fn for r in rows) == n
    assert sum(r.tp + r.fp for r in rows) == n
    for r in rows:
        assert r.n_true == r.tp + r.fn
        if r.tp + r.fp > 0 and r.tp + r.fn > 0 and r.tp > 0:
            p, q = r.precision_, r.recall_
            assert abs(r.f1 - 2 * p * q / (p + q)) < 1e-5
        if r.tp + r.fp == 0:
            assert r.precision_ is None


def test_nearest_centroid_separable_fixture_is_perfect(spark):
    """Three well-separated clusters -> diagonal confusion, all F1 == 1."""
    import open_molecule_data_pipeline_spark.operators.feature_eval as m

    rows = []
    for i in range(30):
        lbl = i % 3
        base = {0: -0.3, 1: 0.0, 2: 0.3}[lbl]
        vec = [base + (0.001 * ((i * 7 + d) % 5)) for d in range(64)]
        rows.append((i, vec, lbl))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = m.ml_nearest_centroid_f1(spark, "x").collect()
    finally:
        m.table = orig
    assert len(out) == 3
    for r in out:
        assert r.fp == 0 and r.fn == 0 and r.f1 == 1.0


def test_assortativity_bounds_and_star_fixture(spark, sf_dir):
    """r must lie in [-1, 1]; a star graph is maximally disassortative
    (r -> -1 exactly for a pure star of >= 3 leaves... for k leaves the
    double-cover Pearson is exactly -1 since x and y are perfectly
    anti-aligned over the edge list)."""
    import open_molecule_data_pipeline_spark.operators.graph_metrics as m

    got = m.graph_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= got.assortativity <= 1.0
    assert got.n_directed_edges % 2 == 0  # double cover

    # synthetic star via a patched edge builder: center 0, leaves 1..5
    orig = m._edges
    try:
        star = spark.createDataFrame([(0, i) for i in range(1, 6)], "u long, v long")
        m._edges = lambda s, d: star
        r = m.graph_assortativity(spark, "x").collect()[0]
    finally:
        m._edges = orig
    assert r.assortativity == -1.0
    assert r.n_nodes == 6


def test_temporal_split_leakage_invariants(spark, sf_dir):
    """train_max < embargo_min <= eval_min, the embargo gap spans >= 1 day
    between train and eval, and the three splits partition the corpus."""
    from open_molecule_data_pipeline_spark.operators.sampling_splits import (
        sample_temporal_split_embargo,
    )

    out = {r.split: r for r in sample_temporal_split_embargo(spark, sf_dir).collect()}
    assert set(out) == {"train", "embargo", "eval"}
    pdf = _events_pdf(sf_dir)
    assert sum(r.n_events for r in out.values()) == len(pdf)
    tr, em, ev = out["train"], out["embargo"], out["eval"]
    assert tr.max_ts < em.min_ts <= em.max_ts < ev.min_ts
    gap_us = (ev.min_ts - tr.max_ts).total_seconds() * 1e6
    assert gap_us >= 86400000000 * 0.999  # >= ~1 day between train and eval


def test_mase_lag_chain_breaks_on_missing_hours(spark):
    """A series with a missing hour must NOT produce a naive-1 error row
    across the gap — the dense-hour-index contract."""
    import open_molecule_data_pipeline_spark.operators.acf as m
    from pyspark.sql import functions as F2

    # hours 0,1,2 then 4 (hour 3 missing): naive-1 pairs = (1,2) and... (2->4 skipped)
    rows = [
        (1, "a", "2024-01-01 00:30:00", 10.0),
        (2, "a", "2024-01-01 01:30:00", 12.0),
        (3, "a", "2024-01-01 02:30:00", 14.0),
        (4, "a", "2024-01-01 04:30:00", 16.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F2.col("ts").cast("timestamp_ntz"))
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        got = m.ts_seasonal_naive_mase(spark, "x").collect()[0]
    finally:
        m.table = orig
    assert got.n_naive == 2  # (h0->h1), (h1->h2); the h2->h4 jump is excluded
    assert got.n_seasonal == 0  # no 24h-back bucket exists
    assert got.mae_naive1 == 2.0


def test_stream_ttest_twin_equals_batch(spark, sf_dir):
    """The streaming twin's one-row state must reproduce the batch t-test
    exactly (same sufficient statistic, same final arithmetic)."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        profile_welch_ttest,
    )
    from open_molecule_data_pipeline_spark.operators.streaming_twin import (
        stream_ttest_twin,
    )

    batch = profile_welch_ttest(spark, sf_dir).collect()[0]
    stream = stream_ttest_twin(spark, sf_dir).collect()[0]
    assert batch.asDict() == stream.asDict()


def test_wordpiece_hand_worked_segmentation(spark):
    """Tiny corpus where the greedy longest-match segmentation is worked
    by hand: vocab singles + top substrings; 'lowest' -> low|e|s|t etc.
    Also pins that every word segments fully (all chars are in-vocab)."""
    import open_molecule_data_pipeline_spark.operators.wordpiece as m

    rows = [(1, "hello world hell low", "en", "x", 1),
            (2, "low lower lowest hell", "en", "x", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        got = m.text_wordpiece_apply(spark, "x").collect()[0]
    finally:
        m.table = orig
    # with TOP_PIECES=32 every 2-4-gram of this tiny corpus is in-vocab,
    # so greedy longest-match takes 4-char bites: hell|o worl|d hell low
    # low lowe|r lowe|st hell -> 12 pieces / 8 words
    assert got.n_words == 8
    assert got.n_pieces == 12
    assert got.pieces_per_word == round(12 / 8, 6)


def test_ivfpq_recall_bounds_and_ground_truth_shape(spark, sf_dir):
    """recall in {0, 1/3, 2/3, 1} per query; n_hit <= 3; and the exact
    ground truth must rank the self-match out."""
    from open_molecule_data_pipeline_spark.operators.ivfpq import (
        N_QUERIES,
        sim_ivfpq_recall,
    )

    rows = sim_ivfpq_recall(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_hit <= 3
        assert r.recall == round(r.n_hit / 3, 6)


def test_xcorr_self_correlation_is_one(spark):
    """When the 'two' series are copies of each other, xcorr at lag 0
    must be exactly 1 and the lag-0 pair count equals the bucket count."""
    import open_molecule_data_pipeline_spark.operators.acf as m
    from pyspark.sql import functions as F2

    rows = []
    for h in range(12):
        for et in ("click", "purchase"):
            # same bucket means for both series, varying by hour
            rows.append((h * 2 + (et == "click"), et,
                         f"2024-01-01 {h:02d}:15:00", 10.0 + (h % 5)))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F2.col("ts").cast("timestamp_ntz"))
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.lag: r for r in m.ts_cross_correlation(spark, "x").collect()}
    finally:
        m.table = orig
    assert out[0].xcorr == 1.0
    assert out[0].n_pairs == 12
    # shifted lags lose one pair per step off each edge
    assert out[1].n_pairs == 11 and out[-1].n_pairs == 11


def test_levene_matches_independent_formula(spark, sf_dir):
    """Levene W recomputed with plain Python using the same quantization
    pipeline (z4 = round(|v_e2 - mean|*100))."""
    from open_molecule_data_pipeline_spark.operators.inference_stats import (
        profile_levene_test,
    )

    pdf = _events_pdf(sf_dir)
    groups = {}
    for gname, sub in pdf.groupby("event_type"):
        v = [int(round(x * 100)) for x in sub.value]
        m = sum(v) / len(v)
        z = [round(abs(x - m) * 100) for x in v]
        groups[gname] = (len(z), sum(z), sum(x * x for x in z))
    k = len(groups)
    nn = sum(n for n, _, _ in groups.values())
    ss = sum(s for _, s, _ in groups.values())
    qq = float(sum(q for _, _, q in groups.values()))
    tt = sum(round(s * s / n) for n, s, _ in groups.values())
    w = ((tt - ss * ss / nn) / (k - 1)) / ((qq - tt) / (nn - k))
    got = profile_levene_test(spark, sf_dir).collect()[0]
    assert (got.n_groups, got.n_total) == (k, nn)
    assert got.levene_w == round(w, 6)


def test_vacuum_report_conservation_and_retention(spark, sf_dir):
    """Statuses partition the ops log (counts sum to the log size), every
    version >= the watermark has zero 'expired' rows, and version 6 (the
    head) is never expired."""
    import pyarrow.parquet as _pq

    from open_molecule_data_pipeline_spark.operators.cdc import (
        _VACUUM_KEEP,
        cdc_vacuum_report,
    )

    rows = cdc_vacuum_report(spark, sf_dir).collect()
    orders = _pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    assert sum(r.n_ops for r in rows) == orders.num_rows
    for r in rows:
        if r.status == "expired":
            # an op expires only if its SUCCESSOR is <= the watermark,
            # so expired ops live strictly below it
            assert r.version < _VACUUM_KEEP
        assert r.status in ("retained", "expired", "dup_superseded")


def test_group_kfold_users_are_fold_pure(spark, sf_dir):
    """The group contract: folds partition USERS — the per-fold distinct
    user counts must sum to the corpus distinct user count (impossible if
    any user straddled folds)."""
    from open_molecule_data_pipeline_spark.operators.readability import (
        sample_group_kfold,
    )

    rows = sample_group_kfold(spark, sf_dir).collect()
    pdf = _events_pdf(sf_dir)
    assert sum(r.n_events for r in rows) == len(pdf)
    assert sum(r.n_users for r in rows) == pdf.user_id.nunique()


def test_modularity_region_beats_hash_and_bounds(spark, sf_dir):
    """Q in [-1, 1]; the generative (region) partition must score far
    above the null hash partition, which sits near 0."""
    from open_molecule_data_pipeline_spark.operators.graph_metrics import (
        graph_modularity,
    )

    out = {r.partition_name: r for r in graph_modularity(spark, sf_dir).collect()}
    reg, hsh = out["region"], out["hash"]
    assert -1.0 <= hsh.modularity_q <= 1.0
    assert -1.0 <= reg.modularity_q <= 1.0
    assert reg.modularity_q > 0.5
    assert abs(hsh.modularity_q) < 0.25
    assert reg.m_edges == hsh.m_edges


def test_runs_test_detects_trend_and_oscillation(spark):
    """A monotone series has exactly 2 runs (z << 0); a perfectly
    alternating series has the maximum run count (z >> 0)."""
    import open_molecule_data_pipeline_spark.operators.inference_stats as m
    from pyspark.sql import functions as F2

    def run(values, et):
        return [(i, et, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", v)
                for i, v in enumerate(values)]

    rows = run([float(i) for i in range(40)], "trend") + run(
        [1.0 if i % 2 == 0 else 9.0 for i in range(40)], "osc"
    )
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F2.col("ts").cast("timestamp_ntz"))
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.event_type: r for r in m.profile_runs_test(spark, "x").collect()}
    finally:
        m.table = orig
    assert out["trend"].n_runs == 2 and out["trend"].z_stat < -5
    assert out["osc"].n_runs == 40 and out["osc"].z_stat > 5
    # median-tie rows dropped: the 40-pt trend keeps 20+20 (even n, exact
    # interpolated median excludes nobody)
    assert out["trend"].n_above == out["trend"].n_below == 20


def test_gini_bounds_and_extremes(spark):
    """Equal values -> G == 0 exactly; a single holder of all value among
    n participants -> G == (n-1)/n."""
    import open_molecule_data_pipeline_spark.operators.inference_stats as m

    rows = [(i, "equal", 5.0) for i in range(10)]
    rows += [(100 + i, "concentrated", 0.01 if i < 9 else 1000.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.event_type: r
               for r in m.profile_gini_coefficient(spark, "x").collect()}
    finally:
        m.table = orig
    assert out["equal"].gini == 0.0
    # 9 holders of 1 cent + 1 holder of 100000 cents: G -> (n-1)/n * (1 - tiny)
    assert 0.85 < out["concentrated"].gini < 0.9


def test_exponential_histogram_two_x_error_contract(spark, sf_dir):
    """The sketch's guarantee: the bucket upper bound is >= the exact
    quantile and < 2x(exact+1) — the base-2 bucket contract; bucket count
    stays <= 64 per series regardless of row count."""
    from open_molecule_data_pipeline_spark.operators.stats import (
        agg_exponential_histogram,
    )

    rows = agg_exponential_histogram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_buckets <= 64
        assert r.hist_p50_le >= r.exact_p50
        # upper bound of the crossing bucket is < 2*(true quantile)+epsilon
        assert r.hist_p50_le <= 2 * r.exact_p50 + 0.02
        assert r.hist_p95_le >= r.hist_p50_le


def test_ngram_novelty_extremes(spark):
    """A doc sharing every shingle with a twin scores 0; a doc with
    wholly unique text scores 1; within-doc repetition doesn't inflate
    counts (distinct shingles per doc)."""
    import open_molecule_data_pipeline_spark.operators.dedup as m

    rows = [
        (1, "a b c d e", "en", "x", 9),
        (2, "a b c d e", "en", "x", 9),          # exact twin of doc 1
        (3, "q r s t u v", "en", "x", 11),        # wholly unique
        (4, "m n o m n o m n o", "en", "x", 17),  # self-repeating, unique
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = m.table
    try:
        m.table = lambda s, d, n: df
        out = {r.doc_id: r for r in m.text_ngram_novelty(spark, "x").collect()}
    finally:
        m.table = orig
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    # doc 4: shingles {m n o, n o m, o m n} distinct -> 3 grams, all unique
    assert out[4].n_grams == 3 and out[4].novelty == 1.0
