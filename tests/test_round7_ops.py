"""Round-7 targeted tests (VERDICT r6 tasks).

Oracle parity for the r7 additions is covered by the registry-wide sweep
in test_oracle_parity.py; these tests pin the properties the verdict
asked for beyond value equality: plan shapes that survive scale, the
no-collect invariant, and the TWS dispatch contract.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

SF = "/root/testdata/sf0.001"
OPERATORS = (
    Path(__file__).resolve().parent.parent
    / "open_molecule_data_pipeline_spark"
    / "operators"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# VERDICT r6 #7: zero driver-side collect in operator code
# --------------------------------------------------------------------------


def test_no_collect_in_operator_sources():
    """No silent driver-side collect on operator data paths. A collect
    whose result set is BOUNDED BY CONSTRUCTION (independent of corpus
    size) may be allowlisted by carrying a ``# bounded-collect:``
    marker with the boundedness argument on the same line — r16
    precedent: louvain's coarsened graph is <= 64 nodes because level-0
    community ids live in the seed domain and moves never mint new
    ids."""
    offenders = []
    for path in sorted(OPERATORS.glob("*.py")):
        src = path.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"\.collect\(\)", line) and "# bounded-collect:" not in line:
                offenders.append(f"{path.name}:{i}")
    assert not offenders, f"driver-side collect in operators/: {offenders}"


# --------------------------------------------------------------------------
# VERDICT r6 #2: sampled fixed-K coarse quantizer
# --------------------------------------------------------------------------


def test_sampled_quantizer_centroid_pick_is_bounded_topk(spark):
    """The K_CENT centroid draw must be a bounded top-k
    (TakeOrderedAndProject), never a full sort of the corpus."""
    from open_molecule_data_pipeline_spark.operators.similarity import (
        K_CENT,
        _sampled_scored,
    )

    scored = _sampled_scored(spark, SF)
    plan = _plan(scored)
    assert "TakeOrderedAndProject" in plan
    # the broadcast side is the centroid set
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert K_CENT == 32


def test_sampled_quantizer_assignment_is_linear_in_corpus(spark):
    """Fixed K => the scored relation has exactly n * min(K_CENT, n) rows
    (vs n * sqrt(n) for the stride quantizer) — the linear-assignment
    property the verdict ordered."""
    from open_molecule_data_pipeline_spark.operators.similarity import (
        K_CENT,
        _sampled_scored,
    )
    from open_molecule_data_pipeline_spark.catalog import table

    n = table(spark, SF, "embeddings").count()
    rows = _sampled_scored(spark, SF).count()
    assert rows == n * min(K_CENT, n)


def test_sampled_quantizer_recall_holds_vs_sqrtn(spark):
    """Quality gate: at equal-or-larger probe fraction the fixed-K index
    must stay within 0.15 mean recall of the sqrt(n) quantizer (they are
    statistically interchangeable on this corpus; a collapse to ~0 would
    mean the probe/assign wiring is broken)."""
    from open_molecule_data_pipeline_spark.registry import load_all

    qs = load_all()
    base = qs["sim_ivf_recall"].fn(spark, SF).toPandas()
    samp = qs["sim_ivf_sampled_quantizer"].fn(spark, SF).toPandas()
    assert abs(samp.recall.mean() - base.recall.mean()) <= 0.15


# --------------------------------------------------------------------------
# VERDICT r6 #6: two-stage weighted mean twin
# --------------------------------------------------------------------------


def test_twostage_weighted_mean_has_partial_agg_and_no_python(spark):
    from open_molecule_data_pipeline_spark.registry import load_all

    df = load_all()["agg_weighted_mean_twostage"].fn(spark, SF)
    plan = _plan(df)
    assert "HashAggregate" in plan  # partial + final pairs
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage leaked into the twin: {marker}"


def test_twostage_matches_udaf(spark):
    """The twin and the UDAF must agree row-for-row (same oracle, but
    assert engine-vs-engine too so a drift in either is caught locally)."""
    from open_molecule_data_pipeline_spark.registry import load_all

    qs = load_all()
    a = (
        qs["udaf_pandas_weighted_mean"].fn(spark, SF)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    b = (
        qs["agg_weighted_mean_twostage"].fn(spark, SF)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert a.equals(b)


# --------------------------------------------------------------------------
# VERDICT r6 #5: batched BPE
# --------------------------------------------------------------------------


def test_batched_bpe_kept_pairs_are_disjoint(spark):
    """Within a sweep, no token may appear in two applied merges (incl.
    the merged output token) — the property that makes the batched
    replacements commute."""
    from open_molecule_data_pipeline_spark.registry import load_all

    out = load_all()["text_bpe_train_batched"].fn(spark, SF).toPandas()
    for sweep, grp in out.groupby("sweep"):
        used: set[str] = set()
        for _, row in grp.iterrows():
            toks = {row.tok_a, row.tok_b, f"{row.tok_a}_{row.tok_b}"}
            assert not (toks & used), f"sweep {sweep}: overlapping merge {toks}"
            used |= toks


def test_batched_bpe_single_rewrite_pass_per_sweep(spark):
    """Bounded merge count and the greedy frequency order per sweep
    (rank order == freq desc within each sweep's kept set)."""
    from open_molecule_data_pipeline_spark.operators.corpus_ops import (
        _BPE_BATCH,
        _BPE_SWEEPS,
        text_bpe_train_batched,
    )

    df = text_bpe_train_batched(spark, SF)
    out = df.toPandas()
    # <= because tiny corpora can yield fewer conflict-free merges
    assert len(out) <= _BPE_SWEEPS * _BPE_BATCH
    for _, grp in out.groupby("sweep"):
        assert list(grp.sort_values("rank").freq) == sorted(grp.freq, reverse=True)


# --------------------------------------------------------------------------
# VERDICT r6 #3: real transformWithStateInPandas path
# --------------------------------------------------------------------------


def test_tws_real_branch_runs_when_protobuf_present(spark):
    """Executes the REAL transformWithStateInPandas branch (not the
    applyInPandasWithState fallback) whenever google.protobuf is
    importable. In sandboxes without protobuf this skips — the dispatch
    itself is covered by test_streaming.py."""
    from open_molecule_data_pipeline_spark.operators import streaming_twin as st

    if not st._tws_available():
        pytest.skip("google.protobuf not importable: TWS runner cannot start")
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in st.stream_tws_user_stats(spark, SF).collect()
    }
    assert st.LAST_TWS_DISPATCH == "tws"
    assert got  # non-empty per-user stats


def test_tws_dispatch_records_branch(spark):
    """LAST_TWS_DISPATCH mirrors the availability probe after a run."""
    from open_molecule_data_pipeline_spark.operators import streaming_twin as st

    st.stream_tws_user_stats(spark, SF).collect()
    want = "tws" if st._tws_available() else "fallback"
    assert st.LAST_TWS_DISPATCH == want
