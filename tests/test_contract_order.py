"""The driver's correctness gate samples the FIRST 50 entries of
``__spark_entry__.queries()`` — these tests pin the properties that make
that window representative: every operator family appears, every sampled
entry has an oracle, and non-contract registry entries stay out."""

from __future__ import annotations

from collections import Counter

from open_molecule_data_pipeline_spark.registry import (
    CONTRACT_ORDER,
    contract_specs,
    load_all,
)

WINDOW = 50

# one representative tag per operator family that must be driver-visible
FAMILY_TAGS = (
    "agg",
    "filter",
    "join",
    "sort",
    "subquery",
    "window",
    "setop",
    "functions",
    "dedup",
    "similarity",
    "text",
    "timeseries",
    "cdc",
    "graph",
    "ml",
    "multimodal",
    "sample",
    "formats",
    "streaming",
    "chemistry",
)


def _cumulative_green_counts() -> dict[str, int]:
    """query -> number of green rows across all committed CORRECTNESS files."""
    import glob
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("rows_match") and not row.get("err"):
                    counts[name] = counts.get(name, 0) + 1
    return counts


def test_every_family_driver_visible_or_cumulatively_proven():
    """Every operator family must be in the head-50 window OR already be
    externally proven by >= 2 driver-green rows in past rounds. (r5 spends
    the whole window on never-sampled + changed queries to close cumulative
    coverage; rotated-out family sentinels must carry historical proof.)"""
    specs = contract_specs()
    head = list(specs.values())[:WINDOW]
    seen = {t for spec in head for t in spec.tags}
    rotated_out = [t for t in FAMILY_TAGS if t not in seen]
    green = _cumulative_green_counts()
    unproven = []
    for tag in rotated_out:
        n_green = sum(
            green.get(name, 0)
            for name, spec in specs.items()
            if tag in spec.tags
        )
        if n_green < 2:
            unproven.append((tag, n_green))
    assert not unproven, (
        f"families neither in the driver window nor cumulatively proven: "
        f"{unproven}"
    )


def test_first_window_all_have_oracles():
    head = list(contract_specs().items())[:WINDOW]
    missing = [name for name, spec in head if not spec.oracle]
    assert not missing, f"oracle-less queries inside the driver window: {missing}"


def test_contract_has_no_oracle_less_entries():
    """VERDICT r1 #2: every contract entry must be driver-checkable."""
    missing = [n for n, s in contract_specs().items() if not s.oracle]
    assert not missing, f"contract entries without oracles: {missing}"


def test_registry_has_no_rows_only_queries():
    """VERDICT r4 #6: the last two rows-only listings became verdict
    queries — every registered query is now oracle-checked and exposed."""
    specs = load_all()
    oracle_less = [n for n, s in specs.items() if not s.oracle]
    assert not oracle_less, f"rows-only registry entries: {oracle_less}"
    exposed = set(contract_specs())
    assert "mllib_minhash_pairs" in exposed
    assert "mllib_brp_neighbors" in exposed


def test_contract_order_has_no_duplicates():
    """ADVICE r4: a duplicate silently shifts later entries relative to the
    documented head-50 bookkeeping — contract_specs dedupes, so lint it."""
    dupes = [n for n, c in Counter(CONTRACT_ORDER).items() if c > 1]
    assert not dupes, f"duplicate CONTRACT_ORDER entries: {dupes}"


def test_contract_preserves_all_other_queries():
    specs = load_all()
    expected = {n for n, s in specs.items() if s.contract}
    assert set(contract_specs()) == expected


# Queries whose implementation CHANGED this round: the only
# already-driver-green names allowed inside the head-50 window (re-proof
# slots). Update per round alongside the CONTRACT_ORDER head comment.
CHANGED_THIS_ROUND = {
    # r9: array outputs flattened to comma-joined strings so the driver
    # canonicalizer can hash them (VERDICT r8 #1) — never driver-green,
    # listed for documentation only.
    "func_array_membership",
    # r8 semantic rewrites whose driver rows predate the change
    # (VERDICT r8 "What's missing" #2): recursion bound carry, BPE
    # fold-automaton, narrow-agg split, BM25 corpus stats off doc lengths.
    "recursive_month_spine",
    "text_bpe_train_batched",
    "text_bpe_train_merges",
    "agg_approx_distinct",
    "text_bm25_topk",
    # r8: xxhash64-rekeyed dedup/corpus internals
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_duplicate_spans",
    "dedup_paragraphs",
    "dedup_prefix_filter_join",
    "dedup_boilerplate_lines",
    "text_decontamination_overlap",
    "corpus_pipeline_report",
    # r8: DECIMAL(38,0) accumulator hardening
    "ml_kmeans_lloyd_3iter",
    "ml_logreg_irls",
    "ml_svm_subgradient",
    "ml_pca_power_iteration",
    "ml_ols_normal_equations",
    "ml_decision_stump",
    "ml_auc_roc",
    "ml_pr_curve",
    "ts_downsample_lttb",
    "sim_pq_encode",
    "graph_clustering_coefficient",
    "text_zipf_coverage",
    "agg_weighted_mean_twostage",
    # r8: sweeper guard on live streaming MV result dirs
    "stream_mv_twin",
    # r8: hint-only forced-broadcast drops (plan-only; AQE keeps identical
    # local plans). Two more — join_local_supplier_volume,
    # join_theta_price_band — did not fit the window and sit at 51-52.
    "text_lm_unigram_score",
    "sample_hash_topk_per_group",
    "join_returned_revenue",
    "agg_promo_share",
    "agg_supplier_variety",
    "join_large_orders",
    "join_disjunctive_predicates",
    "join_volume_shipping",
    "agg_market_share",
    "agg_profit_by_nation_year",
    "join_top_supplier",
    "subquery_small_quantity_revenue",
    "join_waiting_suppliers",
    "join_promo_stock_suppliers",
    "text_dsir_weights",
    "sample_importance_resample",
    "graph_jaccard_neighbors",
    "cdc_deletion_vectors",
    "join_shipping_priority",
    "join_salted_skew",
    "join_bloom_semijoin",
}


def test_window_spends_no_slot_on_unchanged_green_queries():
    """VERDICT r6 #1 discipline, codified: every head-50 slot must be a
    first-time verification (never driver-green) or an explicit re-proof
    of code changed this round — an unchanged already-green query in the
    window wastes a slot the backlog needs."""
    green = set(_cumulative_green_counts())
    head = list(contract_specs())[:WINDOW]
    wasted = [n for n in head if n in green and n not in CHANGED_THIS_ROUND]
    assert not wasted, f"window slots on unchanged already-green queries: {wasted}"


def test_canon_rejects_nested_cells():
    """The local canon must fail on exactly the result shapes the external
    harness rejects (VERDICT r8: the stringify-first canon passed a nested
    query the driver errored on). The driver-parity probe in
    tests/_compare.py sorts RAW columns first — pandas throws TypeError on
    ndarray cells there, same as the driver."""
    import numpy as np
    import pandas as pd
    import pytest

    from ._compare import canon

    flat = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    assert canon(flat) == [("1", "x"), ("2", "y")]

    nested = pd.DataFrame(
        {"a": [np.array(["u", "v"]), np.array(["w"])], "b": [1, 2]}
    )
    with pytest.raises(TypeError):
        canon(nested)


def test_contract_order_is_exhaustive():
    """VERDICT r9 #5: every registered contract query must appear
    EXPLICITLY in CONTRACT_ORDER (positions 51+ are fine). Before r10 the
    registry fell back to registration order for unlisted names — correct,
    but a future addition that forgot the rotation queue could silently
    sit wherever module import order put it. Now omission is a lint
    failure, so placement is always a deliberate decision."""
    specs = load_all()
    listed = set(CONTRACT_ORDER)
    missing = [n for n, s in specs.items() if s.contract and n not in listed]
    assert not missing, (
        f"registered queries absent from CONTRACT_ORDER: {missing} — "
        "add each at an explicit position (head-50 if new this round)"
    )
    # and no phantom names that registration no longer backs
    phantom = [n for n in CONTRACT_ORDER if n not in specs]
    assert not phantom, f"CONTRACT_ORDER names with no registration: {phantom}"
