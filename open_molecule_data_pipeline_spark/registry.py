"""Central registry of named queries with their DuckDB oracle twins.

Every operator the engine claims is registered here via :func:`register`,
giving one source of truth for ``__spark_entry__.queries()`` /
``oracle_sql()``, the pytest parity suite, and ``bench.py``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    contract: bool = True  # expose through __spark_entry__.queries()


QUERIES: dict[str, QuerySpec] = {}

# The driver's correctness gate samples the FIRST 50 entries of
# ``__spark_entry__.queries()``, so the contract ordering is curated and
# ROTATED each round: the window keeps every query ADDED or CHANGED this
# round, and fills the remaining slots with queries the external gate has
# never sampled. Cumulative driver-verified through r4: 171 queries (union
# of CORRECTNESS_r01..r04 green rows); the r5 window verified the 8
# r5-changed entries plus the final 42 never-sampled pre-r5 queries. The r6
# window below = the 27 queries ADDED in r6 (every one locally verified by
# the full 305-query sf0.01 driver-sim sweep), then the 7 sim_* queries
# whose implementations CHANGED in r5 but sat past position 50 (ADVICE r4
# flagged exactly this bypass pattern), then the r5-added post-window
# queries that have never been driver-sampled, riskiest families first
# (streaming/ingest/multimodal/graph/iterative-ML before scalar tails).
# Overflow past position 50 (the r5 scalar/agg/profile tails) queues for
# r7. Operator families whose sentinels rotate OUT
# of the window are already externally proven by >= 2 green rows in past
# CORRECTNESS files; tests/test_contract_order.py enforces exactly that
# invariant (in-window OR cumulatively green). Everything else follows in
# registration order. Names listed here but not registered are ignored
# (keeps the list forward-compatible while modules evolve).
CONTRACT_ORDER: tuple[str, ...] = (
    # --- queries ADDED in r6 (new code: externally verified this round) ---
    "layout_zonemap_pruning",  # min/max file skipping, DPP-pruned stored scan
    "join_bloom_semijoin",  # runtime Bloom filter on fact side + FP audit
    "text_html_strip",  # markup removal round-trip proof
    "text_unicode_clean",  # NFC + control strip (pandas UDF vs nfc_normalize)
    "text_flesch_readability",  # integer-exact readability scoring
    "text_feature_hashing",  # 256-bucket hashing trick + collision audit
    "text_zipf_coverage",  # head-coverage profile, bounded top-k + theta rank
    "ml_decision_stump",  # histogram Gini split finding, exact-int score
    "ml_knn_classify",  # int-quantized dot kNN majority vote
    "ml_pr_curve",  # threshold-sweep precision/recall
    "graph_clustering_coefficient",  # per-node triangles/wedges ppm
    "graph_jaccard_neighbors",  # distance-2 link prediction top-20
    "profile_fd_violations",  # functional-dependency discovery
    "profile_value_patterns",  # mask-based format inference top-5
    "format_fixed_width",  # fixed-width encode/parse round-trip
    "format_csv_quoted_multiline",  # RFC-4180 hostile CSV round-trip
    "ts_interval_union_coverage",  # per-user interval union / uptime
    "sample_systematic_stride",  # every-97th in md5 order, two-pass rank
    "mm_audio_silence_trim",  # edge-only low-energy trim, real WAV path
    "stream_union_twin",  # two-source fan-in union before stateful agg
    "cdc_deletion_vectors",  # positional DV merge-on-read
    "layout_compaction_binpack",  # real compaction rewrite, lossless
    "func_soundex_phonetic",  # Spark soundex vs from-scratch SQL spec
    "ml_ndcg_linear",  # exact-rational-discount ranking eval
    "ts_asof_nearest_click",  # nearest-direction as-of with tolerance gate
    "window_moving_regression",  # trailing-frame least-squares slope
    "mm_video_scene_cuts",  # shot-boundary detection via AVI demux
    "ts_downsample_lttb",  # fixed-anchor LTTB, exact int cross products
    "ts_markov_transitions",  # per-user event transition matrix
    # --- CHANGED in r5, never re-sampled since (spread guards / sqrt(n)
    #     coarse quantizer — locally parity-verified; externally proven now) ---
    "sim_ivf_topk",
    "sim_ivf_persisted",
    "sim_ivf_recall",
    "sim_topk_bruteforce",
    "sim_ann_lsh_topk",
    "sim_pq_encode",
    "sim_pq_adc_topk",
    # --- ADDED in r5 past the window; never driver-sampled. Riskiest
    #     first: real-runtime twins, ingest demos, multimodal, iterative
    #     graph/ML trainers, dedup/text composites, then scalar tails. ---
    "stream_late_drop_twin",
    "stream_static_join_twin",
    "stream_chained_agg_twin",
    "ingest_warc_demo",
    "ingest_arrow_demo",
    "ingest_http_offset_demo",
    "mm_image_resize_nn",
    "mm_image_dhash_neardup",
    "mm_audio_fingerprint_neardup",
    "graph_kcore",
    "graph_bfs_khop",
    "graph_label_propagation",
    "graph_pagerank_personalized",
    "dedup_semantic_clusters",
    "dedup_lsh_recall_vs_exact",
    "dedup_paragraphs",
    "dedup_prefix_filter_join",
    "dedup_duplicate_spans",
    "dedup_url_normalize",
    "text_winnowing_fingerprints",
    "text_bpe_train_merges",
    "text_dsir_weights",
    "text_langid_confusion",
    "text_keyword_blocklist",
    "ml_kmeans_lloyd_3iter",
    "ml_logreg_irls",
    "ml_svm_subgradient",
    "ml_pca_power_iteration",
    "ml_naive_bayes_confusion",
    "ml_ols_normal_equations",
    "ml_auc_roc",
    "ml_calibration_bins",
    "udaf_pandas_weighted_mean",
    "cdc_incremental_agg_maintenance",
    "corpus_pipeline_report",
    "join_skyline_pareto",
    "join_semijoin_reduction",
    "join_spatial_grid",
    "window_pattern_vshape",
    "window_sliding_median",
    "ts_seasonal_decompose",
    "ts_attribution_last_touch",
    "ts_cusum_drift",
    "ts_cohort_retention_matrix",
    "sample_shuffle_shards",
    "sample_importance_resample",
    "sample_contrastive_triplets",
    "sample_poisson_bootstrap",
    "agg_approx_percentile_verdict",
    "agg_misra_gries_verdict",
    "agg_kmv_intersect",
    "agg_bitmap_distinct",
    "agg_winsorized_stats",
    "profile_benford_first_digit",
    "profile_entropy_columns",
    "profile_chi2_independence",
    "layout_hilbert_key",
    "func_listagg_group",
    "func_aes_column_crypto",
    "func_xpath_extract",
    # --- r7 queue: family sentinels for future re-verification ---
    "stream_tws_user_stats",
    "ingest_chembl_demo",
    "dedup_clusters_twostar",
    "mllib_minhash_pairs",
    "mllib_brp_neighbors",
    "udf_pandas_logistic_score",
    "stream_mv_twin",
    "format_bucketed_join",
    "sort_top10_orders",
    "subquery_above_avg_balance",
    "text_quality_filter",
    "setop_union_missing_cols",
    "cdc_scd2_pointintime",
    "mm_frame_sample",
    "sample_hash_topk_per_group",
    "join_salted_skew",
    "agg_salted_skew",
    "molecule_descriptors_demo",
    "mm_audio_frames",
    "join_lateral_latest_order",
    "join_relational_division",
    "join_event_cooccurrence",
    "join_null_safe_eq",
    "func_higher_order_arrays",
    "window_running_revenue",
    "window_nth_value",
    "window_count_distinct_over",
    "window_lag_ship_gap",
    "window_rank_parts",
)


def contract_specs() -> dict[str, QuerySpec]:
    """Registry filtered to contract entries, in curated-first order."""
    specs = load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in CONTRACT_ORDER:
        spec = specs.get(name)
        if spec is not None and spec.contract:
            ordered[name] = spec
    for name, spec in specs.items():
        if spec.contract and name not in ordered:
            ordered[name] = spec
    return ordered

_QUERY_MODULES = (
    "open_molecule_data_pipeline_spark.operators.relational",
    "open_molecule_data_pipeline_spark.operators.tpch_extra",
    "open_molecule_data_pipeline_spark.operators.tpch_extra2",
    "open_molecule_data_pipeline_spark.operators.scalar_funcs",
    "open_molecule_data_pipeline_spark.operators.extra_funcs",
    "open_molecule_data_pipeline_spark.operators.funcs_extra2",
    "open_molecule_data_pipeline_spark.operators.funcs_extra3",
    "open_molecule_data_pipeline_spark.operators.ml_extra",
    "open_molecule_data_pipeline_spark.operators.semantics_extra",
    "open_molecule_data_pipeline_spark.operators.setops_extra",
    "open_molecule_data_pipeline_spark.operators.stats",
    "open_molecule_data_pipeline_spark.operators.mllib_lsh",
    "open_molecule_data_pipeline_spark.operators.cdc",
    "open_molecule_data_pipeline_spark.operators.graph",
    "open_molecule_data_pipeline_spark.operators.windows",
    "open_molecule_data_pipeline_spark.operators.windows_extra",
    "open_molecule_data_pipeline_spark.operators.timeseries",
    "open_molecule_data_pipeline_spark.operators.dedup",
    "open_molecule_data_pipeline_spark.operators.segments",
    "open_molecule_data_pipeline_spark.operators.spatial",
    "open_molecule_data_pipeline_spark.operators.similarity",
    "open_molecule_data_pipeline_spark.operators.text",
    "open_molecule_data_pipeline_spark.operators.text_pipeline",
    "open_molecule_data_pipeline_spark.operators.training_extra",
    "open_molecule_data_pipeline_spark.operators.corpus_ops",
    "open_molecule_data_pipeline_spark.operators.corpus_refinery",
    "open_molecule_data_pipeline_spark.operators.retrieval",
    "open_molecule_data_pipeline_spark.operators.linkage",
    "open_molecule_data_pipeline_spark.operators.layout",
    "open_molecule_data_pipeline_spark.operators.pq",
    "open_molecule_data_pipeline_spark.operators.multimodal",
    "open_molecule_data_pipeline_spark.operators.chemistry",
    "open_molecule_data_pipeline_spark.operators.file_formats",
    "open_molecule_data_pipeline_spark.operators.skipping",
    "open_molecule_data_pipeline_spark.operators.text_clean",
    "open_molecule_data_pipeline_spark.operators.ml_eval",
    "open_molecule_data_pipeline_spark.operators.graph_metrics",
    "open_molecule_data_pipeline_spark.operators.dq_extra",
    "open_molecule_data_pipeline_spark.operators.formats_extra",
    "open_molecule_data_pipeline_spark.operators.ts_extra2",
    "open_molecule_data_pipeline_spark.operators.lakehouse",
    "open_molecule_data_pipeline_spark.operators.funcs_extra4",
    "open_molecule_data_pipeline_spark.operators.streaming_twin",
    "open_molecule_data_pipeline_spark.operators.ingest_demo",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    contract: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, tuple(tags), bench, contract)
        return fn

    return deco


LOAD_ERRORS: dict[str, str] = {}


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry.

    A module that fails to import (missing optional dep, environment skew)
    costs only its own queries, not the whole driver contract; failures are
    recorded in ``LOAD_ERRORS`` for inspection.
    """
    import warnings

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - env-dependent
            LOAD_ERRORS[mod] = repr(exc)
            warnings.warn(
                f"query module {mod} failed to import; its queries are "
                f"missing from the contract: {exc!r}",
                RuntimeWarning,
                stacklevel=2,
            )
    return QUERIES
