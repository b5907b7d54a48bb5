"""Physical-plan property guards: pushdown, pruning, broadcast, codegen.

These assert the *shape* of execution, not timings — the properties that
decide whether a query survives a 100x scale-up. A regression here (filter
stops pushing, a dim join stops broadcasting) is a performance bug even
while results stay correct.
"""

from __future__ import annotations

from open_molecule_data_pipeline_spark.registry import load_all

SPECS = load_all()


def _plan(spark, sf_dir, name) -> str:
    df = SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    # projection pruning: the scan must not read the key columns Q1 ignores
    assert "l_orderkey" not in plan
    assert "l_partkey" not in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 4


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi_order_priority")
    assert "LeftSemi" in plan


def test_anti_join_stays_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_anti_customers_without_orders")
    assert "LeftAnti" in plan


def test_topk_uses_bounded_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_top10_orders")
    # global top-k must not be a full global sort
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation_present(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    # two HashAggregate levels = map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_no_python_in_relational_paths(spark, sf_dir):
    for name in (
        "agg_pricing_summary",
        "dedup_minhash_lsh_pairs",
        "text_quality_score",
        "sim_topk_bruteforce",
        "ts_asof_latest_order",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_whole_stage_codegen_active(spark, sf_dir):
    import contextlib
    import io

    df = SPECS["agg_pricing_summary"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    assert "WholeStageCodegen" in out
    assert "Found" in out  # "Found N WholeStageCodegen subtrees"
