"""Targeted round-6 assertions beyond oracle parity: plan shapes and the
semantic guarantees the hashes alone don't spell out."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_molecule_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

SPECS = load_all()


def test_zonemap_scan_is_dynamically_pruned(spark):
    """The stored-table scan must carry a dynamicpruning PartitionFilter —
    the zone-map decision physically skips files, not just rows."""
    df = SPECS["layout_zonemap_pruning"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]
    # and the row predicate is pushed into the surviving files' scan
    assert "GreaterThanOrEqual(v,12000)" in plan


def test_bloom_semijoin_one_sided_guarantee(spark):
    """Bloom filters never produce false negatives: candidates must be a
    superset of exact matches in every group, with the reported FP count
    consistent."""
    rows = SPECS["join_bloom_semijoin"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bloom_candidates >= r.exact_matches, r
        assert r.false_positives == r.bloom_candidates - r.exact_matches, r


def test_soundex_known_collisions(spark):
    """red/rod collapse to R300 — the collision phonetic blocking exists
    to produce; widget pins the adjacent-duplicate + vowel-separation
    rules (W323, not W232)."""
    out = dict(
        SPECS["func_soundex_phonetic"]
        .fn(spark, SF_DIR)
        .filter(F.col("w").isin("red", "rod", "widget", "small"))
        .collect()
    )
    assert out.get("red") == "R300"
    assert out.get("rod") == "R300"
    assert out.get("widget") == "W323"
    assert out.get("small") == "S540"


def test_nearest_asof_prefers_in_tolerance_side(spark):
    """Every emitted gap is inside the tolerance and the signed direction
    matches the chosen side (negative = backward click)."""
    rows = SPECS["ts_asof_nearest_click"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.gap_s) <= 3600, r


def test_csv_multiline_roundtrip_is_lossless(spark):
    row = SPECS["format_csv_quoted_multiline"].fn(spark, SF_DIR).collect()[0]
    assert row.n_ok == row.n_rows > 0


def test_deletion_vector_bookkeeping(spark):
    """Per file: live + deleted == rows, and the DV actually deleted
    something somewhere."""
    rows = SPECS["cdc_deletion_vectors"].fn(spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_deleted for r in rows) > 0
    for r in rows:
        assert r.n_live + r.n_deleted == r.n_rows, r
