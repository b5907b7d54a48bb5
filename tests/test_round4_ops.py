"""Property checks for the round-4 operators — invariants the oracle hash
can't express (estimator quality bounds, one-sided guarantees, ranking
dominance), on top of the exact cross-engine parity the driver checks."""

from __future__ import annotations

from open_molecule_data_pipeline_spark.registry import load_all

SPECS = load_all()


def _rows(spark, sf_dir, name):
    return SPECS[name].fn(spark, sf_dir).collect()


def test_kmv_estimate_within_sketch_error(spark, sf_dir):
    # KMV with k=64 has relative std-error ~ 1/sqrt(k-2) ~ 12.7%; 3 sigma
    # is a generous-but-meaningful bound that a broken estimator (wrong
    # hash width, off-by-one on R_k) blows through immediately.
    for name in ("agg_kmv_distinct", "agg_kmv_merge"):
        (row,) = _rows(spark, sf_dir, name)
        assert row.rel_err_pct < 38.0, (name, row)


def test_bloom_hits_are_superset_of_exact(spark, sf_dir):
    # the one-sided Bloom guarantee: no false negatives, ever
    for row in _rows(spark, sf_dir, "text_bloom_decontaminate"):
        assert row.bloom_hits >= row.exact_hits, row
        assert row.false_positives >= 0, row


def test_countmin_never_undercounts(spark, sf_dir):
    for row in _rows(spark, sf_dir, "agg_countmin_heavy_hitters"):
        assert row.overcount >= 0, row


def test_fuzzy_linkage_resolves_every_record_correctly(spark, sf_dir):
    # every dirty record is one deletion from its source, the blocking key
    # survives the perturbation, and no other customer is closer: top-1
    # must match the true key for every record.
    rows = _rows(spark, sf_dir, "dedup_fuzzy_linkage")
    n_matched = sum(r.n_matched for r in rows)
    n_correct = sum(r.n_correct for r in rows)
    n_cust = SPECS["filter_project"].fn(spark, sf_dir).sparkSession.read.parquet(
        f"{sf_dir}/customer.parquet"
    ).count()
    assert n_matched == n_cust
    assert n_correct == n_matched


def test_bm25_rare_term_dominates(spark, sf_dir):
    # idf(dup) >> idf(common terms): the top-ranked doc must contain 'dup'
    rows = _rows(spark, sf_dir, "text_bm25_topk")
    assert rows, "bm25 returned no rows"
    top = rows[0]
    spark_df = SPECS["text_bm25_topk"].fn(spark, sf_dir).sparkSession
    text = (
        spark_df.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"doc_id = {top.doc_id}")
        .collect()[0]
        .text
    )
    assert "dup" in text.split(), top
    # scores are sorted non-increasing with doc_id tie-break
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    # |x - dequant(q)| <= s/254 (half a quantization step at that dim's
    # scale); bound with the corpus-wide max scale
    import duckdb

    con = duckdb.connect()
    max_abs = con.execute(
        "SELECT max(abs(cast(x AS DOUBLE))) FROM "
        f"(SELECT unnest(embedding) AS x FROM '{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    con.close()
    for row in _rows(spark, sf_dir, "ml_embedding_quantize_int8"):
        assert row.worst_err <= max_abs / 254 * 1.0001, row


def test_nucleus_reaches_half_mass_minimally(spark, sf_dir):
    for row in _rows(spark, sf_dir, "sample_nucleus_topp"):
        assert row.pct_of_mass >= 50.0, row
        assert 0 < row.n_selected <= row.n_docs, row


def test_psi_contributions_nonnegative(spark, sf_dir):
    # (p - q) and ln(p / q) always share a sign, so every PSI term >= 0
    for row in _rows(spark, sf_dir, "profile_psi_drift"):
        assert row.psi_contrib >= 0, row


def test_gap_fill_grid_is_dense_and_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ts_gap_fill_interpolate")
    assert rows
    heights = {r.n_hours for r in rows}
    assert len(heights) == 1, "every event_type must share the same spine"
    for r in rows:
        assert r.n_observed + r.n_filled == r.n_hours, r


def test_triangle_count_satisfies_wedge_bound(spark, sf_dir):
    (row,) = _rows(spark, sf_dir, "graph_triangle_count")
    assert row.n_triangles >= 0
    assert 0.0 <= row.clustering_coeff <= 1.0, row


def test_boilerplate_totals_consistent(spark, sf_dir):
    for row in _rows(spark, sf_dir, "dedup_boilerplate_lines"):
        assert row.n_removed <= row.n_segments, row
        assert row.docs_affected <= row.n_docs, row
        assert row.kept_tokens == (row.n_segments - row.n_removed) * 3, row
