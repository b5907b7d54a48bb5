"""r9 operator semantics, pinned against independent Python references on
adversarial constructed inputs (the parquet-oracle suite proves engine
parity; these prove the SEMANTICS are the intended ones on inputs the
synthetic tables don't exercise: timestamp ties, bucket edges, rule
boundary values)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_ohlc_bars_ties_and_boundaries(spark):
    """open/close must follow (ts, event_id) order even when timestamps
    collide, and rows exactly on the hour belong to THAT hour's bucket."""
    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def ev(i, seconds, value, typ="click"):
        return Row(
            event_id=i,
            ts=t0 + datetime.timedelta(seconds=seconds),
            user_id=1,
            event_type=typ,
            value=float(value),
            props="{}",
        )

    rows = [
        ev(5, 0, 100.0),      # exactly on the hour; ties with event 2 below
        ev(2, 0, 7.0),        # same ts as event 5 -> smaller id is the open
        ev(9, 1800, -3.0),    # low
        ev(4, 3599, 50.0),    # last second of the bucket -> close
        ev(1, 3600, 999.0),   # next hour: separate bucket
        ev(8, 100, 1.0, "view"),  # different type: separate group
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("events_ohlc_probe")

    from open_molecule_data_pipeline_spark.operators.ts_extra2 import (
        ts_ohlc_bars,
    )
    import open_molecule_data_pipeline_spark.catalog as catalog

    orig = catalog.table
    try:
        catalog.table = lambda s, d, n: spark.table("events_ohlc_probe")
        # ts_ohlc_bars resolves `table` through its module import
        import open_molecule_data_pipeline_spark.operators.ts_extra2 as m

        m_table = m.table
        m.table = catalog.table
        try:
            out = {
                (r.bucket, r.event_type): r
                for r in ts_ohlc_bars(spark, "ignored").collect()
            }
        finally:
            m.table = m_table
    finally:
        catalog.table = orig

    first = out[(t0, "click")]
    assert first.open_val == 7.0      # event 2 beats event 5 on the tie
    assert first.close_val == 50.0    # 3599 s is still inside the bucket
    assert first.high_val == 100.0
    assert first.low_val == -3.0
    assert first.n_events == 4
    nxt = out[(t0 + datetime.timedelta(hours=1), "click")]
    assert nxt.open_val == nxt.close_val == 999.0 and nxt.n_events == 1
    view = out[(t0, "view")]
    assert view.n_events == 1 and view.open_val == 1.0


def test_gopher_rules_reference_semantics(spark):
    """Per-rule pass counts equal an independent pure-Python evaluation of
    the Gopher predicates over docs constructed to straddle every rule
    boundary (49/50/51 words, mean word length exactly 3 and 10, 80%
    alphabetic words, required-word count 1 vs 2, symbol ratio at the
    10% edge)."""
    _REQ = ("data", "table", "row", "value", "key")

    docs = [
        # name, text
        ("short", "data table " + "x " * 47),              # 49 words
        ("edge50", "data table " + "abc " * 48),           # 50 words, mwl 3.04
        ("long_ok", "data table value " + "word " * 60),
        ("mwl_low", "data table " + "ab " * 58),           # mean < 3
        ("mwl_high", "data table " + ("z" * 11 + " ") * 58),  # mean > 10
        ("alpha_low", "data table " + "123 " * 58),        # alpha share low
        ("req_one", "data " + "blah " * 59),               # 1 required word
        ("symbols", "data table " + "# " * 30 + "word " * 30),
    ]

    def py_rules(text):
        toks = text.split(" ")
        nw = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_hash = text.count("#")
        n_ellipsis = text.count("...")
        n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
        n_req = len(set(toks) & set(_REQ))
        return {
            "word_count_50_100k": 50 <= nw <= 100000,
            "mean_word_len_3_10": 3 * nw <= sum_len <= 10 * nw,
            "symbol_ratio_le_10pct": 10 * (n_hash + n_ellipsis) <= nw,
            "alpha_words_ge_80pct": 5 * n_alpha >= 4 * nw,
            "required_words_ge_2": n_req >= 2,
        }

    expected: dict[str, int] = {}
    for _, text in docs:
        for rule, ok in py_rules(text).items():
            expected[rule] = expected.get(rule, 0) + int(ok)

    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="probe",
                n_chars=len(t))
            for i, (_, t) in enumerate(docs)
        ]
    )
    df.createOrReplaceTempView("docs_gopher_probe")
    import open_molecule_data_pipeline_spark.operators.text_pipeline as m

    m_table = m.table
    m.table = lambda s, d, n: spark.table("docs_gopher_probe")
    try:
        rows = m.text_gopher_quality_rules(spark, "ignored").collect()
    finally:
        m.table = m_table
    got = {r.rule: r.n_pass for r in rows}
    n_docs = {r.rule: r.n_docs for r in rows}
    assert got == expected
    assert all(n == len(docs) for n in n_docs.values())
    # trailing strictness: every text above was built single-spaced so the
    # python split and Spark's F.split agree on token boundaries
    assert all("  " not in t.rstrip() and not t.endswith(" ")
               for _, t in ((n, t.rstrip()) for n, t in docs))


def test_session_window_exact_gap_merges(spark):
    """Pin the boundary convention the ts_session_window_native oracle
    encodes — settled EMPIRICALLY by this test, which caught the first
    draft encoding the opposite: an event exactly `gap` after its
    predecessor MERGES into the session (Spark's merge boundary is
    inclusive), and one microsecond beyond the gap opens a new one. The
    synthetic tables never produce an exact 30:00.000000 gap, so parity
    alone cannot distinguish > from >= — this constructed case can."""
    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)

    def ev(i, us_offset):
        return Row(
            event_id=i,
            ts=t0 + datetime.timedelta(microseconds=us_offset),
            user_id=1,
            event_type="click",
            value=1.0,
            props="{}",
        )

    gap_us = 30 * 60 * 1_000_000
    rows = [
        ev(1, 0),
        ev(2, gap_us),              # exactly the gap: SAME session
        ev(3, gap_us * 2 + 1),      # gap + 1 us after event 2: NEW session
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("events_session_probe")
    import open_molecule_data_pipeline_spark.operators.timeseries as m

    m_table = m.table
    m.table = lambda s, d, n: spark.table("events_session_probe")
    try:
        out = sorted(
            m.ts_session_window_native(spark, "ignored").collect(),
            key=lambda r: r.session_start,
        )
    finally:
        m.table = m_table
    assert [r.n_events for r in out] == [2, 1]
    # reported end = last event + gap
    assert out[0].session_end == t0 + datetime.timedelta(
        microseconds=gap_us * 2
    )

    # and the DuckDB islands oracle produces the same sessions on the
    # same three rows (the `> gap` flag, not >=: a new session opens
    # only when the gap STRICTLY exceeds 30 minutes, so the exact-gap
    # event merges — matching Spark's inclusive session_window bound)
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": [
                    t0,
                    t0 + datetime.timedelta(microseconds=gap_us),
                    t0 + datetime.timedelta(microseconds=gap_us * 2 + 1),
                ],
                "user_id": [1, 1, 1],
                "value": [1.0, 1.0, 1.0],
            }
        ),
    )
    from open_molecule_data_pipeline_spark.operators.timeseries import (
        _SESSION_NATIVE_ORACLE,
    )

    oracle = con.execute(_SESSION_NATIVE_ORACLE).df()
    assert sorted(oracle["n_events"].tolist()) == [1, 2]
    # sanity: the `> gap` flag (not >=) is what makes the exact-gap pair
    # one session on BOTH engines
    assert 2 in oracle["n_events"].tolist()


def test_fuzzy_search_blocking_contract(spark):
    """Pin the trigram-blocking recall contract: 'tabel' reaches 'table'
    (shared trigram 'tab', distance 2), while 'jion' must NOT reach
    'join' — a distance-2 transposition sharing no trigram is excluded
    BY DEFINITION, the documented recall limitation of single-gram-size
    blocking. If the operator ever silently changes to an unblocked scan,
    this test flags the contract change."""
    probe_words = {"tabel", "valu", "windoow", "colum", "jion"}
    docs = [
        Row(doc_id=1, text="table value window column join data",
            lang="en", source="probe", n_chars=36),
    ]
    df = spark.createDataFrame(docs)
    df.createOrReplaceTempView("docs_fuzzy_probe")
    import open_molecule_data_pipeline_spark.operators.linkage as m

    # sanity: the probe list under test is the registered one
    assert set(m._FUZZY_PROBES) == probe_words
    m_table = m.table
    m.table = lambda s, d, n: spark.table("docs_fuzzy_probe")
    try:
        rows = m.text_fuzzy_vocab_search(spark, "ignored").collect()
    finally:
        m.table = m_table
    got = {(r.probe, r.word): r.dist for r in rows}
    assert got[("tabel", "table")] == 2
    assert got[("valu", "value")] == 1
    assert got[("windoow", "window")] == 1
    assert got[("colum", "column")] == 1
    # jion/join: levenshtein distance 2, but trigram sets are disjoint
    # ({jio, ion} vs {joi, oin}) — blocked out on both engines
    assert not any(p == "jion" for p, _ in got)


def test_length_bucket_ladder_edges(spark):
    """Docs exactly ON a bucket edge stay in that bucket (<=); one word
    over rolls to the next power of two; anything past the last edge
    lands in the 2048 overflow cap."""
    def doc(i, nw):
        text = " ".join(["w"] * nw)
        return Row(doc_id=i, text=text, lang="en", source="probe",
                   n_chars=len(text))

    df = spark.createDataFrame(
        [doc(1, 16), doc(2, 17), doc(3, 512), doc(4, 513), doc(5, 2000)]
    )
    df.createOrReplaceTempView("docs_lb_probe")
    import open_molecule_data_pipeline_spark.operators.sampling_splits as m

    m_table = m.table
    m.table = lambda s, d, n: spark.table("docs_lb_probe")
    try:
        rows = m.sample_length_bucket_batches(spark, "ignored").collect()
    finally:
        m.table = m_table
    by_cap = {r.cap: r for r in rows}
    assert by_cap[16].n_docs == 1          # nw=16 stays at the 16 edge
    assert by_cap[32].n_docs == 1          # nw=17 rolls to 32
    assert by_cap[512].n_docs == 1
    assert by_cap[1024].n_docs == 1        # nw=513 rolls to 1024
    assert by_cap[2048].n_docs == 1        # nw=2000 -> overflow cap
    # padded accounting at the edge: a full-width doc in a 1-doc batch
    # still pays (batch - 1) empty rows of cap
    b16 = by_cap[16]
    assert b16.n_batches == 1
    assert b16.padded_slots == 1 * 32 * 16 - 16
