"""Property tests for the batched-BPE merge spec (round 7).

Oracle parity proves Spark == DuckDB on the shipped corpus; these
properties prove the SPEC itself is sound on arbitrary corpora: the
conflict filter always yields token-disjoint merges, and token-disjoint
merges COMMUTE under the leftmost-non-overlapping space-delimited
replacement both engines implement — the invariant that makes applying
a whole batch in one rewrite pass equivalent to any sequential order.
"""

from __future__ import annotations

import itertools
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from open_molecule_data_pipeline_spark.operators.corpus_ops import (
    _BPE_BATCH,
    _BPE_POOL,
)

TOKENS = ["a", "b", "c", "d", "ab", "a_b", "x"]


def select_batch(docs: list[list[str]]) -> list[tuple[str, str]]:
    """Pure-Python mirror of the batched-merge selection spec: rank
    adjacent pairs (freq desc, a, b), keep a candidate iff its token set
    {a, b, a_b} is disjoint from EVERY higher-ranked candidate's, cap at
    _BPE_BATCH."""
    counts: Counter = Counter()
    for toks in docs:
        for x, y in zip(toks, toks[1:]):
            counts[(x, y)] += 1
    cand = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_POOL]
    kept: list[tuple[str, str]] = []
    for i, ((a, b), _) in enumerate(cand):
        mine = {a, b, f"{a}_{b}"}
        conflict = False
        for (pa, pb), _ in cand[:i]:
            if mine & {pa, pb, f"{pa}_{pb}"}:
                conflict = True
                break
        if not conflict:
            kept.append((a, b))
        if len(kept) == _BPE_BATCH:
            break
    return kept


def apply_merge(s: str, a: str, b: str) -> str:
    """Leftmost non-overlapping space-delimited replacement — the probed
    regexp_replace semantics shared by Spark and DuckDB."""
    return re.sub(
        re.escape(f" {a} {b} "), f" {a}_{b} ", s
    )


corpus = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=2, max_size=10),
    min_size=1,
    max_size=8,
)


@given(corpus)
@settings(max_examples=200, deadline=None)
def test_selected_batch_is_token_disjoint(docs):
    kept = select_batch(docs)
    used: set[str] = set()
    for a, b in kept:
        mine = {a, b, f"{a}_{b}"}
        assert not (mine & used)
        used |= mine


def apply_batch_reference(toks: list[str], kept: list[tuple[str, str]]) -> list[str]:
    """The oracle semantics: K sequential global leftmost-nonoverlapping
    space-delimited replacement passes (order irrelevant by the
    commutation property above)."""
    s = " " + " ".join(toks) + " "
    for a, b in kept:
        s = apply_merge(s, a, b)
    return s.split()


def test_merge_fold_automaton_matches_regex_reference(spark):
    """r8 hardening: the Spark `_bpe_merge_fold` array-fold automaton
    (corpus_ops.py) — which replaced the per-merge regex scans — must
    reproduce the sequential-regex reference exactly on arbitrary corpora,
    including the self-blocking subtlety ('a b a b' merges once per pass,
    but a DIFFERENT pair may still match at the blocked position).

    One Spark roundtrip: 400 seeded random docs + handcrafted edge cases,
    each row carrying its own kept-batch (selected by the pure-Python spec
    mirror, so batches are realistic AND disjointness always holds)."""
    import random

    from pyspark.sql import functions as F

    from open_molecule_data_pipeline_spark.operators.corpus_ops import (
        _bpe_merge_fold,
    )

    rng = random.Random(718)
    corpora: list[list[list[str]]] = []
    for _ in range(40):
        corpora.append(
            [
                [rng.choice(TOKENS) for _ in range(rng.randint(0, 12))]
                for _ in range(rng.randint(1, 10))
            ]
        )
    # edge cases: self-block chains, interleaved pairs, empty/singleton docs
    corpora.append(
        [
            ["a", "b", "a", "b", "a", "b"],
            ["a", "b", "b", "c", "a", "b"],
            ["c", "d", "a", "b", "c", "d"],
            [],
            ["a"],
            ["a_b", "a", "b"],
        ]
    )

    rows = []
    for ci, docs in enumerate(corpora):
        kept = select_batch(docs)
        kept_struct = [
            {"a": a, "b": b, "m": f"{a}_{b}", "kr": i + 1}
            for i, (a, b) in enumerate(kept)
        ]
        for di, toks in enumerate(docs):
            rows.append(
                {
                    "id": ci * 1000 + di,
                    "toks": toks,
                    "kept": kept_struct,
                    "expect": apply_batch_reference(toks, kept),
                }
            )

    df = spark.createDataFrame(
        rows,
        schema="id long, toks array<string>, "
        "kept array<struct<a:string,b:string,m:string,kr:long>>, "
        "expect array<string>",
    )
    got = (
        df.select(
            "id",
            "expect",
            _bpe_merge_fold("toks", "kept").alias("merged"),
        )
        .filter(F.col("merged") != F.col("expect"))
        .collect()
    )
    assert not got, f"fold automaton diverged from regex reference: {got[:5]}"


@given(corpus)
@settings(max_examples=100, deadline=None)
def test_disjoint_batch_commutes_under_replacement(docs):
    kept = select_batch(docs)
    strings = [" " + " ".join(toks) + " " for toks in docs]
    results = set()
    orders = list(itertools.permutations(kept))[:24]  # cap factorial blowup
    for order in orders:
        out = []
        for s in strings:
            for a, b in order:
                s = apply_merge(s, a, b)
            out.append(s)
        results.add(tuple(out))
    assert len(results) <= 1, f"merge order changed the corpus: {kept}"
