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
