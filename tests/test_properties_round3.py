"""Property-based tests (hypothesis) for the round-3 pure kernels: the
word-n-gram builder, sequence packing, bloom bit math, and t-digest.

These run WITHOUT Ray — the kernels are deliberately pure functions so
their invariants can be fuzzed cheaply.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=5)
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=80, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8), st.integers(min_value=2, max_value=5))
def test_gram_frame_invariants(docs, n):
    from docling_jobkit_ray.functions.webtext import _gram_frame

    doc_idx, grams = _gram_frame(pa.array(docs, pa.string()), n)
    grams = grams.to_pylist()
    # count: each doc contributes max(0, n_words - n + 1) grams
    expected = sum(max(0, len(d.split(" ")) - n + 1) for d in docs)
    assert len(grams) == expected == len(doc_idx)
    # every gram is n words drawn from ITS document at the right offset
    offsets = {}
    for di, g in zip(doc_idx, grams):
        words = docs[di].split(" ")
        k = offsets.get(di, 0)
        assert g == " ".join(words[k : k + n])
        offsets[di] = k + 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=120),
    st.integers(min_value=16, max_value=512),
)
def test_pack_batch_invariants(tokens, budget):
    from docling_jobkit_ray.functions.packing import pack_batch

    tokens = np.asarray(tokens)
    doc_ids = np.arange(len(tokens))
    bin_of, bin_tot = pack_batch(doc_ids, tokens, budget)
    # every doc assigned; totals consistent
    assert len(bin_of) == len(tokens)
    import pandas as pd

    sums = pd.Series(tokens).groupby(bin_of).sum()
    for b, s in sums.items():
        members = tokens[bin_of == b]
        assert (bin_tot[bin_of == b] == s).all()
        # bins respect the budget unless they hold a single oversize doc
        assert s <= budget or (len(members) == 1 and members[0] > budget)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=500))
def test_bloom_positions_no_false_negatives(keys):
    from docling_jobkit_ray.functions.bloom import _positions

    keys = np.unique(np.asarray(keys, np.uint64))
    m_bits = max(64, len(keys) * 16)
    bloom = np.zeros((m_bits + 7) // 8, np.uint8)
    pos = _positions(keys, 11, m_bits)
    np.bitwise_or.at(bloom, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    again = _positions(keys, 11, m_bits)
    assert (((bloom[again >> 3] >> (again & 7).astype(np.uint8)) & 1).all(axis=1)).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=2000
    )
)
def test_tdigest_quantiles_within_range_and_monotone(values):
    from docling_jobkit_ray.functions.sketches import TDigest

    x = np.asarray(values)
    td = TDigest.from_values(x)
    qs = [td.quantile(q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    # estimates stay inside the data range and are monotone in q
    assert min(x) - 1e-6 <= qs[0] and qs[-1] <= max(x) + 1e-6
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_union_find_matches_bfs(edges):
    from collections import deque

    from docling_jobkit_ray.functions.graph import union_find_components

    a = [u for u, _ in edges]
    b = [v for _, v in edges]
    nodes, comp = union_find_components(a, b)

    # BFS reference over the same (symmetrized) graph
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    assert nodes == sorted(adj)
    expect = {}
    seen: set = set()
    for start in sorted(adj):
        if start in seen:
            continue
        members, q = [], deque([start])
        seen.add(start)
        while q:
            x = q.popleft()
            members.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        label = min(members)
        for m in members:
            expect[m] = label
    assert dict(zip(nodes, comp)) == expect
