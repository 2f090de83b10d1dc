"""Property fuzzing for round-5 kernels: Pareto sweep vs brute force,
BPE encode reconstruction, DSIR hash vs a slow reference."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_sweep_matches_bruteforce(pairs):
    """(min date, max price) skyline == the O(n^2) dominance definition,
    including duplicate dates, duplicate prices, and full ties."""
    from docling_jobkit_ray.pipelines.relational import _pareto_sweep

    date = np.array([p[0] for p in pairs], np.int64)
    price = np.array([p[1] for p in pairs], np.int64)
    got = set(_pareto_sweep(date, price).tolist())
    want = set()
    for i in range(len(pairs)):
        dominated = any(
            price[j] >= price[i]
            and date[j] <= date[i]
            and (price[j] > price[i] or date[j] < date[i])
            for j in range(len(pairs))
        )
        if not dominated:
            want.add(i)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abcdef", min_size=1, max_size=12),
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=3),
            st.text(alphabet="abcdef", min_size=1, max_size=3),
        ),
        max_size=8,
    ),
)
def test_bpe_encode_reconstructs_word(word, merges):
    """Whatever the merge list, the encoded tokens concatenate back to the
    original word + the end marker (BPE never loses or duplicates bytes)."""
    from docling_jobkit_ray.functions.bpe import encode_word

    toks = encode_word(word, merges)
    assert "".join(toks) == word + "</w>"
    assert all(t for t in toks)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=14), min_size=1, max_size=80))
def test_dsir_buckets_match_python_reference(words):
    import pyarrow as pa

    from docling_jobkit_ray.functions.dsir import _PRIME, N_BUCKETS, _word_buckets

    got = _word_buckets(pa.array(words, pa.string())).tolist()

    def ref(w: str) -> int:
        h = 0
        for b in w.encode()[:8]:
            h = (h * 31 + b) % _PRIME
        return h % N_BUCKETS

    assert got == [ref(w) for w in words]
