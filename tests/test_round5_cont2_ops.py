"""Semantic invariants + single-process brute-force references for the
second-continuation batch: k-center coreset, contrastive mining, SQ8 ANN,
padding-waste report.  (SQL parity runs in test_driver_contract.py; these
pin the ALGORITHMIC contract against straight-line numpy.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _vecs():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    q = np.round(m * 1e6).astype(np.int64)
    order = np.argsort(ids)
    return ids[order], q[order]


def _d2(x, c):
    return (x * x).sum(1, keepdims=True) - 2 * (x @ c.T) + (c * c).sum(1)


def test_kcenter_matches_brute_force_gonzalez(ray_session):
    from docling_jobkit_ray.functions.similarity import kcenter_coreset_embeddings

    ids, q = _vecs()
    # straight-line Gonzalez on the same integer grid
    k = 6
    centers = [0]  # index of smallest vec_id (ids sorted)
    for _ in range(1, k):
        mind = _d2(q, q[centers]).min(axis=1)
        order = np.lexsort((ids, -mind))
        centers.append(int(order[0]))
    d2 = _d2(q, q[centers])
    best = np.argmin(d2, axis=1)
    want = pd.DataFrame(
        {
            "vec_id": ids,
            "center_rank": best.astype(np.int64),
            "d2": d2[np.arange(len(ids)), best].astype(np.int64),
        }
    )
    got = kcenter_coreset_embeddings(SF).to_pandas()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # Gonzalez invariants: each selected center is its own nearest (d2=0),
    # and the selection radius sequence is non-increasing
    sel = got[got["d2"] == 0]
    assert len(sel) >= k


def test_kcenter_radius_monotone(ray_session):
    """The farthest-point distance sequence must be non-increasing in k —
    the property the 2-approximation proof rests on."""
    ids, q = _vecs()
    centers = [0]
    radii = []
    for _ in range(1, 8):
        mind = _d2(q, q[centers]).min(axis=1)
        order = np.lexsort((ids, -mind))
        radii.append(int(mind[order[0]]))
        centers.append(int(order[0]))
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_contrastive_roles_and_exclusions(ray_session):
    from docling_jobkit_ray.functions.similarity import contrastive_pairs_mining

    got = contrastive_pairs_mining(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    lab = dict(zip(t["vec_id"].astype(int), t["label"].astype(int)))
    for r in got.itertuples(index=False):
        same = lab[int(r.vec_id)] == lab[int(r.query_id)]
        assert same == (r.role == 0)
        if r.role == 0:
            assert int(r.vec_id) != int(r.query_id)  # self excluded
    # both roles present for every query, ranks contiguous from 1
    for (_qid, _role), grp in got.groupby(["query_id", "role"]):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))


def test_sq8_recall_against_exact(ray_session):
    """SQ8 is lossy but 8 bits/dim keeps recall@5 high; and its top-1 must
    be the query itself (a vector's decoded form is nearest to itself
    under any per-dim uniform quantizer on this data)."""
    from docling_jobkit_ray.functions.similarity import sq8_knn_ranks

    got = sq8_knn_ranks(SF).to_pandas()
    ids, q = _vecs()
    recalls = []
    for qid, grp in got.groupby("query_id"):
        qi = int(np.searchsorted(ids, qid))
        exact = _d2(q, q[[qi]])[:, 0]
        top_exact = set(ids[np.lexsort((ids, exact))[:5]].tolist())
        recalls.append(len(set(grp["vec_id"]) & top_exact) / 5)
        assert int(grp.iloc[0]["vec_id"]) == int(qid)
    assert np.mean(recalls) >= 0.6


def test_padding_waste_totals(ray_session):
    from docling_jobkit_ray.functions.packing import padding_waste_report

    got = padding_waste_report(SF).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert int(got["n_docs"].sum()) == n_docs
    assert (got["pad_tokens"] + got["real_tokens"] == got["padded_slots"]).all()
    assert (got["waste_ppm"] >= 0).all() and (got["waste_ppm"] < 1_000_000).all()
    # caps ascending, every bucket non-empty on this corpus
    assert list(got["cap"]) == sorted(got["cap"])
    assert (got["n_docs"] > 0).all()


def test_padding_waste_custom_caps(ray_session):
    from docling_jobkit_ray.functions.packing import padding_waste_report

    got = padding_waste_report(SF, caps=(1024,)).to_pandas()
    # one giant cap: nothing truncates, waste is pure padding
    assert len(got) == 1
    assert int(got["overflow_tokens"].iloc[0]) == 0


def test_kfold_exact_balance(ray_session):
    """Per-(lang, fold) counts differ by at most one — the guarantee
    threshold splits cannot give."""
    from docling_jobkit_ray.functions.webtext import stratified_kfold_assign

    got = stratified_kfold_assign(SF).to_pandas()
    for _lang, grp in got.groupby("lang"):
        sizes = grp.groupby("fold").size()
        assert len(sizes) == min(5, len(grp))
        assert sizes.max() - sizes.min() <= 1
    # every doc assigned exactly once
    assert got["doc_id"].is_unique
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(got) == n_docs


def test_kfold_reshard_invariant(ray_session):
    """The assignment is a pure function of (doc_id, lang) — rerunning
    must be bit-identical (the Lehmer-rank contract)."""
    from docling_jobkit_ray.functions.webtext import stratified_kfold_assign

    a = stratified_kfold_assign(SF).to_pandas()
    b = stratified_kfold_assign(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_query_expansion_superset_of_seed_search(ray_session):
    """Expanding the query can only ADD matching documents: every doc the
    seed alone matches stays matched (n_hits can only grow)."""
    from docling_jobkit_ray.functions.index import (
        query_expansion_search,
        search_corpus,
    )

    seed_only = search_corpus(SF, ["vector"], k=10_000).to_pandas()
    expanded = query_expansion_search(SF, k=10_000).to_pandas()
    assert set(seed_only["doc_id"]) <= set(expanded["doc_id"])
    merged = seed_only.merge(expanded, on="doc_id", suffixes=("_s", "_e"))
    assert (merged["n_hits_e"] >= merged["n_hits_s"]).all()


def test_k_anonymize_ladder_monotone(ray_session):
    """Coarser levels can only merge classes: class count is
    non-increasing and the smallest class non-decreasing along the length
    ladder; the chosen level has zero violations and all earlier levels
    have some."""
    from docling_jobkit_ray.functions.quality_checks import k_anonymize_generalize

    got = k_anonymize_generalize(SF).to_pandas().sort_values("level")
    nc = got["n_classes"].to_numpy()
    assert (nc[1:] <= nc[:-1]).all()
    mn = got["min_class_size"].to_numpy()
    assert (mn[1:] >= mn[:-1]).all()
    chosen = got[got["chosen"] == 1]
    assert len(chosen) == 1
    lv = int(chosen["level"].iloc[0])
    assert int(chosen["n_violating"].iloc[0]) == 0
    assert (got[got["level"] < lv]["n_violating"] > 0).all()


def test_word_dropout_subsequence_and_determinism(ray_session):
    """Augmented text is a SUBSEQUENCE of the original word stream (order
    preserved, nothing invented), the drop share sits near 1/8, and the
    mask replays bit-identically (pure function of doc_id x position)."""
    from docling_jobkit_ray.functions.webtext import word_dropout_augment

    a = word_dropout_augment(SF).to_pandas()
    b = word_dropout_augment(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    orig = dict(zip(docs["doc_id"].astype(int), docs["text"]))
    for r in a.head(50).itertuples(index=False):
        ow = orig[int(r.doc_id)].split(" ")
        aw = r.text_aug.split(" ") if r.text_aug else []
        assert len(aw) == r.n_kept
        assert r.n_kept + r.n_dropped == len(ow)
        # subsequence check
        it = iter(ow)
        assert all(w in it for w in aw)
    share = a["n_dropped"].sum() / (a["n_kept"].sum() + a["n_dropped"].sum())
    assert 0.09 < share < 0.16


def test_token_budget_select_monotone_and_within_budget(ray_session):
    """A larger budget selects a superset; every selection's token sum is
    within its budget and maximal (adding the next-best doc would
    overflow)."""
    from docling_jobkit_ray.functions.webtext import token_budget_select

    small = token_budget_select(SF, budget_ppm=100_000).to_pandas()
    big = token_budget_select(SF, budget_ppm=400_000).to_pandas()
    assert set(small["doc_id"]) <= set(big["doc_id"])
    import pyarrow.compute as pc

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    total = int(
        pc.sum(pc.count_substring_regex(t["text"], pattern=r"[^\s]+")).as_py()
    )
    for df, ppm in ((small, 100_000), (big, 400_000)):
        assert df["n_tokens"].sum() <= total * ppm // 1_000_000


def test_token_budget_select_degenerate_ties(ray_session, tmp_path):
    """All-identical ratios: the whole corpus is one tie group — the fill
    must take doc_ids in order until the budget is spent."""
    import os

    import pyarrow as pa

    from docling_jobkit_ray.functions.webtext import token_budget_select

    src = str(tmp_path / "src")
    os.makedirs(src)
    text = "alpha beta gamma delta epsilon"  # 5 tokens each, same score
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array([text] * 40, pa.string()),
            }
        ),
        f"{src}/documents.parquet",
    )
    got = token_budget_select(src, budget_ppm=250_000).to_pandas()
    # budget = 200*0.25 = 50 tokens = 10 docs; doc_id order
    assert list(got["doc_id"]) == list(range(10))


def test_token_budget_zero_budget_empty(ray_session):
    from docling_jobkit_ray.functions.webtext import token_budget_select

    got = token_budget_select(SF, budget_ppm=0).to_pandas()
    assert len(got) == 0


def test_containment_finds_planted_subset(ray_session, tmp_path):
    """A short doc embedded verbatim inside a long one: containment ~1.0
    finds it; symmetric Jaccard at the same threshold cannot."""
    import os

    import pyarrow as pa

    from docling_jobkit_ray.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    rng_words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    short = " ".join(rng_words[:8])
    long_doc = " ".join(rng_words[8:]) + " " + short + " " + " ".join(reversed(rng_words))
    filler = [" ".join(reversed(rng_words[i:] + rng_words[:i])) for i in range(2, 12)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    import pyarrow.parquet as _pq

    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(2 + len(filler)), pa.int64()),
                "text": pa.array([short, long_doc, *filler], pa.string()),
            }
        ),
        f"{src}/documents.parquet",
    )
    cont = ngram_containment_pairs(src, threshold=0.9).to_pandas()
    hit = cont[(cont["doc_a"] == 0) & (cont["doc_b"] == 1)]
    assert len(hit) == 1 and hit["containment"].iloc[0] >= 0.9
    jac = ngram_jaccard_pairs(src, threshold=0.9).to_pandas()
    if not jac.empty:  # all-empty Dataset drops columns (CLAUDE.md)
        assert not (
            ((jac["doc_a"] == 0) & (jac["doc_b"] == 1))
            | ((jac["doc_a"] == 1) & (jac["doc_b"] == 0))
        ).any()


def test_containment_asymmetry(ray_session):
    """C(short -> long) can hold while C(long -> short) fails — ordered
    pairs must reflect the direction."""
    from docling_jobkit_ray.functions.dedup import ngram_containment_pairs

    got = ngram_containment_pairs(SF, threshold=0.8).to_pandas()
    pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    assert len(got) > 0
    # at least the planted exact near-dups appear in both directions;
    # asymmetric subset relations appear once — ordered output is a
    # superset of its symmetric core, never double-counted
    assert len(pairs) == len(got)


def test_sprt_decision_semantics(ray_session):
    """Decision rules: a crossing row's cum_llr sits beyond the declared
    boundary; a 0-decision's final cum sits strictly inside both."""
    from docling_jobkit_ray.functions.stats_tests import (
        _SPRT_A,
        _SPRT_B,
        ab_sprt_decision,
    )

    row = ab_sprt_decision(SF).to_pandas().iloc[0]
    if row["decision"] == 1:
        assert row["cum_llr"] >= _SPRT_A and row["cross_event_id"] >= 0
    elif row["decision"] == -1:
        assert row["cum_llr"] <= _SPRT_B and row["cross_event_id"] >= 0
    else:
        assert _SPRT_B < row["cum_llr"] < _SPRT_A
        assert row["cross_event_id"] == -1
    assert row["n_seen"] > 0


def test_sprt_planted_conversion_burst(ray_session, tmp_path):
    """A synthetic stream that is pure conversions must accept H1 after
    exactly ceil(A / l1) events."""
    import math
    import os

    import pyarrow as pa

    from docling_jobkit_ray.functions.stats_tests import (
        _SPRT_A,
        _SPRT_L1,
        _SPRT_LEHMER_A,
        _SPRT_LEHMER_M,
        ab_sprt_decision,
    )

    # pick user ids landing in the treatment arm
    uids = [u for u in range(1000) if (u % _SPRT_LEHMER_M) * _SPRT_LEHMER_A % _SPRT_LEHMER_M % 2 == 1][:50]
    n = 40
    src = str(tmp_path / "src")
    os.makedirs(src)
    import pyarrow.parquet as _pq

    _pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([uids[i % len(uids)] for i in range(n)], pa.int64()),
                "event_type": pa.array(["purchase"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{src}/events.parquet",
    )
    row = ab_sprt_decision(src).to_pandas().iloc[0]
    want_n = math.ceil(_SPRT_A / _SPRT_L1)
    assert row["decision"] == 1
    assert row["n_seen"] == want_n
