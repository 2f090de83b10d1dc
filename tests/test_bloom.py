"""Sharded Bloom-filter incremental dedup (functions/bloom.py).

Contracts: NO false negatives ever (every indexed document probes seen);
false-positive rate on disjoint documents within ~4x of theory for the
configured bits/key; the index is a parquet-round-trippable artifact; the
probe routes with the BUILDER's shard count even when trailing shards are
empty.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def small_corpus(tmp_path):
    texts = [f"existing corpus document {i} body words here" for i in range(400)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(400), pa.int64()), "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path), texts


def test_no_false_negatives(ray_session, small_corpus):
    import ray.data

    from docling_jobkit_ray.functions.bloom import build_bloom_index, mark_seen
    from docling_jobkit_ray.sources.pages import read_table

    sf, _ = small_corpus
    idx = build_bloom_index(sf, n_shards=4)
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    v = mark_seen(docs, idx).to_pandas()
    assert len(v) == 400
    assert v["probably_seen"].all()  # bloom guarantee: zero false negatives


def test_false_positive_rate_within_theory(ray_session, small_corpus):
    import ray.data

    from docling_jobkit_ray.functions.bloom import build_bloom_index, mark_seen

    sf, _ = small_corpus
    idx = build_bloom_index(sf, n_shards=4, bits_per_key=16)
    n = 20000
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(10_000_000, 10_000_000 + n), pa.int64()),
                "text": pa.array([f"unseen shard doc {i} tokens" for i in range(n)]),
            }
        )
    )
    v = mark_seen(new, idx).to_pandas()
    assert len(v) == n
    fp = int(v["probably_seen"].sum())
    # theory at 16 bits/key, k=11: ~0.046% (0.00046); allow 4x + slack for
    # small-sample noise — at n=20000 expectation is ~9 FPs
    assert fp <= n * 0.00046 * 4 + 5


def test_filter_unseen_keeps_only_new(ray_session, small_corpus):
    import ray.data

    from docling_jobkit_ray.functions.bloom import build_bloom_index, filter_unseen

    sf, texts = small_corpus
    idx = build_bloom_index(sf, n_shards=4)
    # half re-ingested duplicates, half genuinely new
    mixed = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1000, 1200), pa.int64()),
                "text": pa.array(texts[:100] + [f"brand new doc {i}" for i in range(100)]),
            }
        )
    )
    kept = filter_unseen(mixed, idx).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}
    # every re-ingested duplicate is dropped (no false negatives)
    assert not any(t in set(texts) for t in kept["text"])
    # nearly all new docs survive (bloom FPs may drop a couple)
    assert len(kept) >= 95


def test_index_parquet_round_trip(ray_session, small_corpus, tmp_path):
    import ray.data

    from docling_jobkit_ray.functions.bloom import build_bloom_index, mark_seen
    from docling_jobkit_ray.sources.pages import read_table

    sf, _ = small_corpus
    out = str(tmp_path / "bloom_index")
    build_bloom_index(sf, n_shards=4).write_parquet(out)
    idx_back = ray.data.read_parquet(out)
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    v = mark_seen(docs, idx_back).to_pandas()
    assert v["probably_seen"].all()


def test_probe_uses_builder_shard_count(ray_session, tmp_path):
    """With n_shards=64 and only 3 documents, most shards are empty; the
    probe must still route by the stored builder count, not the index row
    count — else false negatives."""
    import ray.data

    from docling_jobkit_ray.functions.bloom import build_bloom_index, mark_seen
    from docling_jobkit_ray.sources.pages import read_table

    texts = ["alpha doc", "beta doc", "gamma doc"]
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    idx = build_bloom_index(str(tmp_path), n_shards=64)
    assert idx.count() <= 3  # sparse: most shards absent
    docs = read_table(str(tmp_path), "documents", columns=["doc_id", "text"])
    v = mark_seen(docs, idx).to_pandas()
    assert v["probably_seen"].all()


def test_update_bloom_index_ingest_loop(ray_session):
    """The ingest loop: build on corpus A, fold in corpus B, then both
    probe fully seen (no false negatives survive an update), unseen corpus
    C stays mostly unseen, and overfilling flips the saturation flag."""
    import ray.data

    from docling_jobkit_ray.functions.bloom import (
        build_bloom_index_from_dataset,
        mark_seen,
        update_bloom_index,
    )

    def mk(lo, hi, tag):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, hi), pa.int64()),
                    "text": pa.array([f"{tag} doc {i} words" for i in range(lo, hi)]),
                }
            )
        )

    A, B, C = mk(0, 400, "corpusA"), mk(1000, 1400, "corpusB"), mk(5000, 8000, "corpusC")
    idx = build_bloom_index_from_dataset(A, n_shards=8)
    idx2 = update_bloom_index(idx, B)
    assert mark_seen(A, idx2).to_pandas()["probably_seen"].all()
    assert mark_seen(B, idx2).to_pandas()["probably_seen"].all()
    vc = mark_seen(C, idx2).to_pandas()
    # blooms doubled their load (saturated) so FP degrades, but stays far
    # from "everything seen"
    assert vc["probably_seen"].mean() < 0.25
    sat = idx2.to_pandas()
    assert sat["saturated"].any()
    # a right-sized update does NOT saturate: tiny B into a large-enough A
    big = mk(0, 4000, "corpusA")
    idx_big = build_bloom_index_from_dataset(big, n_shards=8)
    small_b = mk(9000, 9050, "corpusB")
    idx_big2 = update_bloom_index(idx_big, small_b)
    assert not idx_big2.to_pandas()["saturated"].any()
    assert mark_seen(small_b, idx_big2).to_pandas()["probably_seen"].all()
    # REPLAYED update: already-present keys must not inflate n_keys (a
    # replay would otherwise falsely trip the saturation flag)
    n_before = idx_big2.to_pandas()["n_keys"].sum()
    idx_big3 = update_bloom_index(idx_big2, small_b)
    assert idx_big3.to_pandas()["n_keys"].sum() == n_before
    assert not idx_big3.to_pandas()["saturated"].any()


def test_update_bloom_index_fresh_shard(ray_session):
    """Keys routed to a shard the original index had no row for get a
    fresh right-sized bloom (not dropped)."""
    import ray.data

    from docling_jobkit_ray.functions.bloom import (
        build_bloom_index_from_dataset,
        mark_seen,
        update_bloom_index,
    )

    one = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["lone doc"])})
    )
    idx = build_bloom_index_from_dataset(one, n_shards=64)  # most shards empty
    many = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 400), pa.int64()),
                "text": pa.array([f"new doc {i}" for i in range(300)]),
            }
        )
    )
    idx2 = update_bloom_index(idx, many)
    assert mark_seen(many, idx2).to_pandas()["probably_seen"].all()
    assert mark_seen(one, idx2).to_pandas()["probably_seen"].all()


def test_content_keys_match_dedup_exact_identity():
    from docling_jobkit_ray.functions.bloom import content_keys

    import hashlib

    k = content_keys(["hello world"])
    want = int.from_bytes(hashlib.sha256(b"hello world").digest()[:8], "big")
    assert int(k[0]) == want
