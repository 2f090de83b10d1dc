"""Persisted MinHash-LSH index (functions/minhash_index.py): build the
band-row artifact for an 'already ingested' corpus, probe new documents,
and check the candidate pairs against planted near-duplicates."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from docling_jobkit_ray.functions.minhash_index import (
    build_minhash_index,
    probe_minhash_index,
)

_BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "distributed data processing engines shuffle blocks across worker nodes",
    "parquet columnar storage keeps scans fast by pruning unread columns",
    "streaming execution pipelines documents through bounded memory stages",
    "vectorized kernels beat python row loops by two orders of magnitude",
    "language models train on deduplicated corpora to avoid memorization "
    "of repeated passages and the training pipeline therefore runs exact "
    "and near duplicate removal before tokenization packing and shuffling "
    "so that every gradient step sees novel text instead of boilerplate",
    "minhash signatures approximate jaccard similarity between shingle sets",
    "object stores spill blocks to disk when worker memory fills up fully",
]


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


def test_probe_finds_planted_near_dups(ray_session, tmp_path):
    existing = _ds(list(enumerate(_BASE)))
    out_dir = str(tmp_path / "mhidx")
    meta = build_minhash_index(existing, out_dir, n_bands=16)
    assert meta["n_bands"] == 16

    probe = _ds(
        [
            (100, _BASE[3]),                                   # exact copy
            # near copy: one word changed in a ~40-word doc -> Jaccard ~0.9
            (101, _BASE[5].replace("corpora", "datasets")),
            (102, "completely unrelated text about gardening tulips in spring"),
        ]
    )
    pairs = probe_minhash_index(out_dir, probe).to_pandas()
    got = set(zip(pairs["probe_doc_id"], pairs["index_doc_id"]))
    assert (100, 3) in got       # exact dup ALWAYS collides in every band
    assert (101, 5) in got       # near dup shares most shingles
    assert not any(p == 102 for p, _ in got)  # unrelated text stays clean
    # candidates are deterministic across runs
    again = probe_minhash_index(out_dir, probe).to_pandas()
    assert pairs.equals(again)


def test_probe_refuses_missing_meta(ray_session, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        probe_minhash_index(str(tmp_path / "nope"), _ds([(1, "a b c")]))
