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


def test_append_minhash_index_probe_sees_both(ray_session, tmp_path):
    """Append with frozen params: a probe finds near-dups of BOTH the
    originally-indexed and the appended docs; appending to a dir with no
    meta refuses."""
    import pyarrow as pa
    import ray

    from docling_jobkit_ray.functions.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
    )

    base_text = "the quick brown fox jumps over the lazy dog again and again today"
    new_text = "completely different words about distributed systems and arrow tables here"

    def _ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    idx = str(tmp_path / "mh_idx")
    build_minhash_index(_ds([(1, base_text)]), idx)
    append_minhash_index(idx, _ds([(2, new_text)]))
    # probe docs: near-dup of the ORIGINAL (3) and of the APPENDED (4)
    probe = _ds(
        [
            (3, base_text.replace("today", "tonight")),
            (4, new_text.replace("here", "now")),
            (5, "zebra xylophone quartz vortex jackdaw mint plume")
        ]
    )
    out = probe_minhash_index(idx, probe).to_pandas()
    pairs = set(zip(out["probe_doc_id"], out["index_doc_id"]))
    assert (3, 1) in pairs and (4, 2) in pairs
    assert not any(p == 5 for p, _ in pairs)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        append_minhash_index(str(tmp_path / "nope"), _ds([(9, "x y z")]))
