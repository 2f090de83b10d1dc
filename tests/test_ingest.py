"""Continuous-ingest loop (pipelines/ingest.py): bloom-filtered dedup
against the standing corpus, hive-partitioned append, versioned index
commit, idempotent replay.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _docs(lo, hi, tag, lang_of=lambda i: "en" if i % 2 == 0 else "fr"):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array([f"{tag} document {i} body" for i in range(lo, hi)]),
                "lang": pa.array([lang_of(i) for i in range(lo, hi)]),
            }
        )
    )


def test_ingest_two_increments_and_replay(ray_session, tmp_path):
    import ray.data

    from docling_jobkit_ray.pipelines.ingest import current_index, ingest_increment

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    # increment 1: empty index -> everything written, index v1 committed
    r1 = ingest_increment(
        _docs(0, 300, "dropA"), corpus_dir=corpus, index_dir=index, partition_cols=["lang"]
    )
    assert r1["n_offered"] == 300 and r1["n_written"] == 300
    assert r1["index_version"] is not None
    assert current_index(index) is not None
    # hive layout: one directory per lang value
    assert sorted(d for d in os.listdir(corpus) if d.startswith("lang=")) == [
        "lang=en",
        "lang=fr",
    ]

    # increment 2: half overlap with increment 1
    half_old = _docs(150, 450, "dropA")  # ids 150-299 repeat dropA texts
    r2 = ingest_increment(
        half_old, corpus_dir=corpus, index_dir=index, partition_cols=["lang"]
    )
    assert r2["n_offered"] == 300
    assert r2["n_dropped_as_seen"] == 150
    assert r2["n_written"] == 150

    # full replay of increment 2: everything seen, nothing written, index
    # version unchanged (idempotent crash-replay)
    before = open(os.path.join(index, "CURRENT")).read()
    r3 = ingest_increment(
        _docs(150, 450, "dropA"), corpus_dir=corpus, index_dir=index, partition_cols=["lang"]
    )
    assert r3["n_written"] == 0 and r3["index_version"] is None
    assert open(os.path.join(index, "CURRENT")).read() == before

    # the corpus holds exactly the union, readable with partition pruning
    back = ray.data.read_parquet(corpus)
    assert back.count() == 450
    en_only = ray.data.read_parquet(os.path.join(corpus, "lang=en"))
    assert en_only.count() == 225


def test_filter_unseen_preserves_all_columns(ray_session):
    from docling_jobkit_ray.functions.bloom import (
        build_bloom_index_from_dataset,
        filter_unseen,
    )

    old = _docs(0, 100, "base")
    idx = build_bloom_index_from_dataset(old, n_shards=4)
    mixed = _docs(50, 150, "base")  # 50-99 dup, 100-149 new
    kept = filter_unseen(mixed, idx).to_pandas()
    assert set(kept.columns) == {"doc_id", "text", "lang"}
    assert sorted(kept["doc_id"]) == list(range(100, 150))
