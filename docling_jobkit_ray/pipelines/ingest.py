"""Continuous-ingest loop: the composite pipeline a standing 100 TB corpus
runs on every new crawl drop.

    new docs ──filter_unseen(bloom index)──► survivors ──write_parquet──► corpus/
                                                 │
                                                 └──update_bloom_index──► index/v{N+1}

Each increment (a) drops documents already in the corpus via the sharded
Bloom index (``functions/bloom.py``), (b) appends the survivors to the
corpus as hive-partitioned parquet (Ray's native ``partition_cols`` —
one directory per partition value, so a failed run resumes by partition
and readers prune at the directory level), and (c) folds the survivors'
keys into a NEW index version, committed with the same atomic
pointer-file pattern as the checkpoint manifest
(``state/checkpoint.py``): versions are immutable directories, ``CURRENT``
flips via write-tmp + ``os.replace``, and a crash mid-increment leaves
the previous version live (the worst case is re-offering the increment's
docs next run — the bloom probe drops them again).
"""

from __future__ import annotations

import os
import uuid

import ray.data

__all__ = ["current_index", "commit_index", "ingest_increment"]

_CURRENT = "CURRENT"


def current_index(index_dir: str) -> ray.data.Dataset | None:
    """Load the live bloom-index version, or None before the first commit."""
    pointer = os.path.join(index_dir, _CURRENT)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        version = f.read().strip()
    return ray.data.read_parquet(os.path.join(index_dir, version))


def commit_index(index_ds: ray.data.Dataset, index_dir: str) -> str:
    """Write ``index_ds`` as the next immutable version and atomically
    flip ``CURRENT`` to it.  Returns the committed version name."""
    os.makedirs(index_dir, exist_ok=True)
    version = f"v-{uuid.uuid4().hex[:12]}"
    index_ds.write_parquet(os.path.join(index_dir, version))
    tmp = os.path.join(index_dir, f".{_CURRENT}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(index_dir, _CURRENT))
    return version


def ingest_increment(
    new_ds: ray.data.Dataset,
    *,
    corpus_dir: str,
    index_dir: str,
    partition_cols: list[str] | None = None,
    n_shards: int = 16,
    bits_per_key: int = 16,
) -> dict:
    """Run one ingest increment; returns counters for the run report.

    Idempotent under replay: re-offering an already-committed increment
    finds every document seen in the index and writes nothing."""
    from ..functions.bloom import (
        build_bloom_index_from_dataset,
        filter_unseen,
        update_bloom_index,
    )

    idx = current_index(index_dir)
    if idx is None:
        survivors = new_ds.materialize()
        next_idx = build_bloom_index_from_dataset(
            survivors, n_shards=n_shards, bits_per_key=bits_per_key
        )
    else:
        survivors = filter_unseen(new_ds, idx).materialize()
        next_idx = update_bloom_index(idx, survivors, bits_per_key=bits_per_key)

    n_in = new_ds.count()
    n_kept = survivors.count()
    if n_kept:
        survivors.write_parquet(corpus_dir, partition_cols=partition_cols)
        version = commit_index(next_idx, index_dir)
    else:
        version = None  # nothing new: keep the live index, no empty version
    return {
        "n_offered": n_in,
        "n_written": n_kept,
        "n_dropped_as_seen": n_in - n_kept,
        "index_version": version,
    }
