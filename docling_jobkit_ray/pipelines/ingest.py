"""Continuous-ingest loop: the composite pipeline a standing 100 TB corpus
runs on every new crawl drop.

    new docs ──filter_unseen(bloom index)──► survivors ──staged write──► corpus/increment=<id>/
                                                 │
                                                 └──update_bloom_index──► index/v{N+1}

Each increment (a) drops documents already in the corpus via the sharded
Bloom index (``functions/bloom.py``), (b) appends the survivors to the
corpus as an immutable per-increment directory (hive-partitionable inside
it), and (c) folds the survivors' keys into a NEW index version committed
with the same atomic pointer-file pattern as the checkpoint manifest
(``state/checkpoint.py``).

Crash-replay safety holds for EVERY window when the caller names the
increment (``increment_id`` = the crawl-drop name) — the commit protocol
is staging-write -> index-commit -> rename:

* already-committed increment (final dir exists): return immediately,
  write nothing, index untouched;
* crash before the index commit: the staging dir may exist with partial
  files — replay recomputes the survivors (the old index still calls
  them unseen), REWRITES staging from scratch, and proceeds;
* crash between index commit and rename: replay finds every document
  seen (the new index is live) AND a staging dir — it finishes the
  interrupted rename, completing the increment without rewriting bytes.

Without an ``increment_id`` a random one is used and the written files
are safe, but a crashed run's replay appends duplicates (documented
trade; pass the id for exactly-once).
"""

from __future__ import annotations

import os
import shutil
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
    increment_id: str | None = None,
    partition_cols: list[str] | None = None,
    n_shards: int = 16,
    bits_per_key: int = 16,
) -> dict:
    """Run one ingest increment; returns counters for the run report.

    Exactly-once under crash-replay when ``increment_id`` names the drop
    (see module docstring for the window-by-window argument)."""
    from ..functions.bloom import (
        build_bloom_index_from_dataset,
        filter_unseen,
        update_bloom_index,
    )

    inc = increment_id or f"inc-{uuid.uuid4().hex[:12]}"
    final_dir = os.path.join(corpus_dir, f"increment={inc}")
    staging_dir = os.path.join(corpus_dir, f".staging-{inc}")
    if os.path.exists(final_dir):
        # increment fully committed in a prior run
        return {
            "n_offered": None,
            "n_written": 0,
            "n_dropped_as_seen": None,
            "index_version": None,
            "already_committed": True,
        }

    # one materialization of the input: counted, filtered and indexed from
    # the pinned copy (a lazy Dataset would re-execute per consumer)
    new_ds = new_ds.materialize()
    n_in = new_ds.count()

    idx = current_index(index_dir)
    if idx is None:
        survivors = new_ds
        next_idx = build_bloom_index_from_dataset(
            survivors, n_shards=n_shards, bits_per_key=bits_per_key
        )
    else:
        survivors = filter_unseen(new_ds, idx).materialize()
        next_idx = update_bloom_index(idx, survivors, bits_per_key=bits_per_key)

    n_kept = survivors.count()
    if n_kept:
        # staging rewrite is idempotent: a partial dir from a crashed
        # attempt is discarded wholesale
        if os.path.exists(staging_dir):
            shutil.rmtree(staging_dir)
        survivors.write_parquet(staging_dir, partition_cols=partition_cols)
        # completeness marker: written only after EVERY parquet file landed,
        # so a later crash-replay can tell "staging is a full drop awaiting
        # rename" from "staging is a torn partial write" (ADVICE r3)
        with open(os.path.join(staging_dir, "_SUCCESS"), "w") as f:
            f.flush()
            os.fsync(f.fileno())
        version = commit_index(next_idx, index_dir)
        os.replace(staging_dir, final_dir)
    elif os.path.exists(staging_dir):
        if os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
            # crash happened AFTER the index commit (everything now probes
            # seen) but BEFORE the rename: finish the interrupted commit
            os.replace(staging_dir, final_dir)
        else:
            # torn staging from a pre-commit crash (possibly of a replay
            # with different input): committing it would publish partial
            # files — discard; the index never saw these keys as committed
            shutil.rmtree(staging_dir)
        version = None
    else:
        version = None  # genuinely nothing new
    return {
        "n_offered": n_in,
        "n_written": n_kept,
        "n_dropped_as_seen": n_in - n_kept,
        "index_version": version,
        "already_committed": False,
    }
