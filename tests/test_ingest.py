"""Continuous-ingest loop (pipelines/ingest.py): bloom-filtered dedup
against the standing corpus, staged per-increment append, versioned index
commit, and exactly-once crash-replay across every commit window.
"""

from __future__ import annotations

import os
import shutil

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
        _docs(0, 300, "dropA"),
        corpus_dir=corpus,
        index_dir=index,
        increment_id="dropA",
        partition_cols=["lang"],
    )
    assert r1["n_offered"] == 300 and r1["n_written"] == 300
    assert r1["index_version"] is not None
    assert current_index(index) is not None
    # immutable per-increment dir, hive layout inside it
    inc1 = os.path.join(corpus, "increment=dropA")
    assert sorted(d for d in os.listdir(inc1) if d.startswith("lang=")) == [
        "lang=en",
        "lang=fr",
    ]

    # increment 2: half overlap with increment 1
    r2 = ingest_increment(
        _docs(150, 450, "dropA"),  # ids 150-299 repeat dropA texts
        corpus_dir=corpus,
        index_dir=index,
        increment_id="dropB",
        partition_cols=["lang"],
    )
    assert r2["n_offered"] == 300
    assert r2["n_dropped_as_seen"] == 150
    assert r2["n_written"] == 150

    # named replay of a committed increment: fast path, nothing touched
    before = open(os.path.join(index, "CURRENT")).read()
    r3 = ingest_increment(
        _docs(150, 450, "dropA"),
        corpus_dir=corpus,
        index_dir=index,
        increment_id="dropB",
        partition_cols=["lang"],
    )
    assert r3["already_committed"] and r3["n_written"] == 0
    assert open(os.path.join(index, "CURRENT")).read() == before

    # the corpus holds exactly the union, readable with partition pruning
    back = ray.data.read_parquet(corpus)
    assert back.count() == 450
    en_only = ray.data.read_parquet(os.path.join(inc1, "lang=en"))
    assert en_only.count() == 150


def test_ingest_replay_under_unnamed_increment_dedups_by_bloom(ray_session, tmp_path):
    """Even without increment_id, a FULLY-committed increment's docs are in
    the index, so a replay writes nothing (dedup by content, not by id)."""
    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    ingest_increment(_docs(0, 200, "x"), corpus_dir=corpus, index_dir=index)
    r = ingest_increment(_docs(0, 200, "x"), corpus_dir=corpus, index_dir=index)
    assert r["n_written"] == 0 and r["index_version"] is None


def test_ingest_crash_window_before_index_commit(ray_session, tmp_path):
    """A partial staging dir from a crash BEFORE the index commit is
    discarded and rewritten — no duplicates, no loss."""
    import ray.data

    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    # simulate the crashed attempt: stale partial staging content
    staging = os.path.join(corpus, ".staging-drop1")
    os.makedirs(staging)
    with open(os.path.join(staging, "garbage.parquet"), "w") as f:
        f.write("partial")
    r = ingest_increment(
        _docs(0, 100, "x"), corpus_dir=corpus, index_dir=index, increment_id="drop1"
    )
    assert r["n_written"] == 100
    back = ray.data.read_parquet(os.path.join(corpus, "increment=drop1"))
    assert back.count() == 100  # garbage gone, exactly the survivors


def test_ingest_crash_window_after_index_commit(ray_session, tmp_path):
    """Crash AFTER the index commit but BEFORE the rename: the replay sees
    everything as seen, finds the staging dir, and finishes the rename —
    the increment's docs are not lost and not duplicated."""
    import ray.data

    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    r1 = ingest_increment(
        _docs(0, 100, "x"), corpus_dir=corpus, index_dir=index, increment_id="drop1"
    )
    assert r1["n_written"] == 100
    # simulate the crash window: the increment committed its index but the
    # rename "didn't happen" — move the final dir back to staging
    final = os.path.join(corpus, "increment=drop1")
    staging = os.path.join(corpus, ".staging-drop1")
    os.replace(final, staging)

    r2 = ingest_increment(
        _docs(0, 100, "x"), corpus_dir=corpus, index_dir=index, increment_id="drop1"
    )
    assert r2["n_written"] == 0  # everything probed seen
    assert os.path.exists(final) and not os.path.exists(staging)  # rename finished
    assert ray.data.read_parquet(final).count() == 100


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


def test_ingest_torn_staging_without_marker_is_discarded(ray_session, tmp_path):
    """A staging dir with NO _SUCCESS marker is a torn pre-commit write
    (possibly from a replay with different input); the all-seen replay must
    discard it rather than publish partial files (ADVICE r3)."""
    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    ingest_increment(
        _docs(0, 100, "x"), corpus_dir=corpus, index_dir=index, increment_id="drop1"
    )
    # torn staging for drop2: partial file, no _SUCCESS
    staging = os.path.join(corpus, ".staging-drop2")
    os.makedirs(staging)
    with open(os.path.join(staging, "partial.parquet"), "w") as f:
        f.write("torn")
    r = ingest_increment(
        _docs(0, 100, "x"),  # all probe seen -> n_kept == 0
        corpus_dir=corpus,
        index_dir=index,
        increment_id="drop2",
    )
    assert r["n_written"] == 0
    assert not os.path.exists(staging)  # torn dir discarded
    assert not os.path.exists(os.path.join(corpus, "increment=drop2"))


def test_committed_increment_carries_success_marker(ray_session, tmp_path):
    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    ingest_increment(
        _docs(0, 50, "x"), corpus_dir=corpus, index_dir=index, increment_id="d"
    )
    final = os.path.join(corpus, "increment=d")
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    # marker does not confuse parquet discovery
    import ray.data

    assert ray.data.read_parquet(final).count() == 50


def _mk_increments(ray_session, corpus, index, drops):
    import ray.data

    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    for inc_id, ids in drops:
        ds = ray.data.from_items(
            [{"doc_id": i, "text": f"doc {i}", "lang": "en"} for i in ids]
        )
        ingest_increment(ds, corpus_dir=corpus, index_dir=index, increment_id=inc_id)


def test_compact_increments_merges_and_deletes_sources(ray_session, tmp_path):
    import os

    from docling_jobkit_ray.pipelines.ingest import compact_increments, read_corpus

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(ray_session, corpus, index, [("d1", [1, 2]), ("d2", [3]), ("d3", [4, 5])])
    before = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
    rep = compact_increments(corpus, compaction_id="c1")
    assert rep["n_absorbed"] == 3 and rep["n_rows"] == 5
    after = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
    assert after == before == [1, 2, 3, 4, 5]
    dirs = sorted(d for d in os.listdir(corpus) if d.startswith("increment="))
    assert dirs == ["increment=c1"]
    # replay is a no-op
    rep2 = compact_increments(corpus, compaction_id="c1")
    assert rep2["already_committed"] and rep2["n_deleted_on_replay"] == 0


def test_compact_duplicate_window_is_invisible_to_readers(ray_session, tmp_path):
    """Crash between rename and source deletion: rows exist twice on disk,
    but the manifest suppresses the absorbed copies; replay finishes."""
    import json
    import os
    import shutil

    from docling_jobkit_ray.pipelines.ingest import compact_increments, read_corpus

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(ray_session, corpus, index, [("d1", [1, 2]), ("d2", [3])])
    # simulate the window: run a real compaction, then RESURRECT a source
    # copy as if deletion had not happened yet
    src_backup = str(tmp_path / "backup")
    shutil.copytree(os.path.join(corpus, "increment=d1"), src_backup)
    compact_increments(corpus, compaction_id="c1")
    shutil.copytree(src_backup, os.path.join(corpus, "increment=d1"))
    # duplicate window: d1 on disk twice, reader must see each row once
    got = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
    assert got == [1, 2, 3]
    # replay with the same id finishes the interrupted deletion
    rep = compact_increments(corpus, compaction_id="c1")
    assert rep["already_committed"] and rep["n_deleted_on_replay"] == 1
    assert not os.path.exists(os.path.join(corpus, "increment=d1"))


def test_reader_and_prober_during_live_compaction(ray_session, tmp_path, monkeypatch):
    """VERDICT r4 #7: a reader AND a bloom prober interleaved with the
    compactor's actual commit sequence must see exactly-once rows at EVERY
    window — asserted inside the commit itself by spying the rename, not by
    reconstructing states after the fact."""
    import os as _os

    import docling_jobkit_ray.pipelines.ingest as ingest
    from docling_jobkit_ray.functions.bloom import mark_seen
    from docling_jobkit_ray.pipelines.ingest import (
        compact_increments,
        current_index,
        read_corpus,
    )

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(
        ray_session, corpus, index, [("d1", [1, 2]), ("d2", [3, 4]), ("d3", [5])]
    )
    expected = [1, 2, 3, 4, 5]

    def snapshot():
        import ray.data

        got = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
        assert got == expected, f"reader saw {got} mid-compaction"
        # prober: every committed key must still probe seen (the index is
        # independent of the compactor's file moves)
        probe = ray.data.from_items(
            [{"doc_id": i, "text": f"doc {i}", "lang": "en"} for i in expected]
        )
        marked = mark_seen(probe, current_index(index)).take_all()
        assert all(r["probably_seen"] for r in marked)

    windows = []
    real_replace = _os.replace

    def spy_replace(src, dst):
        if dst.endswith("increment=c1"):
            windows.append("pre-rename")
            snapshot()  # staging complete + _SUCCESS, commit not yet visible
            real_replace(src, dst)
            windows.append("post-rename")
            # duplicate window: compacted dir live, sources still on disk
            assert _os.path.isdir(_os.path.join(corpus, "increment=d1"))
            snapshot()
        else:
            real_replace(src, dst)

    monkeypatch.setattr(ingest.os, "replace", spy_replace)
    rep = compact_increments(corpus, compaction_id="c1")
    monkeypatch.setattr(ingest.os, "replace", real_replace)
    assert windows == ["pre-rename", "post-rename"]
    assert rep["n_absorbed"] == 3 and rep["n_rows"] == 5
    snapshot()  # post-deletion steady state
    dirs = sorted(d for d in _os.listdir(corpus) if d.startswith("increment="))
    assert dirs == ["increment=c1"]


def test_compact_torn_staging_discarded_and_chained_compaction(ray_session, tmp_path):
    import os

    from docling_jobkit_ray.pipelines.ingest import compact_increments, read_corpus

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(ray_session, corpus, index, [("d1", [1]), ("d2", [2])])
    # torn staging (no _SUCCESS, no rename) from a crashed attempt
    os.makedirs(os.path.join(corpus, ".staging-c1"))
    with open(os.path.join(corpus, ".staging-c1", "junk.parquet"), "w") as f:
        f.write("not parquet")
    rep = compact_increments(corpus, compaction_id="c1")
    assert rep["n_absorbed"] == 2 and not rep["already_committed"]
    # chain: new drop, then compact the compacted increment with it
    _mk_increments(ray_session, corpus, index, [("d3", [3])])
    rep2 = compact_increments(corpus, compaction_id="c2")
    assert rep2["n_absorbed"] == 2  # c1 + d3
    got = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
    assert got == [1, 2, 3]


def test_ingest_replay_of_absorbed_increment_writes_nothing(ray_session, tmp_path):
    """Compaction deletes the increment dir, but exactly-once survives via
    the bloom index: every key still probes seen."""
    import os

    import ray.data

    from docling_jobkit_ray.pipelines.ingest import (
        compact_increments,
        ingest_increment,
        read_corpus,
    )

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(ray_session, corpus, index, [("d1", [1, 2]), ("d2", [3])])
    compact_increments(corpus, compaction_id="c1")
    ds = ray.data.from_items([{"doc_id": i, "text": f"doc {i}", "lang": "en"} for i in (1, 2)])
    rep = ingest_increment(ds, corpus_dir=corpus, index_dir=index, increment_id="d1")
    assert rep["n_written"] == 0 and rep["n_dropped_as_seen"] == 2
    assert not os.path.exists(os.path.join(corpus, "increment=d1"))
    got = sorted(r["doc_id"] for r in read_corpus(corpus).take_all())
    assert got == [1, 2, 3]


def test_gc_index_versions_keeps_live_plus_slack(ray_session, tmp_path):
    import os

    from docling_jobkit_ray.pipelines.ingest import gc_index_versions

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "index")
    _mk_increments(
        ray_session, corpus, index,
        [("d1", [1]), ("d2", [2]), ("d3", [3]), ("d4", [4])],
    )
    versions = sorted(d for d in os.listdir(index) if d.startswith("v-"))
    assert len(versions) == 4
    with open(os.path.join(index, "CURRENT")) as f:
        live = f.read().strip()
    rep = gc_index_versions(index, keep=1)
    assert rep["n_deleted"] == 2
    remaining = sorted(d for d in os.listdir(index) if d.startswith("v-"))
    assert live in remaining and len(remaining) == 2
    # live index still loads and further ingest still dedups
    import ray.data

    from docling_jobkit_ray.pipelines.ingest import ingest_increment

    ds = ray.data.from_items([{"doc_id": 1, "text": "doc 1", "lang": "en"}])
    rep2 = ingest_increment(ds, corpus_dir=corpus, index_dir=index, increment_id="d5")
    assert rep2["n_written"] == 0


def test_read_corpus_schema_evolution(ray_session, tmp_path):
    """An increment written before a column existed reads back with nulls
    under the footer-union schema; a type conflict raises instead of
    silently promoting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.pipelines.ingest import read_corpus, superset_schema

    d1 = tmp_path / "increment=a"
    d2 = tmp_path / "increment=b"
    d1.mkdir(); d2.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64())}), d1 / "part0.parquet"
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([3], pa.int64()), "lang": pa.array(["en"])}
        ),
        d2 / "part0.parquet",
    )
    out = read_corpus(str(tmp_path)).to_pandas().sort_values("doc_id")
    # the hive partition column rides along as usual
    assert list(out.columns) == ["doc_id", "lang", "increment"]
    assert out["lang"].isna().sum() == 2 and out["lang"].iloc[2] == "en"

    # conflict: same column, different type
    d3 = tmp_path / "increment=c"
    d3.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([9], pa.int32())}), d3 / "part0.parquet"
    )
    import pytest as _pytest

    with _pytest.raises(TypeError, match="doc_id"):
        superset_schema(
            [str(d1 / "part0.parquet"), str(d3 / "part0.parquet")]
        )
