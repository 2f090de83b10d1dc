"""Checkpoint/resume: atomic per-shard output, manifest counters, skip-done."""

from __future__ import annotations

import json
import os

import ray.data


def test_checkpointed_run_and_resume(ray_session, corpus_dir, corpus_oracle, tmp_path):
    from docling_jobkit_ray.state.checkpoint import (
        completed_shards,
        run_extract_checkpointed,
    )

    out = str(tmp_path / "out")
    totals = run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    assert totals["shards_total"] == 3
    assert totals["shards_skipped_resume"] == 0
    assert totals["docs"] == len(corpus_oracle)
    expected_failures = sum(
        1 for r in corpus_oracle.values() if r["status"] == "FAILURE"
    )
    assert totals["parse_failures"] == expected_failures
    assert totals["input_bytes"] > 0

    # manifest records exist per shard, with lineage + counters
    done = completed_shards(out)
    assert len(done) == 3
    for rec in done.values():
        assert os.path.isdir(os.path.join(out, rec["output_dir"]))
        assert rec["docs"] > 0 and "wall_sec" in rec and rec["shard_path"]

    # output content matches the oracle (read back everything)
    import glob

    parts = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
    ds = ray.data.read_parquet(parts)
    got = {r["url"]: r for r in ds.take_all()}
    assert set(got) == set(corpus_oracle)
    for url, want in corpus_oracle.items():
        assert got[url]["text"] == want["text"]

    # resume: delete ONE manifest record -> only that shard re-runs
    mdir = os.path.join(out, "_manifest")
    victim = sorted(os.listdir(mdir))[0]
    os.remove(os.path.join(mdir, victim))
    totals2 = run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    assert totals2["shards_skipped_resume"] == 2
    assert totals2["docs"] == totals["docs"]  # durable counters re-aggregate

    # rerun with everything done: nothing executes, totals stable
    totals3 = run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    assert totals3["shards_skipped_resume"] == 3
    assert totals3 == {**totals2, "shards_skipped_resume": 3}


def test_manifest_atomicity_no_tmp_leftover(ray_session, corpus_dir, tmp_path):
    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed

    out = str(tmp_path / "out")
    run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    leftovers = [d for d in os.listdir(out) if d.startswith(".tmp-")]
    assert leftovers == []
    for f in os.listdir(os.path.join(out, "_manifest")):
        assert not f.startswith(".tmp-")
        rec = json.load(open(os.path.join(out, "_manifest", f)))
        assert {"shard_key", "docs", "parse_failures", "input_bytes"} <= set(rec)


def test_checkpointed_fused_matches_oracle(ray_session, corpus_dir, corpus_oracle, tmp_path):
    import glob

    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed

    out = str(tmp_path / "fused_out")
    seen = []
    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed_fused

    totals = run_extract_checkpointed_fused(
        corpus_dir, out, progress_callback=lambda rec: seen.append(rec["shard_key"])
    )
    assert totals["docs"] == len(corpus_oracle)
    assert len(seen) == 3  # progress callback fired per shard
    parts = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
    ds = ray.data.read_parquet(parts)
    got = {r["url"]: r["text"] for r in ds.take_all()}
    assert got == {u: r["text"] for u, r in corpus_oracle.items()}
    # resume skips everything
    totals2 = run_extract_checkpointed(corpus_dir, out, mode="fused")
    assert totals2["shards_skipped_resume"] == 3
    assert totals2["docs"] == totals["docs"]


def test_crash_between_publish_and_manifest_redoes_shard(
    ray_session, corpus_dir, corpus_oracle, tmp_path
):
    """The manifest is the commit point: a part-* dir that was renamed into
    place but whose manifest record never landed (crash window) must be
    re-done and OVERWRITTEN on the next run."""
    import glob

    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed

    out = str(tmp_path / "out")
    run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    mdir = os.path.join(out, "_manifest")
    victim = sorted(os.listdir(mdir))[0]
    victim_key = victim[: -len(".json")]
    # simulate the crash window: manifest gone, published output corrupted
    os.remove(os.path.join(mdir, victim))
    part_dir = os.path.join(out, f"part-{victim_key}")
    for f in os.listdir(part_dir):
        os.remove(os.path.join(part_dir, f))
    with open(os.path.join(part_dir, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    totals = run_extract_checkpointed(corpus_dir, out, concurrency=(1, 2))
    assert totals["shards_skipped_resume"] == 2
    # the corrupted partition was rebuilt: full corpus reads back correct
    parts = sorted(glob.glob(os.path.join(out, "part-*", "*.parquet")))
    ds = ray.data.read_parquet(parts)
    got = {r["url"]: r["text"] for r in ds.take_all()}
    assert got == {u: r["text"] for u, r in corpus_oracle.items()}


def test_resume_refuses_pipeline_mismatch(ray_session, corpus_dir, tmp_path):
    """A shard completed under pipeline=standard must not be silently
    skipped by a vlm resume (the partition would lack vlm_json)."""
    import pytest

    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed

    out = str(tmp_path / "out")
    run_extract_checkpointed(corpus_dir, out, mode="fused")
    with pytest.raises(ValueError, match="pipeline"):
        run_extract_checkpointed(corpus_dir, out, mode="fused", pipeline="vlm")
    # same family resumes fine
    totals = run_extract_checkpointed(corpus_dir, out, mode="fused")
    assert totals["shards_skipped_resume"] == 3


def test_resume_infers_pipeline_from_legacy_manifest(ray_session, corpus_dir, tmp_path):
    """Manifests written before pipeline tracking: the family is inferred
    from the partition schema, so a legacy vlm dir refuses a standard
    resume (and vice versa) instead of silently mixing schemas."""
    import pytest

    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed

    out = str(tmp_path / "legacy")
    run_extract_checkpointed(corpus_dir, out, mode="fused", pipeline="vlm")
    # simulate legacy manifests: strip the pipeline field
    mdir = os.path.join(out, "_manifest")
    for f in os.listdir(mdir):
        p = os.path.join(mdir, f)
        rec = json.load(open(p))
        rec.pop("pipeline", None)
        json.dump(rec, open(p, "w"))
    with pytest.raises(ValueError, match="pipeline"):
        run_extract_checkpointed(corpus_dir, out, mode="fused")  # standard
    totals = run_extract_checkpointed(corpus_dir, out, mode="fused", pipeline="vlm")
    assert totals["shards_skipped_resume"] == 3
