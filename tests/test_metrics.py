"""Run-level metrics, archive sink, timing merge."""

from __future__ import annotations

import os
import zipfile


def test_run_summary_and_categories(ray_session, corpus_dir, corpus_oracle):
    from docling_jobkit_ray.pipelines.extract import extract_pipeline
    from docling_jobkit_ray.pipelines.metrics import category_counts, run_summary

    ds = extract_pipeline(corpus_dir, mode="fused")
    s = run_summary(ds)
    from collections import Counter

    expected = Counter(r["status"] for r in corpus_oracle.values())
    assert s["num_succeeded"] == expected["SUCCESS"]
    assert s["num_failed"] == expected["FAILURE"]
    assert s["num_converted"] == len(corpus_oracle)

    cats = category_counts(extract_pipeline(corpus_dir, mode="fused"))
    expected_cats = Counter(
        r["category"] for r in corpus_oracle.values() if r["category"]
    )
    assert cats == dict(expected_cats)


def test_write_archive(ray_session, corpus_dir, corpus_oracle, tmp_path):
    from docling_jobkit_ray.pipelines.extract import extract_pipeline
    from docling_jobkit_ray.pipelines.metrics import write_archive

    zp = str(tmp_path / "out.zip")
    n = write_archive(extract_pipeline(corpus_dir, mode="fused"), zp, formats=("txt", "json"))
    n_ok = sum(1 for r in corpus_oracle.values() if r["status"] != "FAILURE")
    assert n == n_ok
    with zipfile.ZipFile(zp) as zf:
        names = zf.namelist()
        assert len(names) == 2 * n_ok
        # spot-check one member round-trips byte-identically
        some_url, some = next(
            (u, r) for u, r in corpus_oracle.items() if r["status"] == "SUCCESS" and r["text"]
        )
        member = some_url.replace("://", "_").replace("/", "_")[:180] + ".txt"
        assert zf.read(member).decode("utf-8") == some["text"]


def test_merge_shard_timings():
    from docling_jobkit_ray.pipelines.metrics import merge_shard_timings

    recs = [{"wall_sec": 1.0}, {"wall_sec": 3.0}]
    m = merge_shard_timings(recs)
    assert m == {
        "count": 2, "total_sec": 4.0, "min_sec": 1.0, "max_sec": 3.0, "mean_sec": 2.0,
    }
    assert merge_shard_timings([])["count"] == 0
