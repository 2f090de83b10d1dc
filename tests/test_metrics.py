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


def test_callback_invoker_retry_and_swallow():
    from docling_jobkit_ray.pipelines.callbacks import CallbackInvoker

    calls = []
    fail_first = {"n": 0}

    def flaky(msg):
        fail_first["n"] += 1
        if fail_first["n"] <= 2:
            raise ConnectionError("transient")
        calls.append(msg)

    inv = CallbackInvoker(sink=flaky, retry_delay_s=0.001)
    assert inv.set_num_docs(5) is True  # succeeds on 3rd attempt
    assert calls[0] == {"event": "SET_NUM_DOCS", "total": 5}

    def always_broken(msg):
        raise RuntimeError("down")

    inv2 = CallbackInvoker(sink=always_broken, retry_delay_s=0.001, max_retries=1)
    assert inv2.document_completed("k", "SUCCESS", 1, 5) is False  # swallowed
    assert inv2.n_failed == 1 and "RuntimeError" in inv2.failures[0]


def test_checkpoint_with_callback_sequence(ray_session, corpus_dir, tmp_path):
    from docling_jobkit_ray.pipelines.callbacks import (
        CallbackInvoker,
        progress_callback_from_invoker,
    )
    from docling_jobkit_ray.state.checkpoint import run_extract_checkpointed_fused

    events = []
    inv = CallbackInvoker(sink=events.append)
    cb = progress_callback_from_invoker(inv, total_shards=3)
    run_extract_checkpointed_fused(corpus_dir, str(tmp_path / "o"), progress_callback=cb)
    assert events[0]["event"] == "SET_NUM_DOCS" and events[0]["total"] == 3
    completed = [e for e in events if e["event"] == "DOCUMENT_COMPLETED"]
    assert len(completed) == 3
    assert [e["index"] for e in completed] == [1, 2, 3]


def test_extract_options_validation():
    import pytest

    from docling_jobkit_ray.extract.record import ExtractOptions

    with pytest.raises(ValueError):
        ExtractOptions(max_bytes=0)
    with pytest.raises(ValueError):
        ExtractOptions(max_link_density=1.5)
    with pytest.raises(ValueError):
        ExtractOptions(slice_pages=-1)


def test_domain_stats(ray_session, corpus_dir):
    """Per-domain partial-agg aggregate: totals reconcile with the corpus
    row count and success never exceeds docs."""
    from docling_jobkit_ray.pipelines.extract import extract_pipeline
    from docling_jobkit_ray.pipelines.metrics import domain_stats

    out = domain_stats(extract_pipeline(corpus_dir, mode="fused")).to_pandas()
    assert out["n_docs"].sum() == 600
    assert (out["n_success"] <= out["n_docs"]).all()
    assert (out["total_text_chars"] >= 0).all()
    assert out["domain"].is_unique
    assert list(out["domain"]) == sorted(out["domain"])
