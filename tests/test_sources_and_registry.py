"""HTTP-source stage plumbing, stage registry, CLI smoke."""

from __future__ import annotations

import pyarrow as pa
import ray.data


def test_http_fetch_pipeline(ray_session):
    from docling_jobkit_ray.sources.http import fetch_pipeline

    urls = ray.data.from_items(
        [{"url": f"https://example.org/doc/{i}"} for i in range(50)]
    )
    out = fetch_pipeline(urls, concurrency=(1, 2)).take_all()
    assert len(out) == 50
    assert all(r["fetch_error"] is None for r in out)
    assert all(r["html"].startswith(b"<html>") for r in out)
    # deterministic across runs
    out2 = fetch_pipeline(
        ray.data.from_items([{"url": "https://example.org/doc/0"}]), concurrency=(1, 2)
    ).take_all()
    assert out2[0]["html"] == next(r for r in out if r["url"].endswith("/0"))["html"]


def test_http_fetch_then_extract(ray_session):
    from docling_jobkit_ray.sources.http import fetch_pipeline
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    urls = ray.data.from_items([{"url": f"https://example.org/p/{i}"} for i in range(20)])
    pages = fetch_pipeline(urls, concurrency=(1, 2))
    extracted = pages.map_batches(
        ExtractDocuments, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 2)
    ).take_all()
    assert all(r["status"] == "SUCCESS" for r in extracted)
    assert all("Deterministic fetched body" in r["text"] for r in extracted)


def test_http_fetch_error_absorbed(ray_session):
    from docling_jobkit_ray.sources.http import HttpFetch

    def flaky(url, headers):
        if url.endswith("bad"):
            raise ConnectionError("boom")
        return b"<p>ok page with enough text to be extracted properly</p>"

    udf = HttpFetch(fetcher=flaky)
    out = udf(pa.table({"url": ["https://a/ok", "https://a/bad"]}))
    errs = out.column("fetch_error").to_pylist()
    assert errs[0] is None and "ConnectionError" in errs[1]


def test_registry_apply_stage(ray_session, corpus_dir):
    from docling_jobkit_ray.pipelines.extract import extract_pipeline
    from docling_jobkit_ray.stages.registry import apply_stage, get_stage, list_stages

    assert {"extract", "chunk", "export", "minhash", "quality", "lang_id"} <= set(
        list_stages()
    )
    extracted = extract_pipeline(corpus_dir, mode="fused")
    out = apply_stage(extracted, "export").take(5)
    assert all("md" in r and "doctags" in r for r in out)
    # unknown stage raises with the known list
    try:
        get_stage("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "unknown stage" in str(e)


def test_registry_custom_stage(ray_session):
    from docling_jobkit_ray.stages.registry import apply_stage, register_stage

    def factory(opts):
        def udf(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.append_column("twice", pc.multiply(batch["x"], pa.scalar(2)))

        return udf, {"batch_format": "pyarrow"}

    register_stage("twice", factory, allow_override=True)
    ds = ray.data.from_items([{"x": i} for i in range(10)])
    out = sorted(apply_stage(ds, "twice").take_all(), key=lambda r: r["x"])
    assert [r["twice"] for r in out] == [2 * i for i in range(10)]


def test_plugin_discovery_entry_points(ray_session, tmp_path, monkeypatch):
    """Entry-point plugin discovery with the allow_external_plugins gate
    (reference: connectors/connector_factory.py:74-198): a third-party
    dist-info on sys.path is invisible by default and loads with the gate."""
    import sys
    import textwrap

    import ray.data

    from docling_jobkit_ray.stages.registry import (
        apply_stage,
        discover_plugins,
        list_stages,
    )

    pkg_dir = tmp_path / "site"
    pkg_dir.mkdir()
    (pkg_dir / "djr_test_plugin.py").write_text(
        textwrap.dedent(
            """
            import pyarrow.compute as pc

            def upper_factory(opts):
                def udf(batch):
                    i = batch.column_names.index("text")
                    return batch.set_column(i, "text", pc.utf8_upper(batch["text"]))
                return udf, {"batch_format": "pyarrow", "zero_copy_batch": True}
            """
        )
    )
    di = pkg_dir / "djr_test_plugin-0.1.dist-info"
    di.mkdir()
    (di / "METADATA").write_text("Metadata-Version: 2.1\nName: djr-test-plugin\nVersion: 0.1\n")
    (di / "entry_points.txt").write_text(
        "[docling_jobkit_ray.stages]\nupper_text = djr_test_plugin:upper_factory\n"
    )
    (di / "RECORD").write_text("")
    monkeypatch.syspath_prepend(str(pkg_dir))
    import importlib

    importlib.invalidate_caches()

    # gate closed: the external plugin must NOT load
    assert "upper_text" not in discover_plugins(allow_external_plugins=False)
    assert "upper_text" not in list_stages()
    # gate open: it loads and runs as a stage
    assert "upper_text" in discover_plugins(allow_external_plugins=True)
    ds = ray.data.from_items([{"text": "hello"}, {"text": "world"}])
    out = sorted(r["text"] for r in apply_stage(ds, "upper_text").take_all())
    assert out == ["HELLO", "WORLD"]
