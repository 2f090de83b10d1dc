"""Inline (file/base64) wire sources + HTTP-PUT target delivery."""

from __future__ import annotations

import base64
import hashlib
import os

import pytest

from docling_jobkit_ray.sources.inline import pages_from_inline
from docling_jobkit_ray.state.http_target import (
    HttpPutTarget,
    filesystem_transport,
    http_put_pipeline,
)


def test_pages_from_inline_all_kinds(ray_session, tmp_path):
    html = b"<html><body><main><p>Inline body paragraph long enough to keep the extractor happy.</p></main></body></html>"
    f = tmp_path / "doc.html"
    f.write_bytes(html)
    sources = [
        {"filename": "b64.html", "base64_string": base64.b64encode(html).decode()},
        {"filename": "raw.html", "data": html},
        {"filename": "file.html", "path": str(f)},
        {"filename": "bad.html", "base64_string": "!!!not-base64!!!"},
    ]
    rows = {r["url"]: r for r in pages_from_inline(sources).take_all()}
    assert set(rows) == {"b64.html", "raw.html", "file.html", "bad.html"}
    for u in ("b64.html", "raw.html", "file.html"):
        assert bytes(rows[u]["html"]) == html
        assert rows[u]["source_error"] is None
    assert rows["bad.html"]["html"] == b""
    assert "Error" in rows["bad.html"]["source_error"]

    # malformed wire rows fail fast at the API edge
    with pytest.raises(ValueError):
        pages_from_inline([{"filename": "x", "data": b"", "path": "y"}])
    with pytest.raises(ValueError):
        pages_from_inline([{"data": b"no filename"}])


def test_inline_source_feeds_extraction(ray_session):
    """Inline rows flow through the same extraction UDF as any source."""
    from docling_jobkit_ray.extract.record import ExtractOptions
    from docling_jobkit_ray.stages.extract import ExtractDocuments, options_to_kwargs

    html = b"<html><body><main><p>Wire-delivered paragraph with enough words to clear the minimum content threshold easily.</p></main></body></html>"
    sources = [{"filename": f"wire-{i}.html", "data": html} for i in range(5)]
    ds = pages_from_inline(sources).map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"options": options_to_kwargs(ExtractOptions())},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )
    out = ds.take_all()
    assert len(out) == 5
    assert all(r["status"] == "SUCCESS" for r in out)


def test_http_put_target_delivers_and_reports(ray_session, tmp_path):
    import ray.data

    sink = str(tmp_path / "sink")
    results = ray.data.from_items(
        [
            {"url": f"https://ex.com/d{i}", "doc_json": f'{{"doc":{i}}}'}
            for i in range(6)
        ]
    )
    report = http_put_pipeline(
        results,
        url_template="https://collector.example/{url}",
        transport=filesystem_transport(sink),
        concurrency=(1, 2),
    ).take_all()
    assert len(report) == 6
    assert all(r["status_code"] == 201 and r["put_error"] is None for r in report)
    # the bodies actually landed, one file per target url
    assert len(os.listdir(sink)) == 6
    one = report[0]
    name = hashlib.sha256(one["target_url"].encode()).hexdigest()[:24]
    with open(os.path.join(sink, name), "rb") as f:
        assert f.read().startswith(b'{"doc":')


def test_http_put_per_row_presigned_urls(ray_session, tmp_path):
    """Per-row target_url column = the presigned-URL serving shape."""
    import ray.data

    sink = str(tmp_path / "sink2")
    results = ray.data.from_items(
        [
            {"url": "a", "doc_json": "{}", "presigned": "https://bucket/a?sig=1"},
            {"url": "b", "doc_json": "{}", "presigned": "https://bucket/b?sig=2"},
        ]
    )
    report = http_put_pipeline(
        results,
        target_url_col="presigned",
        transport=filesystem_transport(sink),
        concurrency=(1, 2),
    ).take_all()
    assert sorted(r["target_url"] for r in report) == [
        "https://bucket/a?sig=1",
        "https://bucket/b?sig=2",
    ]
    assert len(os.listdir(sink)) == 2


def test_http_put_failure_isolation():
    import pyarrow as pa

    def flaky(target_url, body, headers):
        if target_url.endswith("boom"):
            raise ConnectionError("refused")
        return 200

    udf = HttpPutTarget(url_template="https://c/{url}", transport=flaky)
    out = udf(
        pa.table({"url": ["ok", "boom"], "doc_json": ['{"a":1}', '{"b":2}']})
    )
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows["ok"]["status_code"] == 200
    assert rows["boom"]["status_code"] is None
    assert "ConnectionError" in rows["boom"]["put_error"]
    with pytest.raises(ValueError):
        HttpPutTarget()
