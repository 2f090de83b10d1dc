"""Presigned-URL targets (VERDICT r2 item 8) and the multi-options LRU in
ExtractDocuments (item 9)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from docling_jobkit_ray.state.http_target import (
    add_presigned_targets,
    check_presigned,
    filesystem_transport,
    http_put_pipeline,
    presign_url,
)

SECRET = b"test-secret"


def test_presign_roundtrip_valid():
    url = presign_url("https://sink.example", "docs/a.json", secret=SECRET, expires_in=60, now=1000)
    assert url.startswith("https://sink.example/docs/a.json?X-Expires=1060&X-Signature=")
    assert check_presigned(url, secret=SECRET, now=1000) is None
    assert check_presigned(url, secret=SECRET, now=1060) is None  # inclusive


def test_presign_expiry():
    url = presign_url("https://sink.example", "k", secret=SECRET, expires_in=60, now=1000)
    assert check_presigned(url, secret=SECRET, now=1061) == "expired"


def test_presign_tamper_detected():
    url = presign_url("https://sink.example", "k", secret=SECRET, expires_in=60, now=1000)
    # tamper with expiry
    assert check_presigned(url.replace("X-Expires=1060", "X-Expires=99999"), secret=SECRET, now=1000) == "bad_signature"
    # wrong secret
    assert check_presigned(url, secret=b"other", now=1000) == "bad_signature"
    # wrong method binding
    assert check_presigned(url, secret=SECRET, method="GET", now=1000) == "bad_signature"
    assert check_presigned("https://sink.example/k", secret=SECRET) == "missing_params"


def test_presigned_delivery_pipeline(ray_session, tmp_path):
    """Per-row presigned target_url -> HTTP-PUT delivery report, validated
    signatures end-to-end (the reference's presigned-PUT flow)."""
    import ray.data

    rows = pa.table(
        {
            "url": pa.array([f"https://x/{i}" for i in range(8)], pa.string()),
            "doc_json": pa.array([json.dumps({"i": i}) for i in range(8)], pa.string()),
        }
    )
    ds = add_presigned_targets(
        ray.data.from_arrow(rows),
        endpoint="https://sink.example",
        secret=SECRET,
        expires_in=120,
        now=5000,
    )
    report = http_put_pipeline(
        ds,
        target_url_col="target_url",
        transport=filesystem_transport(str(tmp_path / "sink")),
        concurrency=(1, 2),
    ).to_pandas()
    assert len(report) == 8
    assert (report["status_code"] == 201).all()
    for t in report["target_url"]:
        assert check_presigned(t, secret=SECRET, now=5000) is None
        assert check_presigned(t, secret=SECRET, now=5121) == "expired"
    # distinct documents get distinct signed destinations
    assert report["target_url"].nunique() == 8


# ---------------------------------------------------------------------------
# multi-options LRU
# ---------------------------------------------------------------------------

_HTML = (
    "<html><body><main><p>A long paragraph with plenty of words to keep under any"
    " sane threshold of extraction quality for testing purposes here.</p>"
    "<p>tiny</p></main></body></html>"
).encode()


def _batch(opts_json: list[str | None]) -> pa.Table:
    n = len(opts_json)
    return pa.table(
        {
            "url": pa.array([f"https://x/{i}" for i in range(n)], pa.string()),
            "html": pa.array([_HTML] * n, pa.binary()),
            "options_json": pa.array(opts_json, pa.string()),
        }
    )


def test_one_pool_serves_mixed_option_sets():
    """Two option-sets through ONE stage instance: per-row resolution via
    the options LRU (manager.py:426-479 analogue)."""
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    permissive = json.dumps({"min_paragraph_chars": 1})
    strict = json.dumps({"min_paragraph_chars": 2000})  # drops every paragraph
    udf = ExtractDocuments(options_col="options_json")
    out = udf(_batch([None, permissive, strict]))
    texts = out.column("text").to_pylist()
    assert texts[1] != ""  # permissive keeps text
    assert texts[2] == ""  # strict drops everything
    # default-row output matches the constructor options
    from docling_jobkit_ray.extract.record import ExtractOptions, extract_record

    assert texts[0] == extract_record("u", _HTML, ExtractOptions())["text"]


def test_options_lru_evicts_but_stays_correct():
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    o1 = json.dumps({"min_paragraph_chars": 1})
    o2 = json.dumps({"min_paragraph_chars": 2000})
    o3 = json.dumps({"min_paragraph_chars": 1, "max_bytes": 10})  # payload-too-large
    udf = ExtractDocuments(options_col="options_json", options_cache_size=2)
    out = udf(_batch([o1, o2, o3, o1, o2, o3]))
    statuses = out.column("status").to_pylist()
    texts = out.column("text").to_pylist()
    assert statuses[2] == statuses[5] == "FAILURE"  # o3: over max_bytes
    assert texts[0] == texts[3] != ""
    assert texts[1] == texts[4] == ""
    assert len(udf._options_lru) == 2  # bounded cache


def test_options_lru_page_range_json_roundtrip():
    from docling_jobkit_ray.extract.binarydoc import build_binary_doc
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    pages = [f"Page {i} words here." for i in range(10)]
    doc = build_binary_doc(pages)
    batch = pa.table(
        {
            "url": pa.array(["https://x/b"], pa.string()),
            "html": pa.array([doc], pa.binary()),
            "options_json": pa.array([json.dumps({"page_range": [2, 4]})], pa.string()),
        }
    )
    udf = ExtractDocuments(options_col="options_json")
    out = udf(batch)
    from docling_jobkit_ray.extract.record import assemble_pages

    assert out.column("text").to_pylist()[0] == assemble_pages(pages[1:4])[0]


def test_options_cache_size_validation():
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    with pytest.raises(ValueError):
        ExtractDocuments(options_cache_size=0)


def test_malformed_options_json_dead_letters_row():
    """A bad per-row options cell must fail THAT row, not the whole block."""
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    udf = ExtractDocuments(options_col="options_json")
    out = udf(_batch(["{not json", None]))
    statuses = out.column("status").to_pylist()
    assert statuses[0] == "FAILURE"
    assert statuses[1] == "SUCCESS"


def test_presign_endpoint_with_base_path():
    """An endpoint carrying a base path (multi-tenant prefix) must validate:
    generation and validation both sign the FULL URL path."""
    url = presign_url("https://sink.example/tenant1/", "docs/a.json", secret=SECRET, expires_in=60, now=1000)
    assert "/tenant1/docs/a.json?" in url
    assert check_presigned(url, secret=SECRET, now=1000) is None
    assert check_presigned(url, secret=SECRET, now=2000) == "expired"


def test_missing_declared_options_col_raises():
    from docling_jobkit_ray.stages.extract import ExtractDocuments

    udf = ExtractDocuments(options_col="options_jsn")  # typo'd column
    with pytest.raises(ValueError, match="options_jsn"):
        udf(_batch([None]).drop_columns(["options_json"]))
