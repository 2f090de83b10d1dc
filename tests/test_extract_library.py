"""Unit tests for the pure extraction library (no Ray)."""

from __future__ import annotations

import json

from docling_jobkit_ray.extract import binarydoc
from docling_jobkit_ray.extract.errors import (
    STATUS_FAILURE,
    STATUS_PARTIAL_SUCCESS,
    STATUS_SUCCESS,
)
from docling_jobkit_ray.extract.html import extract_html
from docling_jobkit_ray.extract.record import (
    ExtractOptions,
    assemble_pages,
    extract_record,
)

OPTS = ExtractOptions()


def test_html_boilerplate_stripped():
    html = (
        "<html><head><title>t</title><script>var x=1;</script></head><body>"
        '<nav><a href="/a">home</a> <a href="/b">about</a></nav>'
        "<main><h1>A real heading here</h1>"
        "<p>This is the main content paragraph with plenty of characters in it.</p>"
        '<div>Related: <a href="/x">one link</a> | <a href="/y">two link</a> | <a href="/z">three</a></div>'
        "</main><footer><a href='/c'>contact</a></footer></body></html>"
    )
    doc = extract_html(html)
    assert "main content paragraph" in doc.text
    assert "home" not in doc.text  # nav stripped
    assert "contact" not in doc.text  # footer stripped
    assert "one link" not in doc.text  # link-dense div stripped
    assert "var x" not in doc.text  # script stripped
    assert doc.text.startswith("A real heading here")
    # spans slice validly
    for s in doc.spans:
        assert 0 <= s["start"] <= s["end"] <= len(doc.text)
    assert doc.spans[0]["kind"] == "heading"


def test_heading_without_content_dropped():
    html = "<body><h2>Lonely heading</h2><nav><a href='/'>x</a></nav></body>"
    doc = extract_html(html)
    assert doc.text == ""


def test_short_paragraph_dropped_long_kept():
    html = "<body><p>tiny</p><p>A sufficiently long paragraph that should be retained here.</p></body>"
    doc = extract_html(html)
    assert "tiny" not in doc.text
    assert "retained" in doc.text


def test_list_and_table_kinds():
    html = (
        "<body><ul><li>First item of the list with text</li>"
        "<li>Second item of the list with text</li></ul>"
        "<table><tr><td>cell one text</td><td>cell two text</td></tr></table></body>"
    )
    doc = extract_html(html)
    kinds = [s["kind"] for s in doc.spans]
    assert "list_item" in kinds
    assert "table" in kinds


def test_doc_json_deterministic():
    html = "<body><p>A paragraph long enough to be kept in the output text.</p></body>"
    a = extract_html(html).doc_json()
    b = extract_html(html).doc_json()
    assert a == b
    payload = json.loads(a)
    assert payload["n_chars"] == len(extract_html(html).text)


def test_binarydoc_roundtrip():
    pages = ["page one text", "page two text", ""]
    data = binarydoc.build_binary_doc(pages)
    directory = binarydoc.parse_directory(data)
    assert len(directory) == 3
    texts, errors = binarydoc.parse_pages(data, directory, 0, 3)
    assert texts == pages
    assert errors == []


def test_binarydoc_truncated_rejected():
    data = binarydoc.build_binary_doc(["abc", "def"])[:-2]
    try:
        binarydoc.parse_directory(data)
        raise AssertionError("expected MalformedBinaryError")
    except binarydoc.MalformedBinaryError:
        pass


def test_assemble_pages_offsets():
    text, spans = assemble_pages(["aa", "", "bbb"])
    assert text == "aa\n\n\n\nbbb"
    assert spans == [
        {"start": 0, "end": 2, "kind": "page"},
        {"start": 4, "end": 4, "kind": "page"},
        {"start": 6, "end": 9, "kind": "page"},
    ]
    for s in spans:
        assert text[s["start"] : s["end"]] is not None


def test_extract_record_paths():
    # empty -> source_unavailable
    r = extract_record("u1", b"", OPTS)
    assert r["status"] == STATUS_FAILURE and r["category"] == "source_unavailable"
    # invalid utf-8 -> internal
    r = extract_record("u2", b"\xff\xfe\x00", OPTS)
    assert r["status"] == STATUS_FAILURE and r["category"] == "internal"
    # oversized -> policy
    small = ExtractOptions(max_bytes=10)
    r = extract_record("u3", b"<p>0123456789012345</p>", small)
    assert r["status"] == STATUS_FAILURE and r["category"] == "policy"
    # too many pages -> policy
    data = binarydoc.build_binary_doc(["x"] * 5)
    r = extract_record("u4", data, ExtractOptions(max_pages=3))
    assert r["status"] == STATUS_FAILURE and r["category"] == "policy"
    # binary happy path
    data = binarydoc.build_binary_doc(["page one here", "page two here"])
    r = extract_record("u5", data, OPTS)
    assert r["status"] == STATUS_SUCCESS
    assert r["text"] == "page one here\n\npage two here"
    assert [s["kind"] for s in r["spans"]] == ["page", "page"]


def test_extract_record_partial_success_binary():
    import struct

    from docling_jobkit_ray.extract.binarydoc import MAGIC

    raw = [b"good page text", b"\xff\xfe bad", b"another good page"]
    data = (
        MAGIC
        + struct.pack("<H", 3)
        + b"".join(struct.pack("<I", len(p)) for p in raw)
        + b"".join(raw)
    )
    r = extract_record("u6", data, OPTS)
    assert r["status"] == STATUS_PARTIAL_SUCCESS
    assert r["text"] == "good page text\n\n\n\nanother good page"
    assert "page 1" in r["error"]
