"""Property-based parity: fast scanner == HTMLParser path on generated HTML.

The fast tokenizer (extract/html.py segment_blocks) must produce identical
blocks to the stdlib-HTMLParser reference path on any HTML the corpus domain
can contain.  Known, documented divergence (literal '>' inside quoted
attribute values) is excluded from the generator.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_jobkit_ray.extract.html import (
    extract_html,
    segment_blocks,
    segment_blocks_htmlparser,
)

TAGS = [
    "p", "div", "span", "em", "b", "a", "ul", "li", "table", "tr", "td",
    "h1", "h2", "h3", "nav", "footer", "header", "aside", "main", "section",
    "script", "style", "br", "img", "blockquote", "pre", "title", "textarea",
]

text_chunk = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="<>&",  # entities/brackets covered separately
        exclude_categories=("Cs",),
    ),
    max_size=40,
)

entities = st.sampled_from(["&amp;", "&lt;", "&gt;", "&#65;", "&nbsp;", "&quot;"])


@st.composite
def html_fragment(draw, depth=0):
    parts = []
    n = draw(st.integers(0, 4 if depth < 3 else 1))
    for _ in range(n):
        choice = draw(st.integers(0, 3))
        if choice == 0:
            parts.append(draw(text_chunk))
        elif choice == 1:
            parts.append(draw(entities))
        elif choice == 2:
            tag = draw(st.sampled_from(TAGS))
            if tag in ("br", "img"):
                parts.append(f"<{tag}>")
            elif tag in ("script", "style", "title", "textarea"):
                # raw-text elements: plain bodies (markup inside textarea is
                # a documented scanner/parser divergence, html.py:segment_blocks)
                body = draw(text_chunk)
                parts.append(f"<{tag}>{body}</{tag}>")
            else:
                inner = draw(html_fragment(depth=depth + 1))
                attr = draw(st.sampled_from(["", ' class="x"', ' href="/y"', " id=z"]))
                parts.append(f"<{tag}{attr}>{inner}</{tag}>")
        else:
            parts.append("<!-- a comment -->")
    return "".join(parts)


def _key(blocks):
    return [(b.kind, b.text, b.anchor_chars, b.in_boiler) for b in blocks]


@settings(max_examples=300, deadline=None)
@given(html_fragment())
def test_fast_scanner_matches_htmlparser(fragment):
    doc = f"<html><body>{fragment}</body></html>"
    assert _key(segment_blocks(doc)) == _key(segment_blocks_htmlparser(doc))


@settings(max_examples=100, deadline=None)
@given(html_fragment())
def test_extract_deterministic_and_spans_valid(fragment):
    doc = f"<html><body>{fragment}</body></html>"
    a = extract_html(doc)
    b = extract_html(doc)
    assert a.text == b.text and a.spans == b.spans
    for s in a.spans:
        assert 0 <= s["start"] <= s["end"] <= len(a.text)
        assert a.text[s["start"] : s["end"]] != "" or s["start"] == s["end"]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_arbitrary_text_never_crashes(junk):
    # malformed input must never raise from the fast scanner
    segment_blocks(junk)
    extract_html(junk)


from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=200, deadline=None)
@_given(_st.lists(_st.text(max_size=60), max_size=12))
def test_binarydoc_roundtrip_property(pages):
    from docling_jobkit_ray.extract import binarydoc

    data = binarydoc.build_binary_doc(pages)
    directory = binarydoc.parse_directory(data)
    texts, errors = binarydoc.parse_pages(data, directory, 0, len(directory))
    assert texts == pages and errors == []


@_settings(max_examples=200, deadline=None)
@_given(_st.binary(max_size=200))
def test_binarydoc_arbitrary_bytes_never_crash(data):
    from docling_jobkit_ray.extract import binarydoc
    from docling_jobkit_ray.extract.errors import ExtractError

    try:
        directory = binarydoc.parse_directory(binarydoc.MAGIC + data)
        binarydoc.parse_pages(binarydoc.MAGIC + data, directory, 0, len(directory))
    except ExtractError:
        pass  # typed rejection is the contract; anything else would fail
