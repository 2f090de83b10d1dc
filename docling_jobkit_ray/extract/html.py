"""Deterministic HTML main-content extraction (Readability/jusText-style).

Pure Python + stdlib ``html.parser``; no Ray, no external deps.  This is the
single code path shared by the single-process oracle and the Ray pipeline, so
per-url byte-identity of ``text`` holds by construction (SURVEY.md §7.3).

Semantics preserved from the reference's per-document convert shape
(``/root/reference/docling_jobkit/datamodel/exportable_document.py:53-122``):
one input document -> one record with ``text``, ``spans``, ``doc_json``,
``status``.  The extraction heuristics themselves are the public
text-density / link-density boilerplate classification of Readability /
jusText (Pomikalek 2011), reimplemented from the published description:

- the document is segmented into blocks at block-level tag boundaries;
- blocks inside nav/header/footer/aside and blocks whose anchor-text
  char ratio (link density) exceeds a threshold are boilerplate;
- short paragraphs are boilerplate; headings are kept only when followed
  by good content before the next heading.

Determinism: fixed thresholds, no dict-order dependence, whitespace
collapsed to single spaces, blocks joined with "\\n\\n", char offsets.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Block kinds (FIXTURES.md §3 span kinds).
KIND_PARAGRAPH = "paragraph"
KIND_HEADING = "heading"
KIND_LIST_ITEM = "list_item"
KIND_TABLE = "table"
KIND_PAGE = "page"

# Tags whose text content never contributes to output.
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head", "title", "svg", "iframe", "textarea"})
# Structural boilerplate containers.
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})
# Tags that terminate the current text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "html",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "table", "tr", "td", "th", "thead", "tbody",
        "blockquote", "pre", "br", "hr", "figure", "figcaption", "form",
    }
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# Void elements: never pushed on the tag stack.
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed", "source", "track", "wbr"})

DEFAULT_MAX_LINK_DENSITY = 0.4
DEFAULT_MIN_PARAGRAPH_CHARS = 25


@dataclass
class Block:
    kind: str
    text: str
    anchor_chars: int
    in_boiler: bool
    good: bool = False

    @property
    def link_density(self) -> float:
        if not self.text:
            return 1.0
        return self.anchor_chars / len(self.text)


@dataclass
class ExtractedDoc:
    """The per-document record (ExportableDocument-equivalent)."""

    text: str
    spans: list[dict] = field(default_factory=list)  # {start,end,kind}
    n_blocks_total: int = 0
    n_blocks_kept: int = 0

    def doc_json(self) -> str:
        # DoclingDocument-equivalent JSON: deterministic key order and
        # compact separators so it is byte-stable.
        payload = {
            "schema": "docling-jobkit-ray/extracted@1",
            "n_chars": len(self.text),
            "n_blocks_total": self.n_blocks_total,
            "n_blocks_kept": self.n_blocks_kept,
            "spans": [
                {"end": s["end"], "kind": s["kind"], "start": s["start"]}
                for s in self.spans
            ],
        }
        return json.dumps(payload, sort_keys=True, separators=(",", ":"))


class _BlockParser(HTMLParser):
    """Segments an HTML document into text blocks with anchor-char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0
        self._kind_stack: list[str] = []  # nested kind contexts (heading/li/td...)
        self._table_depth = 0

    # -- block management -------------------------------------------------
    def _current_kind(self) -> str:
        if self._kind_stack:
            return self._kind_stack[-1]
        if self._table_depth > 0:
            return KIND_TABLE
        return KIND_PARAGRAPH

    def _flush(self) -> None:
        raw = "".join(self._parts)
        self._parts = []
        anchor = self._anchor_chars
        self._anchor_chars = 0
        text = " ".join(raw.split())
        if not text:
            return
        # anchor_chars was counted on raw text; clamp to normalized length.
        anchor = min(anchor, len(text))
        self.blocks.append(
            Block(
                kind=self._current_kind(),
                text=text,
                anchor_chars=anchor,
                in_boiler=self._boiler_depth > 0,
            )
        )

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag in _BOILER_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _HEADING_TAGS:
            self._kind_stack.append(KIND_HEADING)
        elif tag == "li":
            self._kind_stack.append(KIND_LIST_ITEM)
        elif tag in ("td", "th"):
            self._kind_stack.append(KIND_TABLE)
        if tag == "table":
            self._table_depth += 1

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BOILER_TAGS and self._boiler_depth > 0:
            self._boiler_depth -= 1
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag in _HEADING_TAGS and self._kind_stack and self._kind_stack[-1] == KIND_HEADING:
            self._kind_stack.pop()
        elif tag == "li" and self._kind_stack and self._kind_stack[-1] == KIND_LIST_ITEM:
            self._kind_stack.pop()
        elif tag in ("td", "th") and self._kind_stack and self._kind_stack[-1] == KIND_TABLE:
            self._kind_stack.pop()
        if tag == "table" and self._table_depth > 0:
            self._table_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0 or not data:
            return
        self._parts.append(data)
        if self._anchor_depth > 0:
            self._anchor_chars += len(" ".join(data.split()))

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def segment_blocks_htmlparser(html_text: str) -> list[Block]:
    """Reference tokenizer path (stdlib HTMLParser).  Kept for cross-checking
    the fast scanner; ~3x slower."""
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()
    return parser.blocks


# ---------------------------------------------------------------------------
# fast scanner: one compiled-regex pass instead of HTMLParser's char loop
# ---------------------------------------------------------------------------

_TAG_NAME_RE = re.compile(r"(/?)\s*([a-zA-Z][a-zA-Z0-9:_-]*)")
# full tag in one C call: name + attrs up to the closing '>'
_FULLTAG_RE = re.compile(r"(/?)\s*([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>")
# raw-text elements whose content must be skipped to the matching close tag;
# the close search is a precompiled case-insensitive regex (C-speed, no
# full-document .lower() copy — that copy was a measurable share of the
# kernel's memory traffic)
_RAWTEXT_TAGS = ("script", "style", "textarea", "title")
_RAWTEXT_CLOSE_RE = {t: re.compile("</" + t, re.IGNORECASE) for t in _RAWTEXT_TAGS}
_AMP = "&"


# Precomputed per-tag dispatch for the fast scanner: ONE dict lookup per tag
# instead of seven set-membership tests (starttag/endtag are the hottest
# Python calls in the whole engine).  Flags are DERIVED from the same tag
# sets the stdlib _BlockParser path reads directly, so the two tokenizers
# cannot drift (tests/test_html_fuzz.py asserts block-level parity).
def _compute_tag_flags(tag: str) -> tuple:
    if tag in _HEADING_TAGS:
        kind = KIND_HEADING
    elif tag == "li":
        kind = KIND_LIST_ITEM
    elif tag in ("td", "th"):
        kind = KIND_TABLE
    else:
        kind = None
    return (
        tag in _BLOCK_TAGS,
        tag in _VOID_TAGS,
        tag in _SKIP_TAGS,
        tag in _BOILER_TAGS,
        kind,
        tag == "a",
        tag == "table",
    )


_SPECIAL_TAGS = (
    _BLOCK_TAGS | _VOID_TAGS | _SKIP_TAGS | _BOILER_TAGS | _HEADING_TAGS
    | {"a", "li", "td", "th", "table"}
)
_TAG_FLAGS = {t: _compute_tag_flags(t) for t in _SPECIAL_TAGS}


class _BlockBuilder:
    """The tag/text state machine shared by both tokenizers (identical
    semantics to the _BlockParser hooks above)."""

    __slots__ = (
        "blocks", "_parts", "_anchor_chars", "_skip_depth", "_boiler_depth",
        "_anchor_depth", "_kind_stack", "_table_depth",
    )

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0
        self._kind_stack: list[str] = []
        self._table_depth = 0

    def _flush(self) -> None:
        if not self._parts:
            self._anchor_chars = 0
            return
        raw = "".join(self._parts)
        self._parts = []
        anchor = self._anchor_chars
        self._anchor_chars = 0
        text = " ".join(raw.split())
        if not text:
            return
        if self._kind_stack:
            kind = self._kind_stack[-1]
        elif self._table_depth > 0:
            kind = KIND_TABLE
        else:
            kind = KIND_PARAGRAPH
        self.blocks.append(
            Block(
                kind=kind,
                text=text,
                anchor_chars=min(anchor, len(text)),
                in_boiler=self._boiler_depth > 0,
            )
        )

    def starttag(self, tag: str) -> None:
        f = _TAG_FLAGS.get(tag)
        if f is None:
            return  # non-special tag: no state change (same as the set path)
        is_block, is_void, is_skip, is_boiler, kind, is_anchor, is_table = f
        if is_block and (self._parts or self._anchor_chars):
            self._flush()
        if is_void:
            return
        if is_skip:
            self._skip_depth += 1
        if is_boiler:
            self._boiler_depth += 1
        if is_anchor:
            self._anchor_depth += 1
        if kind is not None:
            self._kind_stack.append(kind)
        if is_table:
            self._table_depth += 1

    def endtag(self, tag: str) -> None:
        f = _TAG_FLAGS.get(tag)
        if f is None:
            return
        is_block, is_void, is_skip, is_boiler, kind, is_anchor, is_table = f
        if is_block and (self._parts or self._anchor_chars):
            self._flush()
        if is_void:
            return
        if is_skip and self._skip_depth > 0:
            self._skip_depth -= 1
        if is_boiler and self._boiler_depth > 0:
            self._boiler_depth -= 1
        if is_anchor and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if kind is not None and self._kind_stack and self._kind_stack[-1] == kind:
            self._kind_stack.pop()
        if is_table and self._table_depth > 0:
            self._table_depth -= 1

    def data(self, text: str) -> None:
        if self._skip_depth > 0 or not text:
            return
        self._parts.append(text)
        if self._anchor_depth > 0:
            self._anchor_chars += len(" ".join(text.split()))

    def finish(self) -> list[Block]:
        self._flush()
        return self.blocks


def segment_blocks(html_text: str) -> list[Block]:
    """Fast single-pass tokenizer driving the same block state machine.

    Semantics match the HTMLParser path on well-formed HTML (cross-checked
    in tests); known divergences: (1) a literal '>' inside a quoted
    attribute value terminates the tag early; (2) MARKUP inside
    <textarea> — both paths drop textarea text (form UI is boilerplate;
    textarea is in _SKIP_TAGS), but this scanner blind-jumps to the close
    tag while HTMLParser still interprets nested tags as structure.
    ~4x faster — this is the hot kernel of the whole engine, so the
    tokenizer matters."""
    import html as _htmlmod

    b = _BlockBuilder()
    n = len(html_text)
    pos = 0
    find = html_text.find
    unescape = _htmlmod.unescape
    data = b.data
    fulltag_match = _FULLTAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            seg = html_text[pos:]
            if seg:
                data(unescape(seg) if _AMP in seg else seg)
            break
        if lt > pos:
            seg = html_text[pos:lt]
            data(unescape(seg) if _AMP in seg else seg)
        # classify the tag
        nxt = html_text[lt + 1 : lt + 2]
        if nxt == "!":
            if html_text.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:  # doctype / CDATA-ish
                end = find(">", lt + 2)
                pos = n if end < 0 else end + 1
            continue
        if nxt == "?":  # processing instruction
            end = find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        m = fulltag_match(html_text, lt + 1)
        if not m:
            if _TAG_NAME_RE.match(html_text, lt + 1):
                break  # truncated tag at EOF: drop the remainder
            # stray '<' treated as text (HTMLParser emits it as data)
            data("<")
            pos = lt + 1
            continue
        end = m.end() - 1
        slash, tag = m.group(1, 2)
        closing = slash == "/"
        if not tag.islower():  # already-lowercase tags skip the copy
            tag = tag.lower()
        self_closing = html_text[end - 1] == "/"
        if closing:
            b.endtag(tag)
        else:
            b.starttag(tag)
            if self_closing:
                b.endtag(tag)
            elif tag in _RAWTEXT_TAGS:
                # jump over raw content to the matching close tag
                mm = _RAWTEXT_CLOSE_RE[tag].search(html_text, end + 1)
                if mm is None:
                    pos = n
                    continue
                end = mm.start() - 1  # next loop starts at the close tag
        pos = end + 1
    return b.finish()


def classify_blocks(
    blocks: list[Block],
    *,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    min_paragraph_chars: int = DEFAULT_MIN_PARAGRAPH_CHARS,
) -> None:
    """Two-pass jusText-style classification; sets ``block.good`` in place."""
    # Pass 1: content blocks.
    for b in blocks:
        if b.kind == KIND_HEADING:
            continue
        if b.in_boiler or b.link_density > max_link_density:
            b.good = False
        elif b.kind == KIND_PARAGRAPH and len(b.text) < min_paragraph_chars:
            b.good = False
        elif b.kind in (KIND_LIST_ITEM, KIND_TABLE) and len(b.text) < 3:
            b.good = False
        else:
            b.good = True
    # Pass 2: a heading is good iff good content follows it before the
    # next heading (jusText's near-good heading promotion, deterministic).
    for i, b in enumerate(blocks):
        if b.kind != KIND_HEADING:
            continue
        if b.in_boiler or b.link_density > max_link_density:
            b.good = False
            continue
        good_after = False
        for nb in blocks[i + 1 :]:
            if nb.kind == KIND_HEADING:
                break
            if nb.good:
                good_after = True
                break
        b.good = good_after


def assemble(blocks: list[Block]) -> ExtractedDoc:
    """Join kept blocks with \\n\\n; record char-offset spans."""
    kept = [b for b in blocks if b.good]
    parts: list[str] = []
    spans: list[dict] = []
    offset = 0
    for b in kept:
        if parts:
            offset += 2  # "\n\n"
        spans.append({"start": offset, "end": offset + len(b.text), "kind": b.kind})
        parts.append(b.text)
        offset += len(b.text)
    return ExtractedDoc(
        text="\n\n".join(parts),
        spans=spans,
        n_blocks_total=len(blocks),
        n_blocks_kept=len(kept),
    )


def extract_html(
    html_text: str,
    *,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    min_paragraph_chars: int = DEFAULT_MIN_PARAGRAPH_CHARS,
) -> ExtractedDoc:
    """Full pipeline for one decoded HTML document. Pure + deterministic."""
    blocks = segment_blocks(html_text)
    classify_blocks(
        blocks,
        max_link_density=max_link_density,
        min_paragraph_chars=min_paragraph_chars,
    )
    return assemble(blocks)
