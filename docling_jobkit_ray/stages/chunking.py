"""Chunking stage: extracted documents -> RAG-ready chunk rows.

Parity with the reference's TaskType.CHUNK path
(``/root/reference/docling_jobkit/convert/chunking.py:250-262`` — per-chunk
record with filename/chunk_index/text/num_tokens/headings/page_numbers), as a
``map_batches`` fan-out (one doc row -> N chunk rows).  The reference's
HybridChunker wraps a HF tokenizer (``chunking.py:136-148``, config-keyed LRU
cache ``:121-173``); our deterministic stand-in packs whole spans up to a
token budget, counting whitespace-delimited tokens — the chunker state (the
compiled tokenizer regex + options) lives in ``__init__`` like the
reference's chunker cache.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

CHUNK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_index", pa.int32()),
        ("text", pa.string()),
        ("num_tokens", pa.int32()),
        ("headings", pa.list_(pa.string())),
        ("page_numbers", pa.list_(pa.int32())),
        ("has_image", pa.bool_()),
    ]
)


class ChunkDocuments:
    """Actor-pool UDF: extracted rows -> chunk rows.

    Packing rule (deterministic): walk spans in order; a span is appended to
    the current chunk unless doing so would exceed max_tokens (spans larger
    than max_tokens become their own chunk).  Headings attach to the NEXT
    chunk as context (mirroring the reference's heading propagation,
    chunking.py:250-262).

    ``tokenizer`` makes the token budget tokenizer-faithful, like the
    reference's HybridChunker wrapping a real HF tokenizer behind an
    options-keyed cache (``convert/chunking.py:119-173``, tokenizer at
    ``:136-148``): pass any picklable callable ``text -> int`` (e.g. a
    closure over ``tokenizers.Tokenizer.encode`` returning
    ``len(enc.ids)``), or an object with a ``count_tokens(text)`` method.
    Default: whitespace-run counting (the dependency-free stand-in).  The
    tokenizer is constructed/shipped ONCE per actor (state in __init__),
    never per batch."""

    def __init__(
        self,
        max_tokens: int = 256,
        tokenizer=None,
        *,
        merge_peers: bool = True,
        variant: str = "hybrid",
        split_oversized: bool = False,
    ):
        if variant not in ("hybrid", "hierarchical"):
            raise ValueError(f"variant must be 'hybrid' or 'hierarchical', got {variant!r}")
        self.max_tokens = max_tokens
        self.merge_peers = merge_peers
        self.variant = variant
        self.split_oversized = split_oversized
        self.token_re = re.compile(r"\S+")
        if tokenizer is None:
            self._count_tokens = None
        elif callable(tokenizer):
            self._count_tokens = tokenizer
        elif hasattr(tokenizer, "count_tokens"):
            self._count_tokens = tokenizer.count_tokens
        else:
            raise TypeError(
                "tokenizer must be a callable text->int or expose count_tokens()"
            )

    def _count(self, text: str) -> int:
        if self._count_tokens is not None:
            return self._count_tokens(text)
        return len(self.token_re.findall(text))

    def _split_segment(self, seg: str) -> list[str]:
        """Token-budget split of one oversized segment (HybridChunker's
        split-then-merge first phase).  Splits on whitespace-token
        boundaries; with a custom tokenizer the budget check re-counts the
        growing piece through it."""
        token_spans = [m.span() for m in self.token_re.finditer(seg)]
        if not token_spans:
            return [seg]
        pieces: list[str] = []
        if self._count_tokens is None:
            # fast path: one whitespace token == one counted token
            for i in range(0, len(token_spans), self.max_tokens):
                lo = token_spans[i][0]
                hi = token_spans[min(i + self.max_tokens, len(token_spans)) - 1][1]
                pieces.append(seg[lo:hi])
            return pieces
        start = token_spans[0][0]
        last_end = token_spans[0][1]
        for lo, hi in token_spans[1:]:
            if self._count(seg[start:hi]) > self.max_tokens:
                pieces.append(seg[start:last_end])
                start = lo
            last_end = hi
        pieces.append(seg[start:last_end])
        return pieces

    def chunk_doc(self, url: str, text: str, spans: list[dict]) -> list[dict]:
        """Two-phase chunking, mirroring the reference's chunker family
        (``convert/chunking.py:136-150``):

        * elements = non-heading spans; each carries the heading CONTEXT
          (the run of consecutive headings immediately above it — chunks
          never span a heading boundary, docling's section rule);
        * ``variant="hierarchical"``: one chunk per element, no token
          budget (HierarchicalChunker);
        * ``variant="hybrid"``: oversized elements optionally split
          (``split_oversized``), then ``merge_peers=True`` packs adjacent
          SAME-CONTEXT elements up to max_tokens (HybridChunker's
          merge_peers), ``merge_peers=False`` leaves one chunk per
          element."""
        chunks: list[dict] = []
        cur_parts: list[str] = []
        cur_tokens = 0
        cur_headings: list[str] = []
        cur_pages: set[int] = set()
        context: list[str] = []
        context_open = False  # currently inside a run of heading spans

        def flush():
            nonlocal cur_parts, cur_tokens, cur_headings, cur_pages
            if cur_parts:
                chunk_text = "\n".join(cur_parts)
                chunks.append(
                    {
                        "url": url,
                        "chunk_index": len(chunks),
                        "text": chunk_text,
                        "num_tokens": self._count(chunk_text),
                        "headings": list(cur_headings),
                        "page_numbers": sorted(cur_pages),
                        "has_image": False,
                    }
                )
            cur_parts, cur_tokens, cur_headings, cur_pages = [], 0, [], set()

        page_no = 0
        hierarchical = self.variant == "hierarchical"
        for span in spans or []:
            seg = text[span["start"] : span["end"]]
            kind = span["kind"]
            if kind == "page":
                page_no += 1
            if kind == "heading":
                flush()  # a heading starts a new section: never merge across
                if context_open:
                    context.append(seg)
                else:
                    context = [seg]
                    context_open = True
                continue
            context_open = False
            segs = [seg]
            n = self._count(seg)
            if (
                not hierarchical
                and self.split_oversized
                and n > self.max_tokens
            ):
                segs = self._split_segment(seg)
            for piece in segs:
                n = self._count(piece)
                if hierarchical or not self.merge_peers:
                    flush()
                elif cur_tokens and cur_tokens + n > self.max_tokens:
                    flush()
                if not cur_parts:
                    cur_headings = list(context)
                cur_parts.append(piece)
                cur_tokens += n
                if kind == "page":
                    cur_pages.add(page_no)
                if not hierarchical and cur_tokens >= self.max_tokens:
                    flush()
        flush()
        return chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        spans = batch.column("spans").to_pylist()
        statuses = batch.column("status").to_pylist()
        for url, text, sp, status in zip(urls, texts, spans, statuses):
            if status == "FAILURE" or not text:
                continue
            rows.extend(self.chunk_doc(url, text, sp or []))
        cols = {name: [] for name in CHUNK_SCHEMA.names}
        for r in rows:
            for name in CHUNK_SCHEMA.names:
                cols[name].append(r[name])
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in CHUNK_SCHEMA],
            schema=CHUNK_SCHEMA,
        )


def chunk_pipeline(
    extracted: ray.data.Dataset,
    *,
    max_tokens: int = 256,
    tokenizer=None,
    merge_peers: bool = True,
    variant: str = "hybrid",
    split_oversized: bool = False,
) -> ray.data.Dataset:
    # callable instance -> stateless task pool: the chunker's state (one
    # compiled regex + the injected tokenizer) is trivial, and task pools
    # schedule much better than a small autoscaling actor pool behind a
    # fast upstream stage
    return extracted.map_batches(
        ChunkDocuments(
            max_tokens=max_tokens,
            tokenizer=tokenizer,
            merge_peers=merge_peers,
            variant=variant,
            split_oversized=split_oversized,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
