"""Per-document record extraction: bytes -> ExportableDocument-equivalent row.

This is the single shared code path for BOTH the single-process oracle and the
Ray pipeline UDFs (SURVEY.md §7.3: byte-identity by construction).  Output row
schema mirrors the reference's ``ExportableDocument``
(``/root/reference/docling_jobkit/datamodel/exportable_document.py:53-122``):
identity (url), status, content (text/spans/doc_json), error surface.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from . import binarydoc
from .errors import (
    STATUS_FAILURE,
    STATUS_PARTIAL_SUCCESS,
    STATUS_SUCCESS,
    DecodeError,
    EmptyPayloadError,
    ExtractError,
    PayloadTooLargeError,
    TooManyPagesError,
    classify_exception,
)
from .html import (
    DEFAULT_MAX_LINK_DENSITY,
    DEFAULT_MIN_PARAGRAPH_CHARS,
    KIND_PAGE,
    extract_html,
)

PAGE_SEP = "\n\n"


@dataclass(frozen=True)
class ExtractOptions:
    """Frozen per-run options; the analogue of the reference's hashed
    ``PdfFormatOption`` (``convert/manager.py:1673-1723``) — one options
    object selects one warm extractor configuration for the whole run."""

    max_bytes: int = 64 * 1024 * 1024
    max_pages: int = 1000
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY
    min_paragraph_chars: int = DEFAULT_MIN_PARAGRAPH_CHARS
    # Binary docs with more pages than this are sliced when fan-out is on.
    slice_pages: int = 10

    def __post_init__(self):
        # boundary validation, the reference's options-matrix discipline
        # (convert/manager.py:1461-1552 validates every option at the edge)
        if self.max_bytes <= 0:
            raise ValueError(f"max_bytes must be positive, got {self.max_bytes}")
        if self.max_pages <= 0:
            raise ValueError(f"max_pages must be positive, got {self.max_pages}")
        if not (0.0 <= self.max_link_density <= 1.0):
            raise ValueError(
                f"max_link_density must be in [0, 1], got {self.max_link_density}"
            )
        if self.min_paragraph_chars < 0:
            raise ValueError(
                f"min_paragraph_chars must be >= 0, got {self.min_paragraph_chars}"
            )
        if self.slice_pages <= 0:
            raise ValueError(f"slice_pages must be positive, got {self.slice_pages}")


def assemble_pages(page_texts: list[str]) -> tuple[str, list[dict]]:
    """Join page texts with PAGE_SEP and emit one span per page.

    Shared by the inline path and the slice-reassembly path so both produce
    byte-identical text (SURVEY.md §7.3, slice ordering concern)."""
    spans: list[dict] = []
    offset = 0
    for i, t in enumerate(page_texts):
        if i > 0:
            offset += len(PAGE_SEP)
        spans.append({"start": offset, "end": offset + len(t), "kind": KIND_PAGE})
        offset += len(t)
    return PAGE_SEP.join(page_texts), spans


def pages_doc_json(text: str, spans: list[dict], n_pages: int) -> str:
    payload = {
        "schema": "docling-jobkit-ray/extracted-pages@1",
        "n_chars": len(text),
        "n_pages": n_pages,
        "spans": [
            {"end": s["end"], "kind": s["kind"], "start": s["start"]} for s in spans
        ],
    }
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def _success_row(url: str, text: str, spans: list[dict], doc_json: str, status: str = STATUS_SUCCESS, error: str | None = None) -> dict:
    return {
        "url": url,
        "status": status,
        "text": text,
        "spans": spans,
        "doc_json": doc_json,
        "n_chars": len(text),
        "error": error,
        "category": None,
        "retryable": None,
    }


def _failure_row(url: str, exc: BaseException) -> dict:
    """FAILURE row preserving identity + error, mirroring
    ``_build_failed_exportable_document`` (convert/results.py:112-127)."""
    category, retryable, phase = classify_exception(exc)
    return {
        "url": url,
        "status": STATUS_FAILURE,
        "text": "",
        "spans": [],
        "doc_json": "",
        "n_chars": 0,
        "error": f"{type(exc).__name__}: {exc} [phase={phase}]",
        "category": category,
        "retryable": retryable,
    }


def preflight(data: bytes, options: ExtractOptions) -> None:
    """Admission checks; raises typed ExtractError.  Analogue of
    ``materialize_and_preflight`` (convert/materialization.py:158-213)."""
    if len(data) == 0:
        raise EmptyPayloadError("empty payload")
    if len(data) > options.max_bytes:
        raise PayloadTooLargeError(
            f"payload {len(data)} bytes exceeds limit {options.max_bytes}"
        )
    if binarydoc.is_binary_doc(data):
        directory = binarydoc.parse_directory(data)
        if len(directory) > options.max_pages:
            raise TooManyPagesError(
                f"{len(directory)} pages exceeds limit {options.max_pages}"
            )


def extract_record(url: str, data: bytes, options: ExtractOptions) -> dict:
    """One document, full pipeline, all expected errors absorbed.

    Never raises for data-dependent failures — returns a FAILURE row instead
    (per-row failure isolation vs Ray's block-level retry, SURVEY.md §7.3).
    """
    try:
        preflight(data, options)
        if binarydoc.is_binary_doc(data):
            directory = binarydoc.parse_directory(data)
            page_texts, errors = binarydoc.parse_pages(
                data, directory, 0, len(directory)
            )
            text, spans = assemble_pages(page_texts)
            doc_json = pages_doc_json(text, spans, len(directory))
            if errors and len(errors) == len(directory):
                status = STATUS_FAILURE
            elif errors:
                status = STATUS_PARTIAL_SUCCESS
            else:
                status = STATUS_SUCCESS
            if status == STATUS_FAILURE:
                return _failure_row(url, DecodeError("; ".join(errors)))
            return _success_row(
                url, text, spans, doc_json, status=status,
                error="; ".join(errors) if errors else None,
            )
        # HTML path: strict UTF-8 decode; invalid bytes -> dead letter.
        try:
            html_text = data.decode("utf-8", errors="strict")
        except UnicodeDecodeError as exc:
            raise DecodeError(f"payload not UTF-8 ({exc.reason})") from exc
        doc = extract_html(
            html_text,
            max_link_density=options.max_link_density,
            min_paragraph_chars=options.min_paragraph_chars,
        )
        return _success_row(url, doc.text, doc.spans, doc.doc_json())
    except ExtractError as exc:
        return _failure_row(url, exc)
    except Exception as exc:  # unexpected: still absorb, classified internal
        return _failure_row(url, exc)


def extract_corpus_oracle(rows: list[tuple[str, bytes]], options: ExtractOptions) -> list[dict]:
    """Single-process oracle: the reference run the Ray pipeline must
    byte-match per url (BASELINE.json per-row invariant)."""
    return [extract_record(url, data, options) for url, data in rows]
