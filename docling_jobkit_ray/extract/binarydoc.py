"""Deterministic binary "layout document" container + parser.

Stand-in for the reference's PDF path (docling is not installable in this
sandbox — SURVEY.md §7.0).  The container mirrors what the reference's
materialize → preflight → slice → reassemble shape needs
(``/root/reference/docling_jobkit/convert/materialization.py:158-213``,
``orchestrators/ray/serve_deployment.py:437-464,510-549``): a page count that
preflight can read cheaply, and a page directory that lets a slice fan-out
ship ONLY the byte range of its pages (the reference shares whole-PDF bytes
via ``ray.put``; with a page directory we do strictly better — zero payload
duplication across slices).

Format (little-endian):
    magic   8 bytes   b"DLBIN1\\x00\\x00"
    u16     page_count
    u32[n]  per-page payload byte lengths (the page directory)
    bytes   concatenated UTF-8 page payloads
"""

from __future__ import annotations

import struct

from .errors import DecodeError, MalformedBinaryError

MAGIC = b"DLBIN1\x00\x00"
_HEADER = struct.Struct("<H")
_LEN = struct.Struct("<I")


def is_binary_doc(data: bytes) -> bool:
    return data[: len(MAGIC)] == MAGIC


def build_binary_doc(pages: list[str]) -> bytes:
    payloads = [p.encode("utf-8") for p in pages]
    out = [MAGIC, _HEADER.pack(len(payloads))]
    for p in payloads:
        out.append(_LEN.pack(len(p)))
    out.extend(payloads)
    return b"".join(out)


def parse_directory(data: bytes) -> list[tuple[int, int]]:
    """-> [(offset, length)] per page. Raises MalformedBinaryError.

    This is the cheap preflight (page-count + structural validity), the
    analogue of ``materialize_and_preflight`` (materialization.py:158-213).
    """
    if not is_binary_doc(data):
        raise MalformedBinaryError("bad magic")
    pos = len(MAGIC)
    if len(data) < pos + _HEADER.size:
        raise MalformedBinaryError("truncated header")
    (n_pages,) = _HEADER.unpack_from(data, pos)
    pos += _HEADER.size
    dir_end = pos + n_pages * _LEN.size
    if len(data) < dir_end:
        raise MalformedBinaryError("truncated page directory")
    lengths = [
        _LEN.unpack_from(data, pos + i * _LEN.size)[0] for i in range(n_pages)
    ]
    offsets: list[tuple[int, int]] = []
    off = dir_end
    for ln in lengths:
        offsets.append((off, ln))
        off += ln
    if off != len(data):
        raise MalformedBinaryError(
            f"payload size mismatch: directory says {off - dir_end}, "
            f"have {len(data) - dir_end}"
        )
    return offsets


def parse_page(data: bytes, offset: int, length: int) -> tuple[str | None, str | None]:
    """-> (text, error). A page that fails strict UTF-8 decode contributes
    empty text + an error (doc degrades to PARTIAL_SUCCESS, mirroring the
    reference's per-slice status merge, serve_deployment.py:510-549)."""
    try:
        return data[offset : offset + length].decode("utf-8", errors="strict"), None
    except UnicodeDecodeError as exc:
        return None, f"{DecodeError.__name__}: page payload not UTF-8 ({exc.reason})"


def parse_pages(
    data: bytes, directory: list[tuple[int, int]], start: int, stop: int
) -> tuple[list[str], list[str]]:
    """Parse pages [start, stop) -> (page_texts, errors). Failed pages
    contribute "" so slice/inline assembly stays byte-identical."""
    texts: list[str] = []
    errors: list[str] = []
    for i in range(start, stop):
        off, ln = directory[i]
        text, err = parse_page(data, off, ln)
        if err is not None:
            errors.append(f"page {i}: {err}")
            texts.append("")
        else:
            texts.append(text)
    return texts, errors
