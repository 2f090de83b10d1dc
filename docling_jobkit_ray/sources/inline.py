"""Inline (in-body) document sources: base64 / raw-bytes / local-file rows.

Parity with the reference's wire inputs
(``/root/reference/docling_jobkit/datamodel/http_inputs.py:3-5`` —
``FileSource`` carries ``base64_string`` + ``filename``; job payloads may mix
them with URL sources): a caller hands the engine documents IN the request
body instead of pointing at object storage.

Ray-Data shape: the wire rows become a Dataset immediately
(``ray.data.from_items``); the base64 decode / file read happens INSIDE
``map_batches`` on workers, so the driver never holds decoded payloads and a
large inline batch streams like any other source.  Output schema matches the
pages table contract (url, html) so every downstream stage —
``extract_pipeline`` via its Dataset-ready stages, dedup, chunking — is
source-agnostic (the reference's source-expansion rule, SURVEY.md §2.1).
"""

from __future__ import annotations

import base64
import binascii

import pyarrow as pa
import ray.data


def pages_from_inline(sources: list[dict]) -> ray.data.Dataset:
    """Wire rows -> pages-shaped Dataset (url, html, source_error).

    Each source dict needs ``filename`` (becomes the url identity) plus ONE
    of: ``base64_string`` (the reference's FileSource), ``data`` (raw
    bytes), or ``path`` (a worker-readable file).  Malformed rows degrade to
    (url, b"", source_error) — dead-letter-able, never raising, mirroring
    the materializer's failure isolation (convert/materialization.py:97-155).
    """
    items = []
    for i, src in enumerate(sources):
        if "filename" not in src:
            raise ValueError(f"source #{i}: missing filename")
        keys = [k for k in ("base64_string", "data", "path") if k in src]
        if len(keys) != 1:
            raise ValueError(
                f"source #{i} ({src['filename']!r}): need exactly one of "
                f"base64_string/data/path, got {keys}"
            )
        items.append(
            {
                "url": src["filename"],
                "base64_string": src.get("base64_string", ""),
                "data": src.get("data", b""),
                "path": src.get("path", ""),
                "kind": keys[0],
            }
        )

    def decode(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        b64s = batch.column("base64_string").to_pylist()
        datas = batch.column("data").to_pylist()
        paths = batch.column("path").to_pylist()
        payloads: list[bytes] = []
        errors: list[str | None] = []
        for kind, b64, data, path in zip(kinds, b64s, datas, paths):
            try:
                if kind == "base64_string":
                    payloads.append(base64.b64decode(b64, validate=True))
                elif kind == "data":
                    payloads.append(bytes(data))
                else:
                    with open(path, "rb") as f:
                        payloads.append(f.read())
                errors.append(None)
            except (binascii.Error, OSError, ValueError) as exc:
                payloads.append(b"")
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(payloads, pa.binary()),
                "source_error": pa.array(errors, pa.string()),
            }
        )

    ds = ray.data.from_items(items)
    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
