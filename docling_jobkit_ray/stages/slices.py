"""Page-slice fan-out + group-by-url reassembly for oversized binary docs.

Ray-Data-native re-expression of the reference's single-PDF slice fan-out
(``/root/reference/docling_jobkit/orchestrators/ray/serve_deployment.py:437-464``
slice plan, ``:510-549`` reassembly, ``:467-482`` timing merge):

- plan: one oversized binary row -> N slice rows of <= slice_pages pages.
  Unlike the reference (which shares whole-PDF bytes via ``ray.put`` and has
  every slice child deref the full payload, ``serve_deployment.py:1253-1258``),
  the container's page directory lets each slice row carry ONLY its own byte
  range — zero payload duplication through the shuffle.
- extract: slices are just rows through the same actor-pool stage.
- reassemble: ``groupby("url").map_groups`` with an in-group sort on
  ``slice_index``; page numbering is absolute so concatenation needs no
  renumbering.  Status merge: SUCCESS iff all slices SUCCESS, any failure
  degrades to PARTIAL_SUCCESS, all-failed -> FAILURE; errors concatenated —
  exactly the reference's merge semantics (``serve_deployment.py:510-549``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..extract import binarydoc
from ..extract.errors import (
    STATUS_FAILURE,
    STATUS_PARTIAL_SUCCESS,
    STATUS_SUCCESS,
)
from ..extract.record import ExtractOptions, assemble_pages, pages_doc_json
from .extract import EXTRACTED_SCHEMA, partition_id_for_path, rows_to_extracted_table

SLICE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("slice_index", pa.int32()),
        ("n_slices", pa.int32()),
        ("page_start", pa.int32()),
        ("page_lens", pa.list_(pa.int32())),
        ("payload", pa.binary()),
        ("path", pa.string()),
    ]
)


def is_big_binary(payload: bytes, slice_pages: int) -> bool:
    if payload is None or not binarydoc.is_binary_doc(payload):
        return False
    try:
        directory = binarydoc.parse_directory(payload)
    except Exception:
        return False
    return len(directory) > slice_pages


def keep_big_binary(slice_pages: int):
    """Vectorized-ish filter stage: keep only rows needing slice fan-out.
    Cheap: only the fixed-size header + directory is inspected per row."""

    def _fn(batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        mask = pa.array([is_big_binary(p, slice_pages) for p in payloads], pa.bool_())
        return batch.filter(mask)

    return _fn


def drop_big_binary(slice_pages: int):
    def _fn(batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        mask = pa.array(
            [not is_big_binary(p, slice_pages) for p in payloads], pa.bool_()
        )
        return batch.filter(mask)

    return _fn


def plan_slices(slice_pages: int):
    """map_batches UDF: big-binary page rows -> slice rows (the slice plan,
    ``_build_slice_plan`` serve_deployment.py:437-464).  Each slice row
    carries only its pages' bytes, cut using the page directory."""

    def _fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        paths = (
            batch.column("path").to_pylist()
            if "path" in batch.column_names
            else [None] * len(urls)
        )
        out = {name: [] for name in SLICE_SCHEMA.names}
        for url, payload, path in zip(urls, payloads, paths):
            directory = binarydoc.parse_directory(payload)
            n_pages = len(directory)
            n_slices = (n_pages + slice_pages - 1) // slice_pages
            for s in range(n_slices):
                start = s * slice_pages
                stop = min(start + slice_pages, n_pages)
                first_off = directory[start][0]
                last_off, last_len = directory[stop - 1]
                out["url"].append(url)
                out["slice_index"].append(s)
                out["n_slices"].append(n_slices)
                out["page_start"].append(start)
                out["page_lens"].append([directory[i][1] for i in range(start, stop)])
                out["payload"].append(payload[first_off : last_off + last_len])
                out["path"].append(path)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], type=f.type) for f in SLICE_SCHEMA],
            schema=SLICE_SCHEMA,
        )

    return _fn


SLICE_EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("slice_index", pa.int32()),
        ("n_slices", pa.int32()),
        ("n_pages", pa.int32()),
        ("status", pa.string()),
        # per-page texts (NOT pre-joined: pages may contain arbitrary text,
        # including PAGE_SEP, so joining is deferred to reassembly)
        ("page_texts", pa.list_(pa.string())),
        ("error", pa.string()),
        ("partition_id", pa.int32()),
    ]
)


class ExtractSlices:
    """Actor-pool UDF: slice rows -> per-slice extracted partials.
    Equivalent of the slice-convert children (serve_deployment.py:855-882)."""

    def __init__(self, options: ExtractOptions | dict | None = None):
        if options is None:
            options = ExtractOptions()
        elif isinstance(options, dict):
            options = ExtractOptions(**options)
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in SLICE_EXTRACT_SCHEMA.names}
        urls = batch.column("url").to_pylist()
        slice_idx = batch.column("slice_index").to_pylist()
        n_slices = batch.column("n_slices").to_pylist()
        page_lens = batch.column("page_lens").to_pylist()
        payloads = batch.column("payload").to_pylist()
        paths = batch.column("path").to_pylist()
        for url, si, ns, lens, payload, path in zip(
            urls, slice_idx, n_slices, page_lens, payloads, paths
        ):
            texts: list[str] = []
            errors: list[str] = []
            off = 0
            for j, ln in enumerate(lens):
                text, err = binarydoc.parse_page(payload, off, ln)
                if err is not None:
                    errors.append(f"slice {si} page {j}: {err}")
                    texts.append("")
                else:
                    texts.append(text)
                off += ln
            if errors and len(errors) == len(lens):
                status = STATUS_FAILURE
            elif errors:
                status = STATUS_PARTIAL_SUCCESS
            else:
                status = STATUS_SUCCESS
            out["url"].append(url)
            out["slice_index"].append(si)
            out["n_slices"].append(ns)
            out["n_pages"].append(len(lens))
            out["status"].append(status)
            out["page_texts"].append(texts)
            out["error"].append("; ".join(errors) if errors else None)
            out["partition_id"].append(partition_id_for_path(path, url))
        return pa.Table.from_arrays(
            [pa.array(out[f.name], type=f.type) for f in SLICE_EXTRACT_SCHEMA],
            schema=SLICE_EXTRACT_SCHEMA,
        )


def reassemble_group(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups(key="url") UDF: merge slices back into one document row.

    In-group sort by slice_index; text concat with PAGE_SEP (byte-identical
    to the inline path by the assemble_pages invariant); status merge per
    ``_assemble_slice_results`` (serve_deployment.py:510-549)."""
    group = group.sort_values("slice_index")
    url = group["url"].iloc[0]
    statuses = list(group["status"])
    errors = [e for e in group["error"] if e]
    n_pages_total = int(group["n_pages"].sum())

    # Concatenate per-page texts in absolute page order and assemble with the
    # SAME helper the inline path uses — byte-identity by construction.
    page_texts: list[str] = []
    for pts in group["page_texts"]:
        page_texts.extend(pts)
    text, spans = assemble_pages(page_texts)
    doc_json = pages_doc_json(text, spans, n_pages_total)

    if all(s == STATUS_SUCCESS for s in statuses):
        status = STATUS_SUCCESS
    elif all(s == STATUS_FAILURE for s in statuses):
        status = STATUS_FAILURE
    else:
        status = STATUS_PARTIAL_SUCCESS

    if status == STATUS_FAILURE:
        row = {
            "url": url,
            "status": status,
            "text": "",
            "spans": [],
            "doc_json": "",
            "n_chars": 0,
            "error": "; ".join(errors),
            "category": "internal",
            "retryable": False,
            "partition_id": int(group["partition_id"].iloc[0]),
        }
    else:
        row = {
            "url": url,
            "status": status,
            "text": text,
            "spans": spans,
            "doc_json": doc_json,
            "n_chars": len(text),
            "error": "; ".join(errors) if errors else None,
            "category": None,
            "retryable": None,
            "partition_id": int(group["partition_id"].iloc[0]),
        }
    return pd.DataFrame([row])


def reassembled_to_arrow(df: pd.DataFrame) -> pa.Table:
    return rows_to_extracted_table(df.to_dict("records"))


EXTRACTED_SCHEMA_REF = EXTRACTED_SCHEMA  # re-export for pipeline assembly
