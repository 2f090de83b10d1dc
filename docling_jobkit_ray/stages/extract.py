"""Ray Data extraction stages: the flagship map_batches UDFs.

The heavy per-document parse is expressed as a callable CLASS for
``map_batches(Cls, concurrency=N, batch_size=B)`` — an actor pool whose
``__init__`` builds the warm extractor configuration once per actor, the
Ray-Data-native replacement for the reference's warm converter replicas
(``/root/reference/docling_jobkit/orchestrators/ray/serve_deployment.py:580-604``,
LRU converter cache ``convert/manager.py:426-479``).

All batches are Arrow (``batch_format="pyarrow"``, zero-copy from the object
store).  The per-row loop inside a batch is intentional: document parsing is
the heavy kernel here (like model inference), not a cheap columnar op.
Expected per-document failures never raise — they become FAILURE rows
(dead-letter routing, SURVEY.md §4.2).
"""

from __future__ import annotations

import zlib
from dataclasses import asdict

import pyarrow as pa

from ..extract.record import ExtractOptions, extract_record_with_retry

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("text", pa.string()),
        ("spans", SPAN_TYPE),
        ("doc_json", pa.string()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
        ("category", pa.string()),
        ("retryable", pa.bool_()),
        ("partition_id", pa.int32()),
    ]
)


def partition_id_for_path(path: str | None, url: str) -> int:
    """Stable int32 lineage id: derived from the input shard path when the
    read attached one (``read_parquet(include_paths=True)``), else from the
    url.  Plays the role of the reference's source_index/chunk_index lineage
    (``connectors/source_processor.py:15-22``)."""
    key = path if path else url
    return zlib.crc32(key.encode("utf-8")) & 0x7FFFFFFF


def rows_to_extracted_table(rows: list[dict]) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in EXTRACTED_SCHEMA.names}
    for r in rows:
        for name in EXTRACTED_SCHEMA.names:
            cols[name].append(r.get(name))
    arrays = [
        pa.array(cols[f.name], type=f.type) for f in EXTRACTED_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)


class ExtractDocuments:
    """Actor-pool UDF: Arrow batch of pages -> Arrow batch of extracted rows.

    Usage::

        ds.map_batches(ExtractDocuments, fn_constructor_kwargs={"options": opts},
                       batch_format="pyarrow", zero_copy_batch=True,
                       concurrency=(1, n), batch_size=B)
    """

    def __init__(self, options: ExtractOptions | dict | None = None):
        # Once per actor: freeze options (analogue of the options-hash-keyed
        # warm converter, manager.py:456-479).
        if options is None:
            options = ExtractOptions()
        elif isinstance(options, dict):
            options = ExtractOptions(**options)
        self.options = options

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        paths = (
            batch.column("path").to_pylist()
            if "path" in batch.column_names
            else [None] * len(urls)
        )
        rows = []
        for url, payload, path in zip(urls, htmls, paths):
            # retry-then-dead-letter wrapper: retryable failures (timeout,
            # capacity) get options.retry_attempts re-drives before the
            # FAILURE row is final (serve_deployment.py:693-747 analogue)
            row = extract_record_with_retry(
                url, payload if payload is not None else b"", self.options
            )
            row["partition_id"] = partition_id_for_path(path, url)
            rows.append(row)
        return rows_to_extracted_table(rows)


def extract_documents_fn(options: ExtractOptions):
    """Stateless-task variant of the same UDF (for cheap configs where an
    actor pool is unnecessary)."""
    udf = ExtractDocuments(options)

    def _fn(batch: pa.Table) -> pa.Table:
        return udf(batch)

    return _fn


def options_to_kwargs(options: ExtractOptions) -> dict:
    return asdict(options)
