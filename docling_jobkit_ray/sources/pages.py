"""Pages-table source: column-pruned Parquet read.

Replaces the reference's source-connector listing/fetch machinery
(``/root/reference/docling_jobkit/connectors/source_processor.py:49-198``)
with ``ray.data.read_parquet`` — Ray's read tasks ARE the listing + chunking
(one `DocumentChunk` == one block).  ``include_paths=True`` attaches the
input shard path per row, the lineage key for the dead-letter dataset and
checkpoint manifest (SURVEY.md §4.2 resume).
"""

from __future__ import annotations

import ray.data


def read_pages(
    path: str | list[str],
    *,
    columns: list[str] | None = None,
    include_paths: bool = True,
    **kwargs,
) -> ray.data.Dataset:
    """Read the pages table, pruned to the columns the pipeline needs.

    The extraction pipeline only needs (url, html) — never read text/lang
    along for the ride (prune-at-the-read; a read that loads all columns for
    a 2-column transform is wrong at 100 TB)."""
    if columns is None:
        columns = ["url", "html"]
    return ray.data.read_parquet(
        path, columns=columns, include_paths=include_paths, **kwargs
    )


# Fact tables big enough that post-read block splitting pays: the driver
# files are single-row-group, so the read is one task either way, but
# override_num_blocks lets every DOWNSTREAM stage run wide.
_SPLIT_TABLES = {"lineitem": 32, "orders": 16, "events": 16, "documents": 16, "embeddings": 8}


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read one of the driver-generated testdata tables with column pruning
    and fact-table block splitting."""
    if "override_num_blocks" not in kwargs and name in _SPLIT_TABLES:
        kwargs["override_num_blocks"] = _SPLIT_TABLES[name]
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)
