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


def latest_snapshot_per_url(
    pages: ray.data.Dataset, *, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Re-crawl dedup for Common-Crawl-style inputs: keep ONE row per url —
    the newest ``warc_ts`` snapshot (ties break to the longer, then
    lexicographically larger ``html`` payload, so the rule is total and
    deterministic).  This is the standard pre-extraction step when shards
    span multiple crawls of the same sites; running it FIRST means the
    expensive extract stage never converts a superseded snapshot.

    Scale shape: urls are high-cardinality strings — a direct string-keyed
    groupby sorts every key through the shuffle (CLAUDE.md: 2.4x slower at
    238k keys), so rows exchange on ``hash(url) % n_buckets`` (scale-derived
    count) and the per-bucket fold is ONE vectorized lexsort + first-per-url
    take.  Full rows ride the exchange exactly once (the html payload has
    to move to wherever its url group lands — that is inherent to any
    exact snapshot dedup)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..scale import bucket_count

    if n_buckets is None:
        # count() on a fresh read_parquet Dataset is a metadata fast path;
        # for a TRANSFORMED input pass n_buckets explicitly (count() would
        # execute the upstream plan and the dedup would re-execute it — the
        # documented branch-re-execution hazard)
        est = pages.count()
        n_buckets = bucket_count(est, min_buckets=32)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return batch
        urls = batch["url"].to_numpy(zero_copy_only=False)
        b = (
            pd.util.hash_array(np.asarray(urls, dtype=object))
            & np.uint64(n_buckets - 1)
        ).astype(np.int64)
        return batch.append_column("ubucket", pa.array(b, pa.int64()))

    def keep_latest(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return group
        cols = [c for c in group.column_names if c != "ubucket"]
        g = group.select(cols)
        ts = pc.cast(pc.cast(g["warc_ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hlen = pc.binary_length(g["html"]).to_numpy(zero_copy_only=False)
        urls = g["url"].to_numpy(zero_copy_only=False)
        html_np = g["html"].to_numpy(zero_copy_only=False)
        _, html_rank = np.unique(html_np, return_inverse=True)  # asc rank
        # first row per url under (ts desc, len desc, html desc): lexsort is
        # stable and sorts by LAST key primary
        order = np.lexsort((-html_rank, -hlen, -ts, urls))
        u_sorted = urls[order]
        first = np.concatenate([[True], u_sorted[1:] != u_sorted[:-1]])
        return g.take(pa.array(order[first], pa.int64()))

    return (
        pages.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(keep_latest, batch_format="pyarrow")
    )


def page_metadata(path: str | ray.data.Dataset) -> ray.data.Dataset:
    """WAT-style page metadata scan: (url, title, first_h1, n_links,
    is_html) per page — the lightweight companion record Common Crawl
    ships next to the WARC (CCF's WAT files carry exactly these header
    fields), produced WITHOUT running the full extraction kernel.

    Pure vectorized map: payloads route by a binary header sniff
    (``<html`` prefix — the admission discipline of extract/record), only
    the HTML minority casts to string, and title/h1 capture is one
    ``pc.extract_regex`` each (RE2, first match); link counts are one
    ``count_substring_regex``.  Non-HTML payloads keep their row with
    null metadata, so the output is a full census of the corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_pages(path, columns=["url", "html"]) if isinstance(path, str) else path

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("title", pa.string()),
            ("first_h1", pa.string()),
            ("n_links", pa.int64()),
            ("is_html", pa.int64()),
        ]
    )

    def meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        html_bin = batch["html"]
        head = pc.binary_slice(html_bin, 0, 8)
        is_html = pc.starts_with(pc.cast(head, pa.string(), safe=False), "<html")
        is_html_np = pc.fill_null(is_html, False).to_numpy(zero_copy_only=False)
        import numpy as np

        n = batch.num_rows
        titles = np.full(n, None, dtype=object)
        h1s = np.full(n, None, dtype=object)
        links = np.zeros(n, np.int64)
        if is_html_np.any():
            sel = pa.array(is_html_np)
            html_str = pc.cast(html_bin.filter(sel), pa.string())
            titles[is_html_np] = np.asarray(
                pc.struct_field(
                    pc.extract_regex(html_str, pattern=r"<title[^>]*>(?P<t>[^<]*)"),
                    "t",
                ).to_pylist(),
                dtype=object,
            )
            h1s[is_html_np] = np.asarray(
                pc.struct_field(
                    pc.extract_regex(html_str, pattern=r"<h1[^>]*>(?P<h>[^<]*)"), "h"
                ).to_pylist(),
                dtype=object,
            )
            links[is_html_np] = pc.count_substring_regex(
                html_str, pattern=r"<a\s"
            ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "url": batch["url"],
                "title": pa.array(titles.tolist(), pa.string()),
                "first_h1": pa.array(h1s.tolist(), pa.string()),
                "n_links": pa.array(links),
                "is_html": pa.array(is_html_np.astype("int64")),
            }
        )

    return ds.map_batches(meta, batch_format="pyarrow", zero_copy_batch=True)
