"""Re-crawl snapshot dedup: keep the newest warc_ts per url — the
Common-Crawl pre-extraction step (north-star input shape: url, warc_ts,
html, text, lang)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


@pytest.fixture(scope="module")
def dup_corpus(ray_session, tmp_path_factory):
    """A corpus where half the urls appear TWICE (second crawl, +1 day,
    different html) and a handful three times."""
    from docling_jobkit_ray.fixtures.corpus import write_corpus

    base = tmp_path_factory.mktemp("snap")
    src = str(base / "src")
    write_corpus(src, n_rows=400, seed=11, n_shards=2)
    import glob

    tables = [pq.read_table(f) for f in sorted(glob.glob(f"{src}/*.parquet"))]
    t = pa.concat_tables(tables).combine_chunks()
    df = t.to_pandas()
    half = df.iloc[: len(df) // 2].copy()
    half["warc_ts"] = half["warc_ts"] + pd.Timedelta(days=1)
    half["html"] = half["html"].map(lambda b: b + b"<!-- recrawl -->")
    third = df.iloc[:20].copy()
    third["warc_ts"] = third["warc_ts"] + pd.Timedelta(days=2)
    out = str(base / "dup")
    import os

    os.makedirs(out)
    allrows = pd.concat([df, half, third], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(allrows, preserve_index=False, schema=t.schema),
        f"{out}/pages.parquet",
    )
    return out, df, allrows


def test_keeps_exactly_newest_per_url(dup_corpus):
    from docling_jobkit_ray.sources.pages import latest_snapshot_per_url

    out, orig, allrows = dup_corpus
    ds = ray.data.read_parquet(f"{out}/pages.parquet")
    got = latest_snapshot_per_url(ds).to_pandas()
    assert len(got) == orig["url"].nunique()
    assert got["url"].is_unique
    want_ts = allrows.groupby("url")["warc_ts"].max().astype("datetime64[us]")
    merged = got.set_index("url")["warc_ts"].astype("datetime64[us]")
    pd.testing.assert_series_equal(
        merged.sort_index(), want_ts.sort_index(), check_names=False
    )


def test_unique_input_is_identity(dup_corpus, ray_session):
    """A corpus with no re-crawls must pass through unchanged (row set)."""
    from docling_jobkit_ray.sources.pages import latest_snapshot_per_url

    out, orig, _ = dup_corpus
    src_tbl = pa.Table.from_pandas(orig, preserve_index=False)
    ds = ray.data.from_arrow(src_tbl)
    got = latest_snapshot_per_url(ds, n_buckets=32).to_pandas()
    assert len(got) == len(orig)
    a = got.sort_values("url").reset_index(drop=True)
    b = orig.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["url", "text"]], b[["url", "text"]])


def test_extract_after_dedup_converts_each_url_once(dup_corpus):
    """The composed flow — snapshot dedup feeding the extraction kernel's
    admission logic — produces one output row per url."""
    from docling_jobkit_ray.sources.pages import latest_snapshot_per_url

    out, orig, _ = dup_corpus
    ds = ray.data.read_parquet(f"{out}/pages.parquet", columns=["url", "warc_ts", "html"])
    deduped = latest_snapshot_per_url(ds)
    urls = deduped.to_pandas()["url"]
    assert urls.is_unique and len(urls) == orig["url"].nunique()


def test_page_metadata_census(dup_corpus, ray_session):
    """Every page keeps a row; HTML rows carry the title the generator
    embedded (cross-checked with an independent stdlib parse); binary
    payloads survive with null metadata."""
    import re

    out, orig, _ = dup_corpus
    from docling_jobkit_ray.sources.pages import page_metadata

    got = page_metadata(ray.data.from_arrow(pa.Table.from_pandas(orig, preserve_index=False))).to_pandas()
    assert len(got) == len(orig)
    by_url = dict(zip(orig["url"], orig["html"]))
    n_html = 0
    for r in got.itertuples(index=False):
        raw = by_url[r.url]
        if r.is_html:
            n_html += 1
            m = re.search(rb"<title[^>]*>([^<]*)", raw)
            assert m and m.group(1).decode() == r.title
            assert r.n_links >= 1  # nav blocks always carry anchors
        else:
            assert r.title is None and r.n_links == 0
    assert n_html > len(got) * 0.8  # binary/poison are a small minority
