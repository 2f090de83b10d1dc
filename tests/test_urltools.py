"""URL canonicalization: rule coverage + dedup stats over a synthetic crawl."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docling_jobkit_ray.functions.urltools import canonical_url


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/a/b/", "http://example.com/a/b"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("https://example.com/page#frag", "https://example.com/page"),
        (
            "https://example.com/p?utm_source=tw&b=2&a=1&fbclid=xyz",
            "https://example.com/p?a=1&b=2",
        ),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/", "https://example.com/"),
        ("https://user:pw@Example.com/x", "https://user:pw@example.com/x"),
        ("not a url", "not a url"),  # pass-through, never lose a row
        ("/relative/only", "/relative/only"),
    ],
)
def test_canonical_url_rules(raw, canon):
    assert canonical_url(raw) == canon
    # idempotent: canonicalizing a canonical form is a no-op
    assert canonical_url(canon) == canon


def test_url_dedup_stats(ray_session):
    import ray.data

    from docling_jobkit_ray.functions.urltools import (
        canonicalize_urls,
        url_dedup_stats,
    )

    urls = [
        "http://a.com:80/x",
        "https://a.com/x",       # different scheme: NOT a dup of the above
        "http://A.COM/x#top",    # dup of the first
        "http://a.com/x?utm_source=1",  # dup of the first
        "https://b.com/y",
        "https://b.com/y/",      # dup
        "https://c.com/unique",
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    out = url_dedup_stats(ds).to_pandas()
    got = dict(zip(out["canonical_url"], out["n_variants"]))
    assert got == {"http://a.com/x": 3, "https://b.com/y": 2}

    withcanon = canonicalize_urls(ds).to_pandas()
    assert "canonical_url" in withcanon.columns
    assert len(withcanon) == len(urls)
