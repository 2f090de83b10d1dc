"""URL canonicalization + canonical-URL dedup stats.

Common-Crawl pipelines dedup by CANONICAL url before content dedup: the
same page is crawled as http/https, with/without default port, fragment,
tracking parameters, trailing slash.  The reference keys documents by
``source_uri`` verbatim (``connectors/source_processor.py:15-22``); this
adds the normalization pass a web corpus needs before that key is usable.

Pure deterministic string work per row, batch-applied — no shuffle; the
dedup stats reuse the exact-dedup hash-partition recipe.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa
import ray.data

__all__ = ["canonical_url", "canonicalize_urls", "url_dedup_stats"]

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = frozenset({"fbclid", "gclid", "msclkid", "mc_eid", "igshid"})


def canonical_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme/host, default port
    stripped, fragment dropped, tracking params removed, remaining query
    params sorted, empty path -> '/'. Invalid URLs pass through verbatim
    (a canonicalizer must never lose a row)."""
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return url
    if not scheme or not netloc:
        return url
    scheme = scheme.lower()
    host = netloc.lower()
    if "@" in host:  # userinfo: keep verbatim but lowercase host part
        userinfo, _, hostport = host.rpartition("@")
        host = f"{userinfo}@{hostport}"
    if ":" in host.rsplit("@", 1)[-1]:
        bare, _, port = host.rpartition(":")
        if _DEFAULT_PORTS.get(scheme) == port:
            host = bare
    params = [
        (k, v)
        for k, v in parse_qsl(query, keep_blank_values=True)
        if not k.lower().startswith(_TRACKING_PREFIXES)
        and k.lower() not in _TRACKING_PARAMS
    ]
    query = urlencode(sorted(params))
    if not path:
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return urlunsplit((scheme, host, path, query, ""))


def canonicalize_urls(
    ds: ray.data.Dataset, *, column: str = "url", out_column: str = "canonical_url"
) -> ray.data.Dataset:
    """Append the canonical form of a url column (batch map, no shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        canon = pa.array(
            [canonical_url(u) for u in batch[column].to_pylist()], pa.string()
        )
        return batch.append_column(out_column, canon)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def url_dedup_stats(ds: ray.data.Dataset, *, column: str = "url") -> ray.data.Dataset:
    """Canonical-URL duplicate groups: (canonical_url, n_variants) for every
    canonical form hit by >= 2 raw urls — the crawl-frontier dedup report.
    Shuffle carries only (canonical_url, partial_count)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        canon = pa.array(
            [canonical_url(u) for u in batch[column].to_pylist()], pa.string()
        )
        return (
            pa.table({"canonical_url": canon})
            .group_by("canonical_url")
            .aggregate([([], "count_all")])
            .rename_columns(["canonical_url", "n"])
        )

    import pyarrow.compute as pc

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("canonical_url")
        .aggregate(Sum("n", alias_name="n_variants"))
    )
    return agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_variants"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["n_variants", "canonical_url"], descending=[True, False])
