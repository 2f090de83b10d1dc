"""HTTP-style source: per-row fetch inside map_batches with a pluggable
fetcher.

Parity with the reference's HTTP source connector
(``/root/reference/docling_jobkit/connectors/http/source_processor.py:119-181``
— converter-side fetch by URL + headers, no driver materialization) and its
streamed size-limit enforcement
(``convert/materialization.py:97-155``): the fetch happens inside the worker
task, per row, bounded by ``max_bytes``; failures degrade to dead-letter-able
rows, never raise.

No network exists in this sandbox, so the default fetcher is a deterministic
fake keyed on the url (clearly marked); a real deployment injects
``fetcher=`` (e.g. urllib/requests-based).  The Ray-side plumbing — actor
pool with a connection-pool-holding fetcher built once per actor, small
batches, binary output column — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pyarrow as pa
import ray.data

Fetcher = Callable[[str, dict], bytes]


def deterministic_fake_fetcher(url: str, headers: dict) -> bytes:
    """Stand-in for a real HTTP GET: emits a small deterministic HTML page
    derived from the url (so tests are reproducible without network)."""
    h = hashlib.sha256(url.encode("utf-8")).hexdigest()
    return (
        f"<html><head><title>{h[:8]}</title></head><body>"
        f"<main><p>Deterministic fetched body for {url} with token {h} "
        f"padded to a reasonable paragraph length for extraction.</p></main>"
        f"</body></html>"
    ).encode("utf-8")


class HttpFetch:
    """Actor-pool UDF: url rows -> (url, html, fetch_error) rows.

    The fetcher (connection pool / session state) is built once per actor in
    __init__, mirroring the per-worker SDK clients of the reference
    (``connectors/source_processor.py:79-94``)."""

    def __init__(
        self,
        fetcher: Fetcher | None = None,
        headers: dict | None = None,
        max_bytes: int = 64 * 1024 * 1024,
        retry_attempts: int = 2,
        retry_delay: float = 0.1,
        sleep=None,
    ):
        import time as _time

        self.fetcher = fetcher or deterministic_fake_fetcher
        self.headers = headers or {}
        self.max_bytes = max_bytes
        # bounded in-worker retries for transient fetch faults — the
        # reference's retry-then-fail for retryable failures
        # (serve_deployment.py:693-747) applied at the fetch phase
        self.retry_attempts = retry_attempts
        self.retry_delay = retry_delay
        self._sleep = sleep or _time.sleep

    def _fetch_with_retry(self, url: str) -> tuple[bytes, str | None]:
        err = None
        for attempt in range(self.retry_attempts + 1):
            try:
                return self.fetcher(url, self.headers), None
            except Exception as exc:  # fetch failure -> retry, then report
                err = f"{type(exc).__name__}: {exc}"
                if attempt < self.retry_attempts and self.retry_delay > 0:
                    self._sleep(self.retry_delay)
        return b"", err

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads: list[bytes | None] = []
        errors: list[str | None] = []
        for url in urls:
            data, err = self._fetch_with_retry(url)
            if err is not None:
                payloads.append(b"")
                errors.append(err)
            elif len(data) > self.max_bytes:
                payloads.append(b"")
                errors.append(
                    f"PayloadTooLargeError: fetched {len(data)} > {self.max_bytes}"
                )
            else:
                payloads.append(data)
                errors.append(None)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(payloads, pa.binary()),
                "fetch_error": pa.array(errors, pa.string()),
            }
        )


def fetch_pipeline(
    url_ds: ray.data.Dataset,
    *,
    fetcher: Fetcher | None = None,
    headers: dict | None = None,
    concurrency=(1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """urls dataset -> pages-shaped dataset (url, html, fetch_error).

    Small batches: fetch latency dominates, and payload bytes x batch_size
    bounds per-task heap."""
    kwargs = {}
    if fetcher is not None:
        kwargs["fetcher"] = fetcher
    if headers is not None:
        kwargs["headers"] = headers
    return url_ds.map_batches(
        HttpFetch,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
