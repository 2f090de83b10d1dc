"""HTTP-PUT target: push per-document results to an endpoint from workers.

Parity with the reference's HTTP target processor
(``/root/reference/docling_jobkit/connectors/http/target_processor.py:1-108``
— PUT each converted document to a caller-supplied endpoint) and, via a
per-row ``target_url`` column, the presigned-URL serving shape
(``connectors/s3/presigned_target_processor.py:1-124`` — each document gets
its own signed destination).

Ray-Data shape: an actor-pool ``map_batches`` stage; the transport (HTTP
session / connection pool) is built once per actor in ``__init__``; each
batch PUTs its rows and emits (url, target_url, status_code, put_error) —
a delivery report the caller can dead-letter on.  No network exists in this
sandbox, so the default transport raises; inject ``transport=`` (a
``requests.Session.put`` adapter in real deployments) or use
:func:`filesystem_transport` (writes bodies under a root dir — also a
useful local target in its own right).
"""

from __future__ import annotations

import hashlib
import hmac
import os
import time
from collections.abc import Callable
from urllib.parse import parse_qs, urlsplit

import pyarrow as pa
import ray.data

# (target_url, body, headers) -> HTTP status code
Transport = Callable[[str, bytes, dict], int]


def no_network_transport(target_url: str, body: bytes, headers: dict) -> int:
    raise NotImplementedError(
        "no network in this environment — inject transport= (e.g. a "
        "requests.Session.put adapter) to deliver results over HTTP"
    )


def filesystem_transport(root: str) -> Transport:
    """A transport that 'PUTs' to the local filesystem: body lands at
    ``<root>/<sha256(target_url)[:24]>``.  Worker-process-safe (plain file
    writes), used by tests and usable as a real local-dir target."""

    def put(target_url: str, body: bytes, headers: dict) -> int:
        os.makedirs(root, exist_ok=True)
        name = hashlib.sha256(target_url.encode("utf-8")).hexdigest()[:24]
        with open(os.path.join(root, name), "wb") as f:
            f.write(body)
        return 201

    return put


# ---------------------------------------------------------------------------
# presigned URLs (HMAC over method+key+expiry — works offline)
# ---------------------------------------------------------------------------

def presign_url(
    endpoint: str,
    key: str,
    *,
    secret: bytes,
    expires_in: int = 3600,
    method: str = "PUT",
    now: int | None = None,
) -> str:
    """Generate a time-limited signed URL for ``key`` under ``endpoint`` —
    the shape of the reference's presigned-target generation
    (``connectors/s3/presigned_target_processor.py:1-124``), implemented as
    an HMAC-SHA256 over (method, full URL path, expiry) so it needs no cloud
    SDK or network.  Signing the FULL path (endpoint base path included)
    keeps generation and validation symmetric for endpoints like
    ``https://host/tenant1``.  Deterministic given ``now`` (tests pin it)."""
    if now is None:
        now = int(time.time())
    expires_at = now + int(expires_in)
    base = endpoint.rstrip("/")
    full_path = (urlsplit(base).path.rstrip("/") + "/" + key).lstrip("/")
    sig = hmac.new(
        secret, f"{method}\n{full_path}\n{expires_at}".encode("utf-8"), hashlib.sha256
    ).hexdigest()
    return f"{base}/{key}?X-Expires={expires_at}&X-Signature={sig}"


def check_presigned(
    url: str, *, secret: bytes, method: str = "PUT", now: int | None = None
) -> str | None:
    """Validate a URL produced by :func:`presign_url`.  Returns ``None`` when
    valid, else a reason string ("expired", "bad_signature",
    "missing_params").  Constant-time signature compare."""
    if now is None:
        now = int(time.time())
    parts = urlsplit(url)
    q = parse_qs(parts.query)
    if "X-Expires" not in q or "X-Signature" not in q:
        return "missing_params"
    try:
        expires_at = int(q["X-Expires"][0])
    except ValueError:
        return "missing_params"
    key = parts.path.lstrip("/")
    want = hmac.new(
        secret, f"{method}\n{key}\n{expires_at}".encode("utf-8"), hashlib.sha256
    ).hexdigest()
    if not hmac.compare_digest(want, q["X-Signature"][0]):
        return "bad_signature"
    if now > expires_at:
        return "expired"
    return None


def add_presigned_targets(
    ds: ray.data.Dataset,
    *,
    endpoint: str,
    secret: bytes,
    expires_in: int = 3600,
    key_col: str = "url",
    target_col: str = "target_url",
    now: int | None = None,
) -> ray.data.Dataset:
    """Append a per-row presigned ``target_url`` (key = sha256 of the row's
    ``key_col``), ready for :func:`http_put_pipeline` via
    ``target_url_col=`` — each document gets its own expiring signed
    destination, exactly the reference's per-document presigned-PUT flow."""
    if now is None:
        now = int(time.time())

    def fn(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.sha256(str(k).encode("utf-8")).hexdigest()
            for k in batch.column(key_col).to_pylist()
        ]
        targets = [
            presign_url(endpoint, k, secret=secret, expires_in=expires_in, now=now)
            for k in keys
        ]
        return batch.append_column(target_col, pa.array(targets, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class HttpPutTarget:
    """Actor-pool UDF: result rows -> delivery-report rows."""

    def __init__(
        self,
        *,
        url_template: str = "",
        target_url_col: str | None = None,
        body_col: str = "doc_json",
        transport: Transport | None = None,
        headers: dict | None = None,
    ):
        if not url_template and not target_url_col:
            raise ValueError("need url_template or target_url_col")
        self.url_template = url_template
        self.target_url_col = target_url_col
        self.body_col = body_col
        self.transport = transport or no_network_transport
        self.headers = headers or {"content-type": "application/json"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        bodies = batch.column(self.body_col).to_pylist()
        if self.target_url_col:
            targets = batch.column(self.target_url_col).to_pylist()
        else:
            targets = [self.url_template.format(url=u) for u in urls]
        codes: list[int | None] = []
        errors: list[str | None] = []
        for tgt, body in zip(targets, bodies):
            data = body.encode("utf-8") if isinstance(body, str) else bytes(body or b"")
            try:
                codes.append(int(self.transport(tgt, data, self.headers)))
                errors.append(None)
            except Exception as exc:  # delivery failure -> report row
                codes.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "target_url": pa.array(targets, pa.string()),
                "status_code": pa.array(codes, pa.int32()),
                "put_error": pa.array(errors, pa.string()),
            }
        )


def http_put_pipeline(
    results: ray.data.Dataset,
    *,
    url_template: str = "",
    target_url_col: str | None = None,
    body_col: str = "doc_json",
    transport: Transport | None = None,
    headers: dict | None = None,
    concurrency=(1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """results dataset -> delivery-report dataset.  Small batches: delivery
    latency dominates and bodies x batch_size bounds per-task heap."""
    return results.map_batches(
        HttpPutTarget,
        fn_constructor_kwargs={
            "url_template": url_template,
            "target_url_col": target_url_col,
            "body_col": body_col,
            "transport": transport,
            "headers": headers,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
