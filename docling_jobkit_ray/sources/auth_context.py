"""Interactive-authentication gate for cloud connectors.

Some fsspec backends (Google Drive without a stored refresh token) fall
back to a BROWSER OAuth flow when no offline credentials are configured.
Inside a Ray worker that flow can never complete — it would hang a read
task on a prompt nobody sees — so the connector compile path refuses it
unless the caller is a trusted interactive frontend that has explicitly
opened the gate for the current (async-)context.

Mirrors the capability of the reference's interactive-auth ContextVar gate
(``docling_jobkit/connectors/auth_context.py``) with the same contract:
closed by default, opened only inside an explicit ``with`` scope, and
restored even when the scope raises.  The ContextVar travels with the task
context on the DRIVER only — worker processes always see the closed
default, which is exactly right: interactive auth can only ever happen
where a human is.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from contextvars import ContextVar

__all__ = [
    "interactive_auth_allowed",
    "allow_interactive_auth",
    "require_interactive_auth",
    "InteractiveAuthRequired",
]

_allowed: ContextVar[bool] = ContextVar("djr_interactive_auth_allowed", default=False)


class InteractiveAuthRequired(PermissionError):
    """A connector needs a browser auth flow but the gate is closed."""


def interactive_auth_allowed() -> bool:
    """True iff the current context has explicitly opted into interactive
    (browser-based) authentication."""
    return _allowed.get()


@contextmanager
def allow_interactive_auth() -> Iterator[None]:
    """Open the gate for the enclosed scope (trusted frontends only).
    Re-entrant; always restores the previous state, even on exceptions."""
    token = _allowed.set(True)
    try:
        yield
    finally:
        _allowed.reset(token)


def require_interactive_auth(what: str) -> None:
    """Raise :class:`InteractiveAuthRequired` unless the gate is open."""
    if not interactive_auth_allowed():
        raise InteractiveAuthRequired(
            f"{what} requires an interactive (browser) authentication flow; "
            "configure offline credentials (refresh token / service account) "
            "or wrap the call in allow_interactive_auth() from a trusted "
            "interactive frontend"
        )
