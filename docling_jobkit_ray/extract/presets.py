"""Named ExtractOptions presets + admin allowlist.

Parity with the reference's admin-managed option presets and allowlists
(``convert/manager.py:484-751``: factory-registered OCR/layout/table kinds
behind name->config registries that an operator can restrict).  Here one
preset = one frozen :class:`ExtractOptions`; the allowlist is the runtime
gate an operator sets before handing the engine to tenants.
"""

from __future__ import annotations

from .record import ExtractOptions

_PRESETS: dict[str, ExtractOptions] = {}
_ALLOWED: set[str] | None = None  # None = all presets allowed


class PresetNotAllowedError(PermissionError):
    """Raised when resolving a preset outside the admin allowlist."""


def register_preset(name: str, options: ExtractOptions, *, allow_override: bool = False) -> None:
    if name in _PRESETS and not allow_override:
        raise ValueError(f"preset {name!r} already registered")
    if not isinstance(options, ExtractOptions):
        raise TypeError(f"preset {name!r}: expected ExtractOptions, got {type(options)}")
    _PRESETS[name] = options


def get_preset(name: str) -> ExtractOptions:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; known: {sorted(_PRESETS)}")
    if _ALLOWED is not None and name not in _ALLOWED:
        raise PresetNotAllowedError(
            f"preset {name!r} is not in the admin allowlist {sorted(_ALLOWED)}"
        )
    return _PRESETS[name]


def list_presets() -> list[str]:
    """All registered presets (allowlist shown separately so operators can
    see what exists vs what tenants may use)."""
    return sorted(_PRESETS)


def set_allowed_presets(names: list[str] | None) -> None:
    """Restrict which presets :func:`get_preset` resolves (None = all).
    Unknown names are rejected so a typo cannot silently allow nothing."""
    global _ALLOWED
    if names is None:
        _ALLOWED = None
        return
    unknown = set(names) - set(_PRESETS)
    if unknown:
        raise KeyError(f"allowlist references unknown presets: {sorted(unknown)}")
    _ALLOWED = set(names)


# -- built-in presets --------------------------------------------------------

register_preset("default", ExtractOptions())
# strict admission: small payloads only — the tenant-facing safe default
register_preset(
    "strict", ExtractOptions(max_bytes=4 * 1024 * 1024, max_pages=100, slice_pages=10)
)
# permissive: archive backfills where giant documents are expected
register_preset(
    "permissive",
    ExtractOptions(max_bytes=512 * 1024 * 1024, max_pages=20_000, slice_pages=25),
)
# aggressive boilerplate stripping for low-quality web text
register_preset(
    "aggressive_strip",
    ExtractOptions(max_link_density=0.35, min_paragraph_chars=40),
)
