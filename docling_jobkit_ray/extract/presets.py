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


# ---------------------------------------------------------------------------
# per-stage MODEL-KIND registries (reference convert/manager.py:484-751)
# ---------------------------------------------------------------------------

class ModelKindRegistry:
    """Name -> options registry for ONE model kind (vlm / ocr / layout /
    table_structure / picture_description / code_formula), mirroring the
    reference's ``_build_preset_registries`` rules
    (``convert/manager.py:484-751``):

    * ``"default"`` ALWAYS resolves (to the configured default builtin);
    * builtin presets are gated by an admin allowlist (None = all);
    * custom presets (operator-registered) are ALWAYS allowed.
    """

    def __init__(self, kind: str, builtins: dict[str, dict], default: str):
        if default not in builtins:
            raise KeyError(f"{kind}: default {default!r} not among builtins {sorted(builtins)}")
        self.kind = kind
        self._builtins = dict(builtins)
        self._customs: dict[str, dict] = {}
        self._default_id = default
        self._allowed: set[str] | None = None

    def register_custom(self, name: str, options: dict, *, allow_override: bool = False) -> None:
        if name == "default":
            raise ValueError("'default' is reserved for the configured builtin")
        if not allow_override and (name in self._customs or name in self._builtins):
            raise ValueError(f"{self.kind} preset {name!r} already registered")
        self._customs[name] = dict(options)

    def set_allowed(self, names: list[str] | None) -> None:
        if names is None:
            self._allowed = None
            return
        unknown = set(names) - set(self._builtins)
        if unknown:
            raise KeyError(f"{self.kind} allowlist references unknown builtins: {sorted(unknown)}")
        self._allowed = set(names)

    def resolve(self, name: str = "default") -> dict:
        if name == "default":
            return self._builtins[self._default_id]
        if name in self._customs:  # custom presets bypass the allowlist
            return self._customs[name]
        if name in self._builtins:
            if self._allowed is not None and name not in self._allowed:
                raise PresetNotAllowedError(
                    f"{self.kind} preset {name!r} not in allowlist {sorted(self._allowed)}"
                )
            return self._builtins[name]
        raise KeyError(f"unknown {self.kind} preset {name!r}; known: {self.list_names()}")

    def list_names(self) -> list[str]:
        """Resolvable names under the CURRENT allowlist (the tenant view)."""
        builtins = (
            set(self._builtins) if self._allowed is None else set(self._allowed)
        )
        return sorted({"default"} | builtins | set(self._customs))


# Builtin matrices: plain option dicts (docling itself is absent from this
# environment — names follow docling's public option surface; the registry
# mechanics, gating and selection are the real, tested parity surface).
MODEL_KIND_REGISTRIES: dict[str, ModelKindRegistry] = {
    "vlm": ModelKindRegistry(
        "vlm",
        {
            "fake_page_describer": {"describer": "fake_page_describer"},
        },
        default="fake_page_describer",
    ),
    "ocr": ModelKindRegistry(
        "ocr",
        {
            "auto": {"engine": "auto"},
            "easyocr": {"engine": "easyocr", "use_gpu": False},
            "tesseract": {"engine": "tesseract", "lang": ["eng"]},
            "rapidocr": {"engine": "rapidocr"},
        },
        default="auto",
    ),
    "layout": ModelKindRegistry(
        "layout",
        {"standard": {"model": "layout-standard"}, "fast": {"model": "layout-fast"}},
        default="standard",
    ),
    "table_structure": ModelKindRegistry(
        "table_structure",
        {
            "accurate": {"mode": "accurate", "do_cell_matching": True},
            "fast": {"mode": "fast", "do_cell_matching": False},
        },
        default="fast",
    ),
    "picture_description": ModelKindRegistry(
        "picture_description",
        {"none": {"enabled": False}, "caption": {"enabled": True, "mode": "caption"}},
        default="none",
    ),
    "code_formula": ModelKindRegistry(
        "code_formula",
        {"off": {"enabled": False}, "on": {"enabled": True}},
        default="off",
    ),
}


def model_kind(kind: str) -> ModelKindRegistry:
    if kind not in MODEL_KIND_REGISTRIES:
        raise KeyError(f"unknown model kind {kind!r}; known: {sorted(MODEL_KIND_REGISTRIES)}")
    return MODEL_KIND_REGISTRIES[kind]
