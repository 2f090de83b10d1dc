"""Stage registry: the engine's user-extension surface.

Parity with the reference's plugin/extension points (SURVEY.md §2.12): the
connector plugin registry (``connectors/connector_factory.py:74-198``), the
factory-registered model-stage kinds (``convert/manager.py:484-751``) and the
STANDARD-vs-VLM pipeline selection (``manager.py:1704-1721``) — re-expressed
as a flat named registry of stage factories.

A *stage* is anything usable as ``ds.map_batches(stage_or_cls, **opts)``:
either a callable (task pool) or a callable class (actor pool).  Factories
take an options dict and return ``(udf, map_batches_kwargs)`` so per-stage
resources (`concurrency`, `batch_size`, `num_cpus`) live with the stage
definition, not the call site.
"""

from __future__ import annotations

from collections.abc import Callable

StageFactory = Callable[[dict], tuple[object, dict]]

_REGISTRY: dict[str, StageFactory] = {}


def register_stage(name: str, factory: StageFactory, *, allow_override: bool = False) -> None:
    if name in _REGISTRY and not allow_override:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = factory


def get_stage(name: str, options: dict | None = None) -> tuple[object, dict]:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](options or {})


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stage(ds, name: str, options: dict | None = None):
    """ds -> ds through a named stage."""
    udf, kwargs = get_stage(name, options)
    return ds.map_batches(udf, **kwargs)


PLUGIN_GROUP = "docling_jobkit_ray.stages"
_OWN_DISTRIBUTION = "docling-jobkit-ray"


def discover_plugins(
    *, allow_external_plugins: bool = False, group: str = PLUGIN_GROUP
) -> list[str]:
    """Load stage plugins from setuptools entry points — the reference's
    third-party connector discovery (``connectors/connector_factory.py:74-198``,
    pluggy + ``allow_external_plugins`` gate) re-expressed over stdlib
    ``importlib.metadata`` (no pluggy dependency).

    A third-party distribution ships a stage without touching this package:

        [project.entry-points."docling_jobkit_ray.stages"]
        my_stage = my_pkg.stages:my_factory

    where ``my_factory`` is a :data:`StageFactory`.  Entry points from any
    distribution other than this package are EXTERNAL and are skipped unless
    ``allow_external_plugins=True`` — the same admin gate the reference
    enforces before loading foreign code.  Returns the stage names loaded
    this call (already-registered names are re-registered, so rediscovery
    is idempotent)."""
    import importlib.metadata as _md

    loaded: list[str] = []
    for ep in _md.entry_points(group=group):
        dist = getattr(ep, "dist", None)
        dist_name = getattr(dist, "name", None)
        is_external = dist_name != _OWN_DISTRIBUTION
        if is_external and not allow_external_plugins:
            continue
        factory = ep.load()
        if not callable(factory):
            raise TypeError(
                f"plugin {ep.name!r} from {dist_name!r} is not a StageFactory"
            )
        register_stage(ep.name, factory, allow_override=True)
        loaded.append(ep.name)
    return loaded


# -- built-in stage registrations -------------------------------------------

def _extract_factory(opts: dict):
    from ..extract.record import ExtractOptions
    from .extract import ExtractDocuments, options_to_kwargs

    eo = ExtractOptions(**{k: v for k, v in opts.items() if k != "map_kwargs"})
    kwargs = {
        "fn_constructor_kwargs": {"options": options_to_kwargs(eo)},
        "batch_format": "pyarrow",
        "zero_copy_batch": True,
        "batch_size": 64,
        "concurrency": (1, 8),
    }
    kwargs.update(opts.get("map_kwargs", {}))
    return ExtractDocuments, kwargs


def _simple_factory(make_udf):
    def factory(opts: dict):
        kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
        kwargs.update(opts.get("map_kwargs", {}))
        return make_udf(opts), kwargs

    return factory


def _register_builtins() -> None:
    from ..functions.dedup import MinHasher, SimHasher
    from ..functions.textstats import LangId, QualityScorer
    from .chunking import ChunkDocuments
    from .export import doc_stats, export_projections

    def _chunk_factory(opts: dict):
        kwargs = {
            "fn_constructor_kwargs": {
                "max_tokens": opts.get("max_tokens", 256),
                "tokenizer": opts.get("tokenizer"),
            },
            "batch_format": "pyarrow",
            "zero_copy_batch": True,
            "concurrency": opts.get("concurrency", (1, 4)),
        }
        kwargs.update(opts.get("map_kwargs", {}))
        return ChunkDocuments, kwargs

    register_stage("extract", _extract_factory, allow_override=True)
    register_stage("chunk", _chunk_factory, allow_override=True)
    register_stage("export", _simple_factory(lambda o: export_projections), allow_override=True)
    register_stage("doc_stats", _simple_factory(lambda o: doc_stats), allow_override=True)
    register_stage(
        "minhash",
        _simple_factory(
            lambda o: MinHasher(
                num_perm=o.get("num_perm", 64), shingle_k=o.get("shingle_k", 3)
            )
        ),
        allow_override=True,
    )
    register_stage("simhash", _simple_factory(lambda o: SimHasher()), allow_override=True)
    from .vlm import VlmDescribe

    def _vlm_factory(opts: dict):
        kwargs = {
            "batch_format": "pyarrow",
            "zero_copy_batch": True,
            "concurrency": opts.get("concurrency", (1, 4)),
        }
        kwargs.update(opts.get("map_kwargs", {}))
        return VlmDescribe, kwargs

    register_stage("vlm_describe", _vlm_factory, allow_override=True)
    register_stage("quality", _simple_factory(lambda o: QualityScorer()), allow_override=True)
    register_stage("lang_id", _simple_factory(lambda o: LangId()), allow_override=True)


_register_builtins()
