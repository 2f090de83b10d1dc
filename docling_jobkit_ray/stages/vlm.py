"""VLM pipeline family: extraction + per-page model descriptions.

The reference selects between a STANDARD and a VLM conversion pipeline at
options-compile time (``convert/manager.py:1567-1670`` builds the VLM
pipeline, ``:1704-1721`` selects it).  Here the second family is expressed
the Ray-Data way: the same extraction plan plus one more actor-pool
``map_batches`` stage that holds the (expensive) vision-language model warm
in ``__init__`` and annotates each document with per-page descriptions.

MODEL STAND-IN: no VLM weights or image stack exist in this sandbox, so
``FakePageDescriber`` is a deterministic stand-in (page stats + content
digest).  The Ray-side plumbing — actor pool, per-actor model state, batch
shaping, output schema — is the real thing; swap ``describer_cls`` for a
class whose ``__init__`` loads actual weights to go live.
"""

from __future__ import annotations

import functools
import hashlib
import json

import pyarrow as pa
import ray.data

PIPELINE_STANDARD = "standard"
PIPELINE_VLM = "vlm"
PIPELINES = (PIPELINE_STANDARD, PIPELINE_VLM)


def describer_for_preset(name: str = "default"):
    """Resolve a VLM preset name to a describer class through the per-kind
    model registry (reference ``convert/manager.py:484-751``): the resolved
    options dict names the describer implementation."""
    from ..extract.presets import model_kind

    opts = model_kind("vlm").resolve(name)
    impl = opts.get("describer", "fake_page_describer")
    known = {"fake_page_describer": FakePageDescriber}
    if callable(impl):
        return impl  # custom presets may carry the class directly
    if impl not in known:
        raise KeyError(f"vlm preset {name!r} names unknown describer {impl!r}")
    return known[impl]


class FakePageDescriber:
    """Deterministic model stand-in: 'describes' a page from its text.
    A real describer would load weights here (once per actor)."""

    def __init__(self) -> None:
        self.name = "fake-page-describer/1"

    def describe(self, page_text: str) -> str:
        digest = hashlib.sha256(page_text.encode("utf-8")).hexdigest()[:8]
        n_words = len(page_text.split())
        return f"[{self.name}] {n_words} words, digest {digest}"


class VlmDescribe:
    """Actor-pool UDF: extracted rows -> rows + ``vlm_json`` column with one
    description per page span.  Model state lives in ``__init__`` (once per
    actor), work in ``__call__`` (per batch) — the warm-model discipline of
    the reference's converter replicas."""

    def __init__(self, describer_cls=FakePageDescriber):
        self.model = describer_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        statuses = batch.column("status").to_pylist()
        out = []
        for text, spans, status in zip(texts, spans_col, statuses):
            if status == "FAILURE" or not text:
                out.append("")
                continue
            pages = [
                text[s["start"] : s["end"]]
                for s in (spans or [])
                if s["kind"] == "page"
            ] or [text]
            out.append(
                json.dumps(
                    {
                        "model": self.model.name,
                        "pages": [self.model.describe(p) for p in pages],
                    },
                    sort_keys=True,
                    separators=(",", ":"),
                )
            )
        return batch.append_column("vlm_json", pa.array(out, pa.string()))


@functools.lru_cache(maxsize=None)
def get_describe_udf(describer_cls=FakePageDescriber) -> VlmDescribe:
    """Per-WORKER-PROCESS cache of the VlmDescribe UDF (and thus its warm
    model) for stateless-task plans like the fused checkpoint path: the
    model loads once per worker, not once per shard task — the task-pool
    substitute for actor ``__init__`` state."""
    return VlmDescribe(describer_cls=describer_cls)


def vlm_enrich(
    extracted: ray.data.Dataset, *, describer_cls=FakePageDescriber, concurrency=(1, 4), batch_size: int = 64
) -> ray.data.Dataset:
    """Append the VLM stage to an extracted dataset (the second pipeline
    family's plan = standard plan + this stage)."""
    return extracted.map_batches(
        VlmDescribe,
        fn_constructor_kwargs={"describer_cls": describer_cls},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
