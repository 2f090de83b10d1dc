"""docling_jobkit_ray — a Ray-Data-native document extraction engine.

Brand-new implementation of docling-jobkit's data-processing capabilities
(reference: docling-project/docling-jobkit v3.1.0) re-expressed as
``ray.data.Dataset`` pipelines: map_batches over zero-copy Arrow batches,
actor pools for stateful stages, groupby/sort for the wide steps, streaming
execution with backpressure, per-partition checkpointed output.

Public surface:

- :mod:`docling_jobkit_ray.extract` — pure deterministic extraction library
  (HTML boilerplate strip, binary layout parse, error taxonomy).  The oracle.
- :mod:`docling_jobkit_ray.pipelines.extract` — the flagship pipeline
  (inline / sliced / size_bucketed modes, dead-letter view).
- :mod:`docling_jobkit_ray.state.checkpoint` — resumable shard-by-shard runs
  with manifest lineage + counters.
- :mod:`docling_jobkit_ray.stages` — extraction / slice-fanout / chunking /
  multimodal actor-pool stages.
- :mod:`docling_jobkit_ray.functions` — dedup (exact, MinHash-LSH, SimHash,
  embedding), similarity search (brute-force / IVF ANN), text analysis
  (lang-id, quality, tokens, fingerprints).
- :mod:`docling_jobkit_ray.pipelines.relational` — filter / project /
  broadcast-join / grouped-aggregate / window / top-k query surface.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (bench.py, tests' conftest, or the driver).
"""

__version__ = "0.1.0"
