"""Session-scoped Ray + shared synthetic corpus fixtures."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    """Seeded pages corpus (FIXTURES.md §1): 600 rows over 3 shards with
    poisoned rows, binary payloads and a heavy tail."""
    from docling_jobkit_ray.fixtures.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n_rows=600, seed=42, n_shards=3)
    return out


@pytest.fixture(scope="session")
def corpus_oracle(corpus_dir):
    """Single-process oracle over the same corpus: {url: extracted row}."""
    import glob

    import pyarrow.parquet as pq

    from docling_jobkit_ray.extract.record import ExtractOptions, extract_record

    opts = ExtractOptions()
    rows = {}
    for path in sorted(glob.glob(f"{corpus_dir}/*.parquet")):
        t = pq.read_table(path, columns=["url", "html"])
        for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            rows[url] = extract_record(url, html, opts)
    return rows
