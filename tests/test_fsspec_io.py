"""fsspec-backed I/O: makes the "fsspec URIs subsume the cloud connectors"
claim real (SURVEY.md §2.1/§2.2; reference connector packs at
``/root/reference/docling_jobkit/connectors/s3/source_processor.py:47-156``).

``read_pages`` / ``Dataset.write_parquet`` accept any pyarrow filesystem;
wrapping an fsspec filesystem in ``PyFileSystem(FSSpecHandler(...))`` is the
exact wiring a user needs for s3fs/adlfs/gcsfs — this test exercises that
code path end-to-end through distributed Ray read tasks (the handler is
pickled to workers), using fsspec's local filesystem since the sandbox has
no network.
"""

from __future__ import annotations

import fsspec
import pytest
from pyarrow.fs import FSSpecHandler, PyFileSystem

from docling_jobkit_ray.pipelines.extract import extract_pipeline
from docling_jobkit_ray.sources.pages import read_pages


@pytest.fixture(scope="module")
def fsspec_fs():
    return PyFileSystem(FSSpecHandler(fsspec.filesystem("file")))


def test_read_pages_through_fsspec(ray_session, corpus_dir, fsspec_fs):
    plain = read_pages(corpus_dir)
    via_fsspec = read_pages(corpus_dir, filesystem=fsspec_fs)
    assert via_fsspec.count() == plain.count()
    a = sorted(r["url"] for r in via_fsspec.select_columns(["url"]).take_all())
    b = sorted(r["url"] for r in plain.select_columns(["url"]).take_all())
    assert a == b


def test_extract_and_write_through_fsspec(ray_session, corpus_dir, fsspec_fs, tmp_path):
    """Full pipeline over an fsspec source, sink through the same handler,
    then read the sink back — the cloud-target round trip, §2.2."""
    import ray.data

    out = str(tmp_path / "fsspec_out")
    ds = extract_pipeline(corpus_dir, mode="inline", concurrency=(1, 2))
    ds.write_parquet(out, filesystem=fsspec_fs)
    back = ray.data.read_parquet(out, columns=["url", "status"], filesystem=fsspec_fs)
    assert back.count() == 600
    statuses = {r["status"] for r in back.take_all()}
    assert "SUCCESS" in statuses
