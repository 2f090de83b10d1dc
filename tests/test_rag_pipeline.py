"""Composed RAG ingestion: extract -> chunk -> embed -> IVF -> search.

The invariant that makes the composition checkable without a model: a probe
using a chunk's OWN embedding must return that chunk at rank 1 with cosine
~1.0 (embeddings are L2-normalized and deterministic)."""

from __future__ import annotations

import tempfile
import zlib

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunk_vecs(ray_session):
    import pyarrow as pa

    from docling_jobkit_ray.fixtures.corpus import write_corpus
    from docling_jobkit_ray.functions.embed import TextEmbedder
    from docling_jobkit_ray.pipelines.extract import extract_pipeline, successes
    from docling_jobkit_ray.stages.chunking import chunk_pipeline

    corpus = "/tmp/djr_rag_test_corpus"
    write_corpus(corpus, n_rows=300, seed=5, n_shards=2)

    def add_id(b: pa.Table) -> pa.Table:
        urls = b["url"].to_pylist()
        idx = b["chunk_index"].to_numpy(zero_copy_only=False).astype("int64")
        crc = np.array([zlib.crc32(u.encode()) for u in urls], dtype=np.int64)
        return b.append_column("vec_id", pa.array((crc << 20) | idx, pa.int64()))

    chunks = chunk_pipeline(successes(extract_pipeline(corpus))).map_batches(
        add_id, batch_format="pyarrow", zero_copy_batch=True
    )
    return chunks.map_batches(
        TextEmbedder(id_col="vec_id", text_col="text"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()


def test_chunk_ids_unique(chunk_vecs):
    ids = chunk_vecs.select_columns(["vec_id"]).to_pandas()["vec_id"]
    assert ids.is_unique


def test_self_retrieval_rank1(chunk_vecs):
    from docling_jobkit_ray.functions.vector_index import (
        build_ivf_index,
        probe_ivf_index,
    )

    qdf = chunk_vecs.limit(10).to_pandas().sort_values("vec_id")
    queries = np.vstack(qdf["embedding"].to_numpy()).astype(np.float32)
    qids = qdf["vec_id"].astype("int64").tolist()
    with tempfile.TemporaryDirectory() as tmp:
        build_ivf_index(chunk_vecs, tmp, n_cells=8)
        out = probe_ivf_index(tmp, queries, qids, k=3, n_probe=8).to_pandas()
    top1 = out[out["rank"] == 1].set_index("query_id")
    for qid in qids:
        # full probe: the chunk's own embedding must retrieve itself
        # (distinct chunks can tie at cosine 1.0 only if their text is
        # identical; the fixture corpus has unique chunk texts)
        assert top1.loc[qid, "vec_id"] == qid
        assert top1.loc[qid, "cosine"] == pytest.approx(1.0, abs=1e-5)
