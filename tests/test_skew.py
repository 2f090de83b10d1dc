"""Skew / oversized-document handling: slice fan-out over a giant binary doc
and size-bucketed routing of a giant HTML row."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def skewed_corpus(tmp_path_factory):
    from docling_jobkit_ray.extract.binarydoc import build_binary_doc
    from docling_jobkit_ray.fixtures.corpus import generate_rows, rows_to_table

    d = tmp_path_factory.mktemp("skew")
    cols = generate_rows(50, seed=7, poison_frac=0.0, binary_frac=0.0)
    # one giant binary doc: 200 pages (20 slices at slice_pages=10)
    pages = [f"Giant page {i} content with several words of payload text." for i in range(200)]
    cols["url"].append("https://giant.example/binary")
    cols["warc_ts"].append(cols["warc_ts"][0])
    cols["html"].append(build_binary_doc(pages))
    cols["text"].append("")
    cols["lang"].append("en")
    # one giant html doc (~2.5 MB)
    big_html = (
        "<html><body><main>"
        + "".join(f"<p>Large paragraph {i} " + "word " * 60 + "</p>" for i in range(6000))
        + "</main></body></html>"
    )
    cols["url"].append("https://giant.example/html")
    cols["warc_ts"].append(cols["warc_ts"][0])
    cols["html"].append(big_html.encode())
    cols["text"].append("")
    cols["lang"].append("en")
    pq.write_table(rows_to_table(cols), str(d / "pages-00000.parquet"))
    return str(d)


def _oracle(skewed_corpus):
    from docling_jobkit_ray.extract.record import ExtractOptions, extract_record

    t = pq.read_table(f"{skewed_corpus}/pages-00000.parquet", columns=["url", "html"])
    opts = ExtractOptions()
    return {
        u: extract_record(u, h, opts)
        for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist())
    }


@pytest.mark.parametrize("mode", ["sliced", "size_bucketed", "fused"])
def test_giant_docs_byte_identical(ray_session, skewed_corpus, mode):
    from docling_jobkit_ray.pipelines.extract import extract_pipeline

    oracle = _oracle(skewed_corpus)
    got = {
        r["url"]: r
        for r in extract_pipeline(skewed_corpus, mode=mode, concurrency=(1, 2)).take_all()
    }
    assert set(got) == set(oracle)
    for url in ("https://giant.example/binary", "https://giant.example/html"):
        assert got[url]["status"] == "SUCCESS"
        assert got[url]["text"] == oracle[url]["text"]
        assert got[url]["doc_json"] == oracle[url]["doc_json"]


def test_slice_plan_shape(skewed_corpus):
    """The giant binary doc must be planned into 20 byte-range slices that
    reconstruct the payload exactly (zero duplication)."""
    from docling_jobkit_ray.extract import binarydoc
    from docling_jobkit_ray.stages.slices import plan_slices

    t = pq.read_table(f"{skewed_corpus}/pages-00000.parquet", columns=["url", "html"])
    mask = pa.compute.equal(t["url"], "https://giant.example/binary")
    big = t.filter(mask).append_column("path", pa.array(["x"], pa.string()))
    slices = plan_slices(10)(big)
    assert slices.num_rows == 20
    payload = big.column("html")[0].as_py()
    directory = binarydoc.parse_directory(payload)
    total_payload_bytes = sum(ln for _off, ln in directory)
    shipped = sum(len(p) for p in slices.column("payload").to_pylist())
    assert shipped == total_payload_bytes  # each slice ships ONLY its pages
    assert slices.column("slice_index").to_pylist() == list(range(20))
