"""Element-explode surface: slice integrity, kind counts vs doc_stats,
filter pushdown."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    from docling_jobkit_ray.fixtures.corpus import write_corpus
    from docling_jobkit_ray.pipelines.extract import extract_pipeline, successes

    corpus = str(tmp_path_factory.mktemp("elements") / "corpus")
    write_corpus(corpus, n_rows=200, seed=11, n_shards=2)
    return successes(extract_pipeline(corpus)).materialize()


def test_element_text_matches_slice(extracted):
    from docling_jobkit_ray.stages.export import elements_pipeline

    docs = extracted.select_columns(["url", "text"]).to_pandas().set_index("url")
    els = elements_pipeline(extracted).to_pandas()
    assert len(els) > 0
    for row in els.itertuples():
        assert row.element_text == docs.loc[row.url, "text"][row.start : row.end]
    # offsets are sane and elements are non-degenerate in aggregate
    assert (els["end"] >= els["start"]).all()
    assert (els["element_text"].str.len() > 0).mean() > 0.9


def test_kind_counts_match_doc_stats(extracted):
    from docling_jobkit_ray.stages.export import doc_stats_pipeline, elements_pipeline

    els = elements_pipeline(extracted).to_pandas()
    stats = doc_stats_pipeline(extracted).to_pandas()
    got = els.groupby("kind").size()
    assert got.get("table", 0) == stats["num_tables"].sum()
    assert got.get("heading", 0) == stats["num_headings"].sum()
    assert len(els) == stats["num_spans"].sum()


def test_kind_filter(extracted):
    from docling_jobkit_ray.stages.export import elements_pipeline

    tables = elements_pipeline(extracted, kinds=["table"]).to_pandas()
    assert set(tables["kind"]) <= {"table"}
    full = elements_pipeline(extracted).to_pandas()
    pd.testing.assert_frame_equal(
        tables.reset_index(drop=True),
        full[full["kind"] == "table"].reset_index(drop=True),
    )
