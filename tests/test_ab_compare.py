"""Extraction A/B shadow compare (pipelines/extract.extract_ab_compare)."""

from __future__ import annotations


def test_ab_compare_identical_presets_all_equal(ray_session, tmp_path):
    from docling_jobkit_ray.fixtures.corpus import write_corpus
    from docling_jobkit_ray.pipelines.extract import extract_ab_compare

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_rows=300, seed=11, n_shards=2)
    same = extract_ab_compare(corpus, preset_a="default", preset_b="default").to_pandas()
    # identical presets -> texts always equal, statuses on the diagonal
    assert (same["texts_equal"] == 1).all()
    assert (same["status_a"] == same["status_b"]).all()
    assert int(same["n_docs"].sum()) == 300


def test_ab_compare_detects_preset_differences(ray_session, tmp_path):
    from docling_jobkit_ray.fixtures.corpus import write_corpus
    from docling_jobkit_ray.pipelines.extract import extract_ab_compare

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_rows=300, seed=11, n_shards=2)
    diff = extract_ab_compare(
        corpus, preset_a="default", preset_b="aggressive_strip"
    ).to_pandas()
    assert int(diff["n_docs"].sum()) == 300
    # the aggressive stripper must change SOME texts but not all
    changed = int(diff.loc[diff["texts_equal"] == 0, "n_docs"].sum())
    unchanged = int(diff.loc[diff["texts_equal"] == 1, "n_docs"].sum())
    assert changed > 0 and unchanged > 0
