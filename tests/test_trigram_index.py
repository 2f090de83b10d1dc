"""Trigram substring index: artifact round trip, pruning fast paths, and
parity with the brute-force LIKE scan."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from docling_jobkit_ray.functions.trigram_index import build_trigram_index
    from docling_jobkit_ray.sources.pages import read_table

    out = str(tmp_path_factory.mktemp("tri") / "idx")
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    meta = build_trigram_index(docs, out)
    assert os.path.exists(os.path.join(out, "_meta.json"))
    assert meta["n_buckets"] == 64
    return out


def _scan_truth(pattern: str) -> set[int]:
    return {
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
                WHERE trim(regexp_replace(lower(text),'[^a-z]+',' ','g'))
                      LIKE '%{pattern}%'"""
        ).fetchall()
    }


@pytest.mark.parametrize("pattern", ["data table", "spark window", "merge part"])
def test_indexed_search_matches_scan(index_dir, pattern):
    from docling_jobkit_ray.functions.trigram_index import search_trigram_index
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    got = search_trigram_index(index_dir, docs, pattern).to_pandas()
    assert set(got["doc_id"]) == _scan_truth(pattern)
    assert (got["n_hits"] >= 1).all()


def test_absent_trigram_short_circuits(index_dir):
    from docling_jobkit_ray.functions.trigram_index import search_trigram_index
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    # 'zzz' never appears in the corpus: the missing posting row must
    # empty the candidate set without any verification scan hits
    ds = search_trigram_index(index_dir, docs, "zzzqqq")
    assert ds.count() == 0
    # Dataset-level schema survives (to_pandas on an all-empty Dataset
    # drops columns — consumers go through substring_search_indexed's
    # typed-empty-frame guard for that)
    assert ds.schema().names == ["doc_id", "n_hits"]


def test_short_pattern_refused(index_dir):
    from docling_jobkit_ray.functions.trigram_index import _pattern_codes

    with pytest.raises(ValueError):
        _pattern_codes("ab")


def test_partition_pruning_reads_only_query_buckets(index_dir):
    from docling_jobkit_ray.functions.trigram_index import _pattern_codes

    codes = _pattern_codes("data table")
    buckets = {c % 64 for c in codes}
    all_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
    }
    # the query touches a strict subset of the artifact's partitions
    assert buckets < all_buckets


def test_candidate_superset_and_verification_tightens(index_dir):
    """Trigram candidates are a SUPERSET of true matches (necessary, not
    sufficient) — verification must only ever remove docs."""
    from docling_jobkit_ray.functions.trigram_index import (
        _pattern_codes,
        search_trigram_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    # a pattern whose trigrams are all common but whose full string is
    # rare: candidates >> matches
    pattern = "table data"  # reversed word order: trigrams exist, phrase rare
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    got = search_trigram_index(index_dir, docs, pattern).to_pandas()
    assert set(got["doc_id"]) == _scan_truth(pattern)


def test_append_equals_rebuild(ray_session, tmp_path):
    """Incremental protocol: build on the even half, append the odd half —
    every search must equal the full-rebuild index's answer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from docling_jobkit_ray.functions.trigram_index import (
        append_trigram_index,
        build_trigram_index,
        search_trigram_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    def half(parity):
        return read_table(SF, "documents", columns=["doc_id", "text"]).map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(pc.bit_wise_and(b["doc_id"], pa.scalar(1, pa.int64())), p)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_trigram_index(half(0), inc)
    append_trigram_index(inc, half(1))
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    build_trigram_index(docs, full)
    for pattern in ("data table", "spark window"):
        a = search_trigram_index(inc, docs, pattern).to_pandas()
        b = search_trigram_index(full, docs, pattern).to_pandas()
        assert a.values.tolist() == b.values.tolist()
        assert set(a["doc_id"]) == _scan_truth(pattern)


def test_append_requires_meta(ray_session, tmp_path):
    from docling_jobkit_ray.functions.trigram_index import append_trigram_index
    from docling_jobkit_ray.sources.pages import read_table

    with pytest.raises(FileNotFoundError):
        append_trigram_index(
            str(tmp_path / "nowhere"),
            read_table(SF, "documents", columns=["doc_id", "text"]),
        )
