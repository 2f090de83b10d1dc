"""Inverted-index build: exact posting lists vs a single-process oracle,
partitioned artifact layout, pruned lookup."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _brute_force_postings(sf_dir, min_df=1, max_df=10**9):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    posts: dict[str, set[int]] = {}
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for w in set(re.findall(r"[a-z]+", txt.lower())):
            posts.setdefault(w, set()).add(d)
    return {
        w: sorted(ds) for w, ds in posts.items() if min_df <= len(ds) <= max_df
    }


def test_build_index_matches_bruteforce_and_partitions(ray_session, tmp_path):
    from docling_jobkit_ray.functions.index import build_inverted_index

    out = str(tmp_path / "idx")
    info = build_inverted_index(SF_DIR, out, min_df=2)
    want = _brute_force_postings(SF_DIR, min_df=2)

    # hive-partitioned artifact: bucket=N dirs (resumable / prunable)
    parts = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert len(parts) >= 2

    got_t = pq.read_table(out, columns=["term", "df", "postings"])
    got = {
        t: p
        for t, p in zip(got_t["term"].to_pylist(), got_t["postings"].to_pylist())
    }
    assert got == want
    dfs = dict(zip(got_t["term"].to_pylist(), got_t["df"].to_pylist()))
    assert all(dfs[t] == len(p) for t, p in got.items())
    assert info["n_buckets"] >= 2


def test_lookup_reads_only_matching_buckets(ray_session, tmp_path):
    from docling_jobkit_ray.functions.index import (
        _term_bucket,
        build_inverted_index,
        lookup_postings,
    )

    out = str(tmp_path / "idx")
    info = build_inverted_index(SF_DIR, out, min_df=1)
    want = _brute_force_postings(SF_DIR)
    terms = sorted(want)[:3] + ["zzzmissingterm"]
    got = lookup_postings(out, terms, n_buckets=info["n_buckets"])
    hit = dict(zip(got["term"].to_pylist(), got["postings"].to_pylist()))
    for t in terms[:3]:
        assert hit[t] == want[t]
    assert "zzzmissingterm" not in hit
    # pruning: the touched partitions are exactly the query-term buckets
    buckets = set(_term_bucket(terms, info["n_buckets"]).tolist())
    assert len(buckets) <= len(terms)


def test_stats_query_vectorized_pairs(ray_session):
    """term_doc_pairs is batch-local distinct: duplicate words inside one
    doc emit ONE pair; the same term across docs emits one pair per doc."""
    from docling_jobkit_ray.functions.index import term_doc_pairs

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["Cat cat DOG!", "dog fish"]),
        }
    )
    out = term_doc_pairs(batch, n_buckets=64)
    pairs = sorted(zip(out["term"].to_pylist(), out["doc_id"].to_pylist()))
    assert pairs == [("cat", 1), ("dog", 1), ("dog", 2), ("fish", 2)]
    assert out["bucket"].to_numpy().max() < 64


def test_search_postings_equals_search_corpus(ray_session, tmp_path):
    """The artifact-backed ranking must be byte-equal to the corpus-direct
    pipeline — the index path never changes the answer — and empty-hit
    queries return a typed empty table."""
    import pandas as pd

    from docling_jobkit_ray.functions.index import (
        build_inverted_index,
        search_corpus,
        search_postings,
    )

    sf = "/root/testdata/sf0.01"
    out_dir = str(tmp_path / "idx")
    info = build_inverted_index(sf, out_dir)
    terms = ["table", "spark", "window"]
    direct = search_corpus(sf, terms, k=20).to_pandas().reset_index(drop=True)
    art = search_postings(
        out_dir, terms, n_buckets=info["n_buckets"], k=20
    ).to_pandas()
    pd.testing.assert_frame_equal(art.reset_index(drop=True), direct, check_dtype=False)
    miss = search_postings(
        out_dir, ["zzzznotaword"], n_buckets=info["n_buckets"], k=5
    )
    assert miss.num_rows == 0 and miss.column_names == ["doc_id", "n_hits", "sum_df"]


def test_bm25_search_matches_sql_and_ranks_sensibly(ray_session, tmp_path):
    """Hand-crafted corpus: rarer terms dominate (idf), higher tf beats
    lower at equal length, longer docs are penalized at equal tf; parity
    with the DuckDB oracle on the same corpus."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.index import bm25_search, bm25_search_sql

    texts = [
        "spark spark spark",           # 0: high tf of the rare term
        "spark table table table",     # 1: one rare + common
        "table table table",           # 2: common only
        "spark " + "pad " * 50,        # 3: rare term in a LONG doc
        "nothing relevant here",       # 4: no query terms -> excluded
    ] + ["table window pad"] * 10      # commons
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = bm25_search(str(tmp_path), ["table", "spark", "window"], k=20).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(bm25_search_sql(["table", "spark", "window"], k=20)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    ranks = {d: i for i, d in enumerate(got["doc_id"])}
    assert 4 not in ranks  # no query terms
    assert ranks[0] < ranks[2]  # rare-term tf beats common-term tf
    assert ranks[0] < ranks[3]  # length normalization penalizes the long doc


def test_append_equals_rebuild_and_idempotent(ray_session, tmp_path):
    """Half build + half append must answer every query exactly like the
    all-at-once build; re-appending the same half (crashed-append replay)
    must change nothing (lookup-side union dedup)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from docling_jobkit_ray.functions.index import (
        append_inverted_index,
        build_inverted_index,
        lookup_postings,
        search_postings,
    )
    from docling_jobkit_ray.sources.pages import read_table

    full_dir = str(tmp_path / "full")
    half_dir = str(tmp_path / "half")
    meta_full = build_inverted_index(SF_DIR, full_dir)
    assert os.path.exists(os.path.join(full_dir, "_meta.json"))

    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    lo = docs.map_batches(
        lambda b: b.filter(pc.less(pc.cast(b["doc_id"], "int64"), 250)),
        batch_format="pyarrow",
    )
    hi = docs.map_batches(
        lambda b: b.filter(pc.greater_equal(pc.cast(b["doc_id"], "int64"), 250)),
        batch_format="pyarrow",
    )
    half_src = str(tmp_path / "halfsrc")
    os.makedirs(half_src)
    _pq.write_table(
        pa.Table.from_pandas(lo.to_pandas(), preserve_index=False),
        f"{half_src}/documents.parquet",
    )
    build_inverted_index(half_src, half_dir, min_df=1, max_df_ratio=1.0)
    # pin the bucket count so both artifacts share partitions for compare
    append_inverted_index(half_dir, hi)

    terms = ["table", "spark", "window", "hash"]
    a = search_postings(full_dir, terms, n_buckets=meta_full["n_buckets"], k=50)
    import json

    nb_half = json.load(open(f"{half_dir}/_meta.json"))["n_buckets"]
    b = search_postings(half_dir, terms, n_buckets=nb_half, k=50)
    assert a.to_pydict() == b.to_pydict()

    before = lookup_postings(half_dir, terms, n_buckets=nb_half).to_pydict()
    append_inverted_index(half_dir, hi)  # replay
    after = lookup_postings(half_dir, terms, n_buckets=nb_half).to_pydict()
    assert before == after


def test_append_refuses_pruned_index(ray_session, tmp_path):
    import pytest as _pytest

    from docling_jobkit_ray.functions.index import (
        append_inverted_index,
        build_inverted_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    out = str(tmp_path / "pruned")
    build_inverted_index(SF_DIR, out, min_df=2)
    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    with _pytest.raises(ValueError, match="unpruned"):
        append_inverted_index(out, docs)
