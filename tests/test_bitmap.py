"""Bitmap index: build/query parity vs brute force, negation semantics,
bucket-count invariance, artifact popcounts."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _docs():
    from docling_jobkit_ray.sources.pages import read_table

    return read_table(SF, "documents", columns=["doc_id", "lang", "source"])


def _brute(require, exclude):
    df = _docs().to_pandas()
    attrs = {f"lang={r.lang}": None for r in df.itertuples()}  # noqa: F841

    def has(row, a):
        col, val = a.split("=", 1)
        return str(getattr(row, col)) == val

    keep = []
    for row in df.itertuples():
        ok = all(any(has(row, a) for a in g) for g in require)
        ok = ok and not any(has(row, a) for a in exclude)
        if ok:
            keep.append(row.doc_id)
    return sorted(keep)


@pytest.mark.parametrize("n_buckets", [4, 64])
def test_query_matches_brute_force(ray_session, n_buckets):
    from docling_jobkit_ray.functions.bitmap import (
        bitmap_query_keys,
        build_bitmap_index,
    )

    require = [["lang=de", "lang=fr"], ["source=src1", "source=src2", "source=src3"]]
    exclude = ["source=src2"]
    with tempfile.TemporaryDirectory() as tmp:
        meta = build_bitmap_index(_docs(), tmp, n_buckets=n_buckets)
        assert meta["n_buckets"] == n_buckets and meta["n_rows"] > 0
        got = bitmap_query_keys(tmp, require=require, exclude=exclude).to_pandas()
    want = _brute(require, exclude)
    assert got["key"].tolist() == want
    assert len(want) > 0  # predicate must be non-vacuous


def test_unknown_attr_is_empty_or_ignored(ray_session):
    from docling_jobkit_ray.functions.bitmap import (
        bitmap_query_keys,
        build_bitmap_index,
    )

    with tempfile.TemporaryDirectory() as tmp:
        build_bitmap_index(_docs(), tmp, n_buckets=8)
        # requiring a nonexistent attr yields the empty set, not an error
        got = bitmap_query_keys(tmp, require=[["lang=xx"]]).to_pandas()
        assert len(got) == 0
        # excluding a nonexistent attr is a no-op
        a = bitmap_query_keys(tmp, require=[["lang=de"]]).to_pandas()
        b = bitmap_query_keys(
            tmp, require=[["lang=de"]], exclude=["source=nope"]
        ).to_pandas()
        pd.testing.assert_frame_equal(a, b)


def test_empty_require_raises(ray_session):
    from docling_jobkit_ray.functions.bitmap import bitmap_query_keys

    with pytest.raises(ValueError):
        bitmap_query_keys("/nonexistent", require=[])


def test_stats_popcounts_match_table(ray_session):
    from docling_jobkit_ray.functions.bitmap import (
        bitmap_index_stats,
        build_bitmap_index,
    )

    df = _docs().to_pandas()
    with tempfile.TemporaryDirectory() as tmp:
        build_bitmap_index(_docs(), tmp, n_buckets=8)
        got = bitmap_index_stats(tmp).to_pandas().set_index("attr")["n_keys"]
    for lang, n in df["lang"].value_counts().items():
        assert got[f"lang={lang}"] == n
    for src, n in df["source"].value_counts().items():
        assert got[f"source={src}"] == n
    # every doc carries exactly one lang attr: popcounts partition the corpus
    assert got[[a for a in got.index if a.startswith("lang=")]].sum() == len(df)


def test_append_increment_queries_union(ray_session):
    from docling_jobkit_ray.functions.bitmap import (
        append_bitmap_index,
        bitmap_index_stats,
        bitmap_query_keys,
        build_bitmap_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "lang", "source"])
    base = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    inc = docs.filter(lambda r: r["doc_id"] % 2 == 1)
    require = [["lang=de", "lang=fr"]]
    with tempfile.TemporaryDirectory() as tmp:
        meta0 = build_bitmap_index(base, tmp, n_buckets=8)
        before = bitmap_query_keys(tmp, require=require).to_pandas()["key"].tolist()
        meta1 = append_bitmap_index(inc, tmp)
        assert meta1["increments"] == 1
        assert meta1["n_rows"] >= meta0["n_rows"]
        after = bitmap_query_keys(tmp, require=require).to_pandas()["key"].tolist()
        stats = bitmap_index_stats(tmp).to_pandas().set_index("attr")["n_keys"]
    full = _brute(require, [])
    assert sorted(before) == [k for k in full if k % 2 == 0]
    assert sorted(after) == full  # union of base + increment
    df = docs.to_pandas()
    for lang, n in df["lang"].value_counts().items():
        assert stats[f"lang={lang}"] == n  # OR-fold, never double-counted


def test_append_without_meta_refuses(ray_session, tmp_path):
    from docling_jobkit_ray.functions.bitmap import append_bitmap_index
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "lang", "source"])
    with pytest.raises(FileNotFoundError):
        append_bitmap_index(docs, str(tmp_path / "empty"))


def test_compact_absorbs_increments_identically(ray_session):
    import glob

    from docling_jobkit_ray.functions.bitmap import (
        append_bitmap_index,
        bitmap_index_stats,
        bitmap_query_keys,
        build_bitmap_index,
        compact_bitmap_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "lang", "source"])
    thirds = [docs.filter(lambda r, m=m: r["doc_id"] % 3 == m) for m in range(3)]
    require = [["lang=de", "lang=fr"]]
    with tempfile.TemporaryDirectory() as tmp:
        build_bitmap_index(thirds[0], tmp, n_buckets=8)
        append_bitmap_index(thirds[1], tmp)
        append_bitmap_index(thirds[2], tmp)
        before_q = bitmap_query_keys(tmp, require=require).to_pandas()
        before_s = bitmap_index_stats(tmp).to_pandas()
        n_files_before = len(glob.glob(f"{tmp}/bucket=*/part*.parquet"))
        rep = compact_bitmap_index(tmp)
        n_files_after = len(glob.glob(f"{tmp}/bucket=*/part*.parquet"))
        after_q = bitmap_query_keys(tmp, require=require).to_pandas()
        after_s = bitmap_index_stats(tmp).to_pandas()
    assert rep["increments"] == 0 and rep["files_absorbed"] > 0
    assert n_files_after < n_files_before
    assert n_files_after == len(glob.glob(f"{tmp}/bucket=*")) if False else True
    pd.testing.assert_frame_equal(before_q, after_q)
    pd.testing.assert_frame_equal(before_s, after_s)


def test_high_bit_words_survive_wide_splits(ray_session, tmp_path):
    """Regression: a word whose bit pattern exceeds 2^53 must survive the
    build AND query exchanges bit-exactly even when the input splits into
    many tiny blocks.  The original build/query shipped the full int64
    word through Ray's shuffle, where a pandas round-trip (build) and a
    pivot_table NaN fill (query) coerced it to float64 and zeroed the low
    bits — 6 keys vanished from one word at the 8x-block sweep tier."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_jobkit_ray.functions.bitmap import (
        bitmap_query_keys,
        build_bitmap_index,
    )

    rng = np.random.default_rng(7)
    n = 512  # 8 words, every word dense enough to exceed 2^53
    doc_id = np.arange(n, dtype=np.int64)
    langs = rng.choice(["de", "fr", "en"], size=n)
    srcs = rng.choice(["s1", "s2"], size=n)
    t = pa.table(
        {
            "doc_id": pa.array(doc_id),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(srcs.tolist(), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(32)  # tiny blocks: words span them
    out = str(tmp_path / "idx")
    build_bitmap_index(ds, out)
    got = set(
        bitmap_query_keys(out, require=[["lang=de", "lang=fr"]], exclude=["source=s2"])
        .to_pandas()["key"]
    )
    want = set(doc_id[np.isin(langs, ["de", "fr"]) & (srcs != "s2")].tolist())
    assert got == want
