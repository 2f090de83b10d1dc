"""Positional inverted index: artifact round trip, phrase/proximity parity
with the scan-based oracles, m>2 phrases, and the incremental-append
protocol (the index family's contract)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from docling_jobkit_ray.functions.positional_index import build_positional_index

    out = str(tmp_path_factory.mktemp("pos") / "idx")
    meta = build_positional_index(SF, out)
    assert os.path.exists(os.path.join(out, "_meta.json"))
    assert meta["n_buckets"] >= 64
    return out


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).df()


@pytest.mark.parametrize(
    "phrase",
    [("table", "hash"), ("big", "order", "scan"), ("sort", "slow", "hash")],
)
def test_phrase_matches_scan_oracle(index_dir, phrase):
    from docling_jobkit_ray.functions.positional_index import (
        phrase_search_indexed_sql,
        search_phrase_index,
    )

    got = search_phrase_index(index_dir, list(phrase)).to_pandas()
    want = _oracle(phrase_search_indexed_sql(phrase))
    assert len(got) > 0  # non-vacuous by fixture choice
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64")
    )


def test_phrase_two_word_matches_batch_local_kernel(index_dir):
    """The indexed path and the corpus-scan kernel (index.phrase_search)
    must agree — two independent implementations of the same contract."""
    from docling_jobkit_ray.functions.index import phrase_search
    from docling_jobkit_ray.functions.positional_index import search_phrase_index

    got = search_phrase_index(index_dir, ["table", "hash"]).to_pandas()
    want = phrase_search(SF, phrase=("table", "hash")).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        want.reset_index(drop=True).astype("int64"),
    )


def test_absent_term_returns_empty_with_schema(index_dir):
    from docling_jobkit_ray.functions.positional_index import search_phrase_index

    ds = search_phrase_index(index_dir, ["zzzqqq", "table"])
    assert ds.count() == 0


def test_repeated_word_phrase(index_dir):
    """A phrase with a duplicated term exercises the slot-expansion path
    (one posting row feeds two slots)."""
    from docling_jobkit_ray.functions.positional_index import (
        phrase_search_indexed_sql,
        search_phrase_index,
    )

    got = search_phrase_index(index_dir, ["data", "data"]).to_pandas()
    want = _oracle(phrase_search_indexed_sql(("data", "data")))
    if want.empty:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True).astype("int64"), want.astype("int64")
        )


def test_proximity_matches_oracle(ray_session):
    from docling_jobkit_ray.functions.positional_index import (
        proximity_search_indexed,
        proximity_search_indexed_sql,
    )

    got = proximity_search_indexed(SF)
    want = _oracle(proximity_search_indexed_sql())
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64")
    )


def test_append_equals_rebuild(ray_session, tmp_path):
    """Index half the corpus, append the other half: every phrase answer
    must equal the all-at-once build (the family invariant)."""
    import pyarrow.compute as pc

    from docling_jobkit_ray.functions.positional_index import (
        append_positional_index,
        build_positional_index,
        search_phrase_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    full = str(tmp_path / "full")
    half = str(tmp_path / "half")
    build_positional_index(SF, full)
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    lo = docs.map_batches(
        lambda b: b.filter(pc.less(pc.cast(b["doc_id"], "int64"), 250)),
        batch_format="pyarrow",
    )
    hi = docs.map_batches(
        lambda b: b.filter(pc.greater_equal(pc.cast(b["doc_id"], "int64"), 250)),
        batch_format="pyarrow",
    )
    # build over the low half only: write a reduced corpus, index it, then
    # append the high half through the incremental path
    import pyarrow as pa
    import pyarrow.parquet as pq

    half_src = str(tmp_path / "halfsrc")
    os.makedirs(half_src)
    pq.write_table(
        pa.Table.from_pandas(lo.to_pandas(), preserve_index=False),
        f"{half_src}/documents.parquet",
    )
    build_positional_index(half_src, half)
    append_positional_index(half, hi)

    for phrase in (["table", "hash"], ["big", "order", "scan"]):
        a = search_phrase_index(full, phrase).to_pandas()
        b = search_phrase_index(half, phrase).to_pandas()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True).astype("int64"),
            b.reset_index(drop=True).astype("int64"),
        )


def test_append_rerun_is_idempotent(ray_session, tmp_path):
    """Re-running a crashed append duplicates posting rows; the search-side
    (doc, slot, start) dedup must keep answers identical."""
    from docling_jobkit_ray.functions.positional_index import (
        append_positional_index,
        build_positional_index,
        search_phrase_index,
    )
    from docling_jobkit_ray.sources.pages import read_table

    out = str(tmp_path / "idx")
    build_positional_index(SF, out)
    before = search_phrase_index(out, ["table", "hash"]).to_pandas()
    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    # append the SAME corpus again (worst-case duplicate)
    append_positional_index(out, docs)
    after = search_phrase_index(out, ["table", "hash"]).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True).astype("int64"),
        after.reset_index(drop=True).astype("int64"),
    )


def test_append_requires_meta(ray_session, tmp_path):
    from docling_jobkit_ray.functions.positional_index import append_positional_index
    from docling_jobkit_ray.sources.pages import read_table

    docs = read_table(SF, "documents", columns=["doc_id", "text"])
    with pytest.raises(FileNotFoundError):
        append_positional_index(str(tmp_path / "nope"), docs)


def test_phrase_fuzz_vs_brute_force(ray_session, tmp_path):
    """Seeded random corpora: indexed phrase counts must equal a naive
    single-process scan for random 2-4 word phrases (boundary positions,
    repeated words, absent words all arise naturally)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.positional_index import (
        build_positional_index,
        search_phrase_index,
    )

    rng = random.Random(77)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(120)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        f"{src}/documents.parquet",
    )
    idx = str(tmp_path / "idx")
    build_positional_index(src, idx)

    def brute(phrase):
        out = {}
        for did, t in enumerate(texts):
            w = t.split() if t else []
            c = sum(
                1
                for i in range(len(w) - len(phrase) + 1)
                if w[i : i + len(phrase)] == list(phrase)
            )
            if c:
                out[did] = c
        return out

    for _ in range(15):
        m = rng.randint(2, 4)
        phrase = [rng.choice(vocab) for _ in range(m)]
        got = search_phrase_index(idx, phrase).to_pandas()
        want = brute(phrase)
        assert dict(zip(got["doc_id"], got["n_matches"])) == want, phrase
