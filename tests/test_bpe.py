"""Distributed BPE fitting/application (functions/bpe.py): known-corpus
merge order, encoder invariants, word-count exchange vs DuckDB."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_known_merge_sequence(ray_session, tmp_path):
    """Hand-checkable corpus: 'low' x5 and 'lower' x2 -> the classic
    Sennrich example.  First merges must assemble the shared stem."""
    from docling_jobkit_ray.functions.bpe import encode_word, train_bpe

    sf = _write_docs(tmp_path, ["low low low low low", "lower lower"])
    merges = train_bpe(sf, n_merges=4)
    # 'l'+'o' appears in every word occurrence (7) — the unambiguous first
    # merge; 'lo'+'w' (7) follows
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # after enough merges the frequent word becomes ONE token
    merges_full = train_bpe(sf, n_merges=10)
    assert encode_word("low", merges_full) == ["low</w>"]
    # encoder is a pure function of the merge list
    assert encode_word("lowest", merges_full)[:1] == ["low"]


def test_bpe_token_counts_invariants(ray_session, tmp_path):
    """Subword token count per doc: bounded below by word count after full
    merging is impossible for unseen words, bounded above by chars+1; the
    whole pipeline is deterministic across runs."""
    from docling_jobkit_ray.functions.bpe import bpe_token_counts

    texts = [
        "low low lower lowest",
        "newer newest new",
        "",
        "low new",
    ]
    sf = _write_docs(tmp_path, texts)
    a = bpe_token_counts(sf, n_merges=30).to_pandas()
    b = bpe_token_counts(sf, n_merges=30).to_pandas()
    assert a.equals(b)
    assert a["doc_id"].tolist() == [0, 1, 2, 3]
    assert a["n_words"].tolist() == [4, 3, 0, 2]
    # every word encodes to >= 1 token and <= len(word)+1 symbols
    for _, row in a.iterrows():
        n_chars = len(texts[row["doc_id"]].replace(" ", ""))
        assert row["n_words"] <= row["n_bpe_tokens"] <= n_chars + row["n_words"]
    assert a.loc[a["doc_id"] == 2, "n_bpe_tokens"].iloc[0] == 0


def test_corpus_word_counts_matches_duckdb(ray_session):
    import duckdb

    from docling_jobkit_ray.functions.bpe import corpus_word_counts

    sf = "/root/testdata/sf0.001"
    got = corpus_word_counts(sf, top_k=50).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        """
        SELECT w AS word, count(*) AS count
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
        ORDER BY count DESC, word LIMIT 50
        """
    ).df()
    assert got["word"].tolist() == want["word"].tolist()
    assert got["count"].tolist() == want["count"].tolist()


def test_bpe_fertility_by_lang(ray_session):
    """Per-lang fertility: sums reconcile with the per-doc counts and
    fertility >= 1 token/word everywhere."""
    from docling_jobkit_ray.functions.bpe import (
        bpe_fertility_by_lang,
        bpe_token_counts,
    )

    sf = "/root/testdata/sf0.001"
    fert = bpe_fertility_by_lang(sf, n_merges=50).to_pandas()
    docs = bpe_token_counts(sf, n_merges=50).to_pandas()
    assert int(fert["n_docs"].sum()) == len(docs)
    assert int(fert["n_words"].sum()) == int(docs["n_words"].sum())
    assert int(fert["n_bpe_tokens"].sum()) == int(docs["n_bpe_tokens"].sum())
    assert (fert["fertility_ppm"] >= 1_000_000).all()
