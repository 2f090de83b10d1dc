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


def test_bpe_packed_sequences_invariants(ray_session):
    """Packed training rows: every sequence fits seq_len, token mass
    reconciles with per-doc counts plus separators, ids decode within the
    vocab, determinism."""
    from docling_jobkit_ray.functions.bpe import (
        EOS_ID,
        bpe_packed_sequences,
        bpe_token_counts,
    )

    sf = "/root/testdata/sf0.001"
    seqs = bpe_packed_sequences(sf, seq_len=256, n_merges=50).to_pandas()
    docs = bpe_token_counts(sf, n_merges=50).to_pandas()
    assert (seqs["n_tokens"] <= 256).all()
    assert int(seqs["n_docs"].sum()) == len(docs)
    # token mass: sum of per-doc tokens (minus truncation losses) plus one
    # eos per extra doc per sequence equals the packed totals
    seps = int((seqs["n_docs"] - 1).clip(lower=0).sum())
    packed_payload = int(seqs["n_tokens"].sum()) - seps
    assert packed_payload <= int(docs["n_bpe_tokens"].sum())
    if int(seqs["n_truncated"].sum()) == 0:
        assert packed_payload == int(docs["n_bpe_tokens"].sum())
    # ids are in-vocab int32s; eos appears exactly `seps` times as separator
    all_ids = [i for ids in seqs["input_ids"] for i in ids]
    assert min(all_ids) >= 0
    assert sum(1 for i in all_ids if i == EOS_ID) == seps
    again = bpe_packed_sequences(sf, seq_len=256, n_merges=50).to_pandas()
    assert seqs.equals(again)
