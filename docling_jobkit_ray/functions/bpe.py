"""Distributed BPE tokenizer fitting + application — the tokenizer half of
a training-data platform (the reference's chunker consumes a PRE-trained
tokenizer, ``docling_jobkit/chunking``; a data platform must also FIT one
from the corpus it just curated).

Split of labor (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"):

* the DATA-proportional step is the word-frequency table — ONE word-bucket
  exchange of within-doc-distinct ``(word, tf)`` partials (the same
  exchange shape as ``term_rarity_scores``; the vocabulary never
  broadcasts, texts never cross);
* BPE merges operate on the word-frequency TABLE, whose size is the
  DISTINCT vocabulary (Zipf-bounded; capped at ``max_words`` by frequency
  — the standard practice, since sub-cap words can't influence top merges
  materially and the cap bounds the driver pull);
* application is an embarrassingly-parallel map with the merge list
  broadcast in the UDF closure and a per-batch unique-word cache (the
  trick every production tokenizer uses: encode each DISTINCT word once,
  then scatter counts).

Deterministic end to end: merge ties break on (pair count desc, pair
lexicographic), so the same corpus always yields the same vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table

__all__ = [
    "corpus_word_counts",
    "train_bpe",
    "bpe_token_counts",
    "encode_word",
    "BPE_WORD_COUNTS_SQL",
]

# exact oracle for corpus_word_counts(top_k=200): one word-bucket exchange
# == a DuckDB unnest/GROUP BY; deterministic (count desc, word) ordering
BPE_WORD_COUNTS_SQL = """
SELECT w AS word, count(*) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
WHERE w <> ''
GROUP BY w
ORDER BY count DESC, word
LIMIT 200
"""

_END = "</w>"


def corpus_word_counts(sf_dir: str, *, top_k: int | None = None) -> ray.data.Dataset:
    """Exact corpus (word, count) via one word-bucket exchange.  Words are
    single-space splits of ``text`` (the repo's oracle-contract
    tokenization); empties dropped.  ``top_k`` adds a final count-desc
    truncation (tiny sort: the exchange already collapsed to distinct
    words)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        t = (
            pa.table({"word": words})
            .filter(pc.not_equal(words, ""))
            .group_by("word")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"word": t["word"], "count": pc.cast(t["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("count", alias_name="count"))
    )
    if top_k is not None:
        counts = counts.sort(["count", "word"], descending=[True, False]).limit(top_k)
    return counts


def _merge_pass(symseqs: list[list[str]], counts: np.ndarray) -> tuple[str, str] | None:
    """One BPE iteration: the most frequent adjacent symbol pair across the
    weighted word table (count desc, pair lexicographic ties)."""
    pair_counts: dict[tuple[str, str], int] = {}
    for seq, c in zip(symseqs, counts):
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + int(c)
    if not pair_counts:
        return None
    return min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _apply_merge(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train_bpe(
    sf_dir: str, *, n_merges: int = 200, max_words: int = 50_000
) -> list[tuple[str, str]]:
    """Fit ``n_merges`` BPE merges on the corpus word-frequency table.

    The driver pull is the top-``max_words`` rows of the (already
    distinct-folded) word-count exchange — a bounded, Zipf-justified
    truncation, NOT a corpus materialization."""
    wc = corpus_word_counts(sf_dir, top_k=max_words).to_pandas()
    words = wc["word"].tolist()
    counts = wc["count"].to_numpy(np.int64)
    symseqs = [list(w) + [_END] for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _merge_pass(symseqs, counts)
        if best is None:
            break
        merges.append(best)
        symseqs = [_apply_merge(s, *best) for s in symseqs]
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list to one word (training-order replay — the
    canonical BPE encoder)."""
    seq = list(word) + [_END]
    for a, b in merges:
        if len(seq) < 2:
            break
        seq = _apply_merge(seq, a, b)
    return seq


class BpeCounter:
    """Batch UDF: (doc_id, text) -> (doc_id, n_words, n_bpe_tokens) with a
    per-instance encoded-word cache (each DISTINCT word is encoded once
    per actor lifetime, then looked up — the production-tokenizer shape)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = merges
        self.cache: dict[str, int] = {}

    def _token_len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = len(encode_word(w, self.merges))
            self.cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        uniq, inv = np.unique(
            flat.to_numpy(zero_copy_only=False).astype(object), return_inverse=True
        )
        keep = np.array([len(w) > 0 for w in uniq])
        tok_of = np.array(
            [self._token_len(w) if k else 0 for w, k in zip(uniq, keep)],
            dtype=np.int64,
        )
        per_occ = tok_of[inv]
        n_tokens = np.bincount(doc_idx, weights=per_occ, minlength=len(lens)).astype(
            np.int64
        )
        n_words = np.bincount(
            doc_idx, weights=keep[inv].astype(np.float64), minlength=len(lens)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_tokens),
            }
        )


def bpe_token_counts(
    sf_dir: str, *, n_merges: int = 200, max_words: int = 50_000
) -> ray.data.Dataset:
    """Fit BPE on the corpus, then count each document's subword tokens —
    the token-budget accounting a training run does with its OWN tokenizer
    (vs ``token_counts``' whitespace proxy).  Rows-only (the learned
    merges are data-dependent, not SQL-expressible); invariants pinned in
    tests/test_bpe.py."""
    merges = train_bpe(sf_dir, n_merges=n_merges, max_words=max_words)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        BpeCounter(merges), batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def bpe_fertility_by_lang(
    sf_dir: str, *, n_merges: int = 150, max_words: int = 50_000
) -> ray.data.Dataset:
    """Tokenizer fertility per language: subword tokens per word after
    fitting BPE on the WHOLE corpus — the multilingual-tokenizer health
    check (a language with high fertility is under-served by the merge
    table and will burn training budget).  Exact integer sums ride a tiny
    per-lang groupby; fertility_ppm is integer floor division."""
    from ray.data.aggregate import Sum

    merges = train_bpe(sf_dir, n_merges=n_merges, max_words=max_words)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    counter = BpeCounter(merges)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_bpe_tokens", pa.int64()),
                ]
            ).empty_table()
        counts = counter(batch.select(["doc_id", "text"]))
        return (
            pa.table(
                {
                    "lang": batch["lang"],
                    "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                    "n_words": counts["n_words"],
                    "n_bpe_tokens": counts["n_bpe_tokens"],
                }
            )
            .group_by("lang")
            .aggregate([("n_docs", "sum"), ("n_words", "sum"), ("n_bpe_tokens", "sum")])
            .rename_columns(["lang", "n_docs", "n_words", "n_bpe_tokens"])
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_bpe_tokens", pa.int64()),
                    ("fertility_ppm", pa.int64()),
                ]
            ).empty_table()
        nw = batch["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = batch["n_bpe_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": batch["lang"],
                "n_docs": pc.cast(batch["n_docs"], pa.int64()),
                "n_words": pa.array(nw),
                "n_bpe_tokens": pa.array(nt),
                "fertility_ppm": pa.array(
                    nt * np.int64(1_000_000) // np.maximum(nw, 1)
                ),
            }
        )

    return (
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
        .map_batches(finalize, batch_format="pyarrow")
        .sort("lang")
    )


UNK_ID = 0
EOS_ID = 1


def build_vocab(merges: list[tuple[str, str]], words: list[str]) -> dict[str, int]:
    """Deterministic token-string -> id table: specials, then the sorted
    set of symbols produced by encoding the (capped) word table plus all
    single characters seen — the id space a resumed run reproduces exactly
    from (merges, word table)."""
    syms: set[str] = set(_END)
    for w in words:
        syms.update(encode_word(w, merges))
        syms.update(w)
    table = {"<unk>": UNK_ID, "<eos>": EOS_ID}
    for i, s in enumerate(sorted(syms)):
        table[s] = i + 2
    return table


class BpeSequencePacker:
    """Batch UDF: documents -> fixed-length packed token-id sequences (the
    tensors a training run consumes): encode each DISTINCT word once per
    actor (cached), concatenate docs greedily up to ``seq_len`` with an
    <eos> separator, never splitting a document across sequences (docs
    longer than seq_len are truncated — counted in ``n_truncated``).

    Packing is batch-local by design (bins never span batches — the same
    locality tradeoff as functions/packing.py: a global bin-packing would
    be an all-to-all for a ~1% density win)."""

    def __init__(self, merges: list[tuple[str, str]], vocab: dict[str, int], seq_len: int):
        self.merges = merges
        self.vocab = vocab
        self.seq_len = seq_len
        self.cache: dict[str, list[int]] = {}

    def _ids(self, word: str) -> list[int]:
        ids = self.cache.get(word)
        if ids is None:
            ids = [self.vocab.get(t, UNK_ID) for t in encode_word(word, self.merges)]
            self.cache[word] = ids
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("seq_key", pa.int64()),
                    ("n_docs", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("n_truncated", pa.int64()),
                    ("input_ids", pa.list_(pa.int32())),
                ]
            ).empty_table()
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        seqs: list[dict] = []
        cur: dict | None = None
        for did, text in zip(doc_ids, texts):
            ids: list[int] = []
            for w in text.split(" "):
                if w:
                    ids.extend(self._ids(w))
            truncated = 0
            if len(ids) > self.seq_len:
                ids = ids[: self.seq_len]
                truncated = 1
            need = len(ids) if cur is None else len(ids) + 1  # +1 eos sep
            if cur is None or cur["n"] + need > self.seq_len:
                cur = {"key": did, "docs": 0, "n": 0, "trunc": 0, "ids": []}
                seqs.append(cur)
            elif cur["ids"]:
                cur["ids"].append(EOS_ID)
                cur["n"] += 1
            cur["ids"].extend(ids)
            cur["n"] += len(ids)
            cur["docs"] += 1
            cur["trunc"] += truncated
        return pa.table(
            {
                "seq_key": pa.array([s["key"] for s in seqs], pa.int64()),
                "n_docs": pa.array([s["docs"] for s in seqs], pa.int64()),
                "n_tokens": pa.array([s["n"] for s in seqs], pa.int64()),
                "n_truncated": pa.array([s["trunc"] for s in seqs], pa.int64()),
                "input_ids": pa.array(
                    [s["ids"] for s in seqs], pa.list_(pa.int32())
                ),
            }
        )


def bpe_packed_sequences(
    sf_dir: str,
    *,
    seq_len: int = 512,
    n_merges: int = 150,
    max_words: int = 50_000,
) -> ray.data.Dataset:
    """End-to-end tokenize-and-pack: fit BPE on the corpus, build the
    deterministic vocab, encode every document and pack into
    ``seq_len``-token training rows — the terminal materialization of the
    curation pipeline (curated text -> tensors).  The merge list + vocab
    ride the actor closure; encoding is cached per distinct word per
    actor."""
    wc = corpus_word_counts(sf_dir, top_k=max_words).to_pandas()
    merges = train_bpe(sf_dir, n_merges=n_merges, max_words=max_words)
    vocab = build_vocab(merges, wc["word"].tolist())
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        BpeSequencePacker(merges, vocab, seq_len),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("seq_key")
