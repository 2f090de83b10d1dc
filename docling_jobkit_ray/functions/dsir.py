"""DSIR importance resampling — select raw-corpus documents that look like
a TARGET domain via hashed-token importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"; the method
behind most modern pretraining-mix curation).

Scale shape (the part that matters at 100 TB):

* Pass A is ONE bounded exchange: per-batch hashed-token bucket counts
  (raw + target, ``N_BUCKETS`` = 4096 int64 partials per batch) fold
  through ``groupby(bucket)`` — the driver pull is <= 4096 rows at ANY
  corpus size, by construction.
* The per-bucket log-ratio table is quantized to an int64 1e-6 grid ON THE
  DRIVER and broadcast in the pass-B UDF closure (32 KB — the classic
  ``ray.put``-once small side).
* Pass B is an embarrassingly-parallel map: hash tokens, gather the int64
  log-ratios, exact integer sum per document.  Because the per-token
  weights are INTEGERS, the document weight is associative — reshard- and
  engine-invariant (the float -> int quantization happens once per BUCKET,
  not once per token or document), which is what makes the whole method
  SQL-oracle-able.

Token hashing is an 8-byte polynomial fold (base 31 mod 1000003) computed
from the flat Arrow UTF-8 buffer — no Python loop over words — and
expressed identically in DuckDB as
``list_reduce(list_transform(string_split(substr(w,1,8),''), ascii), ...)``
(tokens are ``[a-z]+`` so chars == bytes; parity pinned in
tests/test_dsir.py).

Reference anchor: the reference's quality/enrichment options compile into
per-document scoring stages (docling_jobkit/convert/manager.py) — DSIR is
the corpus-level counterpart a training-data platform adds on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table

__all__ = [
    "dsir_importance_weights",
    "dsir_bucket_logratios",
    "DSIR_IMPORTANCE_WEIGHTS_SQL",
    "N_BUCKETS",
]

N_BUCKETS = 4096
_PRIME = 1_000_003
_SMOOTH = 1.0  # add-one smoothing on bucket counts


def _word_hash(flat: pa.Array) -> np.ndarray:
    """Vectorized polynomial hash of each word's first 8 bytes, mod
    ``_PRIME`` (the pre-bucket value; cms.py derives its row hashes from
    it).  Words are ASCII ``[a-z]+`` tokens, so DuckDB's character fold
    computes the identical value."""
    arr = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    starts, lens = off[:-1], np.diff(off)
    h = np.zeros(n, np.int64)
    for j in range(8):
        m = lens > j
        if not m.any():
            break
        h[m] = (h[m] * 31 + data[starts[m] + j]) % _PRIME
    return h


def _word_buckets(flat: pa.Array) -> np.ndarray:
    return _word_hash(flat) % N_BUCKETS


def _tokens(batch_text: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(flat non-empty tokens, doc index per token, tokens-per-doc) for one
    batch — same ``[a-z]+`` tokenization as the gopher/classifier family."""
    words = pc.split_pattern_regex(pc.utf8_lower(batch_text), pattern="[^a-z]+")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(mask)), doc_idx[mask], lens


def dsir_bucket_logratios(
    sf_dir: str, *, target_lang: str = "en"
) -> tuple[np.ndarray, int]:
    """Pass A: (per-bucket int64 log-ratio table of size ``N_BUCKETS``,
    per-token corpus-mean threshold on the same 1e-6 grid).

    raw = all token occurrences; target = occurrences inside
    ``lang == target_lang`` documents.  Smoothed log-ratio per bucket,
    quantized once to the 1e-6 int grid.  The threshold is the raw-corpus
    expectation of the per-token log-ratio (== -KL(p_raw || p_target) on
    the grid): a document ``keep``s iff its total weight beats
    ``n_tokens x threshold`` — i.e. it is more target-typical than the
    average document — an exact integer comparison on both engines."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "raw_n": pa.array([], pa.int64()),
                    "tgt_n": pa.array([], pa.int64()),
                }
            )
        flat, doc_idx, _lens = _tokens(batch["text"])
        buckets = _word_buckets(flat)
        is_tgt = pc.equal(batch["lang"], target_lang).to_numpy(zero_copy_only=False)
        tgt_tok = is_tgt[doc_idx]
        raw = np.bincount(buckets, minlength=N_BUCKETS)
        tgt = np.bincount(buckets[tgt_tok], minlength=N_BUCKETS)
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw_n": pa.array(raw[nz].astype(np.int64)),
                "tgt_n": pa.array(tgt[nz].astype(np.int64)),
            }
        )

    # bounded: <= N_BUCKETS distinct keys reach the driver
    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("raw_n", alias_name="raw_n"), Sum("tgt_n", alias_name="tgt_n"))
        .to_pandas()
    )
    raw = np.zeros(N_BUCKETS, np.int64)
    tgt = np.zeros(N_BUCKETS, np.int64)
    raw[counts["bucket"].to_numpy()] = counts["raw_n"].to_numpy()
    tgt[counts["bucket"].to_numpy()] = counts["tgt_n"].to_numpy()
    rt, tt = int(raw.sum()), int(tgt.sum())
    # same parenthesization as the SQL oracle: each division is one
    # exactly-rounded IEEE op on exact integers, ln is libm on identical
    # doubles; quantized ONCE per bucket
    lr = np.log((tgt + _SMOOTH) / (tt + N_BUCKETS)) - np.log(
        (raw + _SMOOTH) / (rt + N_BUCKETS)
    )
    lr_e6 = np.round(lr * 1e6).astype(np.int64)
    # exact int weighted sum (Python ints: no int64 overflow at any scale),
    # then ONE double division — mirrors the SQL's sum()*1.0/sum() exactly
    s = sum(int(a) * int(b) for a, b in zip(raw.tolist(), lr_e6.tolist()))
    thr_e6 = int(round(float(s) / float(rt))) if rt else 0
    return lr_e6, thr_e6


def dsir_importance_weights(
    sf_dir: str, *, target_lang: str = "en"
) -> ray.data.Dataset:
    """Per-document DSIR importance log-weight (1e-6 int grid) toward the
    ``target_lang`` domain, and the ``keep`` resampling verdict
    (logw > 0 <=> the document looks more target-like than corpus-like).

    Pass A exchange is bucket-bounded; pass B is a pure map with the 32 KB
    log-ratio table in the closure — nothing data-proportional reaches the
    driver.  ``keep`` = the document beats the corpus-average per-token
    weight (``logw_e6 > n_tok * thr_e6``, exact int64)."""
    lr_e6, thr_e6 = dsir_bucket_logratios(sf_dir, target_lang=target_lang)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "logw_e6": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        flat, doc_idx, lens = _tokens(batch["text"])
        buckets = _word_buckets(flat)
        # int64 weights summed via float64 bincount: every partial sum is an
        # integer far below 2^53, so the accumulation is EXACT
        w = np.bincount(
            doc_idx, weights=lr_e6[buckets].astype(np.float64), minlength=len(lens)
        ).astype(np.int64)
        n_tok = np.bincount(doc_idx, minlength=len(lens)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tok": pa.array(n_tok),
                "logw_e6": pa.array(w),
                "keep": pa.array((w > n_tok * thr_e6).astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort(
        "doc_id"
    )


DSIR_IMPORTANCE_WEIGHTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), tb AS (
  SELECT doc_id, lang,
         list_reduce(list_transform(string_split(substr(w, 1, 8), ''),
                                    c -> ascii(c)),
                     (a, b) -> (a * 31 + b) % {_PRIME}) % {N_BUCKETS} AS bucket
  FROM toks
), counts AS (
  SELECT bucket, count(*) AS raw_n,
         count(*) FILTER (WHERE lang = 'en') AS tgt_n
  FROM tb GROUP BY bucket
), tot AS (
  SELECT sum(raw_n) AS rt, sum(tgt_n) AS tt FROM counts
), lr AS (
  SELECT bucket,
         CAST(round((ln((tgt_n + 1.0) / (tt + {N_BUCKETS}))
                     - ln((raw_n + 1.0) / (rt + {N_BUCKETS}))) * 1000000)
              AS BIGINT) AS lr_e6
  FROM counts, tot
), thr AS (
  SELECT CAST(round((sum(counts.raw_n * lr.lr_e6) * 1.0)
                    / (SELECT rt FROM tot)) AS BIGINT) AS thr_e6
  FROM counts JOIN lr USING (bucket)
), docw AS (
  SELECT tb.doc_id, count(*) AS n_tok, CAST(sum(lr.lr_e6) AS BIGINT) AS logw_e6
  FROM tb JOIN lr USING (bucket) GROUP BY tb.doc_id
)
SELECT d.doc_id,
       COALESCE(w.n_tok, 0) AS n_tok,
       COALESCE(w.logw_e6, 0) AS logw_e6,
       CAST(COALESCE(w.logw_e6, 0)
            > COALESCE(w.n_tok, 0) * (SELECT thr_e6 FROM thr) AS BIGINT) AS keep
FROM documents d LEFT JOIN docw w ON d.doc_id = w.doc_id
ORDER BY d.doc_id
"""
