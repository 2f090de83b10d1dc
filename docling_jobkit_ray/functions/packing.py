"""Sequence packing: assemble documents into fixed-token-budget training
sequences — the last stage of a pretraining data pipeline (after cleaning
/ dedup / mixing, before the trainer reads fixed-length batches).

Ray-Data-first shape: packing is PARTITION-LOCAL (each block packs its own
documents, bins never span blocks).  That is the correct distributed
design, not a shortcut — a global optimal packing would serialize the
corpus through one node for ~1% fewer bins, while partition-local
first-fit-decreasing keeps the stage embarrassingly parallel and its
waste bounded (FFD <= 11/9 OPT + 1 per partition).  Token counts use the
same whitespace-token kernel as ``textstats.token_counts`` so budgets mean
the same thing across the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table

__all__ = ["pack_sequences", "pack_batch"]

_TOKEN_RE = r"[^\s]+"


def pack_batch(
    doc_ids: np.ndarray, tokens: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """First-fit-decreasing bin packing of one batch.

    Returns (bin_index per doc, bin_total per doc's bin).  Documents longer
    than the budget get a dedicated overflow bin each (the trainer's
    truncation decision, not ours).  The placement loop is O(n * open_bins)
    Python — packing is inherently sequential per partition; n is one
    block's rows and the loop body is a handful of int ops."""
    order = np.argsort(-tokens, kind="stable")  # decreasing, ties by position
    bin_of = np.empty(len(doc_ids), dtype=np.int64)
    bin_totals: list[int] = []
    for i in order:
        t = int(tokens[i])
        placed = False
        if t <= budget:
            for b, tot in enumerate(bin_totals):
                if tot + t <= budget:
                    bin_totals[b] = tot + t
                    bin_of[i] = b
                    placed = True
                    break
        if not placed:
            bin_of[i] = len(bin_totals)
            bin_totals.append(t)
    totals = np.asarray(bin_totals, dtype=np.int64)
    return bin_of, totals[bin_of]


def pack_sequences(
    sf_dir: str, *, budget_tokens: int = 512
) -> ray.data.Dataset:
    """(doc_id, n_tokens, pack_id, pack_tokens) — each document assigned to
    a training sequence whose total stays within ``budget_tokens``.

    ``pack_id`` is globally unique and deterministic for a fixed block
    layout: the minimum doc_id in the bin (bins never span blocks, so the
    minimum identifies the bin corpus-wide)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                    "pack_tokens": pa.array([], pa.int64()),
                }
            )
        doc_ids = batch["doc_id"].to_numpy()
        tokens = pc.count_substring_regex(batch["text"], pattern=_TOKEN_RE).to_numpy().astype(np.int64)
        bin_of, bin_tot = pack_batch(doc_ids, tokens, budget_tokens)
        # pack_id = min doc_id in the bin (vectorized per-bin min)
        n_bins = int(bin_of.max()) + 1 if len(bin_of) else 0
        bin_min = np.full(n_bins, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(bin_min, bin_of, doc_ids)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "n_tokens": pa.array(tokens),
                "pack_id": pa.array(bin_min[bin_of]),
                "pack_tokens": pa.array(bin_tot),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


# ---------------------------------------------------------------------------
# Padding-waste report — the length-bucketing efficiency diagnostic
# ---------------------------------------------------------------------------

_PAD_CAPS = (16, 32, 64, 96)


def padding_waste_report(
    sf_dir: str, *, caps: tuple[int, ...] = _PAD_CAPS
) -> pa.Table:
    """Per length-bucket padding economics under a bucketed-batching
    policy: each document pads up to the smallest cap >= its ``\\S+``
    token count (the ``token_counts`` contract); documents beyond the
    largest cap TRUNCATE to it.  Reports, per cap: doc count, stored
    (post-truncation) tokens, padded slots, pad tokens, truncated-away
    overflow tokens, and waste_ppm = pad * 1e6 // slots (floor division —
    the repo's cross-engine ppm rule).  This is the report a training
    team reads before choosing sequence-length buckets: waste says how
    much compute padding burns, overflow says how much data truncation
    destroys.

    Plan shape: one streaming pass emits <= len(caps) partial rows per
    block (np.bincount over the searchsorted bucket index); one bounded
    groupby folds them.  Nothing row-proportional crosses the exchange."""
    from ray.data.aggregate import Sum

    caps_arr = np.asarray(sorted(caps), np.int64)
    top = int(caps_arr[-1])
    part_schema = pa.schema(
        [
            ("cap", pa.int64()),
            ("n_docs", pa.int64()),
            ("real_tokens", pa.int64()),
            ("overflow_tokens", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return part_schema.empty_table()
        n = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_TOKEN_RE), pa.int64()
        ).to_numpy(zero_copy_only=False)
        idx = np.minimum(
            np.searchsorted(caps_arr, n, side="left"), len(caps_arr) - 1
        )
        stored = np.minimum(n, top)
        docs = np.bincount(idx, minlength=len(caps_arr)).astype(np.int64)
        real = np.bincount(idx, weights=stored, minlength=len(caps_arr)).astype(
            np.int64
        )
        over = np.bincount(
            idx, weights=np.maximum(n - top, 0), minlength=len(caps_arr)
        ).astype(np.int64)
        keep = docs > 0
        return pa.table(
            {
                "cap": pa.array(caps_arr[keep], pa.int64()),
                "n_docs": pa.array(docs[keep], pa.int64()),
                "real_tokens": pa.array(real[keep], pa.int64()),
                "overflow_tokens": pa.array(over[keep], pa.int64()),
            }
        )

    folded = (
        read_table(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cap")
        .aggregate(
            Sum(on="n_docs", alias_name="n_docs"),
            Sum(on="real_tokens", alias_name="real_tokens"),
            Sum(on="overflow_tokens", alias_name="overflow_tokens"),
        )
        .sort("cap")
        .take_all()  # bounded: one row per cap
    )
    cap = np.array([int(r["cap"]) for r in folded], np.int64)
    docs = np.array([int(r["n_docs"]) for r in folded], np.int64)
    real = np.array([int(r["real_tokens"]) for r in folded], np.int64)
    over = np.array([int(r["overflow_tokens"]) for r in folded], np.int64)
    slots = docs * cap
    pad = slots - real
    return pa.table(
        {
            "cap": pa.array(cap),
            "n_docs": pa.array(docs),
            "real_tokens": pa.array(real),
            "padded_slots": pa.array(slots),
            "pad_tokens": pa.array(pad),
            "overflow_tokens": pa.array(over),
            "waste_ppm": pa.array(pad * 1_000_000 // slots),
        }
    )


def padding_waste_report_sql(caps: tuple[int, ...] = _PAD_CAPS) -> str:
    caps_s = sorted(caps)
    top = caps_s[-1]
    ladder = " ".join(
        f"WHEN n <= {c} THEN {c}" for c in caps_s[:-1]
    )
    return f"""
WITH t AS (
  SELECT CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT) AS n
  FROM documents),
b AS (
  SELECT CASE {ladder} ELSE {top} END AS cap,
         least(n, {top}) AS stored,
         greatest(n - {top}, 0) AS overflow
  FROM t),
g AS (
  SELECT cap, count(*) AS n_docs,
         CAST(sum(stored) AS BIGINT) AS real_tokens,
         CAST(sum(overflow) AS BIGINT) AS overflow_tokens
  FROM b GROUP BY cap)
SELECT cap, n_docs, real_tokens,
       CAST(n_docs * cap AS BIGINT) AS padded_slots,
       CAST(n_docs * cap - real_tokens AS BIGINT) AS pad_tokens,
       overflow_tokens,
       CAST((n_docs * cap - real_tokens) * 1000000 // (n_docs * cap)
            AS BIGINT) AS waste_ppm
FROM g ORDER BY cap
"""
