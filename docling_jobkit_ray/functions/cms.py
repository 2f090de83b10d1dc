"""Count-Min sketch (Cormode & Muthukrishnan 2005 — public literature) over
the corpus token stream, with EXACT cross-engine parity: counters are plain
integer sums and the row hashes are affine maps of the dsir 8-byte
polynomial token hash (numpy-vs-DuckDB parity already fuzz-pinned in
tests/test_dsir.py), so the sketch itself — not just an invariant of it —
replays in SQL and hash-checks.

Shape: ONE pass over the token stream emits per-batch partial rows of a
tagged union — (kind=0) nonzero sketch cells via a single ``np.bincount``
over ``d * WIDTH + cell``, and (kind=1) exact counts of the fixed query
terms via ``pc.index_in`` — one small groupby folds both.  The folded
result is bounded by DEPTH x WIDTH + |terms| rows (4 KiB-scale) regardless
of corpus size, so the final estimate step may take_all on the driver.

The output carries est_count (min over rows), true_count, and their
difference — CMS guarantees est >= true always, giving the tests a sharp
invariant on top of the SQL hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table
from .dsir import _PRIME, _tokens, _word_hash

WIDTH = 1024
DEPTH = 4
# affine row-hash params: cell_d = ((h * A_d + B_d) % PRIME) % WIDTH.
# A_d < 2**12 and h < PRIME ~ 2**20 keep every product far inside int64.
_A = (131, 631, 1009, 2003)
_B = (0, 17, 101, 503)

QUERY_TERMS = (
    "agg batch big column customer data dup fast filter flux group hash join "
    "key line merge order part quantum query row scan slow small sort spark "
    "stream table the value window zebra"
).split()  # flux/quantum/zebra are absent from the corpus: true_count = 0


def _cells(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(len(h), depth) int64 cell indices."""
    out = np.empty((len(h), depth), np.int64)
    for d in range(depth):
        out[:, d] = ((h * _A[d] + _B[d]) % _PRIME) % width
    return out


def cms_term_counts(
    sf_dir: str, *, width: int = WIDTH, depth: int = DEPTH
) -> pa.Table:
    """Count-Min estimates vs exact counts for the fixed query-term list:
    (term, true_count, est_count, overcount) sorted by term.  ``width`` /
    ``depth`` shrink the sketch for collision tests; defaults are the
    production sizing (must mirror ``cms_term_counts_sql``'s)."""
    if depth > len(_A):
        raise ValueError(f"depth > {len(_A)} needs more row-hash params")
    ds = read_table(sf_dir, "documents", columns=["text"])
    terms = pa.array(QUERY_TERMS)
    part_schema = pa.schema(
        [("kind", pa.int64()), ("key", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return part_schema.empty_table()
        flat, _doc_idx, _lens = _tokens(batch["text"])
        if len(flat) == 0:
            return part_schema.empty_table()
        h = _word_hash(flat)
        cells = _cells(h, width, depth)
        keys = cells + np.arange(depth, dtype=np.int64) * width  # broadcast rows
        counters = np.bincount(keys.ravel(), minlength=depth * width)
        nz = np.flatnonzero(counters)
        idx = pc.index_in(flat, value_set=terms)
        valid = idx.drop_null().to_numpy(zero_copy_only=False)
        tc = np.bincount(valid, minlength=len(QUERY_TERMS))
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(nz), np.int64), np.ones(len(QUERY_TERMS), np.int64)]
                    )
                ),
                "key": pa.array(
                    np.concatenate([nz.astype(np.int64), np.arange(len(QUERY_TERMS), dtype=np.int64)])
                ),
                "n": pa.array(
                    np.concatenate([counters[nz].astype(np.int64), tc.astype(np.int64)])
                ),
            }
        )

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["kind", "key"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: <= depth*width + |terms| rows by construction
    )
    counters = np.zeros(depth * width, np.int64)
    true = np.zeros(len(QUERY_TERMS), np.int64)
    for r in folded:
        if r["kind"] == 0:
            counters[r["key"]] = r["n"]
        else:
            true[r["key"]] = r["n"]
    qh = _word_hash(pa.array(QUERY_TERMS))
    qcells = _cells(qh, width, depth) + np.arange(depth, dtype=np.int64) * width
    est = counters[qcells].min(axis=1)
    order = np.argsort(np.asarray(QUERY_TERMS, dtype=object), kind="stable")
    return pa.table(
        {
            "term": pa.array([QUERY_TERMS[i] for i in order]),
            "true_count": pa.array(true[order], pa.int64()),
            "est_count": pa.array(est[order], pa.int64()),
            "overcount": pa.array((est - true)[order], pa.int64()),
        }
    )


def cms_term_counts_sql(*, width: int = WIDTH, depth: int = DEPTH) -> str:
    params = ", ".join(
        f"({d}, {_A[d]}, {_B[d]})" for d in range(depth)
    )
    terms = ", ".join(f"('{t}')" for t in QUERY_TERMS)
    poly = (
        "list_reduce(list_transform(string_split(substr({col}, 1, 8), ''), "
        "c -> ascii(c)), (a, b) -> (a * 31 + b) % " + str(_PRIME) + ")"
    )
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
),
th AS (SELECT {poly.format(col="w")} AS h FROM toks),
params(d, a, b) AS (VALUES {params}),
counters AS (
  SELECT d, ((h * a + b) % {_PRIME}) % {width} AS cell, count(*) AS n
  FROM th CROSS JOIN params GROUP BY 1, 2
),
qterms(term) AS (VALUES {terms}),
qh AS (SELECT term, {poly.format(col="term")} AS h FROM qterms),
qcells AS (
  SELECT term, d, ((h * a + b) % {_PRIME}) % {width} AS cell
  FROM qh CROSS JOIN params
),
est AS (
  SELECT q.term, min(coalesce(c.n, 0)) AS est_count
  FROM qcells q LEFT JOIN counters c ON q.d = c.d AND q.cell = c.cell
  GROUP BY q.term
),
tru AS (
  SELECT q.term, count(t.w) AS true_count
  FROM qterms q LEFT JOIN toks t ON t.w = q.term
  GROUP BY q.term
)
SELECT e.term,
       CAST(tru.true_count AS BIGINT) AS true_count,
       CAST(e.est_count AS BIGINT) AS est_count,
       CAST(e.est_count - tru.true_count AS BIGINT) AS overcount
FROM est e JOIN tru USING (term)
ORDER BY term
"""
