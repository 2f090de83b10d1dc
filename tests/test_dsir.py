"""DSIR importance resampling (functions/dsir.py): planted target-domain
signal, DuckDB parity, hash-kernel fuzz, degenerate inputs."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dsir_planted_target_signal(ray_session, tmp_path):
    """Target (en) docs use a disjoint vocabulary from the rest: every en
    doc must score strictly above every non-en doc and be kept; the
    non-en docs must all be dropped."""
    from docling_jobkit_ray.functions.dsir import dsir_importance_weights

    en_words = "alpha beta gamma delta epsilon"
    de_words = "zeta eta theta iota kappa"
    rows = [(i, en_words, "en") for i in range(10)] + [
        (10 + i, de_words, "de") for i in range(10)
    ]
    sf = _write_docs(tmp_path, rows)
    out = dsir_importance_weights(sf).to_pandas().set_index("doc_id")
    en_w = out.loc[range(10), "logw_e6"]
    de_w = out.loc[range(10, 20), "logw_e6"]
    assert en_w.min() > de_w.max()
    assert (out.loc[range(10), "keep"] == 1).all()
    assert (out.loc[range(10, 20), "keep"] == 0).all()


def test_dsir_duckdb_parity(ray_session):
    from docling_jobkit_ray.functions.dsir import (
        DSIR_IMPORTANCE_WEIGHTS_SQL,
        dsir_importance_weights,
    )

    sf = "/root/testdata/sf0.001"
    got = dsir_importance_weights(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(DSIR_IMPORTANCE_WEIGHTS_SQL).df()
    for c in ("doc_id", "n_tok", "logw_e6", "keep"):
        assert got[c].tolist() == want[c].tolist(), c
    # the verdict must be non-vacuous on the driver fixture (VERDICT r4 #1:
    # an all-zero driver row checks nothing)
    assert 0 < int(got["keep"].sum()) < len(got)


def test_dsir_hash_kernel_matches_duckdb_fuzz(ray_session):
    """The 8-byte polynomial fold over the flat Arrow buffer must equal
    DuckDB's character fold for arbitrary [a-z]+ words."""
    from docling_jobkit_ray.functions.dsir import _PRIME, N_BUCKETS, _word_buckets

    rng = np.random.default_rng(7)
    words = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(1, 15)))
        for _ in range(300)
    ]
    got = _word_buckets(pa.array(words, pa.string())).tolist()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in words)
        + ") v(w)"
    )
    want = con.execute(
        f"""SELECT list_reduce(list_transform(string_split(substr(w,1,8), ''),
                   c -> ascii(c)), (a,b) -> (a*31+b) % {_PRIME}) % {N_BUCKETS}
            FROM t"""
    ).df().iloc[:, 0].tolist()
    assert got == want


def test_dsir_degenerate_docs(ray_session, tmp_path):
    """Token-less documents get weight 0 / keep 0 and never crash the
    bucket exchange; a sliced (non-zero offset) Arrow array hashes the
    same as a fresh one."""
    from docling_jobkit_ray.functions.dsir import _word_buckets, dsir_importance_weights

    rows = [(0, "", "en"), (1, "123 456 !!!", "de"), (2, "one real doc", "en")]
    sf = _write_docs(tmp_path, rows)
    out = dsir_importance_weights(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tok"] == 0 and out.loc[0, "logw_e6"] == 0
    assert out.loc[1, "n_tok"] == 0 and out.loc[1, "keep"] == 0
    assert out.loc[2, "n_tok"] == 3
    arr = pa.array(["pad", "low", "lower", "apex"], pa.string())
    assert _word_buckets(arr.slice(1)).tolist() == _word_buckets(
        pa.array(["low", "lower", "apex"], pa.string())
    ).tolist()
