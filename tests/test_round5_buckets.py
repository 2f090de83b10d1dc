"""Round-5 bucket/histogram ops: dup-cluster size histogram and CCNet
quality terciles — DuckDB parity + semantic invariants."""

from __future__ import annotations

import duckdb


def test_dup_cluster_size_histogram_parity(ray_session):
    from docling_jobkit_ray.functions.graph import (
        dup_cluster_size_histogram,
        dup_cluster_size_histogram_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = dup_cluster_size_histogram(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(dup_cluster_size_histogram_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    # every cluster has >= 2 members by construction (components of a
    # near-dup PAIR graph) and the histogram is non-vacuous on the fixture
    assert len(got) > 0
    assert int(got["size"].min()) >= 2


def test_ccnet_buckets_parity_and_terciles(ray_session):
    from docling_jobkit_ray.functions.webtext import (
        ccnet_perplexity_buckets,
        ccnet_perplexity_buckets_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = ccnet_perplexity_buckets(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(ccnet_perplexity_buckets_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    # terciles: bucket sizes within 1 of each other; ordering respected
    counts = got["bucket"].value_counts()
    assert counts.max() - counts.min() <= 1
    assert (
        got.loc[got["bucket"] == "tail", "logit_e6"].max()
        <= got.loc[got["bucket"] == "middle", "logit_e6"].min()
    )
    assert (
        got.loc[got["bucket"] == "middle", "logit_e6"].max()
        <= got.loc[got["bucket"] == "head", "logit_e6"].min()
    )


def test_score_drift_psi_parity_and_semantics(ray_session, tmp_path):
    """PSI: DuckDB parity on the fixture; planted drift (current half's
    scores shifted) must raise total PSI far above the same-distribution
    case."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import (
        score_drift_psi,
        score_drift_psi_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = score_drift_psi(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(score_drift_psi_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    base_psi = int(got["psi_e6"].sum())

    # planted drift: odd docs get much longer texts -> higher logits
    rng = np.random.default_rng(1)
    rows = []
    for i in range(400):
        n = 30 if i % 2 == 0 else 400
        words = " ".join(
            rng.choice(["the", "and", "of", "data", "word"], size=n)
        )
        rows.append((i, words, "en"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    drifted = score_drift_psi(str(tmp_path)).to_pandas()
    assert int(drifted["psi_e6"].sum()) > 10 * max(base_psi, 1)


def test_length_weighted_sample(ray_session):
    """Efraimidis-Spirakis weighted draw: DuckDB parity; the sample skews
    long (weights work); exactly k rows; deterministic."""
    from docling_jobkit_ray.functions.webtext import (
        length_weighted_sample,
        length_weighted_sample_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = length_weighted_sample(sf, k=100).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(length_weighted_sample_sql(k=100)).df()
    assert got.values.tolist() == want.values.tolist()
    assert len(got) == 100
    corpus_mean = con.execute("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert got["n_chars"].mean() > corpus_mean
    again = length_weighted_sample(sf, k=100).to_pandas()
    assert got.equals(again)
