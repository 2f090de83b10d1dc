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
