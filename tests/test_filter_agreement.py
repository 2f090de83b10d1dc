"""Filter-agreement matrix (webtext.filter_agreement_matrix): DuckDB
parity + marginal consistency with the three base filters."""

from __future__ import annotations

import duckdb


def test_agreement_duckdb_parity(ray_session):
    from docling_jobkit_ray.functions.webtext import (
        filter_agreement_matrix,
        filter_agreement_matrix_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = filter_agreement_matrix(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(filter_agreement_matrix_sql()).df()
    assert got.values.tolist() == want.values.tolist()


def test_agreement_marginals_match_base_filters(ray_session):
    """The matrix's marginal sums must equal each base filter's own kept
    count — the three verdict columns really ARE the three operators."""
    import duckdb as dd

    from docling_jobkit_ray.functions.dsir import dsir_importance_weights
    from docling_jobkit_ray.functions.webtext import (
        classifier_quality_scores,
        filter_agreement_matrix,
        gopher_quality_docs,
    )

    sf = "/root/testdata/sf0.01"
    m = filter_agreement_matrix(sf).to_pandas()
    total = dd.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert int(m["n_docs"].sum()) == total
    g_kept = len(gopher_quality_docs(sf).to_pandas())
    assert int(m.loc[m["gopher_keep"] == 1, "n_docs"].sum()) == g_kept
    c_kept = int(classifier_quality_scores(sf).to_pandas()["keep"].sum())
    assert int(m.loc[m["classifier_keep"] == 1, "n_docs"].sum()) == c_kept
    d_kept = int(dsir_importance_weights(sf).to_pandas()["keep"].sum())
    assert int(m.loc[m["dsir_keep"] == 1, "n_docs"].sum()) == d_kept
