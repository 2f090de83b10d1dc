"""Count-Min sketch (functions/cms.py): exact SQL replay of the sketch
itself (hashes + counters + min-estimate), plus the CMS overestimate
guarantee under forced collisions at a tiny width."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from docling_jobkit_ray.functions.cms import (
    QUERY_TERMS,
    cms_term_counts,
    cms_term_counts_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_cms_matches_sql_default_sizing(ray_session):
    got = cms_term_counts(SF_DIR).to_pandas().reset_index(drop=True)
    want = _duck(cms_term_counts_sql())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # absent terms exist in the query list and report true_count = 0
    absent = got.set_index("term").loc[["flux", "quantum", "zebra"], "true_count"]
    assert (absent == 0).all()


@pytest.mark.parametrize("width,depth", [(8, 1), (8, 2), (16, 4)])
def test_cms_collisions_overestimate_never_under(ray_session, width, depth):
    """At tiny widths the ~30-term vocabulary MUST collide: est >= true for
    every term with at least one strict overcount — and the full sketch
    still replays exactly in SQL."""
    got = cms_term_counts(SF_DIR, width=width, depth=depth).to_pandas()
    assert (got["est_count"] >= got["true_count"]).all()
    if width == 8:
        assert (got["overcount"] > 0).any(), "no collision at width 8?"
    want = _duck(cms_term_counts_sql(width=width, depth=depth))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_cms_terms_sorted_and_complete(ray_session):
    got = cms_term_counts(SF_DIR).to_pandas()
    assert list(got["term"]) == sorted(QUERY_TERMS)
