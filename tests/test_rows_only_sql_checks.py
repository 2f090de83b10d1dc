"""DuckDB oracles for the SQL-expressible SLICES of rows-only families
(VERDICT r3 #9): quality_scores' count/ratio features, fingerprints' sha256
column, and lang_id's function-word winner on ASCII documents.  These keep
their driver entries rows-only (cap ordering unchanged) but no longer rely
on pytest-only assertions for their deterministic columns."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_quality_scores_features_match_sql(ray_session):
    """n_chars / n_words / punct_ratio are pure ASCII-regex functions of the
    text — identical RE2 semantics in pyarrow and DuckDB."""
    from docling_jobkit_ray.functions.textstats import quality_scores

    got = (
        quality_scores(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[A-Za-z'']+')) AS n_words,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE len(regexp_extract_all(text, '[.,;:!?]'))
                         / CAST(length(text) AS DOUBLE) END AS punct_ratio
        FROM documents ORDER BY doc_id
        """
    )
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["n_chars"], want["n_chars"], check_dtype=False)
    pd.testing.assert_series_equal(got["n_words"], want["n_words"], check_dtype=False)
    pd.testing.assert_series_equal(
        got["punct_ratio"], want["punct_ratio"], check_dtype=False, rtol=1e-12
    )


def test_fingerprints_sha256_matches_sql(ray_session):
    from docling_jobkit_ray.functions.textstats import FINGERPRINT_SHA_SQL, fingerprints

    got = (
        fingerprints(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _duck(FINGERPRINT_SHA_SQL)
    pd.testing.assert_series_equal(got["sha256"], want["sha256"])


def test_lang_id_matches_sql_on_ascii_docs(ray_session):
    """The function-word vote is SQL-expressible exactly for ASCII text
    (Python's unicode word regex == RE2 [a-z]+ after lowering); the max-hits
    winner with lexicographic tie-break replays as a window rank."""
    from docling_jobkit_ray.functions.textstats import _LANG_MARKERS, lang_id

    marker_rows = ", ".join(
        f"('{lang}', '{w}')" for lang in sorted(_LANG_MARKERS) for w in sorted(_LANG_MARKERS[lang])
    )
    sql = f"""
    WITH ascii_docs AS (
      SELECT doc_id, text FROM documents
      WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')
    ),
    markers(lang, word) AS (VALUES {marker_rows}),
    words AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM ascii_docs
    ),
    scores AS (
      SELECT w.doc_id, m.lang, count(*) AS c
      FROM words w JOIN markers m ON w.w = m.word
      GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn
      FROM scores
    )
    SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
    FROM ascii_docs d
    LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    ORDER BY d.doc_id
    """
    want = _duck(sql)
    if len(want) == 0:
        pytest.skip("no pure-ASCII documents at this scale")
    got = lang_id(SF_DIR).to_pandas()
    got = (
        got[got["doc_id"].isin(want["doc_id"])]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
