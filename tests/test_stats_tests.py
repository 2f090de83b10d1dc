"""Exact-integer statistical tests (functions/stats_tests.py): chi-square
independence cell table and grouped OLS trend — crafted corpora pin the
zero-cell grid, the truncating-division parity on NEGATIVE slopes, and the
degenerate-group exclusion."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_jobkit_ray.functions.stats_tests import (
    EVENTS_HOURLY_OLS_SQL,
    LANG_SOURCE_CHISQ_SQL,
    _trunc_div,
    events_hourly_ols,
    lang_source_chisq,
)

SF_DIR = "/root/testdata/sf0.001"


def test_trunc_div_matches_duckdb_fuzz():
    rng = np.random.default_rng(3)
    con = duckdb.connect()
    for _ in range(200):
        num = int(rng.integers(-10**12, 10**12))
        den = int(rng.integers(1, 10**6))
        want = con.execute(
            "SELECT CAST(? AS HUGEINT) // CAST(? AS HUGEINT)", [num, den]
        ).fetchone()[0]
        assert _trunc_div(num, den) == int(want), (num, den)


def test_chisq_matches_sql_and_includes_zero_cells(ray_session, tmp_path):
    """A (lang, source) combination with no documents must appear with
    n_docs = 0 and a positive contribution."""
    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["x"] * 6),
            "lang": pa.array(["en", "en", "en", "de", "de", "de"]),
            "source": pa.array(["web", "web", "wiki", "web", "web", "web"]),
            "n_chars": pa.array([1] * 6, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = lang_source_chisq(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(LANG_SOURCE_CHISQ_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    zero = got[(got["lang"] == "de") & (got["source"] == "wiki")]
    assert len(zero) == 1 and zero.iloc[0]["n_docs"] == 0
    assert zero.iloc[0]["contrib_e6"] > 0
    # statistic identity vs scipy-free hand computation: chi2 = sum over the
    # 2x2 grid of (O - E)^2 / E with margins (en,de)=(3,3), (web,wiki)=(5,1)
    expected_stat = sum(
        (o - e) ** 2 / e
        for o, e in [(2, 2.5), (1, 0.5), (3, 2.5), (0, 0.5)]
    )
    assert got["contrib_e6"].sum() / 1e6 == pytest.approx(expected_stat, abs=1e-5)


def test_chisq_matches_sql_sf0001(ray_session):
    got = lang_source_chisq(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(LANG_SOURCE_CHISQ_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ols_negative_slope_and_degenerate_exclusion(ray_session, tmp_path):
    """A strictly decreasing value-by-hour series gives a negative slope
    (truncating-division parity with DuckDB), and a group whose events all
    share one hour is excluded on both engines."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    # 'down': y = 1000 - 100*x cents at hours 0..9 -> slope exactly -1 $/h
    for hx in range(10):
        rows.append(("down", base + pd.Timedelta(hours=hx), (1000 - 100 * hx) / 100.0))
    # 'flatline': two events in the same hour -> degenerate, excluded
    rows.append(("flatline", base, 5.0))
    rows.append(("flatline", base + pd.Timedelta(minutes=10), 7.0))
    # 'noisy': non-integral slope exercising truncation of a negative num
    for hx, v in [(0, 3.0), (1, 1.0), (2, 2.5), (3, 0.2)]:
        rows.append(("noisy", base + pd.Timedelta(hours=hx), v))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = events_hourly_ols(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(EVENTS_HOURLY_OLS_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["event_type"]) == {"down", "noisy"}
    down = got.set_index("event_type").loc["down"]
    assert down["slope_e6"] == -100 * 1_000_000  # -100 cents/hour exactly


def test_ols_matches_sql_sf0001(ray_session):
    got = events_hourly_ols(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.execute(EVENTS_HOURLY_OLS_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_score_drift_ks_crafted_shift(ray_session, tmp_path):
    """A planted location shift between halves yields the hand-computable
    KS gap; the argmax threshold tie-breaks to the smallest logit."""
    import pyarrow as pa, pyarrow.parquet as pq
    from docling_jobkit_ray.functions.webtext import score_drift_ks, score_drift_ks_sql

    # even doc_ids (ref): text with many stopwords (high logit);
    # odd doc_ids (cur): digit-heavy text (low logit) -> large KS
    texts = []
    for i in range(40):
        if i % 2 == 0:
            texts.append("the and that with for this from they have " * 3)
        else:
            texts.append("12345 67890 11111 22222 33333 44444")
    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["web"] * 40),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = score_drift_ks(str(tmp_path)).to_pandas()
    assert got.loc[0, "ks_ppm"] == 1_000_000  # disjoint distributions
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(score_drift_ks_sql()).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_score_drift_ks_matches_sql_sf0001(ray_session):
    from docling_jobkit_ray.functions.webtext import score_drift_ks, score_drift_ks_sql

    got = score_drift_ks(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(score_drift_ks_sql()).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bootstrap_ci_brackets_mean_and_narrows(ray_session):
    """CI brackets the exact mean at both scales and narrows with more
    data (~sqrt(10) between sf0.001 and sf0.01); parity with the oracle."""
    from docling_jobkit_ray.functions.stats_tests import (
        BOOTSTRAP_CI_VALUE_SQL,
        bootstrap_ci_value,
    )

    widths = {}
    for sf in ["sf0.001", "sf0.01"]:
        d = f"/root/testdata/{sf}"
        got = bootstrap_ci_value(d).to_pandas()
        r = got.iloc[0]
        assert r["ci_lo_e6"] <= r["mean_e6"] <= r["ci_hi_e6"]
        widths[sf] = r["ci_hi_e6"] - r["ci_lo_e6"]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(BOOTSTRAP_CI_VALUE_SQL).fetchdf()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    ratio = widths["sf0.001"] / widths["sf0.01"]
    assert 2.0 < ratio < 5.5, f"CI width should shrink ~sqrt(10), got {ratio}"


def test_bootstrap_weights_are_reshard_invariant(ray_session, tmp_path):
    """Splitting the same rows across different shard layouts cannot
    change the CI (weights hash event_id, not position)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.stats_tests import bootstrap_ci_value

    rng = np.random.default_rng(2)
    n = 400
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * n, pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(rng.uniform(0, 100, n), pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    a_dir = tmp_path / "one"; a_dir.mkdir()
    pq.write_table(t, a_dir / "events.parquet")
    b_dir = tmp_path / "many"; b_dir.mkdir()
    pq.write_table(t, b_dir / "events.parquet", row_group_size=37)
    out_a = bootstrap_ci_value(str(a_dir)).to_pandas()
    out_b = bootstrap_ci_value(str(b_dir)).to_pandas()
    pd.testing.assert_frame_equal(out_a, out_b)
