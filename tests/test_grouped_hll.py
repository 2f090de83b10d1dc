"""Grouped HLL (sketches.approx_distinct_by): accuracy vs exact, and the
per-key fold's block-split invariance."""

from __future__ import annotations

import duckdb
import numpy as np


def test_grouped_hll_accuracy(ray_session):
    from docling_jobkit_ray.functions.sketches import approx_distinct_users_by_type

    sf = "/root/testdata/sf0.1"
    got = approx_distinct_users_by_type(sf).to_pandas()
    want = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"GROUP BY event_type ORDER BY event_type"
    ).df()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    err = np.abs(got["approx_n"].to_numpy() - want["n"].to_numpy()) / np.maximum(
        want["n"].to_numpy(), 1
    )
    # p=12 -> ~1.6% standard error; 5% is a safe hard bound
    assert float(err.max()) < 0.05


def test_grouped_hll_split_invariance(ray_session, tmp_path):
    """The merged per-key estimate must not depend on how rows were split
    into batches (sketch merges are associative/commutative)."""
    import pyarrow as pa
    import ray

    from docling_jobkit_ray.functions.sketches import approx_distinct_by

    rng = np.random.default_rng(3)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(np.where(rng.random(n) < 0.5, "a", "b")),
            "v": pa.array(rng.integers(0, 700, size=n)),
        }
    )
    one = approx_distinct_by(
        ray.data.from_arrow(tbl), "k", "v"
    ).to_pandas()
    many = approx_distinct_by(
        ray.data.from_arrow(tbl).repartition(17), "k", "v"
    ).to_pandas()
    assert one.values.tolist() == many.values.tolist()


def test_grouped_tdigest_accuracy(ray_session):
    """Grouped t-digest medians within 5% of the exact per-lang medians."""
    import duckdb as dd

    from docling_jobkit_ray.functions.sketches import (
        doc_length_quantiles_by_lang_approx,
    )

    sf = "/root/testdata/sf0.1"
    got = (
        doc_length_quantiles_by_lang_approx(sf).to_pandas().set_index("lang")
    )
    want = dd.sql(
        f"SELECT lang, quantile_cont(n_chars, 0.5) AS m "
        f"FROM read_parquet('{sf}/documents.parquet') GROUP BY lang"
    ).df().set_index("lang")
    for lang in want.index:
        rel = abs(got.loc[lang, "q50"] - want.loc[lang, "m"]) / max(
            want.loc[lang, "m"], 1
        )
        assert rel < 0.05, (lang, rel)


def test_grouped_mg_top_terms(ray_session):
    """Grouped Misra-Gries: each language's reported top term matches the
    exact per-lang top term (heaviest hitters always survive MG)."""
    import duckdb as dd

    from docling_jobkit_ray.functions.sketches import approx_top_terms_by_lang

    sf = "/root/testdata/sf0.01"
    got = approx_top_terms_by_lang(sf, n=3).to_pandas()
    want = dd.sql(
        f"""
        SELECT lang, w AS term, count(*) AS c
        FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM read_parquet('{sf}/documents.parquet'))
        GROUP BY lang, w QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) = 1
        """
    ).df()
    for _, row in want.iterrows():
        top1 = got[(got["lang"] == row["lang"]) & (got["rank"] == 1)]
        assert top1["term"].iloc[0] == row["term"]
        assert int(top1["count"].iloc[0]) <= int(row["c"])  # MG undercounts only


def test_user_overlap_estimate_accuracy(ray_session):
    """HLL set algebra: union/intersection estimates within 7% of the
    exact time-half overlap (inclusion-exclusion compounds two sketch
    errors, hence the looser bound)."""
    import duckdb as dd

    from docling_jobkit_ray.functions.sketches import user_overlap_estimate

    sf = "/root/testdata/sf0.1"
    got = user_overlap_estimate(sf).to_pandas().iloc[0]
    truth = dd.sql(
        f"""
        WITH b AS (SELECT user_id, epoch_us(ts) AS t FROM read_parquet('{sf}/events.parquet')),
        m AS (SELECT (min(t) + max(t)) // 2 AS mid FROM b)
        SELECT count(DISTINCT CASE WHEN t <= mid THEN user_id END) AS e,
               count(DISTINCT CASE WHEN t > mid THEN user_id END) AS l,
               count(DISTINCT user_id) AS u
        FROM b, m
        """
    ).df().iloc[0]
    inter = int(truth["e"]) + int(truth["l"]) - int(truth["u"])
    for k, t in (("n_early", truth["e"]), ("n_late", truth["l"]), ("n_union", truth["u"]), ("n_intersection", inter)):
        rel = abs(int(got[k]) - int(t)) / max(int(t), 1)
        assert rel < 0.07, (k, got[k], t)


def test_verified_heavy_hitters_superset_guarantee(ray_session, tmp_path):
    """A skewed crafted corpus: the MG candidate pass must not lose any
    true phi-heavy hitter, and the exact verify filters the rest."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.sketches import (
        verified_heavy_hitters,
        verified_heavy_hitters_sql,
    )

    # term 'hot' = 30% of tokens, 'warm' = 5%, long tail of singletons
    def b26(i):  # distinct ALPHABETIC tail words ([a-z]+ tokenization)
        s = ""
        for _ in range(4):
            s += chr(97 + i % 26)
            i //= 26
        return "tail" + s

    words = ["hot"] * 300 + ["warm"] * 50 + [b26(i) for i in range(650)]
    texts = [" ".join(words[i::10]) for i in range(10)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 10),
                "source": pa.array(["web"] * 10),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = verified_heavy_hitters(str(tmp_path), phi_denominator=50).to_pandas()
    assert list(out["term"])[:2] == ["hot", "warm"]
    assert out.iloc[0]["n"] == 300 and out.iloc[1]["n"] == 50
    assert not out["term"].str.startswith("tail").any()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(verified_heavy_hitters_sql(50)).fetchdf()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False
    )


def test_verified_heavy_hitters_param_guard():
    import pytest

    from docling_jobkit_ray.functions.sketches import verified_heavy_hitters

    with pytest.raises(ValueError):
        verified_heavy_hitters("/root/testdata/sf0.001", phi_denominator=50, k_counters=60)
