"""Benchmark-leakage report (webtext.benchmark_leakage_report): planted
leaked grams, DuckDB parity, integer-exact ppm."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_planted_leakage(ray_session, tmp_path):
    """Eval doc 0 (doc_id % 97 == 0) shares one 4-gram with a training doc
    and has one clean 4-gram -> n_grams=2, n_leaked=1, leak_ppm=500000;
    eval doc 97 is fully clean -> 0 leaked."""
    from docling_jobkit_ray.functions.webtext import benchmark_leakage_report

    rows = [
        (0, "alpha beta gamma delta unique tail words"),  # eval: 4 grams
        (97, "clean eval item nothing shared here at"),  # eval: 4 grams, clean
        (1, "prefix alpha beta gamma delta suffix"),  # training: leaks gram
        (2, "totally unrelated training document text body"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        benchmark_leakage_report(str(tmp_path)).to_pandas().set_index("doc_id")
    )
    assert out.loc[0, "n_grams"] == 4
    assert out.loc[0, "n_leaked"] == 1  # only 'alpha beta gamma delta'
    assert out.loc[0, "leak_ppm"] == 250000
    assert out.loc[97, "n_leaked"] == 0 and out.loc[97, "leak_ppm"] == 0


def test_leakage_duckdb_parity(ray_session):
    from docling_jobkit_ray.functions.webtext import (
        benchmark_leakage_report,
        benchmark_leakage_report_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = benchmark_leakage_report(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(benchmark_leakage_report_sql()).df()
    for c in ("doc_id", "n_grams", "n_leaked", "leak_ppm"):
        assert got[c].tolist() == want[c].tolist(), c
    assert len(got) > 0
