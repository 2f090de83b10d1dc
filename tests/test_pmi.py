"""PMI collocations (webtext.pmi_collocations): DuckDB parity + a planted
collocation ranking check."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_pmi_duckdb_parity(ray_session):
    from docling_jobkit_ray.functions.webtext import (
        pmi_collocations,
        pmi_collocations_sql,
    )

    sf = "/root/testdata/sf0.01"
    got = pmi_collocations(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(pmi_collocations_sql()).df()
    assert got.values.tolist() == want.values.tolist()


def test_pmi_planted_collocation(ray_session, tmp_path):
    """'hong kong' always co-occurs (perfect collocation) while 'the the'
    pairs two independent frequent words: PMI must rank the former far
    above the latter."""
    rows = ["hong kong visit " + "the a " * 5, "hong kong again " + "a the " * 5]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from docling_jobkit_ray.functions.webtext import pmi_collocations

    out = pmi_collocations(str(tmp_path), k=50).to_pandas().set_index("bigram")
    assert out.loc["hong kong", "pmi_e6"] > out.loc["the a", "pmi_e6"]
    # 'hong' and 'kong' occur ONLY together -> pmi == ln(N_words^2 / (c * N_bigrams))-ish > 0
    assert out.loc["hong kong", "pmi_e6"] > 0
