"""Schema-on-read JSON extraction (functions/jsontools.py): null-on-missing
parity with DuckDB json_extract, and crafted payload edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from docling_jobkit_ray.functions.jsontools import (
    EVENTS_PROPS_EXTRACT_SQL,
    events_props_extract,
    extract_int_key,
)

SF_DIR = "/root/testdata/sf0.001"


def test_extract_int_key_edge_payloads():
    col = pa.array(
        [
            '{"k": 87}',
            '{"k":-3}',
            '{"other": 1}',  # key absent -> null
            "",  # malformed -> null
            '{"k": 12, "j": 5}',
            '{ "k" : 7 }',  # whitespace variants
        ]
    )
    got = extract_int_key(col, "k").to_pylist()
    assert got == [87, -3, None, None, 12, 7]


def test_events_props_extract_matches_sql(ray_session):
    got = events_props_extract(SF_DIR).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.execute(EVENTS_PROPS_EXTRACT_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_extract_nulls_survive_to_rows(ray_session, tmp_path):
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 2, pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "a"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(['{"k": 5}', "not json"]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = events_props_extract(str(tmp_path)).to_pandas()
    assert out.loc[0, "k"] == 5 and pd.isna(out.loc[1, "k"])
