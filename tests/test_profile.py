"""Table profiler (functions/profile.py): DuckDB parity + null handling."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_profile_events_parity(ray_session):
    from docling_jobkit_ray.functions.profile import (
        PROFILE_EVENTS_SQL,
        profile_events,
    )

    sf = "/root/testdata/sf0.01"
    got = profile_events(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(PROFILE_EVENTS_SQL).df()
    assert got.values.tolist() == want.values.tolist()
    assert set(got["col"]) == {"event_id", "ts", "user_id", "value"}


def test_profile_counts_nulls(ray_session, tmp_path):
    """Nulls are counted and excluded from min/max; partially-null batches
    fold correctly across blocks."""
    from docling_jobkit_ray.functions.profile import profile_table

    tbl = pa.table(
        {
            "a": pa.array([1, None, 3, None, 5], pa.int64()),
            "b": pa.array([10.0, 20.0, None, 40.0, 50.0]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = (
        profile_table(str(tmp_path), "events", [("a", "int"), ("b", "cents")])
        .to_pandas()
        .set_index("col")
    )
    assert out.loc["a", "n"] == 5 and out.loc["a", "n_null"] == 2
    assert out.loc["a", "min_v"] == 1 and out.loc["a", "max_v"] == 5
    assert out.loc["b", "n_null"] == 1
    assert out.loc["b", "min_v"] == 1000 and out.loc["b", "max_v"] == 5000
