"""Statistics catalog (functions/stats_catalog.py): incremental refresh
equals full rebuild (HLL bit-exact, counts exact, t-digest bounded),
versioned commit protocol."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _half(sf: str, parity: int):
    from docling_jobkit_ray.functions.profile import _EVENT_SPECS
    from docling_jobkit_ray.sources.pages import read_table

    ds = read_table(sf, "events", columns=[c for c, _ in _EVENT_SPECS])
    return ds.map_batches(
        lambda b, p=parity: b.filter(
            pc.equal(pc.bit_wise_and(b["event_id"], pa.scalar(1, pa.int64())), p)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def test_refresh_matches_full_rebuild(ray_session, tmp_path):
    from docling_jobkit_ray.functions.sketches import HyperLogLog, TDigest
    from docling_jobkit_ray.functions.stats_catalog import (
        column_sketch_rows,
        current_stats,
        init_stats,
        refresh_stats,
    )
    from docling_jobkit_ray.functions.profile import _EVENT_SPECS
    from docling_jobkit_ray.sources.pages import read_table

    sf = "/root/testdata/sf0.001"
    cat = str(tmp_path / "stats")
    init_stats(_half(sf, 0), cat)
    refresh_stats(cat, _half(sf, 1))
    got = current_stats(cat).to_pandas().set_index("col")

    full = (
        column_sketch_rows(
            read_table(sf, "events", columns=[c for c, _ in _EVENT_SPECS]),
            _EVENT_SPECS,
        )
        .to_pandas()
        .set_index("col")
    )
    for col in full.index:
        assert int(got.loc[col, "n"]) == int(full.loc[col, "n"])
        # HLL registers are max-merged: incremental == full, BIT-EXACT
        assert (
            HyperLogLog.deserialize(got.loc[col, "hll"]).registers.tobytes()
            == HyperLogLog.deserialize(full.loc[col, "hll"]).registers.tobytes()
        )
        # t-digest medians agree within the documented rank error
        a = TDigest.deserialize(got.loc[col, "tdigest"]).quantile(0.5)
        b = TDigest.deserialize(full.loc[col, "tdigest"]).quantile(0.5)
        assert abs(a - b) <= 0.02 * max(abs(b), 1.0)
    assert sorted(os.listdir(cat))[:2] == ["v1", "v2"]


def test_table_stats_events_values(ray_session):
    """The driver view's n is exact and approx_distinct lands within 5% of
    the true distinct count for every profiled column."""
    from docling_jobkit_ray.functions.stats_catalog import table_stats_events

    sf = "/root/testdata/sf0.01"
    got = table_stats_events(sf).to_pandas().set_index("col")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    truth = con.execute(
        """
        SELECT count(*) AS n,
               count(DISTINCT event_id) AS d_event, count(DISTINCT user_id) AS d_user,
               count(DISTINCT ts) AS d_ts,
               count(DISTINCT CAST(round(value*100) AS BIGINT)) AS d_value
        FROM events
        """
    ).df().iloc[0]
    assert (got["n"] == int(truth["n"])).all()
    for col, key in (
        ("event_id", "d_event"),
        ("user_id", "d_user"),
        ("ts", "d_ts"),
        ("value", "d_value"),
    ):
        rel = abs(got.loc[col, "approx_distinct"] - truth[key]) / max(truth[key], 1)
        assert rel < 0.05, (col, rel)
