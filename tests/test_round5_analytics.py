"""Crafted-input semantics for the round-5 continuation analytics ops:
revenue concentration (Gini/HHI) and the interval sweep-line peak
concurrency.  SQL-oracle parity runs in test_driver_contract.py; here the
exact-integer arithmetic is pinned on hand-built tables.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _write_dims(tmp_path, nations):
    _write(
        tmp_path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(len(nations)), pa.int64()),
                "n_name": pa.array(nations),
                "n_regionkey": pa.array([0] * len(nations), pa.int64()),
            }
        ),
    )


def test_revenue_gini_exact_values(ray_session, tmp_path):
    """One skewed nation, one perfectly equal nation: hand-computed Gini
    ppm and quantized-share HHI ppm."""
    from docling_jobkit_ray.pipelines.relational import revenue_gini_by_nation

    _write_dims(tmp_path, ["ALPHA", "BETA"])
    # customers 1-3 in ALPHA (revenues 100, 100, 200), 4-5 in BETA (50, 50)
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_nationkey": pa.array([0, 0, 0, 1, 1], pa.int64()),
            }
        ),
    )
    # one order per customer except cust 3 (two orders of 100 summing 200)
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(6), pa.int64()),
                "o_custkey": pa.array([1, 2, 3, 3, 4, 5], pa.int64()),
                "o_totalprice": pa.array([100.0, 100.0, 100.0, 100.0, 50.0, 50.0]),
            }
        ),
    )
    out = (
        revenue_gini_by_nation(str(tmp_path))
        .to_pandas()
        .set_index("nation")
    )
    # ALPHA: x = [10000, 10000, 20000] cents, n=3, s=40000
    #   rs = 1*10000 + 2*10000 + 3*20000 = 90000
    #   gini = (180000 - 4*40000) * 1e6 // 120000 = 166666
    #   shares ppm = [250000, 250000, 500000]
    #   hhi = (2*250000^2 + 500000^2) // 1e6 = 375000
    assert out.loc["ALPHA", "n_customers"] == 3
    assert out.loc["ALPHA", "total_revenue"] == 400.0
    assert out.loc["ALPHA", "gini_ppm"] == 166666
    assert out.loc["ALPHA", "hhi_ppm"] == 375000
    # BETA: equal split -> gini 0, hhi = 2*500000^2 // 1e6 = 500000
    assert out.loc["BETA", "gini_ppm"] == 0
    assert out.loc["BETA", "hhi_ppm"] == 500000


def test_peak_concurrency_sweep_and_carry(ray_session, tmp_path):
    """Overlapping sessions peak at 2; a session spanning an hour boundary
    carries its concurrency into the next hour even though that hour's
    only boundary is a drop."""
    from docling_jobkit_ray.pipelines.behavior import sessions_peak_concurrency

    base = pd.Timestamp("2024-03-01")

    def at(h, m):
        return base + pd.Timedelta(hours=h, minutes=m)

    rows = [
        # user 1: one session [10:00, 10:10]
        (1, at(10, 0)),
        (1, at(10, 10)),
        # user 2: point session at 10:05 (overlaps user 1 -> concurrency 2)
        (2, at(10, 5)),
        # user 3: point session at 11:30
        (3, at(11, 30)),
        # user 4: session [12:50, 13:10] spanning the hour boundary
        (4, at(12, 50)),
        (4, at(13, 10)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = sessions_peak_concurrency(str(tmp_path), n_buckets=4).to_pandas()
    got = {
        ts.hour: int(p)
        for ts, p in zip(out["hour_ts"], out["peak_sessions"])
    }
    # hour 13 holds only the -1 boundary: peak is the carried-in 1
    assert got == {10: 2, 11: 1, 12: 1, 13: 1}


def test_clustering_coeff_clique_vs_hub(ray_session, tmp_path):
    """Triangle corners in a 3-clique score 1e6; the clique node that also
    hubs two dangling spokes scores 2/(4*3); degree-1 spokes are excluded."""
    from docling_jobkit_ray.functions.graph import part_clustering_coeff

    # order 1 buys parts 1,2,3 (a 3-clique); orders 2 and 3 attach spokes
    # 4 and 5 to part 3
    ok = [1, 1, 1, 2, 2, 3, 3]
    pk = [1, 2, 3, 3, 4, 3, 5]
    t = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
            "l_quantity": pa.array([40.0] * len(ok)),
        }
    )
    _write(tmp_path, "lineitem", t)
    out = (
        part_clustering_coeff(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("partkey")
    )
    assert set(out.index) == {1, 2, 3}
    assert out.loc[1, "cc_ppm"] == 1_000_000 and out.loc[1, "degree"] == 2
    assert out.loc[2, "cc_ppm"] == 1_000_000
    # node 3: degree 4, one triangle -> 2*1e6 // 12
    assert out.loc[3, "degree"] == 4
    assert out.loc[3, "n_triangles"] == 1
    assert out.loc[3, "cc_ppm"] == 166_666


def test_record_orders_running_records(ray_session, tmp_path):
    """First order is always a record; equal-to-max is NOT a record;
    date ties break by orderkey."""
    from docling_jobkit_ray.pipelines.relational import record_orders

    d = pd.Timestamp("2024-01-01")
    # cust 1: 100 (rec), 50, 100 (equal max -> no), 150 (rec) => 2 records
    # cust 2: same-date orders 3 then 4 by orderkey: 100 (rec), 200 (rec)
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 10, 11], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "o_orderdate": pa.array(
                [d, d + pd.Timedelta(days=1), d + pd.Timedelta(days=2),
                 d + pd.Timedelta(days=3), d, d],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([100.0, 50.0, 100.0, 150.0, 100.0, 200.0]),
        }
    )
    _write(tmp_path, "orders", t)
    out = record_orders(str(tmp_path), n_buckets=4).to_pandas().set_index("o_custkey")
    assert out.loc[1, "n_orders"] == 4 and out.loc[1, "n_records"] == 2
    assert out.loc[2, "n_orders"] == 2 and out.loc[2, "n_records"] == 2


def test_seasonal_anomaly_flags_only_spiked_hod(ray_session, tmp_path):
    """A spike at one 03:00 flags against the 03:00 baseline; the same
    count at a different hour-of-day with a high baseline does not flag."""
    from docling_jobkit_ray.pipelines.behavior import hourly_seasonal_anomalies

    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0

    def burst(day, hour, k):
        nonlocal eid
        for i in range(k):
            rows.append((eid, base + pd.Timedelta(days=day, hours=hour, seconds=i)))
            eid += 1

    # hod 3 baseline: 2,2,2 across three days, then a 12-spike on day 3
    for day in range(3):
        burst(day, 3, 2)
    burst(3, 3, 12)
    # hod 9: counts 12,12,12,12 -> no anomaly even though 12 is large
    for day in range(4):
        burst(day, 9, 12)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = hourly_seasonal_anomalies(str(tmp_path)).to_pandas()
    flagged = out[out["anomaly"] == 1]
    assert len(flagged) == 1
    assert flagged.iloc[0]["hod"] == 3 and flagged.iloc[0]["n_events"] == 12


def test_theilsen_ignores_single_spike(ray_session, tmp_path):
    """Hourly counts 1,2,3,4,100: OLS would chase the spike; the pairwise-
    slope median stays at ~1/hour (slope2 = 2 middle slopes of 1e6 each)."""
    from docling_jobkit_ray.pipelines.behavior import events_hourly_theilsen

    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    for h, k in enumerate([1, 2, 3, 4, 100]):
        for i in range(k):
            rows.append((eid, base + pd.Timedelta(hours=h, seconds=i)))
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = events_hourly_theilsen(str(tmp_path)).to_pandas().iloc[0]
    assert out["n_hours"] == 5 and out["n_pairs"] == 10
    # sorted pair slopes (ppm): 1e6 x6 then 24e6, 32.3e6, 48e6, 96e6 -> med2 = 2e6
    assert out["slope2_ppm"] == 2_000_000
