"""Incremental materialized view (functions/matview.py): refresh ==
full recompute (exact), versioned commit, torn-staging recovery."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def _events_ds(sf: str, parity: int):
    import ray

    from docling_jobkit_ray.sources.pages import read_table

    ds = read_table(sf, "events", columns=["ts", "event_type", "value", "event_id"])
    return ds.map_batches(
        lambda b, p=parity: b.filter(
            pc.equal(
                pc.bit_wise_and(b["event_id"], pa.scalar(1, pa.int64())),
                p,
            )
        ).drop_columns(["event_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def test_refresh_equals_full_recompute(ray_session, tmp_path):
    from docling_jobkit_ray.functions.matview import (
        current_view,
        hourly_event_counts,
        init_view,
        refresh_view,
    )
    from docling_jobkit_ray.sources.pages import read_table

    sf = "/root/testdata/sf0.001"
    view_dir = str(tmp_path / "view")
    init_view(_events_ds(sf, 0), view_dir)  # base = even event_ids
    refresh_view(view_dir, _events_ds(sf, 1))  # delta = odd event_ids
    got = (
        current_view(view_dir)
        .to_pandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    full = (
        hourly_event_counts(
            read_table(sf, "events", columns=["ts", "event_type", "value"])
        )
        .to_pandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    assert got.values.tolist() == full.values.tolist()
    # two committed versions exist
    assert sorted(os.listdir(view_dir))[:2] == ["v1", "v2"]


def test_refresh_requires_init_and_recovers_torn_staging(ray_session, tmp_path):
    import pytest

    from docling_jobkit_ray.functions.matview import init_view, refresh_view

    sf = "/root/testdata/sf0.001"
    view_dir = str(tmp_path / "view")
    with pytest.raises(FileNotFoundError):
        refresh_view(view_dir, _events_ds(sf, 1))
    init_view(_events_ds(sf, 0), view_dir)
    # torn staging from a crashed refresh is discarded by the retry
    os.makedirs(os.path.join(view_dir, "v2.staging"))
    with open(os.path.join(view_dir, "v2.staging", "junk.parquet"), "w") as fh:
        fh.write("junk")
    refresh_view(view_dir, _events_ds(sf, 1))
    assert os.path.exists(os.path.join(view_dir, "v2", "_SUCCESS"))
    meta = json.load(open(os.path.join(view_dir, "v2", "_SUCCESS")))
    assert meta["op"] == "refresh" and meta["prev"] == 1


def test_view_version_diff_and_time_travel(ray_session, tmp_path):
    """Old versions stay readable after refresh; the diff reports exactly
    the keys the delta touched, with introduced keys at old = 0."""
    import pandas as pd
    import pytest
    import ray.data

    from docling_jobkit_ray.functions.matview import (
        init_view,
        read_view_version,
        refresh_view,
        view_version_diff,
    )

    base = pd.Timestamp("2024-01-01")
    def ev(ts_h, typ, val):
        return (ts_h, typ, val)
    rows_v1 = [(0, "a", 1.0), (0, "a", 2.0), (1, "b", 5.0)]
    rows_delta = [(0, "a", 1.5), (2, "c", 7.0)]  # touches (0,a); introduces (2,c)

    def to_ds(rows):
        t = pa.table(
            {
                "ts": pa.array(
                    [base + pd.Timedelta(hours=h) for h, _, _ in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([ty for _, ty, _ in rows]),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
            }
        )
        return ray.data.from_arrow(t)

    view_dir = str(tmp_path / "view")
    init_view(to_ds(rows_v1), view_dir)
    refresh_view(view_dir, to_ds(rows_delta))
    v1 = read_view_version(view_dir, 1).to_pandas().sort_values(["hour", "event_type"])
    assert len(v1) == 2  # time travel: v1 unchanged by the refresh
    diff = view_version_diff(view_dir, 1, 2).to_pandas()
    assert len(diff) == 2
    d = diff.set_index("event_type")
    assert d.loc["a", "n_old"] == 2 and d.loc["a", "n_new"] == 3
    assert d.loc["a", "cents_new"] - d.loc["a", "cents_old"] == 150
    assert d.loc["c", "n_old"] == 0 and d.loc["c", "n_new"] == 1
    with pytest.raises(FileNotFoundError):
        read_view_version(view_dir, 9)


def test_cdc_refresh_retracts_to_zero(ray_session, tmp_path):
    """Deleting EVERY event of one (hour, type) cell must remove the cell
    from the maintained view entirely (not leave an n=0 row), and the
    result must equal a full recompute over the surviving rows."""
    import ray.data

    from docling_jobkit_ray.functions.matview import (
        current_view,
        hourly_event_counts,
        init_view,
        refresh_view_cdc,
    )
    from docling_jobkit_ray.sources.pages import read_table

    sf = "/root/testdata/sf0.001"
    base = read_table(sf, "events", columns=["ts", "event_type", "value"])
    view_dir = str(tmp_path / "view")
    init_view(base, view_dir)

    # pick the first cell of the live view and delete all its rows
    live = current_view(view_dir).to_pandas().sort_values(["hour", "event_type"])
    hour0 = int(live.iloc[0]["hour"])
    type0 = str(live.iloc[0]["event_type"])

    def killers(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("ts", pa.timestamp("us")),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("op", pa.int64()),
            ]
        )
        if batch.num_rows == 0 or batch.num_columns == 0:
            return schema.empty_table()
        hour = pc.divide(
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
            pa.scalar(3_600_000_000, pa.int64()),
        )
        m = pc.and_(
            pc.equal(hour, pa.scalar(hour0, pa.int64())),
            pc.equal(batch["event_type"], pa.scalar(type0)),
        )
        t = batch.filter(m)
        return pa.table(
            {
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "event_type": t["event_type"],
                "value": pc.cast(t["value"], pa.float64()),
                "op": pa.array([-1] * t.num_rows, pa.int64()),
            }
        )

    cdc = base.map_batches(killers, batch_format="pyarrow", zero_copy_batch=True)
    refresh_view_cdc(view_dir, cdc)

    after = current_view(view_dir).to_pandas()
    assert not (
        (after["hour"] == hour0) & (after["event_type"] == type0)
    ).any(), "retracted-to-zero cell must disappear"
    assert (after["n"] > 0).all()

    # equals a full recompute over the surviving rows
    def survivors(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return batch
        hour = pc.divide(
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
            pa.scalar(3_600_000_000, pa.int64()),
        )
        keep = pc.invert(
            pc.and_(
                pc.equal(hour, pa.scalar(hour0, pa.int64())),
                pc.equal(batch["event_type"], pa.scalar(type0)),
            )
        )
        return batch.filter(keep)

    expect = (
        hourly_event_counts(
            base.map_batches(survivors, batch_format="pyarrow", zero_copy_batch=True)
        )
        .to_pandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    after = after.sort_values(["hour", "event_type"], ignore_index=True)
    pa_after = pa.Table.from_pandas(after, preserve_index=False)
    pa_expect = pa.Table.from_pandas(expect, preserve_index=False)
    assert pa_after.equals(pa_expect)
