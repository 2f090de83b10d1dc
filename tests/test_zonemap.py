"""Zone-map layout + pruned scan: skipping is observable, correctness is
never delegated to it, and the fingerprint invalidates stale layouts."""

from __future__ import annotations

import json
import os
import shutil

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    from docling_jobkit_ray.functions.zonemap import write_orders_year_layout

    out = str(tmp_path_factory.mktemp("zm") / "orders_year")
    write_orders_year_layout(SF_DIR, out)
    return out


def test_layout_commit_protocol(layout):
    assert os.path.exists(os.path.join(layout, "_SUCCESS"))
    zones = json.load(open(os.path.join(layout, "_zonemaps.json")))
    years = [z["o_year"] for z in zones]
    assert years == sorted(years) and len(years) >= 5
    for z in zones:
        assert z["date_min"] <= z["date_max"]
        assert z["cents_min"] <= z["cents_max"]
        assert os.path.isdir(os.path.join(layout, f"o_year={z['o_year']}"))


def test_pruned_scan_skips_partitions_and_stays_exact(layout):
    from docling_jobkit_ray.functions.zonemap import _date_us, pruned_orders_scan

    ds, nread, ntotal = pruned_orders_scan(
        layout, _date_us("1997-03-01"), _date_us("1998-03-01")
    )
    assert nread < ntotal, "a one-year window must prune year partitions"
    assert nread == 2  # straddles exactly two calendar years
    rows = ds.take_all()
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(os.path.join(SF_DIR, "orders.parquet"))
    d = pc.cast(pc.cast(t["o_orderdate"], "timestamp[us]"), "int64")
    lo, hi = _date_us("1997-03-01"), _date_us("1998-03-01")
    expected = t.filter(
        pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
    ).num_rows
    assert len(rows) == expected


def test_empty_predicate_reads_nothing(layout):
    from docling_jobkit_ray.functions.zonemap import _date_us, pruned_orders_scan

    ds, nread, ntotal = pruned_orders_scan(
        layout, _date_us("2015-01-01"), _date_us("2016-01-01")
    )
    assert nread == 0 and ntotal >= 5
    assert ds.count() == 0


def test_fingerprint_invalidates_stale_layout(ray_session, tmp_path):
    from docling_jobkit_ray.functions.zonemap import write_orders_year_layout

    out = str(tmp_path / "orders_year")
    write_orders_year_layout(SF_DIR, out)
    marker = os.path.join(out, "_SUCCESS")
    committed = open(marker).read()
    # same input -> reuse (marker untouched)
    m0 = os.stat(marker).st_mtime_ns
    write_orders_year_layout(SF_DIR, out)
    assert os.stat(marker).st_mtime_ns == m0
    # corrupt the fingerprint -> rebuild from scratch
    with open(marker, "w") as f:
        f.write("0:0:0")
    write_orders_year_layout(SF_DIR, out)
    assert open(marker).read() == committed


def test_zorder_layout_prunes_both_dimensions(ray_session, tmp_path):
    """The 2-D box must prune tiles by BOTH dimensions: strictly fewer
    tiles than a one-dimensional (date-only) predicate would leave, and
    exact results regardless."""
    import shutil

    from docling_jobkit_ray.functions.zonemap import (
        _ZT_BITS,
        _dim_minmax,
        write_orders_zorder_layout,
        zorder_pruned_scan,
    )

    out = str(tmp_path / "zorder")
    write_orders_zorder_layout(SF_DIR, out)
    c_lo, c_hi, h_lo, h_hi = _dim_minmax(SF_DIR)
    grid = 1 << _ZT_BITS
    cs, hs = c_hi - c_lo + 1, h_hi - h_lo + 1
    box = (
        c_lo + cs // grid,
        c_lo + cs * 2 // grid,
        h_lo + hs // grid,
        h_lo + hs * 2 // grid,
    )
    ds, nread, ntotal = zorder_pruned_scan(out, *box)
    assert nread < ntotal
    # a date-only predicate (full customer range) prunes strictly less
    _, nread_1d, _ = zorder_pruned_scan(out, c_lo, c_hi + 1, box[2], box[3])
    assert nread < nread_1d, "2-D box must beat the 1-D predicate"

    # exactness against a direct filtered read
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "orders.parquet"))
    cust = pc.cast(t["o_custkey"], "int64")
    hour = pc.divide(
        pc.cast(pc.cast(t["o_orderdate"], "timestamp[us]"), "int64"), 3_600_000_000
    )
    m = pc.and_(
        pc.and_(pc.greater_equal(cust, box[0]), pc.less(cust, box[1])),
        pc.and_(pc.greater_equal(hour, box[2]), pc.less(hour, box[3])),
    )
    assert ds.count() == t.filter(m).num_rows
