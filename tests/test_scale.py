"""Scale-adaptive bucket sizing (VERDICT r2 item 1): bucket counts must be
derived from input size, bound per-group rows, and leave operator results
invariant to the bucket count chosen."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from docling_jobkit_ray.scale import bucket_count, estimate_rows, estimate_table_rows

SF = "/root/testdata/sf0.001"


def test_bucket_count_floor_and_pow2():
    # small inputs stay at the floor (the measured small-scale sweet spot)
    assert bucket_count(0) == 64
    assert bucket_count(10_000) == 64
    assert bucket_count(64 * 250_000) == 64
    # always a power of two
    for rows in (1, 10**6, 10**7, 123_456_789, 10**10):
        n = bucket_count(rows)
        assert n & (n - 1) == 0


def test_bucket_count_bounds_per_group_rows():
    """The whole point: rows/n_buckets <= target at any input size."""
    target = 250_000
    for rows in (10**7, 10**8, 10**9, 10**10, 10**11):
        n = bucket_count(rows, target_rows_per_bucket=target)
        assert rows / n <= target
        # and not absurdly over-split (power-of-two roundup is <= 2x need)
        assert n <= max(64, 2 * (rows // target + 1))


def test_bucket_count_cap_and_custom_floor():
    assert bucket_count(10**15, max_buckets=1 << 20) == 1 << 20
    assert bucket_count(0, min_buckets=256) == 256
    with pytest.raises(ValueError):
        bucket_count(100, target_rows_per_bucket=0)


def test_estimate_rows_matches_footer():
    import pyarrow.parquet as pq

    exact = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert estimate_rows(SF, "events") == exact
    assert estimate_table_rows(f"{SF}/events.parquet") == exact


def test_estimate_table_rows_directory(tmp_path):
    import pyarrow.parquet as pq

    for i in range(3):
        pq.write_table(pa.table({"x": list(range(10 + i))}), str(tmp_path / f"p{i}.parquet"))
    assert estimate_table_rows(str(tmp_path)) == 10 + 11 + 12


@pytest.mark.parametrize("op_name", ["events_sessionize", "events_asof_login"])
def test_bucket_count_invariance(ray_session, op_name):
    """Operator results must be IDENTICAL whichever bucket count the scale
    heuristic picks — buckets are partitioning, not semantics."""
    from docling_jobkit_ray.pipelines import relational

    op = getattr(relational, op_name)
    base = op(SF).to_pandas()
    for n in (4, 256):
        got = op(SF, n_buckets=n).to_pandas()
        pd.testing.assert_frame_equal(got, base)


def test_bucketed_join_scales_with_est_rows(ray_session):
    """est_rows drives the derived bucket count; output stays identical."""
    import ray.data

    from docling_jobkit_ray.pipelines.joins import bucketed_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array(range(500), pa.int64()), "lv": pa.array(range(500), pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(range(0, 500, 5), pa.int64()), "rv": pa.array(range(100), pa.int64())})
    )
    kw = dict(
        on="k",
        right_on="rk",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("rv", pa.int64())]),
    )
    base = bucketed_join(left, right, **kw).to_pandas().sort_values("k").reset_index(drop=True)
    # a wildly larger est_rows (as a 100x corpus would report) only widens
    # the shuffle — the join result is unchanged
    wide = (
        bucketed_join(left, right, est_rows=10**9, **kw)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(wide, base)
    assert len(base) == 100


def test_estimate_table_rows_fsspec_uri(tmp_path):
    """Remote (fsspec) corpora must estimate real row counts — a silent 0
    would collapse every derived bucket count to the floor at exactly the
    scale the derivation exists for."""
    import fsspec
    import pyarrow.parquet as pq

    fs = fsspec.filesystem("memory")
    with fs.open("/scale_est/a.parquet", "wb") as f:
        pq.write_table(pa.table({"x": list(range(40))}), f)
    with fs.open("/scale_est/b.parquet", "wb") as f:
        pq.write_table(pa.table({"x": list(range(25))}), f)
    assert estimate_table_rows("memory://scale_est") == 65
    assert estimate_table_rows("memory://scale_est/a.parquet") == 40
