"""bucketed_join unit tests: the sparse-side-safe shuffle join."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from docling_jobkit_ray.pipelines.joins import bucketed_join

L_SCHEMA = pa.schema([("k", pa.int64()), ("lv", pa.float64())])
R_SCHEMA = pa.schema([("rk", pa.int64()), ("rv", pa.timestamp("us"))])


def _mk(rows, schema):
    return ray.data.from_arrow(
        pa.table({f.name: pa.array(vals, f.type) for f, vals in zip(schema, rows)})
    )


def test_inner_join_sparse_right(ray_session):
    """A 2-row right side against 64 buckets — exactly the shape that
    crashes Ray 2.49's native Dataset.join (empty partitions)."""
    import datetime as dt

    left = _mk([[1, 2, 3, 4, 5], [0.1, 0.2, 0.3, 0.4, 0.5]], L_SCHEMA)
    t0 = dt.datetime(2024, 1, 1)
    right = _mk([[2, 4], [t0, t0]], R_SCHEMA)
    out = bucketed_join(
        left, right, on="k", right_on="rk",
        left_schema=L_SCHEMA, right_schema=R_SCHEMA,
    ).to_pandas().sort_values("k", ignore_index=True)
    assert out["k"].tolist() == [2, 4]
    assert out["lv"].tolist() == [0.2, 0.4]
    assert str(out["rv"].dtype).startswith("datetime64")


def test_left_anti(ray_session):
    left = _mk([[1, 2, 3], [1.0, 2.0, 3.0]], L_SCHEMA)
    right = _mk([[2], [__import__("datetime").datetime(2024, 1, 1)]], R_SCHEMA)
    out = bucketed_join(
        left, right, on="k", right_on="rk",
        left_schema=L_SCHEMA, right_schema=R_SCHEMA, join_type="left anti",
    ).to_pandas()
    assert sorted(out["k"]) == [1, 3]
    assert list(out.columns) == ["k", "lv"]  # anti join keeps left columns only


def test_empty_right_side(ray_session):
    left = _mk([[1, 2], [1.0, 2.0]], L_SCHEMA)
    right = _mk([[], []], R_SCHEMA)
    inner = bucketed_join(
        left, right, on="k", right_on="rk",
        left_schema=L_SCHEMA, right_schema=R_SCHEMA,
    )
    assert inner.count() == 0
    anti = bucketed_join(
        left, right, on="k", right_on="rk",
        left_schema=L_SCHEMA, right_schema=R_SCHEMA, join_type="left anti",
    )
    assert sorted(r["k"] for r in anti.take_all()) == [1, 2]


def test_one_to_many(ray_session):
    left = _mk([[7, 7, 8], [1.0, 2.0, 3.0]], L_SCHEMA)
    right = _mk(
        [[7, 8], [__import__("datetime").datetime(2024, 1, 1)] * 2], R_SCHEMA
    )
    out = bucketed_join(
        left, right, on="k", right_on="rk",
        left_schema=L_SCHEMA, right_schema=R_SCHEMA,
    ).to_pandas()
    assert len(out) == 3  # both left rows with k=7 match


def test_validation_errors(ray_session):
    left = _mk([[1], [1.0]], L_SCHEMA)
    right = _mk([[1], [__import__("datetime").datetime(2024, 1, 1)]], R_SCHEMA)
    with pytest.raises(ValueError, match="power of two"):
        bucketed_join(
            left, right, on="k", right_on="rk",
            left_schema=L_SCHEMA, right_schema=R_SCHEMA, num_buckets=48,
        )
    with pytest.raises(TypeError, match="integer key"):
        bucketed_join(
            left, right, on="lv", right_on="rk",
            left_schema=L_SCHEMA, right_schema=R_SCHEMA,
        )
    overlap_r = pa.schema([("rk", pa.int64()), ("lv", pa.float64())])
    with pytest.raises(ValueError, match="overlapping"):
        bucketed_join(
            left, _mk([[1], [2.0]], overlap_r), on="k", right_on="rk",
            left_schema=L_SCHEMA, right_schema=overlap_r,
        )
