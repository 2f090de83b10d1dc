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


def test_null_keys_sql_semantics(ray_session):
    """NULL keys never match (SQL): inner drops them, left-anti keeps the
    left rows."""
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 2], pa.int64()), "lv": pa.array([10, 20, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, None], pa.int64()), "rv": pa.array([100, 200], pa.int64())})
    )
    ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rs = pa.schema([("rk", pa.int64()), ("rv", pa.int64())])
    inner = bucketed_join(left, right, on="k", right_on="rk", left_schema=ls, right_schema=rs).to_pandas()
    assert inner["lv"].tolist() == [10]
    anti = bucketed_join(
        left, right, on="k", right_on="rk", left_schema=ls, right_schema=rs, join_type="left anti"
    ).to_pandas()
    assert sorted(anti["lv"]) == [20, 30]  # null-key and unmatched rows kept


def test_property_matches_pandas_merge(ray_session):
    """Randomized cross-check vs pandas for inner / left anti / left semi,
    with duplicate keys on both sides."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    for trial in range(4):
        nl, nr = rng.randint(1, 200), rng.randint(1, 60)
        lk = rng.randint(0, 40, size=nl)
        rk = rng.randint(0, 40, size=nr)
        ldf = pd.DataFrame({"k": lk, "lv": np.arange(nl)})
        rdf = pd.DataFrame({"rk": rk, "rv": np.arange(nr) * 7})
        ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
        rs = pa.schema([("rk", pa.int64()), ("rv", pa.int64())])
        left = ray.data.from_arrow(pa.Table.from_pandas(ldf, schema=ls))
        right = ray.data.from_arrow(pa.Table.from_pandas(rdf, schema=rs))

        inner = bucketed_join(
            left, right, on="k", right_on="rk", left_schema=ls, right_schema=rs
        ).to_pandas()
        want = ldf.merge(rdf, left_on="k", right_on="rk")[["k", "lv", "rv"]]
        got = inner.sort_values(["k", "lv", "rv"], ignore_index=True)
        want = want.sort_values(["k", "lv", "rv"], ignore_index=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        anti = bucketed_join(
            left, right, on="k", right_on="rk", left_schema=ls, right_schema=rs,
            join_type="left anti",
        ).to_pandas()
        want_anti = ldf[~ldf["k"].isin(rdf["rk"])]
        assert sorted(anti["lv"]) == sorted(want_anti["lv"])

        semi = bucketed_join(
            left, right, on="k", right_on="rk", left_schema=ls, right_schema=rs,
            join_type="left semi",
        ).to_pandas()
        want_semi = ldf[ldf["k"].isin(rdf["rk"])]
        assert sorted(semi["lv"]) == sorted(want_semi["lv"])


def test_bloom_prefilter_prunes_before_shuffle(ray_session):
    """The bloom prefilter must actually drop non-matching fact rows before
    the exchange, and refuse join types that keep unmatched left rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest

    from docling_jobkit_ray.pipelines.joins import bloom_prefiltered_join, key_bloom
    from docling_jobkit_ray.sources.pages import read_table

    sf = "/root/testdata/sf0.001"
    big_items = read_table(sf, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], pa.scalar(49.0)))
        .select(["l_orderkey"])
        .group_by("l_orderkey")
        .aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_selective = big_items.count()
    n_orders = read_table(sf, "orders", columns=["o_orderkey"]).count()
    assert n_selective < n_orders * 0.2  # genuinely selective right side

    # the filter itself: every right key hits, pruned size is near the
    # selective-set size (bloom FPs allow a small overshoot)
    import numpy as np

    bloom_bytes, m_bits, k_hashes = key_bloom(big_items, "l_orderkey")
    from docling_jobkit_ray.functions.bloom import _positions

    bloom = np.frombuffer(bloom_bytes, np.uint8)
    right_keys = np.array([r["l_orderkey"] for r in big_items.take_all()], np.int64)
    pos = _positions(right_keys.view(np.uint64), k_hashes, m_bits)
    assert (((bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)).all()

    # the PRUNING itself: probing every orderkey keeps roughly the
    # selective set — an all-ones (broken) filter would keep all orders
    all_keys = np.array(
        [r["o_orderkey"] for r in read_table(sf, "orders", columns=["o_orderkey"]).take_all()],
        np.int64,
    )
    pos_all = _positions(all_keys.view(np.uint64), k_hashes, m_bits)
    kept = (((bloom[pos_all >> 3] >> (pos_all & 7).astype(np.uint8)) & 1).all(axis=1)).sum()
    # lower bound is the DISTINCT selective keys that actually exist in
    # orders (big_items dedupes per batch only, and the synthetic data
    # does not enforce the FK)
    n_matching = int(np.isin(np.unique(right_keys), all_keys).sum())
    assert n_matching <= kept <= n_matching + max(5, int(0.01 * len(all_keys)))
    assert kept < len(all_keys) * 0.5  # genuinely pruned

    with pytest.raises(ValueError, match="left outer"):
        bloom_prefiltered_join(
            read_table(sf, "orders", columns=["o_orderkey"]),
            big_items,
            on="o_orderkey",
            right_on="l_orderkey",
            left_schema=pa.schema([("o_orderkey", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64())]),
            join_type="left outer",
        )


def test_coordinated_sample_join_commutes(ray_session):
    """Join-of-samples == sample-of-join: filtering the FULL join by the
    same orderkey rule gives the identical aggregate — the estimator
    property coordinated sampling exists for."""
    import duckdb
    import pandas as pd

    from docling_jobkit_ray.pipelines.joins import (
        _CSJ_A,
        _CSJ_M,
        _CSJ_THR,
        coordinated_sample_join,
    )

    sf = "/root/testdata/sf0.001"
    got = coordinated_sample_join(sf).to_pandas()
    assert len(got) > 0  # non-vacuous at driver scale
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(
        f"""
        SELECT o_orderpriority,
               count(DISTINCT o_orderkey) AS n_orders,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_c4
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE ((o_orderkey % {_CSJ_M}) * {_CSJ_A}) % {_CSJ_M} < {_CSJ_THR}
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"n_orders": "int64", "n_items": "int64", "revenue_c4": "int64"}),
    )
