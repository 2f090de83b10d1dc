"""exact_global_quantiles: driver pull stays bounded when the data is far
denser than the coarse bin width (VERDICT r3 "What's wrong #1" fix).

The round-3 refine collected every row of the rank-bearing bins under a
FIXED bin width; these tests inflate a synthetic orders table so that fixed
scheme would pull ~all rows, and assert the iterative refine keeps the
driver-collected row count under the budget while still producing EXACT
DuckDB ``quantile_disc`` thresholds."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _quantile_disc(vals: np.ndarray, qs: list[float]) -> np.ndarray:
    s = np.sort(vals)
    n = len(s)
    return np.array([s[math.ceil(q * n) - 1] for q in qs], dtype=np.float64)


def _write_orders(tmp_path, prices: np.ndarray) -> str:
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(len(prices)), pa.int64()),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        ),
        d / "orders.parquet",
    )
    return str(d)


QS = [i / 10 for i in range(1, 10)]


def test_dense_bin_refines_within_budget(ray_session, tmp_path):
    """300k rows all inside ONE coarse bin: the fixed-width scheme would
    collect all 300k; the refine must stay under the 5k budget."""
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    rng = np.random.default_rng(7)
    prices = rng.uniform(0.0, 500.0, size=300_000)  # one bin at width=1000
    sf = _write_orders(tmp_path, prices)
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    stats: dict = {}
    th = exact_global_quantiles(
        ds,
        "o_totalprice",
        QS,
        bin_width=1000.0,
        driver_row_budget=5_000,
        stats=stats,
    )
    assert stats["levels"] >= 1
    assert stats["rows_in_need"] <= 5_000
    assert stats["collected_rows"] <= 5_000
    np.testing.assert_array_equal(th, _quantile_disc(prices, QS))


def test_duplicate_heavy_bin_collapses_to_value_counts(ray_session, tmp_path):
    """A bin that CANNOT refine (50k duplicates of a handful of values)
    must still bound the driver pull: the final collect is value counts,
    so the pull equals the distinct-value count, not the row count."""
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    rng = np.random.default_rng(11)
    prices = rng.choice([10.0, 20.0, 30.0], size=50_000)
    sf = _write_orders(tmp_path, prices)
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    stats: dict = {}
    th = exact_global_quantiles(
        ds,
        "o_totalprice",
        QS,
        bin_width=1000.0,
        driver_row_budget=1_000,
        max_refine_levels=2,  # refinement can't split duplicates; cap the loop
        stats=stats,
    )
    assert stats["collected_rows"] <= 3  # distinct values, not 50k rows
    np.testing.assert_array_equal(th, _quantile_disc(prices, QS))


def test_multi_bin_spread_unchanged(ray_session, tmp_path):
    """The easy case (values spread over many bins, no refinement needed)
    still matches quantile_disc and records zero refine levels."""
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    rng = np.random.default_rng(3)
    prices = rng.uniform(0.0, 90_000.0, size=40_000)
    sf = _write_orders(tmp_path, prices)
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    stats: dict = {}
    th = exact_global_quantiles(
        ds, "o_totalprice", QS, bin_width=1000.0, driver_row_budget=100_000,
        stats=stats,
    )
    assert stats["levels"] == 0
    np.testing.assert_array_equal(th, _quantile_disc(prices, QS))


def test_empty_column_raises(ray_session, tmp_path):
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    sf = _write_orders(tmp_path, np.array([], dtype=np.float64))
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    with pytest.raises(ValueError, match="empty"):
        exact_global_quantiles(ds, "o_totalprice", QS)

def test_explicit_ranks_selects_order_statistics(ray_session, tmp_path):
    """The explicit-``ranks`` path (the grouped rank-selection hook used by
    orders_robust_stats): rank r must return the r-th smallest value, with
    refinement forced by a dense single-bin distribution."""
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    rng = np.random.default_rng(5)
    prices = rng.uniform(0.0, 800.0, size=120_000)
    sf = _write_orders(tmp_path, prices)
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    s = np.sort(prices)
    ranks = [1, 17, 60_000, 119_999, 120_000]
    stats: dict = {}
    th = exact_global_quantiles(
        ds, "o_totalprice", [], ranks=ranks,
        bin_width=1000.0, driver_row_budget=5_000, stats=stats,
    )
    assert stats["levels"] >= 1
    np.testing.assert_array_equal(th, s[np.array(ranks) - 1])


def test_explicit_ranks_validation(ray_session, tmp_path):
    from docling_jobkit_ray.pipelines.relational import exact_global_quantiles
    from docling_jobkit_ray.sources.pages import read_table

    sf = _write_orders(tmp_path, np.arange(100, dtype=np.float64))
    ds = read_table(sf, "orders", columns=["o_totalprice"])
    with pytest.raises(ValueError, match="ascending"):
        exact_global_quantiles(ds, "o_totalprice", [], ranks=[5, 3])
    with pytest.raises(ValueError, match="out of range"):
        exact_global_quantiles(ds, "o_totalprice", [], ranks=[1, 101])
