"""Cross-run determinism: the queries whose plans LOOK stochastic
(hash sampling, bootstrap weights, LSH banding, systematic sampling,
shuffle ordering) must return BIT-IDENTICAL results on a second execution
in the same session — the property the driver's value-hash gate and every
resume path depend on.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

DOUBLE_RUN = [
    "pps_sample_orders",        # systematic PPS selection
    "bootstrap_ci_value",       # deterministic double-or-nothing weights
    "mixture_sample",           # exact-rational source mixing
    "epoch_shuffle_order",      # global training order
    "ab_median_uplift",         # Lehmer arm split
    "labeled_pair_sample",      # Lehmer anchors x partners
    "adamic_adar_part_pairs",   # bucketed top-k fold over pair hashes
    "term_dispersion_dp",       # materialize()d branch point
]


@pytest.mark.parametrize("name", DOUBLE_RUN)
def test_second_run_bit_identical(ray_session, name):
    import __ray_entry__

    q = __ray_entry__.queries()[name]

    def run() -> pd.DataFrame:
        import pyarrow as pa
        import ray.data

        r = q(SF)
        if isinstance(r, ray.data.Dataset):
            r = r.to_pandas()
        elif isinstance(r, pa.Table):
            r = r.to_pandas()
        return r.reset_index(drop=True)

    a, b = run(), run()
    pd.testing.assert_frame_equal(a, b, check_exact=True)
