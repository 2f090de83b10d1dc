"""Compression-ratio quality signal (textstats.compression_ratio_scores):
redundant text compresses far better than high-entropy text; determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_compression_ratio_orders_redundancy(ray_session, tmp_path):
    from docling_jobkit_ray.functions.textstats import compression_ratio_scores

    rng = np.random.default_rng(5)
    redundant = "spam ham " * 300
    entropic = " ".join(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=8)) for _ in range(600)
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([redundant, entropic, ""], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = compression_ratio_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "ratio_ppm"] < out.loc[1, "ratio_ppm"] / 5
    assert out.loc[2, "ratio_ppm"] == 0 and out.loc[2, "raw_bytes"] == 0
    # determinism + bytes sanity
    again = compression_ratio_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.equals(again)
    assert out.loc[0, "raw_bytes"] == len(redundant.encode())


def test_compression_ratio_fixture(ray_session):
    from docling_jobkit_ray.functions.textstats import compression_ratio_scores

    out = compression_ratio_scores("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert (out.loc[out["raw_bytes"] > 0, "ratio_ppm"] > 0).all()
