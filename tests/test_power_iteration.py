"""Distributed power iteration (similarity.embedding_top_component):
eigenvector parity vs numpy, determinism, planted dominant direction."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq


def test_power_iteration_matches_numpy(ray_session):
    from docling_jobkit_ray.functions.similarity import embedding_top_component

    sf = "/root/testdata/sf0.001"
    w = embedding_top_component(sf, n_iter=80)
    import duckdb

    x = np.vstack(
        duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
        ).df()["embedding"]
    ).astype(np.float64)
    xc = x - x.mean(axis=0)
    evals = np.linalg.eigvalsh(xc.T @ xc)
    # random embeddings are near-isotropic (eigengap ~0.93 on this fixture),
    # so assert the RAYLEIGH QUOTIENT — it converges as gap^(2k) and is the
    # meaningful "found the top direction" measure when eigenVECTORS of
    # near-tied eigenvalues are ill-conditioned
    lam = float(w @ (xc.T @ (xc @ w)))
    assert np.linalg.norm(w) == pytest.approx(1.0, rel=1e-9)
    assert lam > 0.999 * evals[-1]
    # determinism
    w2 = embedding_top_component(sf, n_iter=80)
    assert np.array_equal(w, w2)


def test_power_iteration_planted_direction(ray_session, tmp_path):
    """Vectors stretched 20x along a known axis: the component must align
    with it."""
    rng = np.random.default_rng(0)
    d, n = 16, 400
    axis = np.zeros(d)
    axis[3] = 1.0
    x = rng.standard_normal((n, d)) + 20.0 * rng.standard_normal((n, 1)) * axis
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in x.astype(np.float32)]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    from docling_jobkit_ray.functions.similarity import embedding_top_component

    w = embedding_top_component(str(tmp_path))
    assert abs(w[3]) > 0.99
