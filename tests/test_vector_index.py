"""Persisted IVF vector index (functions/vector_index.py): build / probe /
append, partition pruning, full-probe == brute-force equivalence."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest


def _vec_table(n, dim, seed, id_lo=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    return vecs, pa.table(
        {
            "vec_id": pa.array(range(id_lo, id_lo + n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )


def _brute_topk(vecs, ids, queries, k):
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = norm(vecs) @ norm(queries).T
    out = {}
    for qi in range(queries.shape[0]):
        order = sorted(range(len(ids)), key=lambda i: (-sims[i, qi], ids[i]))[:k]
        out[qi] = [ids[i] for i in order]
    return out


def test_ivf_index_full_probe_matches_brute_force(ray_session, tmp_path):
    import ray.data

    from docling_jobkit_ray.functions.vector_index import (
        build_ivf_index,
        probe_ivf_index,
    )

    vecs, tbl = _vec_table(300, 16, seed=3)
    idx_dir = str(tmp_path / "ivf")
    rep = build_ivf_index(ray.data.from_arrow(tbl), idx_dir, n_cells=8)
    assert rep["n_cells"] == 8 and os.path.exists(os.path.join(idx_dir, "_meta.json"))

    queries = vecs[:3]
    got = probe_ivf_index(
        idx_dir, queries, [100, 101, 102], k=5, n_probe=8
    ).to_pandas()
    want = _brute_topk(vecs, list(range(300)), queries, 5)
    for qi, qid in enumerate((100, 101, 102)):
        mine = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert mine == want[qi], f"query {qid}: {mine} != {want[qi]}"
    # self-vector is rank 1 with cosine ~1
    assert got[got["rank"] == 1]["cosine"].min() > 0.999


def test_ivf_probe_prunes_partitions(ray_session, tmp_path):
    """n_probe=1 must read only ONE cell directory's files (the pruning
    that makes a 10^12-vector probe tractable) and still return the
    in-cell neighbors."""
    import ray.data

    from docling_jobkit_ray.functions import vector_index
    from docling_jobkit_ray.functions.vector_index import (
        build_ivf_index,
        probe_ivf_index,
    )

    vecs, tbl = _vec_table(400, 16, seed=5)
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_arrow(tbl), idx_dir, n_cells=8)

    seen_dirs = set()
    real_glob = glob.glob

    def spy_glob(pattern, *a, **kw):
        if "cell=" in pattern:
            seen_dirs.add(os.path.basename(os.path.dirname(pattern)))
        return real_glob(pattern, *a, **kw)

    vector_index.glob.glob = spy_glob
    try:
        out = probe_ivf_index(idx_dir, vecs[:1], [0], k=3, n_probe=1).to_pandas()
    finally:
        vector_index.glob.glob = real_glob
    assert len(seen_dirs) == 1  # exactly one partition touched
    assert out["vec_id"].iloc[0] == 0  # the query vector itself lives there


def test_ivf_append_is_immutable_and_probeable(ray_session, tmp_path):
    import ray.data

    from docling_jobkit_ray.functions.vector_index import (
        append_ivf_index,
        build_ivf_index,
        probe_ivf_index,
    )

    vecs, tbl = _vec_table(200, 16, seed=7)
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_arrow(tbl), idx_dir, n_cells=4)
    before = sorted(real := glob.glob(os.path.join(idx_dir, "cell=*", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in before}

    # append EXACT copies of the first 5 vectors under new ids: the probe
    # must find them at cosine ~1 next to their originals
    new_vecs = vecs[:5]
    _, new_tbl = _vec_table(5, 16, seed=99, id_lo=1000)
    new_tbl = new_tbl.set_column(
        1, "embedding", pa.array([v.tolist() for v in new_vecs], pa.list_(pa.float32()))
    )
    append_ivf_index(idx_dir, ray.data.from_arrow(new_tbl))

    after = sorted(glob.glob(os.path.join(idx_dir, "cell=*", "*.parquet")))
    assert set(before) <= set(after) and len(after) > len(before)
    assert all(os.path.getmtime(f) == mtimes[f] for f in before)  # immutable

    out = probe_ivf_index(idx_dir, new_vecs[:1], [0], k=2, n_probe=4).to_pandas()
    assert sorted(out["vec_id"].tolist()) == [0, 1000]  # original + appended copy
    assert (out["cosine"] > 0.999).all()


def test_ivf_probe_refuses_missing_meta(ray_session, tmp_path):
    from docling_jobkit_ray.functions.vector_index import probe_ivf_index

    with pytest.raises(FileNotFoundError):
        probe_ivf_index(str(tmp_path / "nope"), np.zeros((1, 4)), [0])
