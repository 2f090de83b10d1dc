"""Product-quantization ANN (functions/similarity.py knn_pq / pq_encode).

PQ is approximate by construction; the contracts tested are (a) codes are
m bytes per vector with deterministic encoding, (b) ADC + exact re-rank
reaches full recall on the driver corpus at the default settings (random
uniform vectors — PQ's adversarial case), (c) raw-ADC recall improves
monotonically with codebook resolution, and (d) the ADC code-matrix reader
is exact for both fixed-size and plain binary columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return set(zip(df["query_id"], df["vec_id"]))


def test_pq_encode_shape_and_determinism(ray_session):
    from docling_jobkit_ray.functions.similarity import pq_encode

    a = pq_encode(SF, m_subspaces=8, n_codes=16).to_pandas().sort_values("vec_id")
    b = pq_encode(SF, m_subspaces=8, n_codes=16).to_pandas().sort_values("vec_id")
    assert (a["codes"].map(len) == 8).all()
    assert list(a["codes"]) == list(b["codes"])  # deterministic training
    # codes actually compress: 8 bytes vs 64*4 float bytes
    assert len(a) > 0


def test_pq_refined_matches_brute_force(ray_session):
    from docling_jobkit_ray.functions.similarity import knn_brute_force, knn_pq

    bf = knn_brute_force(SF, k=5, n_queries=3).to_pandas()
    pq_res = knn_pq(SF, k=5, n_queries=3).to_pandas()
    want, got = _pairs(bf), _pairs(pq_res)
    assert len(got & want) / len(want) == 1.0
    # refined scores are EXACT cosines: equal to brute force per pair
    bf_score = {(q, v): s for q, v, s in zip(bf["query_id"], bf["vec_id"], bf["cosine"])}
    for q, v, s in zip(pq_res["query_id"], pq_res["vec_id"], pq_res["cosine"]):
        assert abs(bf_score[(q, v)] - s) < 1e-6


def test_pq_raw_adc_recall_improves_with_codes(ray_session):
    from docling_jobkit_ray.functions.similarity import knn_brute_force, knn_pq

    bf = _pairs(knn_brute_force(SF, k=5, n_queries=3).to_pandas())

    def recall(**kw):
        got = _pairs(knn_pq(SF, k=5, n_queries=3, refine=None, **kw).to_pandas())
        return len(got & bf) / len(bf)

    r_small = recall(m_subspaces=4, n_codes=8)
    r_big = recall(m_subspaces=32, n_codes=256)
    assert r_big >= r_small
    assert r_big >= 0.8  # 32 subspaces of 2 dims is near-lossless at 64d


def test_adc_codes_matrix_fixed_and_plain_binary():
    from docling_jobkit_ray.functions.similarity import PqAdcTopK

    books = np.zeros((4, 16, 2), dtype=np.float32)
    adc = PqAdcTopK(books, np.zeros((1, 8), np.float32), [0], 1)
    mat = np.arange(24, dtype=np.uint8).reshape(6, 4)
    fixed = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(4), 6, [None, pa.py_buffer(mat.tobytes())]
    )
    plain = pa.array([mat[i].tobytes() for i in range(6)], pa.binary())
    np.testing.assert_array_equal(adc._codes_matrix(fixed), mat)
    np.testing.assert_array_equal(adc._codes_matrix(plain), mat)
    # sliced fixed-size column must respect the array offset
    np.testing.assert_array_equal(adc._codes_matrix(fixed.slice(2, 3)), mat[2:5])


def test_pq_codebook_validation(ray_session):
    from docling_jobkit_ray.functions.similarity import _pq_codebooks

    # argument errors raise BEFORE the distributed sample scan
    with pytest.raises(ValueError, match="not divisible"):
        _pq_codebooks(SF, m_subspaces=7, n_codes=8)
    with pytest.raises(ValueError, match="uint8"):
        _pq_codebooks(SF, m_subspaces=8, n_codes=512)


def test_pq_encode_empty_batch():
    import numpy as np

    from docling_jobkit_ray.functions.similarity import PqEncode

    books = np.zeros((8, 16, 8), dtype=np.float32)
    out = PqEncode(books)(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert out.num_rows == 0 and out.column_names == ["vec_id", "codes"]


def test_bloom_shard_routing_uses_all_shards():
    """Non-power-of-two shard counts must still reach every shard (the
    round-3 off-by-one shift left the top shards permanently empty)."""
    import numpy as np

    from docling_jobkit_ray.functions.bloom import _shard_of

    # full-range 64-bit keys (np.randint caps at 2^63 and would leave the
    # top bit always 0, itself masking routing bugs)
    keys = np.frombuffer(np.random.RandomState(7).bytes(50_000 * 8), dtype=np.uint64)
    for n in (10, 16, 100):
        shards = _shard_of(keys, n)
        assert set(np.unique(shards)) == set(range(n)), f"n_shards={n}"


def test_ann_recall_report_invariants(ray_session):
    """recall in [0,1]; full-probe IVF is exhaustive (recall == 1); wider
    probes never lose recall per query; every method covers every query."""
    from docling_jobkit_ray.functions.similarity import ann_recall_report

    out = ann_recall_report("/root/testdata/sf0.001", k=5, n_queries=4).to_pandas()
    assert set(out["method"]) == {"ivf_probe1", "ivf_probe4", "ivf_full", "pq"}
    assert out.groupby("method")["query_id"].nunique().eq(4).all()
    assert out["recall_ppm"].between(0, 1_000_000).all()
    m = out.pivot(index="query_id", columns="method", values="recall_ppm")
    assert (m["ivf_full"] == 1_000_000).all()
    assert (m["ivf_probe4"] >= m["ivf_probe1"]).all()
