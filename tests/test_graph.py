"""Connected components (functions/graph.py): label propagation converges to
the transitive closure, and dup_components collapses pairwise matches into
clusters — including A~B~C chains where A and C never matched directly."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from docling_jobkit_ray.functions.graph import (
    connected_components,
    dup_components,
    dup_components_sql,
)


@pytest.mark.parametrize("small_graph_limit", [1_000_000, 0])
def test_components_crafted_graph(ray_session, small_graph_limit):
    # chain 1-2-3-4-5 (diameter 4 — needs >1 propagation round),
    # pair 10-11, triangle 20-21-22 with a redundant edge.
    # Runs BOTH execution paths: driver union-find (default limit) and
    # distributed label propagation (limit=0) — identical output required.
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3, 4, 10, 20, 21, 20], pa.int64()),
                "dst": pa.array([2, 3, 4, 5, 11, 21, 22, 22], pa.int64()),
            }
        )
    )
    out = connected_components(edges, small_graph_limit=small_graph_limit).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_star_skew_distributed(ray_session):
    """Hub-star graph through the DISTRIBUTED path: every symmetrized edge
    of the hub shares one join key, the classic label-propagation hot spot
    (why large-star/small-star exists).  The bucketed join concentrates the
    hub's rows in one bucket but the per-bucket work is a vectorized acero
    join, and min-propagation converges in 2 rounds (star diameter 2)."""
    import numpy as np

    n = 5000
    leaves = np.arange(1, n + 1, dtype=np.int64) * 3 + 100  # non-contiguous ids
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.full(n, 7, dtype=np.int64)),  # hub id 7
                "dst": pa.array(leaves),
            }
        )
    )
    out = connected_components(edges, small_graph_limit=0).to_pandas()
    assert len(out) == n + 1
    assert set(out["component"]) == {7}


def test_components_empty_edges(ray_session):
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    ds = connected_components(edges)
    assert ds.schema().names == ["node", "component"]
    assert ds.count() == 0


def _write_docs(d, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["test"] * len(texts), pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))


def test_dup_components_transitive_chain(ray_session, tmp_path):
    # B shares its first half with A and its second half with C; A and C
    # share nothing.  At a threshold passing the half-overlap pairs, the
    # PAIR list is {A-B, B-C}, but the CLUSTER must be {A, B, C}.
    half1 = " ".join(f"alpha{i}" for i in range(20))
    half2 = " ".join(f"beta{i}" for i in range(20))
    texts = [
        half1 + " onlya stub filler",  # doc 1 (A)
        half1 + " " + half2,  # doc 2 (B)
        half2 + " onlyc other words",  # doc 3 (C)
        "totally unrelated content nothing shared here at all",  # doc 4
    ]
    _write_docs(tmp_path, texts)

    from docling_jobkit_ray.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(str(tmp_path), threshold=0.3).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(1, 2), (2, 3)}

    comp = dup_components(str(tmp_path), threshold=0.3).to_pandas()
    got = dict(zip(comp["doc_id"], comp["component"]))
    # one cluster {1,2,3}; doc 4 is isolated (own component, not emitted)
    assert got == {1: 1, 2: 1, 3: 1}


def test_dup_components_matches_recursive_cte(ray_session, tmp_path):
    # engine vs DuckDB recursive-CTE oracle on a corpus with planted dups
    base = " ".join(f"tok{i}" for i in range(30))
    texts = [
        base,
        base + " extra",
        base + " extra more",
        "different document body entirely " + " ".join(f"z{i}" for i in range(25)),
        "different document body entirely " + " ".join(f"z{i}" for i in range(24)),
    ]
    _write_docs(tmp_path, texts)

    mine = dup_components(str(tmp_path)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(dup_components_sql()).fetchdf()
    pd.testing.assert_frame_equal(mine, oracle)
    assert len(mine) >= 4  # both planted clusters present


# ---------------------------------------------------------------------------
# PageRank: all three execution tiers produce the identical integer ranks
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _pagerank_oracle():
    from docling_jobkit_ray.functions.graph import pagerank_part_supplier_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return con.execute(pagerank_part_supplier_sql()).fetch_arrow_table()


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # tier 1: driver numpy (sf0.001 edges << limit)
        {"small_graph_limit": 0},  # tier 2: broadcast ranks
        {"small_graph_limit": 0, "node_budget": 0},  # tier 3: bucketed
    ],
    ids=["driver", "broadcast", "bucketed"],
)
def test_pagerank_tiers_match_oracle(ray_session, kwargs):
    from docling_jobkit_ray.functions.graph import pagerank_part_supplier

    got = pagerank_part_supplier(SF, **kwargs)
    if isinstance(got, ray.data.Dataset):
        got = pa.Table.from_pandas(got.to_pandas())
    want = _pagerank_oracle()
    assert got.cast(want.schema).equals(want)


def test_pagerank_ranks_sum_near_scale(ray_session):
    # total rank mass stays within N floor-losses of the scale constant
    from docling_jobkit_ray.functions.graph import pagerank_part_supplier

    t = pagerank_part_supplier(SF).to_pandas()
    total = int(t["rank_e12"].sum())
    # flooring loses up to deg(u)-1 per share and 1 per node per round —
    # bounded but graph-dependent; 1% of the scale constant is generous
    assert 0.99 * 10**12 <= total <= 10**12


def test_bfs_hops_tier_parity_and_truncation(ray_session, tmp_path):
    """Crafted chain graph: parts/suppliers alternate in a path so hops
    truncate at max_hops; the driver and distributed tiers agree with the
    recursive-CTE oracle exactly."""
    import duckdb
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.graph import (
        bfs_hops_part_supplier,
        bfs_hops_part_supplier_sql,
    )

    # chain: s1 - p1 - s10 - p2 - s11 - p3 - s12 - p4 - s13 (plus isolated
    # pair p9-s9): from seed s1, s13 sits at hop 8 > max_hops=4 -> excluded
    pairs = [(1, 1), (1, 10), (2, 10), (2, 11), (3, 11), (3, 12), (4, 12), (4, 13), (9, 9)]
    t = pa.table(
        {
            "l_partkey": pa.array([p for p, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = con.execute(bfs_hops_part_supplier_sql()).fetchdf()
    for kw in ({}, {"small_graph_limit": 0}):
        got = bfs_hops_part_supplier(str(tmp_path), **kw).to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
        )
    # seed s1 at hop 0; p1 hop 1; s10 hop 2; ... s12 hop 6 excluded;
    # within max_hops=4 the chain reaches p2 (hop 3) and s11 (hop 4)
    m = got.set_index(["node_type", "key"])["hop"]
    assert m[("supplier", 1)] == 0 and m[("part", 1)] == 1
    assert m[("supplier", 10)] == 2 and m[("part", 2)] == 3
    assert m[("supplier", 11)] == 4
    assert ("part", 3) not in m.index  # hop 5: beyond max_hops
    assert ("part", 9) not in m.index  # disconnected component
    # every hop is minimal: seed s1 also reaches p1 directly (1,1) even
    # though (1,10) offers a longer alternative
    assert m.max() <= 4 and m.min() == 0


def test_bfs_hops_sf0001_sql(ray_session):
    import duckdb

    from docling_jobkit_ray.functions.graph import (
        bfs_hops_part_supplier,
        bfs_hops_part_supplier_sql,
    )

    got = bfs_hops_part_supplier("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    want = con.execute(bfs_hops_part_supplier_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_bfs_hops_broadcast_tier_parity(ray_session):
    """The frontier-broadcast tier (forced via small_graph_limit=0) and the
    fully-bucketed tier (node_budget=0 too) agree with the driver tier."""
    from docling_jobkit_ray.functions.graph import bfs_hops_part_supplier

    base = bfs_hops_part_supplier("/root/testdata/sf0.001").to_pandas()
    bc = bfs_hops_part_supplier(
        "/root/testdata/sf0.001", small_graph_limit=0
    ).to_pandas()
    bk = bfs_hops_part_supplier(
        "/root/testdata/sf0.001", small_graph_limit=0, node_budget=0
    ).to_pandas()
    pd.testing.assert_frame_equal(base, bc)
    pd.testing.assert_frame_equal(base, bk)
