"""Distributed connected components (iterative min-label propagation).

The missing last step of every pairwise-dedup pipeline: LSH / Jaccard /
simhash emit *pairs*, but "keep one doc per duplicate CLUSTER" needs the
transitive closure — A~B and B~C must collapse A, B, C together even when
A and C never matched directly.  The reference has no graph surface at all
(its dedup story stops at per-key grouping); this implements the standard
distributed label-propagation algorithm (Kang et al., HCC/PEGASUS, ICDM'09)
on Ray Data primitives:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))     until fixpoint

Every iteration is two bounded exchanges — a bucketed hash join
(edges x labels, `pipelines/joins.bucketed_join`, sized off the edge count)
and a groupby-min whose shuffle is cut by a per-batch partial min — plus a
`materialize()` (an iterative algorithm MUST pin each round: branching a
lazy Dataset re-executes the whole parent chain, see CLAUDE.md).  The
convergence check is one scalar aggregate (labels only ever decrease, so
`sum(label)` is a strictly-decreasing potential until the fixpoint — no
join-against-previous needed).  Iterations needed = component diameter;
duplicate clusters are near-cliques, so 2-3 rounds in practice.

Scale notes: rows crossing any exchange are (int64, int64) pairs — text
never rides this shuffle; bucket counts derive from the edge-count estimate;
nothing materializes on the driver except the per-round scalar.  Small edge
sets (the common case: dedup pairs are sparse relative to the corpus) take
a byte-bounded driver union-find fast path instead — the same hybrid
small-side/bucketed split the minhash verifier uses.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def union_find_components(a, b) -> tuple[list[int], list[int]]:
    """Pure union-find (path compression, union-by-min) over parallel edge
    arrays.  Returns (sorted nodes, component id per node) where the
    component id is the MIN node id of the component.  Kept pure (no Ray,
    no Arrow) so its invariants are hypothesis-fuzzable against a BFS
    reference."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(a, b):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            # union by MIN id so the representative is the component min
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = sorted(parent)
    return nodes, [find(n) for n in nodes]


def _driver_union_find(sym: ray.data.Dataset) -> ray.data.Dataset:
    """Small-graph fast path: union-find on the driver.  Near-dup edge sets
    are tiny relative to the corpus (pairs, not docs); below the
    byte-bounded limit a single driver pass beats 3-5 rounds of distributed
    jobs by ~50x wall-clock (measured: 67s of iteration overhead for a
    256-edge graph at sf0.1)."""
    import ray as _ray

    # an empty shuffle block can arrive with a DEGRADED (column-less)
    # schema — seen only once inputs split into enough blocks (sf1-shape
    # sweep, round 4); drop empties before concat or the schema unification
    # fails.  An empty block can ALSO arrive as a raw pandas DataFrame:
    # Ray skips the upstream pyarrow-format UDF on empty blocks, so a
    # pandas-block producer (e.g. the near-dup map_groups) leaks its empty
    # frames through to_arrow_refs untyped — coerce before filtering.
    raw = _ray.get(sym.to_arrow_refs())
    tables = []
    for t in raw:
        if isinstance(t, pd.DataFrame):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    t = pa.concat_tables(tables)
    nodes, comp = union_find_components(
        t["src"].to_numpy(zero_copy_only=False).tolist(),
        t["dst"].to_numpy(zero_copy_only=False).tolist(),
    )
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()), "component": pa.array(comp, pa.int64())})
    )


def connected_components(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    est_edges: int | None = None,
    max_iters: int = 50,
    small_graph_limit: int = 1_000_000,
) -> ray.data.Dataset:
    """Connected components over an int64 edge list.

    ``edges`` needs each undirected edge ONCE in either direction; it is
    symmetrized here.  Returns a Dataset of (node, component) for every
    node appearing in an edge (isolated nodes are trivially their own
    component and never need to enter the shuffle), where ``component`` is
    the minimum node id of the component.

    Hybrid execution (the minhash-verify recipe): a graph whose symmetrized
    edge count is <= ``small_graph_limit`` (16-byte rows -> <=16 MB at the
    default) collapses in one driver union-find pass; larger graphs run the
    distributed propagation loop.  The branch is decided by the COUNT of
    the materialized edge list, never by an estimate.
    """
    from ..pipelines.joins import bucketed_join

    _EDGE_OUT = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def symmetrize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty blocks may arrive column-less from an upstream shuffle;
            # rebuild the declared schema instead of indexing into nothing
            return _EDGE_OUT.empty_table()
        a = pc.cast(batch[src], pa.int64()).combine_chunks()
        b = pc.cast(batch[dst], pa.int64()).combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([a, b]).combine_chunks(),
                "dst": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    # pin the (symmetrized) edge list once: it is re-joined every round
    sym = edges.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_sym = sym.count()
    if n_sym == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    if n_sym <= small_graph_limit:
        return _driver_union_find(sym)
    n_edges = est_edges if est_edges is not None else n_sym

    def init_labels(batch: pa.Table) -> pa.Table:
        # per-batch distinct before the global distinct groupby
        t = pa.table({"node": batch["src"]})
        return t.group_by("node").aggregate([]).select(["node"])

    from ray.data.aggregate import Count, Min

    labels = (
        sym.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def partial_min(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by("node")
            .aggregate([("label", "min")])
            .rename_columns(["node", "label"])
        )

    prev_potential: int | None = None
    converged = False
    for _ in range(max_iters):
        # candidate labels: each edge forwards its src's label to dst
        joined = bucketed_join(
            sym,
            labels,
            on="src",
            right_on="node",
            left_schema=_EDGE_SCHEMA,
            right_schema=_LABEL_SCHEMA,
            est_rows=n_edges,
        )
        cand = joined.map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = (
            cand.union(labels)
            .map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        potential = int(labels.sum("label"))
        if potential == prev_potential:
            converged = True
            break
        prev_potential = potential

    if not converged:
        # a component with diameter > max_iters hops would carry WRONG
        # labels if we returned silently (ADVICE r3): min-label propagation
        # only guarantees the fixpoint when the potential stabilizes.
        raise RuntimeError(
            f"connected_components: label propagation did not converge in "
            f"{max_iters} iterations (graph diameter likely exceeds "
            f"max_iters); raise max_iters"
        )
    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def dup_components(sf_dir: str, *, threshold: float = 0.6) -> ray.data.Dataset:
    """Duplicate CLUSTERS of the documents table: connected components over
    the exact n-gram-Jaccard pair graph (``dedup.ngram_jaccard_pairs``) —
    the pairs-to-clusters consolidation a dedup pipeline runs before
    keeping one representative per cluster."""
    from ..scale import estimate_rows
    from .dedup import ngram_jaccard_pairs

    edges = ngram_jaccard_pairs(sf_dir, threshold=threshold).select_columns(
        ["doc_a", "doc_b"]
    )
    comp = connected_components(
        edges,
        src="doc_a",
        dst="doc_b",
        # pair count is unknown pre-run; the doc count is a fine bucket-count
        # driver (pairs per doc are near-constant for near-dup graphs)
        est_edges=estimate_rows(sf_dir, "documents"),
    )
    return comp.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["component"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("doc_id")


def dup_components_sql(threshold: float = 0.6, shingle_k: int = 3) -> str:
    """DuckDB oracle: the same pair graph (``ngram_jaccard_sql``) closed
    transitively with a recursive CTE (min reachable node id per node)."""
    from .dedup import ngram_jaccard_sql

    pair_sql = ngram_jaccard_sql(threshold=threshold, shingle_k=shingle_k)
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({pair_sql}) p),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS v FROM edges),
walk(v, lbl) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.v
)
SELECT v AS doc_id, CAST(min(lbl) AS BIGINT) AS component
FROM walk GROUP BY v ORDER BY doc_id
"""


def dedup_cluster_docs(sf_dir: str, *, threshold: float = 0.6) -> ray.data.Dataset:
    """MATERIALIZED near-dup dedup: the documents table with every
    near-duplicate CLUSTER collapsed to its min-doc_id representative —
    what the training run reads after near-dup removal (the cluster-level
    counterpart of ``dedup.dedup_exact_docs``).

    Drop-set = cluster members that are NOT their component's min (tiny:
    one int per clustered doc).  Survivors come from an ANTI join of the
    documents scan against the drop-set through the bucketed shuffle —
    texts cross the exchange exactly once, ids-only on the other side,
    nothing reaches the driver."""
    from ..pipelines.joins import bucketed_join
    from ..scale import estimate_rows
    from ..sources.pages import read_table

    comp = dup_components(sf_dir, threshold=threshold)
    drop = comp.map_batches(
        lambda b: b.filter(pc.not_equal(b["doc_id"], b["component"])).select(["doc_id"]).rename_columns(["drop_doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = bucketed_join(
        docs,
        drop,
        on="doc_id",
        right_on="drop_doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("drop_doc_id", pa.int64())]),
        join_type="left anti",
        est_rows=estimate_rows(sf_dir, "documents"),
    )
    return out.sort("doc_id")


def dedup_cluster_docs_sql(threshold: float = 0.6, shingle_k: int = 3) -> str:
    """DuckDB oracle: drop every node of the recursive-CTE component graph
    that is not its component's min id."""
    comp_sql = dup_components_sql(threshold=threshold, shingle_k=shingle_k)
    return f"""
SELECT doc_id, text FROM documents
WHERE doc_id NOT IN (
  SELECT doc_id FROM ({comp_sql}) c WHERE doc_id <> component
)
ORDER BY doc_id
"""


def dup_cluster_size_histogram(sf_dir: str, *, threshold: float = 0.6) -> ray.data.Dataset:
    """Duplicate-cluster SIZE distribution — the dedup health report every
    corpus audit prints (a fat tail of giant clusters means boilerplate or
    a crawler loop, not legitimate near-dups).  Two tiny folds over the
    components output: component -> size, size -> n_clusters; both key
    spaces are bounded by the (already small) duplicate-cluster count."""
    from ray.data.aggregate import Count

    comp = dup_components(sf_dir, threshold=threshold)
    sizes = comp.groupby("component").aggregate(Count(alias_name="size"))
    return (
        sizes.groupby("size")
        .aggregate(Count(alias_name="n_clusters"))
        .map_batches(
            lambda b: (
                pa.schema([("size", pa.int64()), ("n_clusters", pa.int64())]).empty_table()
                if b.num_rows == 0 or b.num_columns == 0
                else pa.table(
                    {
                        "size": pc.cast(b["size"], pa.int64()),
                        "n_clusters": pc.cast(b["n_clusters"], pa.int64()),
                    }
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("size")
    )


def dup_cluster_size_histogram_sql(threshold: float = 0.6, shingle_k: int = 3) -> str:
    return f"""
WITH comp AS ({dup_components_sql(threshold=threshold, shingle_k=shingle_k).replace("ORDER BY doc_id", "")})
SELECT size, count(*) AS n_clusters
FROM (SELECT component, count(*) AS size FROM comp GROUP BY component)
GROUP BY size ORDER BY size
"""
