"""Simulated multi-node execution: the same pipelines on a 4-raylet cluster.

The sandbox cannot start real machines, but ``ray.cluster_utils.Cluster``
runs N separate raylets + object stores in one box — blocks genuinely
transfer between node object stores, which is the part of the N-node story
``ray.init(num_cpus=...)`` cannot exercise.  Byte-identical results across
1-node and 4-node topologies is the cross-node correctness evidence for the
north rule's fixed-size-cluster criterion (the throughput side is
bench.py --scaling).

Runs in a subprocess so the session-scoped local Ray fixture is untouched.
"""

from __future__ import annotations

import json
import subprocess
import sys

_SCRIPT = r"""
import json, sys
from ray.cluster_utils import Cluster
import ray
corpus = sys.argv[1]
cluster = Cluster(initialize_head=True, head_node_args={"num_cpus": 2, "object_store_memory": 400*1024*1024})
for _ in range(3):
    cluster.add_node(num_cpus=2, object_store_memory=400*1024*1024)
ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from docling_jobkit_ray.pipelines.extract import extract_pipeline
from docling_jobkit_ray.pipelines.relational import q1_pricing_summary
rows = extract_pipeline(corpus).select_columns(["url", "status", "n_chars"]).take_all()
digest = sorted((r["url"], r["status"], r["n_chars"]) for r in rows)
q1 = q1_pricing_summary("/root/testdata/sf0.001").to_pandas()
from docling_jobkit_ray.pipelines.relational import customers_without_orders, events_sessionize
sess = events_sessionize("/root/testdata/sf0.001").to_pandas()
anti = customers_without_orders("/root/testdata/sf0.001").to_pandas()
out = {
    "alive_nodes": len([n for n in ray.nodes() if n["Alive"]]),
    "n_rows": len(digest),
    "first": digest[0],
    "last": digest[-1],
    "n_chars_total": sum(d[2] for d in digest),
    "q1_rows": len(q1),
    "q1_count_order_sum": int(q1["count_order"].sum()),
    "sess_rows": len(sess),
    "sess_n_events_sum": int(sess["n_events"].sum()),
    "sess_sum_value_sum": round(float(sess["sum_value"].sum()), 2),
    "anti_rows": len(anti),
    "anti_key_sum": int(anti["c_custkey"].sum()),
}
# round-3 shuffle-heavy webtext + bloom ops across node boundaries
from docling_jobkit_ray.functions.webtext import duplicated_passages, decontaminate
from docling_jobkit_ray.functions.bloom import build_bloom_index, mark_seen
from docling_jobkit_ray.sources.pages import read_table
dp = duplicated_passages("/root/testdata/sf0.001").to_pandas()
dc = decontaminate("/root/testdata/sf0.001").to_pandas()
idx = build_bloom_index("/root/testdata/sf0.001", n_shards=8)
docs = read_table("/root/testdata/sf0.001", "documents", columns=["doc_id", "text"])
bl = mark_seen(docs, idx).to_pandas()
out.update({
    "dp_rows": len(dp),
    "dp_ndocs_sum": int(dp["n_docs"].sum()),
    "dc_rows": len(dc),
    "dc_cont_sum": int(dc["n_contaminated"].sum()),
    "bloom_seen": int(bl["probably_seen"].sum()),
    "bloom_rows": len(bl),
})
ray.shutdown(); cluster.shutdown()
print("RESULT " + json.dumps(out))
"""


def test_pipelines_on_simulated_4_node_cluster(ray_session, corpus_dir, corpus_oracle):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, corpus_dir],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    out = json.loads(line[len("RESULT "):])
    assert out["alive_nodes"] == 4
    # byte-level agreement with the single-process oracle
    assert out["n_rows"] == len(corpus_oracle)
    assert out["n_chars_total"] == sum(r["n_chars"] for r in corpus_oracle.values())
    assert out["q1_rows"] == 6
    # shuffle-heavy relational ops (bucketed sessionize groupby + bucketed
    # anti join) agree with the same pipelines on the session-local Ray —
    # the all-to-all exchange crosses real node object-store boundaries
    from docling_jobkit_ray.pipelines.relational import (
        customers_without_orders,
        events_sessionize,
    )

    sess = events_sessionize("/root/testdata/sf0.001").to_pandas()
    anti = customers_without_orders("/root/testdata/sf0.001").to_pandas()
    assert out["sess_rows"] == len(sess)
    assert out["sess_n_events_sum"] == int(sess["n_events"].sum())
    assert out["sess_sum_value_sum"] == round(float(sess["sum_value"].sum()), 2)
    assert out["anti_rows"] == len(anti)
    assert out["anti_key_sum"] == int(anti["c_custkey"].sum())
    # round-3 ops: hash-bucketed passage fold, broadcast decontamination,
    # tagged-union bloom probe — all byte-identical across topologies
    from docling_jobkit_ray.functions.webtext import decontaminate, duplicated_passages

    dp = duplicated_passages("/root/testdata/sf0.001").to_pandas()
    dc = decontaminate("/root/testdata/sf0.001").to_pandas()
    assert out["dp_rows"] == len(dp)
    assert out["dp_ndocs_sum"] == int(dp["n_docs"].sum())
    assert out["dc_rows"] == len(dc)
    assert out["dc_cont_sum"] == int(dc["n_contaminated"].sum())
    # bloom on the same corpus: every doc probes seen on the cluster too
    assert out["bloom_seen"] == out["bloom_rows"] > 0
