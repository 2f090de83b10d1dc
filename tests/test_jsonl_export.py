"""JSONL shard export (stages/export.export_jsonl_shards): readback
parity, commit protocol, torn-staging recovery."""

from __future__ import annotations

import json
import os

import duckdb


def test_jsonl_roundtrip_and_commit(ray_session, tmp_path):
    import ray

    from docling_jobkit_ray.sources.pages import read_table
    from docling_jobkit_ray.stages.export import export_jsonl_shards

    ds = read_table("/root/testdata/sf0.001", "documents", columns=["doc_id", "lang"])
    out = str(tmp_path / "docs_jsonl")
    res = export_jsonl_shards(ds, out)
    assert res["committed"] and res["rows"] == 500
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = duckdb.sql(
        f"SELECT count(*) AS n, count(DISTINCT doc_id) AS d FROM read_json_auto('{out}/*.json')"
    ).fetchone()
    assert back == (500, 500)
    # replay is a no-op
    res2 = export_jsonl_shards(ds, out)
    assert res2["rows"] == 500 and res2["committed"] is False


def test_jsonl_torn_staging_recovery(ray_session, tmp_path):
    import ray

    from docling_jobkit_ray.sources.pages import read_table
    from docling_jobkit_ray.stages.export import export_jsonl_shards

    out = str(tmp_path / "docs_jsonl")
    staging = out + ".staging"
    os.makedirs(staging)
    with open(os.path.join(staging, "garbage.json"), "w") as fh:
        fh.write("{broken\n")
    ds = read_table("/root/testdata/sf0.001", "documents", columns=["doc_id"])
    res = export_jsonl_shards(ds, out)
    assert res["committed"] and res["rows"] == 500
    n = duckdb.sql(f"SELECT count(*) FROM read_json_auto('{out}/*.json')").fetchone()[0]
    assert n == 500  # garbage discarded with the torn staging dir


def test_ipc_shards_roundtrip(ray_session, tmp_path):
    import glob

    import pyarrow.feather as feather
    import ray.data

    from docling_jobkit_ray.stages.export import export_ipc_shards

    ds = ray.data.range(1000).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    out = str(tmp_path / "ipc")
    rep = export_ipc_shards(ds, out)
    assert rep["committed"] is True and rep["rows"] == 1000
    files = sorted(glob.glob(f"{out}/*.arrow"))
    assert len(files) == rep["files"] >= 1
    total = sum(len(feather.read_table(f)) for f in files)
    assert total == 1000
    # committed export replays as a no-op
    rep2 = export_ipc_shards(ds, out)
    assert rep2["committed"] is False and rep2["rows"] == 1000
