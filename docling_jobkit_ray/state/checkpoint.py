"""Per-partition checkpointed execution: resumable output + lineage + metrics.

Replaces the reference's durable Redis terminalization
(``/root/reference/docling_jobkit/orchestrators/ray/redis_helper.py:905-950``
atomic finalize, lease/heartbeat ``:1225-1330``) with a filesystem manifest:

- unit of work = one input shard (parquet file); output dir name is derived
  from the shard name, so a rerun maps shard -> same output (idempotent);
- output written to `<out>/.tmp-<shard>` then atomically renamed to
  `<out>/part-<shard>` — a crashed run never leaves a partial partition
  visible (write-temp-then-rename, SURVEY.md §7.3);
- one manifest JSON per completed shard in `<out>/_manifest/` with lineage
  (shard path, url count) and the north rule's counters (docs, bytes,
  parse_failures) + wall time;
- resume = list `_manifest/`, skip shards already recorded.

At 100 TB, a shard is a multi-GB parquet file and each shard run is itself a
streaming Ray Data pipeline; shards can also be processed K-at-a-time to
keep the cluster saturated while bounding re-do-on-crash work.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow.compute as pc

from ..extract.record import ExtractOptions
from ..pipelines.extract import extract_pipeline


def _shard_key(shard_path: str) -> str:
    return os.path.splitext(os.path.basename(shard_path))[0]


def list_shards(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def completed_shards(out_dir: str) -> dict[str, dict]:
    """-> {shard_key: manifest_record} for shards already finished."""
    done = {}
    for path in glob.glob(os.path.join(out_dir, "_manifest", "*.json")):
        with open(path) as f:
            rec = json.load(f)
        done[rec["shard_key"]] = rec
    return done


def _check_pipeline_consistent(done: dict, pipeline: str, out_dir: str) -> None:
    """Resume must not silently mix pipeline families: a shard completed
    under a different --pipeline would be skipped with the WRONG columns in
    its partition.  Fail loudly instead.  Manifests written before pipeline
    tracking are classified from the partition's actual parquet schema
    (vlm_json column present => vlm), not assumed standard."""
    import glob as _glob

    import pyarrow.parquet as _pq

    for rec in done.values():
        rec_pipeline = rec.get("pipeline")
        if rec_pipeline is None:  # legacy manifest: infer from the output
            part_files = _glob.glob(
                os.path.join(out_dir, rec["output_dir"], "*.parquet")
            )
            if not part_files:
                continue  # partition gone; shard will be re-done anyway
            names = _pq.read_schema(part_files[0]).names
            rec_pipeline = "vlm" if "vlm_json" in names else "standard"
        if rec_pipeline != pipeline:
            raise ValueError(
                f"output dir {out_dir!r} contains shards completed with "
                f"pipeline={rec_pipeline!r} (shard {rec['shard_key']!r}); "
                f"refusing to resume with pipeline={pipeline!r} — use a "
                f"fresh output dir"
            )


def _write_manifest(out_dir: str, rec: dict) -> None:
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{rec['shard_key']}.json")
    with open(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mdir, f"{rec['shard_key']}.json"))  # atomic


def run_extract_checkpointed_fused(
    input_dir: str,
    out_dir: str,
    *,
    options: ExtractOptions | None = None,
    pipeline: str = "standard",
    progress_callback=None,
) -> dict:
    """Checkpointed run as ONE Ray Dataset execution (the scale path).

    One fused task per pending shard: read shard -> extract -> write
    `part-<shard>` parquet (temp-then-rename, atomic) -> return ONE manifest
    row.  The driver only ever sees manifest rows (bytes-counted lineage),
    never document data — so 10^5 shards is one streaming execution with a
    tiny driver-side collect, instead of 10^5 separate pipeline launches.

    Crash safety: an output dir renamed into place without its manifest
    record is re-done (and overwritten) on the next run — outputs are
    idempotent per shard, the manifest is the commit point, mirroring the
    reference's atomic finalize (redis_helper.py:905-950).

    ``progress_callback(rec)`` (optional) is invoked on the driver per
    completed shard — the analogue of the reference's DocumentCompleted
    progress callbacks (orchestrators/callback_invoker.py:19-110).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.extract import ExtractDocuments
    from ..stages.extract import options_to_kwargs as _otk

    from ..stages.vlm import PIPELINES, get_describe_udf

    if pipeline not in PIPELINES:
        raise ValueError(f"unknown pipeline {pipeline!r}; known: {PIPELINES}")
    options = options or ExtractOptions()
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    _check_pipeline_consistent(done, pipeline, out_dir)
    shards = list_shards(input_dir)
    pending = [s for s in shards if _shard_key(s) not in done]
    opts_kwargs = _otk(options)
    abs_out = os.path.abspath(out_dir)
    vlm = pipeline == "vlm"

    def process_shard(batch) -> "pa.Table":
        import shutil as _sh

        udf = ExtractDocuments(opts_kwargs)
        # per-worker-cached model: loads once per worker process, not per
        # shard task (the task-pool substitute for actor __init__ state)
        describe = get_describe_udf() if vlm else None
        recs = {k: [] for k in ("shard_key", "shard_path", "docs", "parse_failures", "chars_out", "input_bytes", "wall_sec")}
        for p in batch["path"]:
            p = str(p)
            key = _shard_key(p)
            t0 = time.monotonic()
            t = pq.read_table(p, columns=["url", "html"])
            t = t.append_column("path", pa.array([p] * t.num_rows, pa.string()))
            out = udf(t)
            if describe is not None:  # vlm family: enrich in the same task
                out = describe(out)
            tmp_dir = os.path.join(abs_out, f".tmp-{key}")
            final_dir = os.path.join(abs_out, f"part-{key}")
            _sh.rmtree(tmp_dir, ignore_errors=True)
            os.makedirs(tmp_dir)
            pq.write_table(out, os.path.join(tmp_dir, "data.parquet"))
            _sh.rmtree(final_dir, ignore_errors=True)
            os.replace(tmp_dir, final_dir)  # atomic publish of the partition
            status = out.column("status").to_pylist()
            recs["shard_key"].append(key)
            recs["shard_path"].append(p)
            recs["docs"].append(out.num_rows)
            recs["parse_failures"].append(sum(1 for s in status if s == "FAILURE"))
            recs["chars_out"].append(int(pc.sum(out["n_chars"]).as_py() or 0))
            recs["input_bytes"].append(os.path.getsize(p))
            recs["wall_sec"].append(round(time.monotonic() - t0, 3))
        return pa.table(
            {
                "shard_key": pa.array(recs["shard_key"], pa.string()),
                "shard_path": pa.array(recs["shard_path"], pa.string()),
                "docs": pa.array(recs["docs"], pa.int64()),
                "parse_failures": pa.array(recs["parse_failures"], pa.int64()),
                "chars_out": pa.array(recs["chars_out"], pa.int64()),
                "input_bytes": pa.array(recs["input_bytes"], pa.int64()),
                "wall_sec": pa.array(recs["wall_sec"], pa.float64()),
            }
        )

    if pending:
        ds = ray.data.from_items([{"path": p} for p in pending]).repartition(len(pending))
        manifest_rows = ds.map_batches(
            process_shard, batch_size=1, batch_format="numpy"
        ).take_all()
        # driver is the single manifest writer (commit point)
        for row in manifest_rows:
            rec = {
                **row,
                "output_dir": f"part-{row['shard_key']}",
                "mode": "fused",
                "pipeline": pipeline,
            }
            _write_manifest(out_dir, rec)
            done[rec["shard_key"]] = rec
            if progress_callback is not None:
                progress_callback(rec)

    return {
        "shards_total": len(shards),
        "shards_skipped_resume": len(shards) - len(pending),
        "docs": int(sum(r["docs"] for r in done.values())),
        "parse_failures": int(sum(r["parse_failures"] for r in done.values())),
        "input_bytes": int(sum(r["input_bytes"] for r in done.values())),
        "chars_out": int(sum(r["chars_out"] for r in done.values())),
    }


def run_extract_checkpointed(
    input_dir: str,
    out_dir: str,
    *,
    options: ExtractOptions | None = None,
    mode: str = "inline",
    pipeline: str = "standard",
    concurrency=None,
    batch_size: int = 64,
) -> dict:
    """Run the extraction pipeline shard-by-shard with resume.

    For mode='fused' this delegates to :func:`run_extract_checkpointed_fused`
    (one Dataset execution for ALL pending shards — the scale path); other
    modes run one pipeline per shard (useful when a shard itself is huge and
    needs the sliced/size_bucketed plan inside).

    Returns run-level metrics (aggregated over manifests, including shards
    completed by PREVIOUS runs — the metrics are durable, not in-memory,
    mirroring the reference's monotonic lifecycle counters,
    ``redis_helper.py:718-812``)."""
    if mode == "fused":
        return run_extract_checkpointed_fused(
            input_dir, out_dir, options=options, pipeline=pipeline
        )
    import shutil

    options = options or ExtractOptions()
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    _check_pipeline_consistent(done, pipeline, out_dir)
    shards = list_shards(input_dir)
    n_skipped = 0

    for shard in shards:
        key = _shard_key(shard)
        if key in done:
            n_skipped += 1
            continue
        t0 = time.monotonic()
        ds = extract_pipeline(
            shard,
            options=options,
            mode=mode,
            pipeline=pipeline,
            concurrency=concurrency,
            batch_size=batch_size,
        )
        tmp_dir = os.path.join(out_dir, f".tmp-{key}")
        final_dir = os.path.join(out_dir, f"part-{key}")
        shutil.rmtree(tmp_dir, ignore_errors=True)  # stale crash leftovers
        ds.write_parquet(tmp_dir)
        # counters from the just-written partition (cheap: local parquet)
        import ray.data

        out_ds = ray.data.read_parquet(tmp_dir, columns=["status", "n_chars"])

        def _partial_counts(t):
            import pyarrow as pa

            return pa.table(
                {
                    "docs": [t.num_rows],
                    "parse_failures": [
                        pc.sum(pc.cast(pc.equal(t["status"], "FAILURE"), "int64")).as_py() or 0
                    ],
                    "chars_out": [pc.sum(t["n_chars"]).as_py() or 0],
                }
            )

        agg = out_ds.map_batches(_partial_counts, batch_format="pyarrow").to_pandas()
        in_bytes = os.path.getsize(shard)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp_dir, final_dir)  # atomic publish
        rec = {
            "shard_key": key,
            "shard_path": shard,
            "output_dir": f"part-{key}",
            "docs": int(agg["docs"].sum()),
            "parse_failures": int(agg["parse_failures"].sum()),
            "chars_out": int(agg["chars_out"].sum()),
            "input_bytes": in_bytes,
            "wall_sec": round(time.monotonic() - t0, 3),
            "mode": mode,
            "pipeline": pipeline,
        }
        _write_manifest(out_dir, rec)
        done[key] = rec

    totals = {
        "shards_total": len(shards),
        "shards_skipped_resume": n_skipped,
        "docs": sum(r["docs"] for r in done.values()),
        "parse_failures": sum(r["parse_failures"] for r in done.values()),
        "input_bytes": sum(r["input_bytes"] for r in done.values()),
        "chars_out": sum(r["chars_out"] for r in done.values()),
    }
    return totals
