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


def _write_manifest(out_dir: str, rec: dict) -> None:
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{rec['shard_key']}.json")
    with open(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mdir, f"{rec['shard_key']}.json"))  # atomic


def run_extract_checkpointed(
    input_dir: str,
    out_dir: str,
    *,
    options: ExtractOptions | None = None,
    mode: str = "inline",
    concurrency=(1, 8),
    batch_size: int = 64,
) -> dict:
    """Run the extraction pipeline shard-by-shard with resume.

    Returns run-level metrics (aggregated over manifests, including shards
    completed by PREVIOUS runs — the metrics are durable, not in-memory,
    mirroring the reference's monotonic lifecycle counters,
    ``redis_helper.py:718-812``)."""
    import shutil

    options = options or ExtractOptions()
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    shards = list_shards(input_dir)
    n_skipped = 0

    for shard in shards:
        key = _shard_key(shard)
        if key in done:
            n_skipped += 1
            continue
        t0 = time.monotonic()
        ds = extract_pipeline(
            shard, options=options, mode=mode, concurrency=concurrency, batch_size=batch_size
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
