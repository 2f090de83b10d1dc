"""CLI entry point: run an extraction job over a pages parquet directory.

The analogue of the reference's ``docling-jobkit-local`` /
``docling-jobkit-multiproc`` CLIs (``cli/local.py:33-109``,
``cli/multiproc.py:371-490``), reduced to what a Ray-Data engine needs:
input dir, output dir, mode, resources.  Checkpointed by default (resume by
re-running with the same output dir).

Usage::

    python -m docling_jobkit_ray.cli --input /data/pages --output /data/out \
        --mode fused --num-cpus 32
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Ray-Data-native extraction job")
    p.add_argument("--input", required=True, help="directory of pages parquet shards")
    p.add_argument("--output", required=True, help="output directory (checkpointed)")
    p.add_argument(
        "--mode",
        default="fused",
        choices=["fused", "inline", "sliced", "size_bucketed"],
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--max-bytes", type=int, default=64 * 1024 * 1024)
    p.add_argument("--no-checkpoint", action="store_true", help="single pass, no manifest")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .extract.record import ExtractOptions

    options = ExtractOptions(max_bytes=args.max_bytes)
    try:
        if args.no_checkpoint:
            from .pipelines.extract import extract_pipeline

            ds = extract_pipeline(
                args.input,
                options=options,
                mode=args.mode,
                batch_size=args.batch_size,
                concurrency=(1, args.concurrency),
            )
            ds.write_parquet(args.output)
            totals = {"docs": "written", "output": args.output}
        else:
            from .state.checkpoint import run_extract_checkpointed

            totals = run_extract_checkpointed(
                args.input,
                args.output,
                options=options,
                mode=args.mode,
                concurrency=(1, args.concurrency),
                batch_size=args.batch_size,
            )
        print(json.dumps(totals))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
