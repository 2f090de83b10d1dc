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
    p.add_argument(
        "--concurrency",
        type=int,
        default=None,
        help="actor-pool size; omit for the (faster) instance task pool",
    )
    p.add_argument("--max-bytes", type=int, default=None)
    p.add_argument(
        "--preset",
        default=None,
        help="named ExtractOptions preset (extract/presets.py); mutually "
        "exclusive with --max-bytes",
    )
    p.add_argument(
        "--pipeline",
        default="standard",
        choices=["standard", "vlm"],
        help="pipeline family: standard, or vlm (adds the per-page description stage)",
    )
    p.add_argument("--no-checkpoint", action="store_true", help="single pass, no manifest")
    p.add_argument(
        "--document-timeout",
        type=float,
        default=None,
        help="per-document wall-clock budget in seconds (expired docs "
        "dead-letter with category=timeout; reference document_timeout=300)",
    )
    p.add_argument(
        "--retry-attempts",
        type=int,
        default=0,
        help="bounded re-drives for retryable per-document failures",
    )
    p.add_argument("--retry-delay", type=float, default=0.0)
    p.add_argument(
        "--page-range",
        default=None,
        metavar="LO:HI",
        help="extract only this 1-based inclusive page range of binary docs",
    )
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

    if args.preset is not None:
        if args.max_bytes is not None:
            p.error("--preset and --max-bytes are mutually exclusive")
        from .extract.presets import get_preset

        options = get_preset(args.preset)
    elif args.max_bytes is not None:
        options = ExtractOptions(max_bytes=args.max_bytes)
    else:
        options = ExtractOptions()
    overrides = {}
    if args.document_timeout is not None:
        overrides["document_timeout"] = args.document_timeout
    if args.retry_attempts:
        overrides["retry_attempts"] = args.retry_attempts
    if args.retry_delay:
        overrides["retry_delay"] = args.retry_delay
    if args.page_range is not None:
        try:
            lo, hi = args.page_range.split(":")
            overrides["page_range"] = (int(lo), int(hi))
        except ValueError:
            p.error("--page-range must be LO:HI (1-based inclusive)")
    if overrides:
        import dataclasses

        try:
            options = dataclasses.replace(options, **overrides)
        except ValueError as exc:  # boundary validation (e.g. page_range 0:5)
            p.error(str(exc))
    concurrency = (1, args.concurrency) if args.concurrency else None
    try:
        if args.no_checkpoint:
            from .pipelines.extract import extract_pipeline

            ds = extract_pipeline(
                args.input,
                options=options,
                mode=args.mode,
                pipeline=args.pipeline,
                batch_size=args.batch_size,
                concurrency=concurrency,
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
                pipeline=args.pipeline,
                concurrency=concurrency,
                batch_size=args.batch_size,
            )
        print(json.dumps(totals))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
