"""CLI entry point: the `ray job submit`-shaped launch path, driven as a
subprocess (the CLI owns its own Ray session)."""

from __future__ import annotations

import glob
import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    from docling_jobkit_ray.fixtures.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("cli_corpus"))
    write_corpus(out, n_rows=60, seed=11, n_shards=2)
    return out


def _run_cli(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "docling_jobkit_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_checkpointed_run_with_new_options(small_corpus, tmp_path):
    out = str(tmp_path / "out")
    totals = _run_cli(
        "--input", small_corpus,
        "--output", out,
        "--mode", "fused",
        "--num-cpus", "2",
        "--document-timeout", "60",
        "--retry-attempts", "2",
    )
    assert totals, "CLI must print a totals JSON line"
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert n == 60


def test_cli_page_range_parse_error(small_corpus, tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "docling_jobkit_ray.cli",
         "--input", small_corpus, "--output", str(tmp_path / "o"),
         "--page-range", "nonsense"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert proc.returncode != 0
    assert "LO:HI" in proc.stderr


def test_cli_query_list(ray_session, capsys):
    from docling_jobkit_ray.cli import main

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "revenue_by_nation\tsql" in out
    assert "extract_fused\trows" in out


def test_cli_query_runs_pipeline(ray_session, capsys):
    import ray

    from docling_jobkit_ray.cli import main

    assert main(["query", "revenue_by_nation", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert '"query": "revenue_by_nation"' in out
    assert ray.is_initialized()  # the CLI must not tear down the caller's session
