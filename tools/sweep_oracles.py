"""sf1-shape oracle sweep (VERDICT r3 #2): run every SQL-backed query at a
block count ~10x the driver harness's, against the same DuckDB oracles.

Round 3 proved parity bugs can hide until inputs split into more blocks
(timestamp-key resolution through the shuffle, join row permutation —
commit a327960).  This sweep emulates an sf1-shaped layout WITHOUT needing
sf1 data:

* each sf0.1 table is rewritten into a multi-row-group parquet file
  (~24 row groups), so the READ itself produces many blocks;
* ``sources.pages._SPLIT_TABLES`` is patched x``--mult`` so every
  downstream stage runs at sf1-like width (lineitem: 32 -> 256 blocks).

Usage:  python tools/sweep_oracles.py [--src /root/testdata/sf0.1] [--mult 8]
Exit code 0 = all green.  Record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def rewrite_multi_rowgroup(src: str, dest: str, n_groups: int = 24) -> None:
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        sp, dp = f"{src}/{t}.parquet", f"{dest}/{t}.parquet"
        if os.path.exists(dp):
            continue
        tab = pq.read_table(sp)
        rg = max(1000, tab.num_rows // n_groups)
        pq.write_table(tab, dp, row_group_size=rg)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip", default="", help="comma-separated query names to skip")
    args = ap.parse_args()

    dest = f"/tmp/sfsweep_rg24_{os.path.basename(args.src.rstrip('/'))}"
    rewrite_multi_rowgroup(args.src, dest)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from docling_jobkit_ray.sources import pages

    pages._SPLIT_TABLES = {k: v * args.mult for k, v in pages._SPLIT_TABLES.items()}

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = (
        args.only.split(",") if args.only else [n for n in qs if n in oracles]
    )
    skip = set(args.skip.split(",")) if args.skip else set()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{dest}/{t}.parquet')"
        )

    failures: list[str] = []
    for name in names:
        if name in skip:
            print(f"SKIP  {name}")
            continue
        t0 = time.time()
        try:
            got_raw = qs[name](dest)
            import ray.data as rd
            import pyarrow as pa

            if isinstance(got_raw, rd.Dataset):
                got_raw = got_raw.to_pandas()
            elif isinstance(got_raw, pa.Table):
                got_raw = got_raw.to_pandas()
            want_raw = con.execute(oracles[name]).fetchdf()
            got, want = canon(got_raw), canon(want_raw)
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"{len(got)} rows != {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-12, atol=1e-12
            )
            print(f"OK    {name}  ({time.time() - t0:.1f}s, {len(got)} rows)")
        except Exception as e:  # noqa: BLE001 — sweep must report every query
            failures.append(name)
            msg = str(e).replace("\n", " | ")[:300]
            print(f"FAIL  {name}  ({time.time() - t0:.1f}s): {msg}")

    ran = [n for n in names if n not in skip]
    print(f"\n{len(ran) - len(failures)}/{len(ran)} green ({len(names) - len(ran)} skipped)")
    if failures:
        print("failures:", ",".join(failures))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
