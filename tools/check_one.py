"""Ad-hoc single-query parity check: run a queries() entry and its oracle
SQL at one or more sf dirs and compare sorted values (the driver's
column-sorted hash compare, but with a visible diff).

Usage: python tools/check_one.py name[,name...] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(name: str, sf_dir: str) -> bool:
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](sf_dir)
    if hasattr(res, "to_pandas"):
        got = res.to_pandas()
    else:
        got = pd.DataFrame(res)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(oracles[name]).fetchdf()
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"  COLS  got={sorted(got.columns)} want={sorted(want.columns)}")
        return False
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    if len(g) != len(w):
        print(f"  ROWS  got={len(g)} want={len(w)}")
        ok = False
    else:
        for c in cols:
            gv, wv = g[c], w[c]
            try:
                pd.testing.assert_series_equal(
                    gv, wv.astype(gv.dtype), check_names=False
                )
            except Exception as e:
                print(f"  DIFF col {c}: {str(e).splitlines()[-1] if str(e) else e}")
                g_bad = gv[gv.astype(str) != wv.astype(str)].head(3)
                print(f"    got  {g_bad.to_dict()}")
                print(f"    want {wv[g_bad.index].to_dict()}")
                ok = False
    return ok


def main() -> int:
    names = sys.argv[1].split(",")
    dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    rc = 0
    for name in names:
        for d in dirs:
            ok = compare(name, d)
            print(f"{name} @ {d}: {'OK' if ok else 'MISMATCH'}")
            rc |= 0 if ok else 1
    ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
