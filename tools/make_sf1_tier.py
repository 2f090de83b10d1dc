"""Synthesize a genuine 10x-ROWS tier from the sf0.1 testdata (no external
data): fact tables replicate 10x with offset primary keys, dimension tables
stay fixed — so every foreign key still resolves and both engines see the
same bytes.  Multi-row-group output so reads split into many blocks.

    python tools/make_sf1_tier.py [--dest /tmp/djr_sf1_full] [--mult 10]

Offsets: orders.o_orderkey / lineitem.l_orderkey shift by k*max+1 per
replica (order-lineitem joins stay consistent); events.event_id,
documents.doc_id, embeddings.vec_id shift likewise.  user_id / custkey /
suppkey / partkey domains are intentionally NOT scaled: 10x rows per key is
the realistic shape of a bigger crawl (more activity per user, more orders
per customer), and it stresses per-key skew paths.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(src: str, dest: str, mult: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in DIMS:
        dp = f"{dest}/{t}.parquet"
        if not os.path.exists(dp):
            pq.write_table(pq.read_table(f"{src}/{t}.parquet"), dp)
    # one consistent orderkey stride for orders AND lineitem
    strides: dict[str, int] = {}
    omax = pq.read_table(f"{src}/orders.parquet", columns=["o_orderkey"])
    strides["o_orderkey"] = strides["l_orderkey"] = (
        int(np.asarray(omax["o_orderkey"]).max()) + 1
    )
    for t, keys in FACTS.items():
        dp = f"{dest}/{t}.parquet"
        if os.path.exists(dp):
            continue
        tab = pq.read_table(f"{src}/{t}.parquet")
        for key in keys:
            if key not in strides:
                strides[key] = int(np.asarray(tab[key]).max()) + 1
        parts = []
        for k in range(mult):
            rep = tab
            for key in keys:
                idx = rep.column_names.index(key)
                shifted = pa.array(
                    np.asarray(rep[key], dtype=np.int64) + k * strides[key]
                )
                rep = rep.set_column(idx, key, shifted)
            parts.append(rep)
        big = pa.concat_tables(parts)
        pq.write_table(big, dp, row_group_size=max(4096, big.num_rows // 24))
        print(f"{t}: {big.num_rows} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="/tmp/djr_sf1_full")
    ap.add_argument("--mult", type=int, default=10)
    a = ap.parse_args()
    replicate(SRC, a.dest, a.mult)
    print("done:", a.dest)
