"""Market-basket association rules over order baskets.

Support / confidence / lift for directed part pairs (a -> b) where the
basket is the set of distinct parts in one order — the classic
co-occurrence mining surface (the retail analogue of the text corpus's
PMI collocations, with per-rule direction and the support threshold that
PMI does not have).

Everything stays exact-integer: supports are counts, confidence and lift
are ppm by FLOOR division (``a * 1000000 // b`` — ``round()`` is hazardous
cross-engine, CLAUDE.md), so the DuckDB oracle hashes identically.

Scale shape — ONE all-to-all carries all three count classes:

- per-batch local ``(order, part)`` distinct, then an ORDER-bucketed
  exchange (an order's basket meets in one bucket);
- per bucket: exact basket dedup, directed-pair emission by vectorized
  self-merge, and THREE partial count classes on a single disjoint int64
  key domain — pair keys ``(a+1) * 2^32 + b`` (>= 2^32 even at partkey
  0), item keys ``part`` (< 2^32), and the order-count key ``-1`` — so one ``groupby(key).sum``
  folds supports, item supports, and N together (never a two-key groupby,
  never a second exchange);
- the folded counts materialize once; the item-support side is
  DIMENSION-bounded (one row per part) and broadcasts into the rule
  finisher as two sorted numpy arrays, while rules stream through a pure
  vectorized map.

Lift multiplies ``supp_ab * N * 1e6`` in int64 — exact up to ~9e18, which
holds to ~1e6 supports on ~1e9 orders; past that the finisher should
switch to a 128-bit path (documented bound, not a silent wrap: the oracle
would diverge loudly).

Reference parity: the reference has no analytics engine; this documents
the Ray-Data-native frequent-pair mining shape (SURVEY.md aggregation
family, next to pmi_collocations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MIN_SUPPORT = 3

_BASKET_SCHEMA = pa.schema(
    [("okey", pa.int64()), ("part", pa.int64()), ("bucket", pa.int64())]
)
_COUNT_SCHEMA = pa.schema([("key", pa.int64()), ("n", pa.int64())])


def basket_association_rules(
    sf_dir: str, *, min_support: int = _MIN_SUPPORT, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Directed association rules (a -> b) with ``supp_ab >= min_support``:
    columns ``a, b, supp_ab, conf_ppm, lift_ppm``, ordered by (a, b)."""
    from ray.data.aggregate import Sum

    from ..scale import bucket_count, estimate_rows
    from ..sources.pages import read_table

    est = estimate_rows(sf_dir, "lineitem")
    n_b = n_buckets or bucket_count(est)
    mask = pa.scalar(n_b - 1, pa.int64())

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def basket_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _BASKET_SCHEMA.empty_table()
        t = (
            pa.table({"okey": batch["l_orderkey"], "part": batch["l_partkey"]})
            .group_by(["okey", "part"])
            .aggregate([])
        )
        return t.append_column("bucket", pc.bit_wise_and(t["okey"], mask))

    def count_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return _COUNT_SCHEMA.empty_table()
        group = group.select(_BASKET_SCHEMA.names).cast(_BASKET_SCHEMA)
        df = group.select(["okey", "part"]).to_pandas().drop_duplicates()
        # directed pairs within each basket
        m = df.merge(df, on="okey")
        m = m[m["part_x"] != m["part_y"]]
        # +1 shift keeps the pair domain strictly >= 2^32 even for
        # partkey 0 (which otherwise collides with the item-key domain)
        pair_key = ((m["part_x"].to_numpy() + 1) << 32) + m["part_y"].to_numpy()
        pk, pn = np.unique(pair_key, return_counts=True)
        # item supports: distinct orders per part (orders are whole here)
        ik, in_ = np.unique(df["part"].to_numpy(), return_counts=True)
        n_orders = df["okey"].nunique()
        keys = np.concatenate([pk, ik, np.array([-1], np.int64)])
        ns = np.concatenate([pn, in_, np.array([n_orders], np.int64)])
        return pa.table(
            {"key": pa.array(keys, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    counts = (
        li.map_batches(basket_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum(on="n", alias_name="n"))
        # item supports and rules BOTH read this — pin it (branching
        # re-executes the shared parent, CLAUDE.md)
        .materialize()
    )

    # dimension-bounded side: one row per part, plus the N row at key -1
    def small_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _COUNT_SCHEMA.empty_table()
        return pa.table(
            {"key": pc.cast(batch["key"], pa.int64()),
             "n": pc.cast(batch["n"], pa.int64())}
        ).filter(pc.less(pc.cast(batch["key"], pa.int64()), pa.scalar(2**32, pa.int64())))

    small = counts.map_batches(small_side, batch_format="pyarrow").take_all()
    item_keys = np.array(
        [r["key"] for r in small if r["key"] >= 0], np.int64
    )
    item_ns = np.array([r["n"] for r in small if r["key"] >= 0], np.int64)
    order_item = np.argsort(item_keys)
    item_keys, item_ns = item_keys[order_item], item_ns[order_item]
    n_total = int(next(r["n"] for r in small if r["key"] == -1))

    out_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("supp_ab", pa.int64()),
            ("conf_ppm", pa.int64()),
            ("lift_ppm", pa.int64()),
        ]
    )
    min_s = pa.scalar(min_support, pa.int64())

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        t = batch.filter(
            pc.and_(
                pc.greater_equal(pc.cast(batch["key"], pa.int64()), pa.scalar(2**32, pa.int64())),
                pc.greater_equal(pc.cast(batch["n"], pa.int64()), min_s),
            )
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t["key"].to_numpy(zero_copy_only=False)
        s = t["n"].to_numpy(zero_copy_only=False)
        a = (key >> 32) - 1
        b = key - ((a + 1) << 32)
        supp_a = item_ns[np.searchsorted(item_keys, a)]
        supp_b = item_ns[np.searchsorted(item_keys, b)]
        conf = s * 1_000_000 // supp_a
        lift = s * n_total * 1_000_000 // (supp_a * supp_b)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "supp_ab": pa.array(s, pa.int64()),
                "conf_ppm": pa.array(conf, pa.int64()),
                "lift_ppm": pa.array(lift, pa.int64()),
            }
        )

    return (
        counts.map_batches(finish, batch_format="pyarrow")
        .sort(["a", "b"])
    )


def basket_association_rules_sql(min_support: int = _MIN_SUPPORT) -> str:
    return f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS cnt FROM b),
item AS (SELECT p, count(*) AS s FROM b GROUP BY p),
ab AS (SELECT x.p AS a, y.p AS b, count(*) AS s
       FROM b x JOIN b y ON x.o = y.o AND x.p <> y.p
       GROUP BY x.p, y.p)
SELECT ab.a, ab.b,
       CAST(ab.s AS BIGINT) AS supp_ab,
       CAST(ab.s * 1000000 // ia.s AS BIGINT) AS conf_ppm,
       CAST(ab.s * (SELECT cnt FROM n) * 1000000 // (ia.s * ib.s) AS BIGINT)
         AS lift_ppm
FROM ab
JOIN item ia ON ia.p = ab.a
JOIN item ib ON ib.p = ab.b
WHERE ab.s >= {min_support}
ORDER BY ab.a, ab.b
"""
