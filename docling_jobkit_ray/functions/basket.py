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


# ---------------------------------------------------------------------------
# item-item co-occurrence similarity — the recsys "customers also bought"
# ---------------------------------------------------------------------------

_COOC_K = 5


def item_cooccurrence_topk(
    sf_dir: str, *, k: int = _COOC_K, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Top-k most-similar items per item by SQUARED cosine over order
    co-occurrence: sim2(a,b) = c_ab^2 / (c_a * c_b) in ppm — the
    item-item collaborative-filtering table ("customers who bought a also
    bought b"), kept exact by scoring the SQUARE of the cosine (no sqrt
    float ever enters; the ranking is identical since cosine >= 0).

    Plan: the SAME one-exchange count fold as the association rules
    (order-bucketed baskets, directed pair keys + item keys on one
    disjoint int64 domain), then the directed pairs — which already carry
    both (a,b) and (b,a) — ride ONE item-bucketed exchange where a
    vectorized lexsort + segment cumcount keeps each item's k best by
    (sim2 DESC, neighbor ASC).  ``c_ab^2 * 1e6`` is exact in int64 up to
    c_ab ~3e6 co-orders per pair (documented bound, same class as the
    rules' lift bound — the oracle diverges loudly past it).
    """
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
        m = df.merge(df, on="okey")
        m = m[m["part_x"] != m["part_y"]]
        pair_key = ((m["part_x"].to_numpy() + 1) << 32) + m["part_y"].to_numpy()
        pk, pn = np.unique(pair_key, return_counts=True)
        ik, in_ = np.unique(df["part"].to_numpy(), return_counts=True)
        keys = np.concatenate([pk, ik])
        ns = np.concatenate([pn, in_])
        return pa.table(
            {"key": pa.array(keys, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    counts = (
        li.map_batches(basket_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum(on="n", alias_name="n"))
        # item side and pair side BOTH read this — pin it (branching
        # re-executes the shared parent, CLAUDE.md)
        .materialize()
    )

    def small_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _COUNT_SCHEMA.empty_table()
        t = pa.table(
            {
                "key": pc.cast(batch["key"], pa.int64()),
                "n": pc.cast(batch["n"], pa.int64()),
            }
        )
        return t.filter(pc.less(t["key"], pa.scalar(2**32, pa.int64())))

    small = counts.map_batches(small_side, batch_format="pyarrow").take_all()
    item_keys = np.array([r["key"] for r in small], np.int64)
    item_ns = np.array([r["n"] for r in small], np.int64)
    order_item = np.argsort(item_keys)
    item_keys, item_ns = item_keys[order_item], item_ns[order_item]

    scored_schema = pa.schema(
        [("bucket", pa.int64()), ("item", pa.int64()), ("nbr", pa.int64()),
         ("cooc", pa.int64()), ("sim2_ppm", pa.int64())]
    )
    out_schema = pa.schema(
        [("item", pa.int64()), ("nbr", pa.int64()), ("cooc", pa.int64()),
         ("sim2_ppm", pa.int64()), ("rank", pa.int64())]
    )

    def score_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return scored_schema.empty_table()
        key = pc.cast(batch["key"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(batch["n"], pa.int64()).to_numpy(zero_copy_only=False)
        is_pair = key >= 2**32
        key, n = key[is_pair], n[is_pair]
        if len(key) == 0:
            return scored_schema.empty_table()
        a = (key >> 32) - 1
        b = key - ((a + 1) << 32)
        c_a = item_ns[np.searchsorted(item_keys, a)]
        c_b = item_ns[np.searchsorted(item_keys, b)]
        sim2 = n * n * 1_000_000 // (c_a * c_b)
        return pa.table(
            {
                "bucket": pa.array(a & (n_b - 1), pa.int64()),
                "item": pa.array(a, pa.int64()),
                "nbr": pa.array(b, pa.int64()),
                "cooc": pa.array(n, pa.int64()),
                "sim2_ppm": pa.array(sim2, pa.int64()),
            }
        )

    def topk_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return out_schema.empty_table()
        group = group.select(scored_schema.names).cast(scored_schema)
        item = np.asarray(group["item"], np.int64)
        nbr = np.asarray(group["nbr"], np.int64)
        cooc = np.asarray(group["cooc"], np.int64)
        sim2 = np.asarray(group["sim2_ppm"], np.int64)
        order = np.lexsort((nbr, -sim2, item))
        item, nbr, cooc, sim2 = item[order], nbr[order], cooc[order], sim2[order]
        # segment cumcount within each item run
        new_seg = np.concatenate([[True], item[1:] != item[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(len(item)), 0))
        rank = np.arange(len(item)) - seg_start + 1
        keep = rank <= k
        return pa.table(
            {
                "item": pa.array(item[keep], pa.int64()),
                "nbr": pa.array(nbr[keep], pa.int64()),
                "cooc": pa.array(cooc[keep], pa.int64()),
                "sim2_ppm": pa.array(sim2[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return (
        counts.map_batches(score_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(topk_bucket, batch_format="pyarrow")
        .sort(["item", "rank"])
    )


def item_cooccurrence_topk_sql(k: int = _COOC_K) -> str:
    return f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
item AS (SELECT p, count(*) AS c FROM b GROUP BY p),
ab AS (SELECT x.p AS item, y.p AS nbr, count(*) AS cooc
       FROM b x JOIN b y ON x.o = y.o AND x.p <> y.p
       GROUP BY x.p, y.p),
sc AS (SELECT ab.item, ab.nbr, ab.cooc,
              CAST(CAST(ab.cooc AS HUGEINT) * ab.cooc * 1000000
                   // (ia.c * ib.c) AS BIGINT) AS sim2_ppm
       FROM ab JOIN item ia ON ia.p = ab.item JOIN item ib ON ib.p = ab.nbr),
rk AS (SELECT *, row_number() OVER
         (PARTITION BY item ORDER BY sim2_ppm DESC, nbr) AS rank
       FROM sc)
SELECT item, nbr, CAST(cooc AS BIGINT) AS cooc, sim2_ppm, rank
FROM rk WHERE rank <= {k} ORDER BY item, rank
"""
