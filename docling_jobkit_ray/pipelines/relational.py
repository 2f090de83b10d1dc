"""Relational pipeline helpers over the driver testdata tables.

Each function takes ``sf_dir`` and lazily builds a Ray Data pipeline; the
matching DuckDB oracle SQL lives in ``__ray_entry__.oracle_sql``.  These are
the "standard query surface" of the engine (SURVEY.md §2.6-2.8): filters,
projections, grouped aggregates (with partial pre-aggregation), broadcast
joins, sort/top-k, distinct, window-bucketed aggregates.

Scale notes (100 TB discipline):
- every read prunes columns (`columns=[...]`);
- grouped aggregates pre-aggregate inside map_batches before the shuffle
  whenever the key cardinality is small (partial+final, like the reference's
  child-counter merge, ``serve_deployment.py:237-253``);
- small dimension tables are broadcast (read once on the driver, shipped in
  the UDF closure via the object store) instead of a shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _round_cols(cols: list[str], ndigits: int = 2):
    """Round float columns identically on both sides (use ONLY for per-row
    values; SUMS must use exact integer-cents arithmetic — see _descale —
    because cross-engine accumulation order shifts float sums across
    rounding boundaries)."""

    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.round(batch.column(c), ndigits=ndigits)
            )
        return batch

    return fn


def _descale(scales: dict[str, float]):
    """Divide exact int64-cent sum columns back to currency doubles: the
    same int / the same scale on both engines -> bitwise-identical."""

    def fn(batch: pa.Table) -> pa.Table:
        for c, s in scales.items():
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.divide(pc.cast(batch.column(c), pa.float64()), pa.scalar(s))
            )
        return batch

    return fn


def _pin_timestamp_us(cols: list[str]):
    """Re-pin timestamp columns to microsecond unit after a groupby/sort
    shuffle: Ray's shuffle can round-trip blocks through pandas and hand
    timestamp keys back at a coarser unit (observed: second resolution at
    sf0.1 multi-block scale, while single-block sf0.001 keeps us) — the
    oracle and the driver's value hash expect us."""

    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.cast(batch.column(c), pa.timestamp("us"))
            )
        return batch

    return fn


def _broadcast_table(sf_dir: str, name: str, columns: list[str]) -> pa.Table:
    """Load a small dimension table once on the driver.  Ray ships the UDF
    closure (and thus this table) to the object store ONCE per stage, not
    per batch — the broadcast-join pattern for small sides."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def _user_buckets(sf_dir: str, n_buckets: int | None) -> int:
    """Bucket count for the per-user event operators: derived from the
    events table's footer row count so one bucket group (~rows/n_buckets
    event rows in one worker's pandas frame) stays bounded as the corpus
    grows.  The 64 floor matches the measured small-scale sweet spot (1024
    buckets were 2.6x slower at sf0.1 — mostly singleton-user groups)."""
    if n_buckets is not None:
        return n_buckets
    from ..scale import bucket_count, estimate_rows

    return bucket_count(estimate_rows(sf_dir, "events"), min_buckets=64)


def _user_bucket_adder(n_buckets: int):
    mask = pa.scalar(n_buckets - 1, pa.int64())

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pc.bit_wise_and(batch["user_id"], mask)
        )

    return fn


def _lookup(keys: pa.ChunkedArray | pa.Array, values: pa.ChunkedArray | pa.Array):
    """Vectorized broadcast-join kernel: map a fact-side key column to the
    small side's value column via ``pc.index_in`` + ``pc.take`` — no Python
    per row, no ``to_pylist`` on fact columns."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()

    def fn(col):
        return pc.take(values, pc.index_in(col, value_set=keys))

    return fn


# ---------------------------------------------------------------------------
# q1: TPC-H Q1-style pricing summary (grouped aggregate w/ partial pre-agg)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Filter on shipdate, then group by (returnflag, linestatus).

    Pre-aggregates per batch (the key space is ~6 combos), then runs the
    final small groupby — the shuffle moves O(batches x 6) rows, not O(N).
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pa.compute.strptime("1998-09-02", format="%Y-%m-%d", unit="us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        # exact integer-cents arithmetic: money columns are 2-dp decimals
        # stored as doubles; per-row quantization is deterministic across
        # engines, and int64 sums are EXACT — so the final values are
        # bitwise identical to the DuckDB oracle regardless of accumulation
        # order (float sums were not: cross-engine diffs straddled rounding
        # boundaries)
        qty_c = pc.cast(pc.round(pc.multiply(batch["l_quantity"], pa.scalar(100.0))), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0))), pa.int64())
        disc_price_c4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_price_c4": disc_price_c4,
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("qty_c", "sum"),
                    ("price_c", "sum"),
                    ("disc_price_c4", "sum"),
                    ("qty_c", "count"),
                ]
            )
            .rename_columns(
                [
                    "l_returnflag",
                    "l_linestatus",
                    "sum_qty",
                    "sum_base_price",
                    "sum_disc_price",
                    "count_order",
                ]
            )
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )
    # descale the exact integer sums back to currency units
    return out.map_batches(
        _descale({"sum_qty": 100.0, "sum_base_price": 100.0, "sum_disc_price": 10000.0}),
        batch_format="pyarrow",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# filter + projection
# ---------------------------------------------------------------------------

def filter_project_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Vectorized predicate inside map_batches + computed revenue column."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_quantity"], pa.scalar(45.0)))
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        out = batch.select(["l_orderkey", "l_linenumber", "l_quantity"])
        return out.append_column("revenue", revenue)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_quantity > 45
"""


# ---------------------------------------------------------------------------
# broadcast join: orders x customer (+ nation)
# ---------------------------------------------------------------------------

def join_orders_customer(sf_dir: str) -> ray.data.Dataset:
    """Fact-side map_batches with a broadcast dict lookup of the small side —
    no shuffle join (SURVEY.md §2.6)."""
    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    name_of = _lookup(cust["c_custkey"], cust["c_name"])
    seg_of = _lookup(cust["c_custkey"], cust["c_mktsegment"])

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def fn(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["o_orderkey", "o_custkey", "o_totalprice"])
            .append_column("c_name", name_of(batch["o_custkey"]))
            .append_column("c_mktsegment", seg_of(batch["o_custkey"]))
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort(
        "o_orderkey"
    )


JOIN_ORDERS_CUSTOMER_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Multi-hop broadcast join (customer->nation) + pre-aggregated groupby:
    revenue per nation from orders."""
    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _broadcast_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    # compose the two dimension hops ONCE on the driver: custkey -> n_name
    nation_of_cust = pc.take(
        nation["n_name"].combine_chunks(),
        pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"].combine_chunks()),
    )
    nation_of = _lookup(cust["c_custkey"], nation_of_cust)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        nations = nation_of(batch["o_custkey"])
        # exact int64-cents sums (see q1): per-row quantize, exact sum
        tp_c = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"n_name": nations, "tp_c": tp_c})
        return (
            t.group_by("n_name")
            .aggregate([("tp_c", "sum"), ("tp_c", "count")])
            .rename_columns(["n_name", "total_revenue", "n_orders"])
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby("n_name")
        .aggregate(
            Sum("total_revenue", alias_name="total_revenue"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .sort("n_name")
    )
    return out.map_batches(_descale({"total_revenue": 100.0}), batch_format="pyarrow")


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# sort / top-k
# ---------------------------------------------------------------------------

def topk_orders(sf_dir: str) -> ray.data.Dataset:
    """Top 10 orders by totalprice; deterministic tiebreak on o_orderkey."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# distinct
# ---------------------------------------------------------------------------

def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """Distinct via per-batch dedup (partial) + global groupby — the
    pre-aggregate-before-shuffle pattern applied to DISTINCT."""
    ds = read_table(sf_dir, "events", columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("event_type").aggregate([]).select(["event_type"])

    from ray.data.aggregate import Count

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("event_type").aggregate(Count(alias_name="_n"))
    return out.select_columns(["event_type"]).sort("event_type")


DISTINCT_EVENT_TYPES_SQL = """
SELECT DISTINCT event_type FROM events ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# windowed aggregate over the events stream table
# ---------------------------------------------------------------------------

def events_hourly_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Ray Data has no event-time windows (SURVEY.md §2.11); the window key is
    derived as a column (floor ts to hour) and the window IS a groupby —
    partial per batch, final across the shuffle."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        value_c = pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        t = pa.table(
            {"window_start": hour, "event_type": batch["event_type"], "value_c": value_c}
        )
        return (
            t.group_by(["window_start", "event_type"])
            .aggregate([("value_c", "sum"), ("value_c", "count")])
            .rename_columns(["window_start", "event_type", "sum_value", "n_events"])
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby(["window_start", "event_type"])
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
        .sort(["window_start", "event_type"])
    )
    return out.map_batches(_descale({"sum_value": 100.0}), batch_format="pyarrow").map_batches(
        _pin_timestamp_us(["window_start"]), batch_format="pyarrow"
    )


EVENTS_HOURLY_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# per-user sessionization (groupby + in-group ordered scan)
# ---------------------------------------------------------------------------

def events_user_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-user ordered aggregate: first/last event ts, count, sum(value).
    groupby(user_id) with partial pre-agg (min/max are mergeable)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        value_c = pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"user_id": batch["user_id"], "ts": batch["ts"], "value_c": value_c})
        return (
            t.group_by("user_id")
            .aggregate([("ts", "min"), ("ts", "max"), ("value_c", "sum"), ("value_c", "count")])
            .rename_columns(["user_id", "first_ts", "last_ts", "sum_value", "n_events"])
        )

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby("user_id")
        .aggregate(
            Min("first_ts", alias_name="first_ts"),
            Max("last_ts", alias_name="last_ts"),
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
        .sort("user_id")
    )
    return out.map_batches(_descale({"sum_value": 100.0}), batch_format="pyarrow")


EVENTS_USER_STATS_SQL = """
SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

RELATIONAL_QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "filter_project_lineitem": (filter_project_lineitem, FILTER_PROJECT_SQL),
    "join_orders_customer": (join_orders_customer, JOIN_ORDERS_CUSTOMER_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "topk_orders": (topk_orders, TOPK_ORDERS_SQL),
    "distinct_event_types": (distinct_event_types, DISTINCT_EVENT_TYPES_SQL),
    "events_hourly_window": (events_hourly_window, EVENTS_HOURLY_WINDOW_SQL),
    "events_user_stats": (events_user_stats, EVENTS_USER_STATS_SQL),
}

# ---------------------------------------------------------------------------
# q6: forecast revenue (pure filter + global aggregate)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6 shape: selective filter + one global sum — pre-aggregated to
    one partial row per batch, so the 'shuffle' is a trivial gather."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = pa.scalar(pc.strptime("1995-01-01", format="%Y-%m-%d", unit="us"))
    hi = pa.scalar(pc.strptime("1996-01-01", format="%Y-%m-%d", unit="us"))

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(24.0)),
            ),
        )
        f = batch.filter(m)
        price_c = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(f["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c4 = pc.sum(pc.multiply(price_c, disc_c)).as_py() or 0
        return pa.table({"revenue_c4": pa.array([rev_c4], pa.int64())})

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
    # aggregate() returns a dict on the driver; wrap into a 1-row table
    return pa.table(
        {"revenue": pa.array([out["revenue_c4"] / 10000.0], pa.float64())}
    )


Q6_SQL = """
SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q3: shipping priority (join + groupby + topk)
# ---------------------------------------------------------------------------

def q3_shipping_priority(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 shape: broadcast only the BUILDING custkey set (a filtered
    dimension column), pre-aggregate lineitem revenue per order inside
    map_batches, then attach ``o_orderdate`` by a hash-shuffle
    ``Dataset.join`` against the FILTERED orders *Dataset* — the orders fact
    table is never materialized on the driver (it is O(rows), not a
    dimension).  The join's inner semantics also apply the
    BUILDING + orderdate predicate to the grouped revenue rows."""
    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building_keys = (
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
        .combine_chunks()
    )
    cutoff = pa.scalar(pc.strptime("1995-03-15", format="%Y-%m-%d", unit="us"))

    def filter_orders(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(batch["o_orderdate"], cutoff),
            pc.is_in(batch["o_custkey"], value_set=building_keys),
        )
        return batch.filter(keep).select(["o_orderkey", "o_orderdate"])

    orders_f = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(filter_orders, batch_format="pyarrow", zero_copy_batch=True)

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        price_c = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(f["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = pa.table({"l_orderkey": f["l_orderkey"], "revenue": rev_c4})
        return (
            t.group_by("l_orderkey")
            .aggregate([("revenue", "sum")])
            .rename_columns(["l_orderkey", "revenue"])
        )

    # ONE bucketed shuffle does both the final revenue aggregation AND the
    # join: lineitem partials and filtered orders are tagged, widened to a
    # shared schema, unioned and grouped on key%n_buckets; each bucket group
    # runs an in-memory arrow group_by (final agg) + arrow join.  (Not
    # Dataset.join: orders_f is SPARSE after the two predicates, and Ray
    # 2.49's native hash join crashes on partitions that receive zero rows
    # of one side — see pipelines/joins.py docstring.  Not
    # aggregate-then-join either: that costs a second all-to-all.)  Bucket
    # count scales with the orders row count (bucket rows are per-order
    # partials, bounded by distinct orderkeys).
    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("revenue_c4", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )

    def _widen_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["l_orderkey"],
                "revenue_c4": batch["revenue"],
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["l_orderkey"], pa.scalar(n_buckets - 1, pa.int64())),
            }
        )

    def _widen_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_orderkey"],
                "revenue_c4": pa.nulls(n, pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["o_orderkey"], pa.scalar(n_buckets - 1, pa.int64())),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    lt = partials.map_batches(_widen_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = orders_f.map_batches(_widen_right, batch_format="pyarrow", zero_copy_batch=True)

    def agg_join_bucket(group: pa.Table) -> pa.Table:
        # shuffle may round-trip through pandas, degrading all-null typed
        # columns to Arrow null — re-cast to the declared schema first
        group = group.select(superset.names).cast(superset)
        side = group["side"]
        li = (
            group.filter(pc.equal(side, 0))
            .select(["key", "revenue_c4"])
            .group_by("key")
            .aggregate([("revenue_c4", "sum")])
            .rename_columns(["l_orderkey", "revenue_c4"])
        )
        orders_part = group.filter(pc.equal(side, 1)).select(["key", "o_orderdate"])
        joined = li.join(
            orders_part, keys=["l_orderkey"], right_keys=["key"], join_type="inner"
        )
        return joined.append_column(
            "revenue",
            pc.divide(pc.cast(joined["revenue_c4"], pa.float64()), pa.scalar(10000.0)),
        ).select(["l_orderkey", "revenue", "o_orderdate"])

    return (
        lt.union(rt)
        .groupby("bucket")
        .map_groups(agg_join_bucket, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# as-of join over events (custom operator Ray Data lacks)
# ---------------------------------------------------------------------------

def events_asof_login(sf_dir: str, *, n_buckets: int | None = None) -> ray.data.Dataset:
    """As-of join: for every event, the ts of the user's most recent event
    with value >= 90 at-or-before it (a 'last big event as of now' join).

    Implementation: hash-partition by a COARSE bucket of user_id (grouping
    on the raw key would fire one Python call per user — the CLAUDE.md
    bucketize rule), then ONE vectorized pandas pass per bucket: sort by
    (user_id, ts), per-user forward-fill of the big-event timestamps via
    groupby-ffill.  The bucket count scales with the events row count
    (scale.bucket_count) so one bucket group stays bounded in a worker's
    heap; a hot user would additionally need ts-range salting.
    DuckDB oracle: correlated window max."""
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    add_bucket = _user_bucket_adder(_user_buckets(sf_dir, n_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        big_ts = g["ts"].where(g["value"] >= 90.0)
        # within each user ts is sorted ascending, so the as-of "most recent
        # big event at or before each row" is a per-user forward fill
        g["last_big_ts"] = big_ts.groupby(g["user_id"]).ffill()
        return g[["event_id", "user_id", "ts", "last_big_ts"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort("event_id")
    )


EVENTS_ASOF_SQL = """
SELECT event_id, user_id, ts,
       max(CASE WHEN value >= 90.0 THEN ts END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big_ts
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# deterministic sample
# ---------------------------------------------------------------------------

def sample_orders(sf_dir: str) -> ray.data.Dataset:
    """Deterministic key-based sample (~12.5%): keep rows where
    (o_orderkey & 7) == 0 — a power-of-two bitmask keeps both engines'
    predicates trivially identical.  Unlike random_sample this is
    reproducible across engines, so it IS SQL-checkable."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch["o_orderkey"], pa.scalar(7, pa.int64())), pa.scalar(0, pa.int64()))
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort("o_orderkey")


SAMPLE_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE (o_orderkey & 7) = 0 ORDER BY o_orderkey
"""

RELATIONAL_QUERIES.update(
    {
        "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
        "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
        "events_asof_login": (events_asof_login, EVENTS_ASOF_SQL),
        "sample_orders": (sample_orders, SAMPLE_ORDERS_SQL),
    }
)

# ---------------------------------------------------------------------------
# gap-based sessionization (streaming-shaped custom operator)
# ---------------------------------------------------------------------------

def events_sessionize(
    sf_dir: str, *, gap_minutes: int = 30, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds `gap_minutes`.  groupby on a coarse user_id
    bucket (one vectorized pandas pass per bucket, not one Python call per
    user; bucket count scales with the events row count so one group stays
    bounded), per-user gap flags + cumulative session ids via
    groupby-shift/cumsum.  Output: one row per session with
    start/end/count/sum.

    Oracle: DuckDB window functions (lag -> gap flag -> running session id).
    """
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)
    add_bucket = _user_bucket_adder(_user_buckets(sf_dir, n_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"]).reset_index(drop=True)
        prev_ts = g.groupby("user_id")["ts"].shift()
        new_session = ((g["ts"] - prev_ts) > gap).astype("int64")
        g["session_id"] = new_session.groupby(g["user_id"]).cumsum()
        g["value_c"] = (g["value"] * 100).round().astype("int64")
        out = (
            g.groupby(["user_id", "session_id"], sort=True)
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("ts", "size"),
                sum_value=("value_c", "sum"),
            )
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"] / 100.0  # exact int-cents sum
        return out[
            ["user_id", "session_id", "session_start", "session_end", "n_events", "sum_value"]
        ]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(["user_id", "session_id"])
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  -- RANGE (not ROWS) framing: under DUPLICATE timestamps a ROWS running
  -- sum is nondeterministic (the session boundary can cut through a tie
  -- group, found by the 10x-rows sweep); RANGE makes tie peers share the
  -- frame, matching the engine's cumsum where only the FIRST tie row can
  -- carry the new-session flag
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     RANGE UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

RELATIONAL_QUERIES["events_sessionize"] = (events_sessionize, EVENTS_SESSIONIZE_SQL)

# ---------------------------------------------------------------------------
# grouped top-k (per-key top-n, a window-function-shaped operator)
# ---------------------------------------------------------------------------

def _grouped_head_rank(t: pa.Table, key: str, k: int):
    """Rank rows within consecutive runs of ``key`` (table must already be
    sorted so each key's rows are adjacent in priority order) and keep rank
    < k.  One numpy pass — no pandas, no per-key Python loop.  Returns
    (filtered table, 0-based ranks of kept rows)."""
    import numpy as np

    arr = t[key].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return t, np.empty(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.where(arr[1:] != arr[:-1], idx[1:], 0)
    np.maximum.accumulate(starts, out=starts)
    rank = idx - starts
    keep = rank < k
    return t.filter(pa.array(keep)), rank[keep]


def top_orders_per_customer(
    sf_dir: str, *, k: int = 2, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Top-k orders by totalprice per customer.

    Two-phase: per-batch partial top-k per key (Arrow sort_by + a numpy
    run-head kernel inside map_batches — cuts the shuffle to <= k rows per
    key per batch, no pandas conversion), then a bucketed final top-k (one
    vectorized pass per bucket, bucket count scaled to the orders row
    count).  Deterministic tiebreak on o_orderkey.  Oracle: row_number()
    window."""
    from ..scale import bucket_count, estimate_rows

    if n_buckets is None:
        n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())
    order_keys = [
        ("o_custkey", "ascending"),
        ("o_totalprice", "descending"),
        ("o_orderkey", "ascending"),
    ]

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t, _ = _grouped_head_rank(batch.sort_by(order_keys), "o_custkey", k)
        return t.append_column("bucket", pc.bit_wise_and(t["o_custkey"], mask))

    def final_bucket(group: pa.Table) -> pa.Table:
        t, rank = _grouped_head_rank(
            group.drop_columns(["bucket"]).sort_by(order_keys), "o_custkey", k
        )
        return t.append_column("rank", pa.array(rank + 1, pa.int64()))

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.groupby("bucket")
        .map_groups(final_bucket, batch_format="pyarrow")
        .sort(["o_custkey", "rank"])
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 2 ORDER BY o_custkey, rank
"""

RELATIONAL_QUERIES["top_orders_per_customer"] = (
    top_orders_per_customer,
    TOP_ORDERS_PER_CUSTOMER_SQL,
)

# ---------------------------------------------------------------------------
# shuffle hash join (native Dataset.join) — the big-x-big strategy
# ---------------------------------------------------------------------------

def join_orders_customer_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Same semantics as :func:`join_orders_customer` but via Ray Data's
    native hash-partitioned shuffle join — the strategy for BIG-x-BIG joins
    where neither side fits a broadcast.  Kept alongside the broadcast
    variant so the engine exposes both; pick by side size."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # explicit final sort: partition emission order is nondeterministic at
    # multi-partition scale (caught by the sf0.1 parity sweep — 8-partition
    # output permutes rows; at the small scales it happened to stay ordered)
    return joined.select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"]
    ).sort("o_orderkey")


RELATIONAL_QUERIES["join_orders_customer_shuffle"] = (
    join_orders_customer_shuffle,
    JOIN_ORDERS_CUSTOMER_SQL,
)

# ---------------------------------------------------------------------------
# union
# ---------------------------------------------------------------------------

def union_order_segments(sf_dir: str) -> ray.data.Dataset:
    """UNION ALL of two filtered scans (high-value orders + urgent orders).
    Exercises ds.union; duplicates preserved (UNION ALL semantics)."""
    base_cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    high = read_table(sf_dir, "orders", columns=base_cols).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(400000.0))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    urgent = read_table(sf_dir, "orders", columns=base_cols).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return high.union(urgent).sort(["o_orderkey", "o_totalprice"])


UNION_ORDER_SEGMENTS_SQL = """
SELECT * FROM (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_totalprice > 400000
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
) ORDER BY o_orderkey, o_totalprice
"""


# ---------------------------------------------------------------------------
# distinct count: exact (partial dedup) and approximate (HLL sketch)
# ---------------------------------------------------------------------------

def count_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id): per-batch dedup partials (the shuffle
    sees unique ids per batch, not every row) -> global distinct -> count."""
    ds = read_table(sf_dir, "events", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("user_id").aggregate([])

    from ray.data.aggregate import Count

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    uniq = partials.groupby("user_id").aggregate(Count(alias_name="_n"))
    n = uniq.count()
    return pa.table({"n_users": pa.array([n], pa.int64())})


COUNT_DISTINCT_USERS_SQL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
"""

def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Anti join: customers with no URGENT order.  Uses the bucketed
    shuffle join with arrow's "left anti" verb — Dataset.join would hit the
    sparse-partition crash here (the right side is a filtered fact table;
    see pipelines/joins.py), and anti joins are the canonical
    dedup/backfill primitive at scale (which inputs are NOT yet
    processed)."""
    from .joins import bucketed_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    urgent = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    from ..scale import estimate_rows

    out = bucketed_join(
        cust,
        urgent,
        on="c_custkey",
        right_on="o_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
        join_type="left anti",
        est_rows=estimate_rows(sf_dir, "orders"),
    )
    return out.sort("c_custkey")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def _order_priority_plan(sf_dir: str, join_fn) -> ray.data.Dataset:
    """The ONE Q4-shape plan, parameterized by the semi-join strategy so
    the plain and bloom-prefiltered variants can never diverge: the right
    side shrinks to per-batch-distinct orderkeys BEFORE the shuffle (semi
    joins never need duplicates); the count is a partial-per-batch + tiny
    final groupby."""
    from ..scale import estimate_rows

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    big_items = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], pa.scalar(49.0)))
        .select(["l_orderkey"])
        .group_by("l_orderkey")
        .aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    matched = join_fn(
        orders,
        big_items,
        on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64())]),
        join_type="left semi",
        est_rows=estimate_rows(sf_dir, "orders"),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["o_orderpriority"])
            .group_by("o_orderpriority")
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "n_orders"])
        )

    from ray.data.aggregate import Sum

    return (
        matched.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def order_priority_semi(sf_dir: str) -> ray.data.Dataset:
    """Semi join + grouped count (TPC-H Q4 shape): priorities of orders
    that have at least one high-quantity lineitem (see
    :func:`_order_priority_plan`)."""
    from .joins import bucketed_join

    return _order_priority_plan(sf_dir, bucketed_join)


ORDER_PRIORITY_SEMI_SQL = """
SELECT o_orderpriority, count(*) AS n_orders FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def revenue_by_year(sf_dir: str) -> ray.data.Dataset:
    """Grouped aggregate on a DERIVED date key (year(o_orderdate)) —
    temporal kernel coverage; exact int-cents sums as everywhere."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(batch["o_orderdate"]), pa.int64())
        tp_c = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"o_year": year, "tp_c": tp_c})
        return (
            t.group_by("o_year")
            .aggregate([("tp_c", "sum"), ("tp_c", "count")])
            .rename_columns(["o_year", "total_revenue", "n_orders"])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_year")
        .aggregate(
            Sum("total_revenue", alias_name="total_revenue"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .sort("o_year")
    )
    return out.map_batches(_descale({"total_revenue": 100.0}), batch_format="pyarrow")


REVENUE_BY_YEAR_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_revenue,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1
"""


def parts_named_bolt(sf_dir: str) -> ray.data.Dataset:
    """Substring filter on a string column (LIKE '%bolt%') via
    pc.match_substring — string-kernel coverage."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.match_substring(batch["p_name"], "bolt"))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort("p_partkey")


PARTS_NAMED_BOLT_SQL = """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_name LIKE '%bolt%' ORDER BY p_partkey
"""


def events_sliding_window(sf_dir: str, *, window_hours: int = 3) -> ray.data.Dataset:
    """SLIDING window (3h window, 1h slide) per event_type: each event is
    emitted into the ``window_hours`` hourly windows that cover it (the
    standard sliding-as-replicated-tumbling decomposition — Ray Data has no
    event-time windows, so the window key is derived and the window IS a
    groupby).  Replication happens inside the per-batch PARTIAL aggregate,
    so the shuffle still carries one row per (window, type) per batch, not
    per event x replicas.  Window ``w`` covers events with
    hour in [w, w + window_hours) — ``window_start`` is genuinely the
    window's start: an event at hour h lands in windows h, h-1h, h-2h."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        value_c = pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        parts = []
        for k in range(window_hours):
            w = pc.subtract(hour, pa.scalar(k * 3_600_000_000, pa.duration("us")))
            parts.append(
                pa.table(
                    {
                        "window_start": pc.cast(w, pa.timestamp("us")),
                        "event_type": batch["event_type"],
                        "value_c": value_c,
                    }
                )
            )
        t = pa.concat_tables(parts)
        return (
            t.group_by(["window_start", "event_type"])
            .aggregate([("value_c", "sum"), ("value_c", "count")])
            .rename_columns(["window_start", "event_type", "sum_value", "n_events"])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
        .sort(["window_start", "event_type"])
    )
    return out.map_batches(_descale({"sum_value": 100.0}), batch_format="pyarrow").map_batches(
        _pin_timestamp_us(["window_start"]), batch_format="pyarrow"
    )


EVENTS_SLIDING_WINDOW_SQL = """
SELECT window_start, event_type,
       sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS sum_value,
       count(*) AS n_events
FROM (
  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
         event_type, value
  FROM events, (SELECT unnest([0, 1, 2]) AS k)
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_value_zscore(sf_dir: str) -> ray.data.Dataset:
    """Group-wise normalization (z-score of value per event_type): the
    TWO-PASS broadcast-aggregate pattern.  Pass 1 reduces the stream to one
    (n, sum, sum-of-squares) row per type — EXACT int64-cents sums, so both
    engines derive bit-identical means/stds (sumsq fits int64 up to ~1e5
    rows x 4-digit values; at larger scale split into hi/lo int64 words).
    Pass 2 broadcasts the tiny stats table and computes z per row with the
    SAME IEEE expression the oracle uses — values match bitwise, not just
    to tolerance."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        value_c = pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        sq = pc.multiply(value_c, value_c)
        t = pa.table({"event_type": batch["event_type"], "sum_c": value_c, "sumsq_c": sq})
        return (
            t.group_by("event_type")
            .aggregate([("sum_c", "sum"), ("sumsq_c", "sum"), ("sum_c", "count")])
            .rename_columns(["event_type", "sum_c", "sumsq_c", "n"])
        )

    from ray.data.aggregate import Sum

    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("sum_c", alias_name="sum_c"),
            Sum("sumsq_c", alias_name="sumsq_c"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()  # tiny: one row per event_type
    )
    import numpy as np

    types = pa.array(stats["event_type"].tolist(), pa.string())
    n = stats["n"].to_numpy().astype(np.float64)
    mean = stats["sum_c"].to_numpy().astype(np.float64) / n
    # clamp tiny negative float residue at 0 and guard zero variance: a
    # constant-valued group gets a NULL z-score (mirrored in the oracle via
    # greatest(...,0) + NULLIF), never inf/nan from a 0 divide
    var = np.maximum(stats["sumsq_c"].to_numpy().astype(np.float64) / n - mean * mean, 0.0)
    std = np.sqrt(var)

    def add_z(batch: pa.Table) -> pa.Table:
        import numpy as np

        idx = pc.index_in(batch["event_type"], value_set=types).to_numpy(
            zero_copy_only=False
        )
        value_c = (
            pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        s = std[idx]
        zero = s == 0.0
        z = (value_c - mean[idx]) / np.where(zero, 1.0, s)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "zscore": pa.array(z, pa.float64(), mask=zero),
            }
        )

    return ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True).sort("event_id")


EVENTS_VALUE_ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value*100) AS BIGINT)) AS sum_c,
         sum(CAST(round(value*100) AS BIGINT) * CAST(round(value*100) AS BIGINT)) AS sumsq_c
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       (CAST(round(e.value*100) AS BIGINT)
          - CAST(s.sum_c AS DOUBLE) / s.n)
       / NULLIF(sqrt(greatest(
              CAST(s.sumsq_c AS DOUBLE) / s.n
              - (CAST(s.sum_c AS DOUBLE) / s.n) * (CAST(s.sum_c AS DOUBLE) / s.n),
              0)), 0)
         AS zscore
FROM events e JOIN stats s USING (event_type)
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# rolling window aggregate (ROWS k PRECEDING — a true ordered window fn)
# ---------------------------------------------------------------------------

def events_rolling_sum(
    sf_dir: str, *, window: int = 5, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-user rolling sum over the current + ``window-1`` preceding events
    (ordered by ts, event_id) — the ROWS-window operator Ray Data lacks.

    Same partitioning recipe as sessionize: coarse user_id buckets, one
    vectorized pandas pass per bucket (groupby-rolling), bucket count
    derived from the events row count.  Exactness: the rolling SUM is an
    int64-cents sum (never AVG — windowed float averages accumulate in
    engine-specific order), so values match the oracle bitwise."""
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    add_bucket = _user_bucket_adder(_user_buckets(sf_dir, n_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        value_c = (g["value"] * 100).round().astype("int64")
        grouped = value_c.groupby(g["user_id"])
        roll = grouped.rolling(window, min_periods=1)
        g["sum_window"] = roll.sum().reset_index(level=0, drop=True) / 100.0
        g["n_window"] = roll.count().reset_index(level=0, drop=True).astype("int64")
        return g[["event_id", "user_id", "ts", "sum_window", "n_window"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort("event_id")
    )


EVENTS_ROLLING_SUM_SQL = """
SELECT event_id, user_id, ts,
       sum(CAST(round(value*100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100.0 AS sum_window,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_window
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# range join (equi key + time-band predicate — the brief's "range join")
# ---------------------------------------------------------------------------

def events_orders_range_join(
    sf_dir: str, *, days: int = 30, n_buckets: int | None = None
) -> ray.data.Dataset:
    """For every event: how many orders the same user placed in the
    preceding ``days`` days (o_orderdate in [ts - days, ts]).

    The distributed band-join recipe: co-partition BOTH sides by the equi
    key's hash bucket through ONE shuffle (tagged union, like
    ``bucketed_join``), then evaluate the range predicate inside each
    bucket with a vectorized pandas merge + filter — never an all-pairs
    cross join across the cluster.  Events with no orders in range keep a
    zero count (left semantics).  Oracle: LEFT JOIN ... BETWEEN."""
    import pandas as pd

    if n_buckets is None:
        from ..scale import bucket_count, estimate_rows

        n_buckets = bucket_count(
            max(estimate_rows(sf_dir, "events"), estimate_rows(sf_dir, "orders")),
            min_buckets=64,
        )
    mask = pa.scalar(n_buckets - 1, pa.int64())
    lo_delta = pd.Timedelta(days=days)

    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("o_orderdate", pa.timestamp("us")),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )

    def widen_events(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["user_id"], mask),
            }
        )

    def widen_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_custkey"],
                "event_id": pa.nulls(n, pa.int64()),
                "ts": pa.nulls(n, pa.timestamp("us")),
                "o_orderdate": batch["o_orderdate"],
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["o_custkey"], mask),
            }
        )

    lt = events.map_batches(widen_events, batch_format="pyarrow", zero_copy_batch=True)
    rt = orders.map_batches(widen_orders, batch_format="pyarrow", zero_copy_batch=True)

    def band_join_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        ev = group.filter(pc.equal(group["side"], 0)).select(["key", "event_id", "ts"]).to_pandas()
        od = group.filter(pc.equal(group["side"], 1)).select(["key", "o_orderdate"]).to_pandas()
        if ev.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "n_recent_orders": pa.array([], pa.int64()),
                }
            )
        m = ev.merge(od, on="key", how="inner")
        in_band = m[
            (m["o_orderdate"] >= m["ts"] - lo_delta) & (m["o_orderdate"] <= m["ts"])
        ]
        counts = in_band.groupby("event_id").size()
        n = counts.reindex(ev["event_id"]).fillna(0).astype("int64")
        out = pd.DataFrame(
            {
                "event_id": ev["event_id"].astype("int64"),
                "user_id": ev["key"].astype("int64"),
                "ts": ev["ts"],
                "n_recent_orders": n.to_numpy(),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("n_recent_orders", pa.int64()),
                ]
            )
        )

    return (
        lt.union(rt)
        .groupby("bucket")
        .map_groups(band_join_bucket, batch_format="pyarrow")
        .sort("event_id")
    )


EVENTS_ORDERS_RANGE_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_recent_orders
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND o.o_orderdate BETWEEN e.ts - INTERVAL 30 DAY AND e.ts
GROUP BY e.event_id, e.user_id, e.ts
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# q5: six-table join chain (broadcast-pruned dims + ONE fact-fact shuffle)
# ---------------------------------------------------------------------------

def q5_local_supplier_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q5 shape: revenue from lineitems where the supplier and the
    ordering customer share a nation inside one region, grouped by nation.

    The 6-table join costs ONE all-to-all: region -> nation -> supplier and
    region -> nation -> customer collapse into two broadcast int64->int64
    key maps (region/nation/supplier are genuinely tiny; the customer map
    ships only (custkey, nationkey) ints, not the customer row), both fact
    scans PRUNE to the region's nations before any exchange (~80% of
    lineitem never moves for a 5-region split), and the surviving
    lineitem partials meet the filtered orders in the same tagged-union
    bucket shuffle q3 uses (aggregation folded into the join exchange).
    The c_nationkey = s_nationkey equality evaluates inside each bucket as
    a vectorized filter after the in-bucket arrow join."""
    nation = _broadcast_table(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _broadcast_table(sf_dir, "region", ["r_regionkey", "r_name"])
    asia_keys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nation_asia = nation.filter(pc.is_in(nation["n_regionkey"], value_set=asia_keys.combine_chunks()))
    asian_nations = nation_asia["n_nationkey"].combine_chunks()

    supp = _broadcast_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"], value_set=asian_nations))
    supp_nation_of = _lookup(supp["s_suppkey"], supp["s_nationkey"])

    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=asian_nations))
    cust_nation_of = _lookup(cust["c_custkey"], cust["c_nationkey"])

    lo = pa.scalar(pc.strptime("1996-01-01", format="%Y-%m-%d", unit="us"))
    hi = pa.scalar(pc.strptime("1997-01-01", format="%Y-%m-%d", unit="us"))

    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())

    def orders_side(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi),
        )
        f = batch.filter(keep)
        cn = cust_nation_of(f["o_custkey"])
        f = f.append_column("cust_nation", pc.cast(cn, pa.int64()))
        f = f.filter(pc.is_valid(f["cust_nation"]))  # non-ASIA customers drop
        n = f.num_rows
        return pa.table(
            {
                "key": f["o_orderkey"],
                "nationkey": f["cust_nation"],
                "rev_c4": pa.nulls(n, pa.int64()),
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(f["o_orderkey"], mask),
            }
        )

    def lineitem_side(batch: pa.Table) -> pa.Table:
        sn = supp_nation_of(batch["l_suppkey"])
        f = batch.append_column("supp_nation", pc.cast(sn, pa.int64()))
        f = f.filter(pc.is_valid(f["supp_nation"]))  # non-ASIA suppliers drop
        price_c = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(f["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = pa.table(
            {"key": f["l_orderkey"], "nationkey": f["supp_nation"], "rev_c4": rev_c4}
        )
        # per-batch partial: one row per (order, supplier-nation)
        t = (
            t.group_by(["key", "nationkey"])
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["key", "nationkey", "rev_c4"])
        )
        return pa.table(
            {
                "key": t["key"],
                "nationkey": t["nationkey"],
                "rev_c4": t["rev_c4"],
                "side": pa.array([0] * t.num_rows, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("nationkey", pa.int64()),
            ("rev_c4", pa.int64()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(lineitem_side, batch_format="pyarrow", zero_copy_batch=True)

    def join_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        li_part = (
            group.filter(pc.equal(group["side"], 0))
            .select(["key", "nationkey", "rev_c4"])
            .group_by(["key", "nationkey"])
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["key", "supp_nation", "rev_c4"])
        )
        od_part = (
            group.filter(pc.equal(group["side"], 1))
            .select(["key", "nationkey"])
            .rename_columns(["key", "cust_nation"])
        )
        j = li_part.join(od_part, keys=["key"], join_type="inner")
        j = j.filter(pc.equal(j["supp_nation"], j["cust_nation"]))
        # per-bucket partial per nation: the final exchange carries
        # <= n_nations rows per bucket
        return (
            j.select(["supp_nation", "rev_c4"])
            .group_by("supp_nation")
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["nationkey", "rev_c4"])
        )

    from ray.data.aggregate import Sum

    name_of = _lookup(nation_asia["n_nationkey"], nation_asia["n_name"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": name_of(batch["nationkey"]),
                "revenue": pc.divide(
                    pc.cast(batch["rev_c4"], pa.float64()), pa.scalar(10000.0)
                ),
            }
        )

    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["revenue", "n_name"], descending=[True, False])
    )


Q5_SQL = """
SELECT n_name,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q18: groupby-HAVING on the fact table, join folded into the same shuffle
# ---------------------------------------------------------------------------

def q18_large_volume_orders(sf_dir: str, *, min_qty: float = 250.0) -> ray.data.Dataset:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer name, largest orders first.

    The HAVING filter needs the FINAL per-order sum, so it evaluates inside
    the bucket group after partials merge — the same single tagged-union
    shuffle carries the lineitem partials and the orders rows (q3's fold;
    no second all-to-all for the join).  Quantities sum in int64
    hundredths (exact; float accumulation order is engine-specific).  The
    customer name attaches AFTER the top-k limit — a lookup over <= k rows
    — so the customer table never rides the fact shuffle; at a scale where
    even the (custkey, name) map outgrows a broadcast, swap the post-limit
    map for a bucketed semi join on the k surviving custkeys."""
    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())
    min_qty_c = pa.scalar(int(round(min_qty * 100)), pa.int64())

    def li_partial(batch: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.round(pc.multiply(batch["l_quantity"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"key": batch["l_orderkey"], "qty_c": qty_c})
        t = (
            t.group_by("key")
            .aggregate([("qty_c", "sum")])
            .rename_columns(["key", "qty_c"])
        )
        n = t.num_rows
        return pa.table(
            {
                "key": t["key"],
                "qty_c": t["qty_c"],
                "o_custkey": pa.nulls(n, pa.int64()),
                "o_totalprice": pa.nulls(n, pa.float64()),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_orderkey"],
                "qty_c": pa.nulls(n, pa.int64()),
                "o_custkey": batch["o_custkey"],
                "o_totalprice": batch["o_totalprice"],
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["o_orderkey"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("qty_c", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def having_join_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        sums = (
            group.filter(pc.equal(group["side"], 0))
            .select(["key", "qty_c"])
            .group_by("key")
            .aggregate([("qty_c", "sum")])
            .rename_columns(["key", "qty_c"])
        )
        big = sums.filter(pc.greater(sums["qty_c"], min_qty_c))  # HAVING
        od = group.filter(pc.equal(group["side"], 1)).select(
            ["key", "o_custkey", "o_totalprice"]
        )
        j = big.join(od, keys=["key"], join_type="inner")
        return pa.table(
            {
                "o_orderkey": j["key"],
                "o_custkey": j["o_custkey"],
                "o_totalprice": j["o_totalprice"],
                "sum_qty": pc.divide(pc.cast(j["qty_c"], pa.float64()), pa.scalar(100.0)),
            }
        )

    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_name"])
    name_of = _lookup(cust["c_custkey"], cust["c_name"])

    def attach_name(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_name": name_of(batch["o_custkey"]),
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
                "sum_qty": batch["sum_qty"],
            }
        )

    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(having_join_bucket, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
        .map_batches(attach_name, batch_format="pyarrow", zero_copy_batch=True)
        # map operators do not preserve block order (ADVICE r3): re-sort the
        # <=20 post-limit rows so output order is pinned, not inherited.
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
    )


Q18_SQL = """
SELECT c_name, o_orderkey, o_totalprice,
       sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_name, o_orderkey, o_totalprice
HAVING sum(CAST(round(l_quantity*100) AS BIGINT)) > 25000
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


RELATIONAL_QUERIES.update(
    {
        "q5_local_supplier_revenue": (q5_local_supplier_revenue, Q5_SQL),
        "q18_large_volume_orders": (q18_large_volume_orders, Q18_SQL),
        "events_rolling_sum": (events_rolling_sum, EVENTS_ROLLING_SUM_SQL),
        "events_orders_range_join": (
            events_orders_range_join,
            EVENTS_ORDERS_RANGE_JOIN_SQL,
        ),
        "events_value_zscore": (events_value_zscore, EVENTS_VALUE_ZSCORE_SQL),
        "events_sliding_window": (events_sliding_window, EVENTS_SLIDING_WINDOW_SQL),
        "union_order_segments": (union_order_segments, UNION_ORDER_SEGMENTS_SQL),
        "count_distinct_users": (count_distinct_users, COUNT_DISTINCT_USERS_SQL),
        "customers_without_orders": (
            customers_without_orders,
            CUSTOMERS_WITHOUT_ORDERS_SQL,
        ),
        "order_priority_semi": (order_priority_semi, ORDER_PRIORITY_SEMI_SQL),
        "revenue_by_year": (revenue_by_year, REVENUE_BY_YEAR_SQL),
        "parts_named_bolt": (parts_named_bolt, PARTS_NAMED_BOLT_SQL),
    }
)


def q13_customer_distribution(sf_dir: str, *, n_buckets: int | None = None) -> ray.data.Dataset:
    """TPC-H Q13 shape: distribution of order counts per customer,
    INCLUDING zero-order customers — the canonical left-outer-join +
    two-level aggregation.

    Plan: orders pre-fold to (custkey, partial count) per batch; customer
    keys and order partials meet in ONE bucket shuffle (tagged union);
    each bucket does the outer accounting (absent custkey -> 0) and folds
    straight to its local (c_count, custdist) histogram — so the second
    groupby exchanges only distinct count values (tiny), and customer
    rows never leave their bucket.  Bucket count derives from the
    customer table's footer row count (scale.bucket_count)."""
    from ..scale import bucket_count, estimate_rows

    if n_buckets is None:
        n_buckets = bucket_count(estimate_rows(sf_dir, "customer"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())

    superset = pa.schema(
        [
            ("bucket", pa.int64()),
            ("side", pa.int8()),  # 0 = order partial, 1 = customer key
            ("key", pa.int64()),
            ("cnt", pa.int64()),
        ]
    )

    def orders_side(batch: pa.Table) -> pa.Table:
        part = (
            batch.select(["o_custkey"])
            .group_by("o_custkey")
            .aggregate([("o_custkey", "count")])
            .rename_columns(["key", "cnt"])
        )
        n = part.num_rows
        return pa.table(
            {
                "bucket": pc.bit_wise_and(part["key"], mask),
                "side": pa.array([0] * n, pa.int8()),
                "key": part["key"],
                "cnt": pc.cast(part["cnt"], pa.int64()),
            },
            schema=superset,
        )

    def customer_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "bucket": pc.bit_wise_and(batch["c_custkey"], mask),
                "side": pa.array([1] * n, pa.int8()),
                "key": batch["c_custkey"].combine_chunks().cast(pa.int64()) if isinstance(batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"].cast(pa.int64()),
                "cnt": pa.nulls(n, pa.int64()),
            },
            schema=superset,
        )

    orders = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        orders_side, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        customer_side, batch_format="pyarrow", zero_copy_batch=True
    )

    def outer_hist_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        parts = (
            group.filter(pc.equal(group["side"], 0))
            .select(["key", "cnt"])
            .group_by("key")
            .aggregate([("cnt", "sum")])
            .rename_columns(["key", "cnt"])
        )
        cust_keys = group.filter(pc.equal(group["side"], 1))["key"].combine_chunks()
        # outer accounting: count per customer, 0 where no order partial
        idx = pc.index_in(cust_keys, value_set=parts["key"].combine_chunks())
        counts = pc.fill_null(pc.take(parts["cnt"].combine_chunks(), idx), 0)
        hist = (
            pa.table({"c_count": counts})
            .group_by("c_count")
            .aggregate([("c_count", "count")])
            .rename_columns(["c_count", "custdist"])
        )
        return pa.table(
            {
                "c_count": hist["c_count"],
                "custdist": pc.cast(hist["custdist"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        orders.union(cust)
        .groupby("bucket")
        .map_groups(outer_hist_bucket, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

RELATIONAL_QUERIES["q13_customer_distribution"] = (
    q13_customer_distribution,
    Q13_SQL,
)


def suppliers_per_part(sf_dir: str, *, n_buckets: int | None = None) -> ray.data.Dataset:
    """COUNT(DISTINCT ...) GROUP BY — distinct suppliers per part over
    lineitem (TPC-H Q16's count-distinct core).

    The naive plan shuffles every lineitem row; this one dedupes
    (partkey, suppkey) pairs per batch FIRST (arrow group_by — pairs
    repeat heavily within a batch), buckets by partkey so a pair lands in
    exactly one group, finishes the global dedup + per-part count inside
    the bucket, and exchanges only distinct pairs.  Unlike per-doc
    distinct (doc_frequency), a pair CAN recur across batches — the
    in-bucket pass is what makes the count exact."""
    from ..scale import bucket_count, estimate_rows

    if n_buckets is None:
        n_buckets = bucket_count(estimate_rows(sf_dir, "lineitem") // 4, min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        pairs = (
            batch.select(["l_partkey", "l_suppkey"])
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([])
        )
        return pa.table(
            {
                "bucket": pc.bit_wise_and(pairs["l_partkey"], mask),
                "l_partkey": pairs["l_partkey"],
                "l_suppkey": pairs["l_suppkey"],
            }
        )

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_bucket(group: pa.Table) -> pa.Table:
        group = group.select(["l_partkey", "l_suppkey"]).cast(
            pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())])
        )
        distinct = group.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        counts = (
            distinct.group_by("l_partkey")
            .aggregate([("l_suppkey", "count")])
            .rename_columns(["l_partkey", "n_suppliers"])
        )
        return pa.table(
            {
                "l_partkey": counts["l_partkey"],
                "n_suppliers": pc.cast(counts["n_suppliers"], pa.int64()),
            }
        )

    return (
        ds.groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
        .sort("l_partkey")
    )


SUPPLIERS_PER_PART_SQL = """
SELECT l_partkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem
GROUP BY l_partkey
ORDER BY l_partkey
"""

RELATIONAL_QUERIES["suppliers_per_part"] = (
    suppliers_per_part,
    SUPPLIERS_PER_PART_SQL,
)


def order_priority_semi_bloom(sf_dir: str) -> ray.data.Dataset:
    """``order_priority_semi`` through the BLOOM-PREFILTERED join
    (``joins.bloom_prefiltered_join``): the high-quantity orderkey set is
    selective (~2% of orders at the driver's data), so a broadcast Bloom
    over its keys drops ~98% of the orders scan BEFORE the all-to-all;
    false positives ride through to the exact in-bucket semi join, so the
    result is identical to the plain plan (same oracle SQL, same shared
    plan builder — only the join strategy differs)."""
    from .joins import bloom_prefiltered_join

    return _order_priority_plan(sf_dir, bloom_prefiltered_join)


RELATIONAL_QUERIES["order_priority_semi_bloom"] = (
    order_priority_semi_bloom,
    ORDER_PRIORITY_SEMI_SQL,
)


def top_event_type_per_hour(sf_dir: str) -> ray.data.Dataset:
    """Grouped ARG-MAX: the most frequent event type in each hour, ties
    broken by smallest type — the per-window mode/argmax shape.

    Per-batch partial counts fold per (hour, type); one small groupby
    finishes the counts; the argmax runs in a per-hour map_groups whose
    input is one row per (hour, type) — bounded by the type cardinality,
    never the event volume."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({"hour": hour, "event_type": batch["event_type"]})
        return (
            t.group_by(["hour", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["hour", "event_type", "n"])
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def argmax_hour(group: "pd.Table") -> "pd.Table":  # pandas group
        g = group.sort_values(["n", "event_type"], ascending=[False, True])
        top = g.iloc[[0]]
        return top[["hour", "event_type", "n"]].rename(
            columns={"event_type": "top_event_type", "n": "n_events"}
        )

    def recast(batch: pa.Table) -> pa.Table:
        # the pandas group round-trip downgrades timestamp resolution;
        # pin the oracle's microsecond unit (same as events_sliding_window)
        return pa.table(
            {
                "hour": pc.cast(batch["hour"], pa.timestamp("us")),
                "top_event_type": batch["top_event_type"],
                "n_events": batch["n_events"],
            }
        )

    return (
        counts.groupby("hour")
        .map_groups(argmax_hour, batch_format="pandas")
        .map_batches(recast, batch_format="pyarrow", zero_copy_batch=True)
        .sort("hour")
    )


TOP_EVENT_TYPE_PER_HOUR_SQL = """
SELECT hour, event_type AS top_event_type, n AS n_events
FROM (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY count(*) DESC, event_type) AS rk
  FROM events GROUP BY 1, 2
) t WHERE rk = 1 ORDER BY hour
"""

RELATIONAL_QUERIES["top_event_type_per_hour"] = (
    top_event_type_per_hour,
    TOP_EVENT_TYPE_PER_HOUR_SQL,
)


# ---------------------------------------------------------------------------
# global-quantile bucketize (ntile-by-value; the "shard by length percentile"
# op of a training-data pipeline)
# ---------------------------------------------------------------------------

def exact_global_quantiles(
    ds: ray.data.Dataset,
    column: str,
    qs: list[float],
    *,
    ranks: list[int] | None = None,
    bin_width: float = 1000.0,
    driver_row_budget: int = 100_000,
    refine_factor: int = 64,
    max_refine_levels: int = 8,
    stats: dict | None = None,
):
    """EXACT ``quantile_disc`` thresholds of one numeric column without a
    global sort, with a HARD bound on what ever reaches the driver.

    Scheme (iterative histogram refinement):
      1. coarse histogram: per-batch counts of ``floor(v/bin_width)`` fold
         through one small groupby into a global bin histogram;
      2. locate: the <=len(qs) bins containing a quantile rank, plus the
         rank offset within each;
      3. while those bins together hold more than ``driver_row_budget``
         rows, re-histogram ONLY those bins at ``width/refine_factor`` (a
         filtered column scan; driver pull per level <= len(qs) *
         refine_factor histogram rows) and re-locate the ranks in the
         sub-bins;
      4. final collect pulls VALUE COUNTS (group-by exact value) of the
         needed bins, so even a pathological bin of 10^9 duplicates of one
         value collapses to one driver row.

    Rank rule: smallest value with cumulative count >= ceil(q*n) — DuckDB
    ``quantile_disc`` semantics.  The driver never sees more than
    ~budget + len(qs)*refine_factor rows regardless of input size (the
    round-3 version pulled O(N/n_bins) rows under a fixed bin width —
    VERDICT r3 "What's wrong #1").

    ``stats`` (optional out-param) records ``levels`` (refine iterations),
    ``rows_in_need`` (row mass of the collected bins) and
    ``collected_rows`` (actual driver-pulled value-count rows).
    """
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    def _bins(col: pa.ChunkedArray | pa.Array, w: float) -> pa.Array:
        return pc.cast(pc.floor(pc.divide(col, pa.scalar(w))), pa.int64())

    # pass 1: coarse bin histogram (bounded by value domain / bin_width)
    def partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"bin": _bins(batch[column], bin_width)})
            .group_by("bin")
            .aggregate([([], "count_all")])
            .rename_columns(["bin", "n"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .sort("bin")
        .to_pandas()  # tiny: one row per coarse bin
    )
    # an empty input loses the aggregate schema entirely — guard both shapes
    total = int(hist["n"].sum()) if "n" in hist.columns else 0
    if total == 0:
        raise ValueError(f"exact_global_quantiles: column {column!r} is empty")
    cum_after = hist["n"].cumsum().to_numpy()
    cum_before = cum_after - hist["n"].to_numpy()
    if ranks is None:
        ranks = [math.ceil(q * total) for q in qs]
    else:
        # explicit 1-indexed GLOBAL ranks (ascending) — the grouped rank
        # selection path: callers encode group into the value domain and
        # translate per-group ranks by per-group prefix offsets.  Must be
        # ascending because the returned array is sorted by value.
        if sorted(ranks) != list(ranks):
            raise ValueError("explicit ranks must be ascending")
        if ranks and not (1 <= ranks[0] and ranks[-1] <= total):
            raise ValueError(f"ranks out of range 1..{total}")
    # bin containing each quantile rank + the rank offset within that bin
    need: dict[int, list[tuple[int, int]]] = {}
    for qi, rank in enumerate(ranks):
        bi = int(np.searchsorted(cum_after, rank))  # first bin with cum >= rank
        need.setdefault(int(hist["bin"].iloc[bi]), []).append(
            (qi, rank - int(cum_before[bi]))
        )
    bin_rows = dict(zip(hist["bin"].astype(int), hist["n"].astype(int)))
    rows_in_need = sum(bin_rows[b] for b in need)
    width = float(bin_width)

    # pass 2 (iterated): refine ONLY the rank-bearing bins until their row
    # mass fits the driver budget.  Sub-bins are grouped by (coarse, sub)
    # so float boundary effects (a sub interval straddling a coarse edge)
    # cannot mis-rank: ranks are re-based to the GLOBAL sub bin via the
    # per-sub prefix offset of each coarse parent.
    levels = 0
    while rows_in_need > driver_row_budget and levels < max_refine_levels:
        new_width = width / refine_factor
        need_bins = pa.array(sorted(need), pa.int64())

        def sub_partial(
            batch: pa.Table, *, _w=width, _nw=new_width, _nb=need_bins
        ) -> pa.Table:
            coarse = _bins(batch[column], _w)
            t = pa.table({"v": batch[column], "coarse": coarse}).filter(
                pc.is_in(coarse, value_set=_nb)
            )
            return (
                pa.table({"coarse": t["coarse"], "sub": _bins(t["v"], _nw)})
                .group_by(["coarse", "sub"])
                .aggregate([([], "count_all")])
                .rename_columns(["coarse", "sub", "n"])
            )

        subhist = (
            ds.map_batches(sub_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["coarse", "sub"])
            .aggregate(Sum("n", alias_name="n"))
            .sort(["coarse", "sub"])
            .to_pandas()  # <= len(qs) * (refine_factor + 1) rows
        )
        # prefix offset of each (coarse, sub) cell within its GLOBAL sub bin
        by_sub = subhist.sort_values(["sub", "coarse"])
        off_within_sub = by_sub.groupby("sub")["n"].cumsum() - by_sub["n"]
        offset = {
            (int(b), int(s)): int(o)
            for b, s, o in zip(by_sub["coarse"], by_sub["sub"], off_within_sub)
        }
        sub_total = by_sub.groupby("sub")["n"].sum()
        new_need: dict[int, list[tuple[int, int]]] = {}
        for b, wants in need.items():
            rows = subhist[subhist["coarse"] == b]
            sub_cum = rows["n"].cumsum().to_numpy()
            sub_before = sub_cum - rows["n"].to_numpy()
            for qi, within in wants:
                i = int(np.searchsorted(sub_cum, within))
                s = int(rows["sub"].iloc[i])
                new_need.setdefault(s, []).append(
                    (qi, within - int(sub_before[i]) + offset[(b, s)])
                )
        need = new_need
        width = new_width
        rows_in_need = int(sum(sub_total[s] for s in need))
        levels += 1

    # pass 3: VALUE COUNTS of only the needed bins — driver pull is bounded
    # by min(rows_in_need, distinct values), so duplicate-heavy bins that
    # cannot refine further (all mass on one value) still collapse.
    need_bins = pa.array(sorted(need), pa.int64())

    def vc_partial(batch: pa.Table, *, _w=width, _nb=need_bins) -> pa.Table:
        bins = _bins(batch[column], _w)
        t = pa.table({"bin": bins, "v": batch[column]}).filter(
            pc.is_in(bins, value_set=_nb)
        )
        return (
            t.group_by(["bin", "v"])
            .aggregate([([], "count_all")])
            .rename_columns(["bin", "v", "n"])
        )

    vcs = (
        ds.map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["bin", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["bin", "v"])
        .to_pandas()
    )
    thresholds = np.empty(len(ranks), dtype=np.float64)
    for b, wants in need.items():
        rows = vcs[vcs["bin"] == b]
        cum = rows["n"].cumsum().to_numpy()
        for qi, within in wants:
            i = int(np.searchsorted(cum, within))
            thresholds[qi] = float(rows["v"].iloc[i])
    thresholds.sort()
    if stats is not None:
        stats.update(
            levels=levels, rows_in_need=int(rows_in_need), collected_rows=len(vcs)
        )
    return thresholds


def orders_price_deciles(
    sf_dir: str, *, bin_width: float = 1000.0
) -> ray.data.Dataset:
    """Assign every order its EXACT global price decile (1..10) without a
    global sort — the quantile-bucketize operator a training pipeline uses
    to shard a corpus by length/score percentile.

    Thresholds come from :func:`exact_global_quantiles` (iterative
    histogram refinement, driver pull hard-bounded at any input size), then
    one vectorized searchsorted per batch assigns ``decile = 1 +
    #thresholds < value``.  Replaces the reference's absent analytics
    surface; the shape mirrors ``ntile() OVER (ORDER BY ...)`` but scales
    as histogram + broadcast instead of a global sort."""
    import numpy as np

    qs = [i / 10 for i in range(1, 10)]
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    thresholds = exact_global_quantiles(ds, "o_totalprice", qs, bin_width=bin_width)

    # broadcast thresholds, vectorized decile assignment
    out = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def assign(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy()
        decile = 1 + np.searchsorted(thresholds, v, side="left")
        return batch.append_column("decile", pa.array(decile, pa.int64()))

    return out.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).sort(
        "o_orderkey"
    )


ORDERS_PRICE_DECILES_SQL = """
WITH th AS (
  SELECT unnest(quantile_disc(o_totalprice,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS t
  FROM orders
)
SELECT o.o_orderkey, o.o_totalprice,
       CAST(1 + (SELECT count(*) FROM th WHERE th.t < o.o_totalprice) AS BIGINT)
         AS decile
FROM orders o
ORDER BY o_orderkey
"""

RELATIONAL_QUERIES["orders_price_deciles"] = (
    orders_price_deciles,
    ORDERS_PRICE_DECILES_SQL,
)


# ---------------------------------------------------------------------------
# grouping-sets rollup (multi-level aggregate from ONE partial scan)
# ---------------------------------------------------------------------------

def revenue_rollup(sf_dir: str) -> ray.data.Dataset | pa.Table:
    """GROUP BY ROLLUP(nation, year): detail rows + per-nation subtotals +
    a grand total, from a SINGLE scan — the subtotal levels re-aggregate
    the finest-grain partial (nations x years rows, tiny) on the driver
    instead of re-scanning the fact table per level.

    Subtotal keys use 'ALL'/-1 sentinels (COALESCE in the oracle) so the
    hash compare never depends on engine NULL-ordering.  Revenue sums in
    int64 cents (exact at every level — integer addition is
    order-independent, so detail rows and their subtotal agree bitwise)."""
    import pandas as pd

    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _broadcast_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nation_of_cust = pc.take(
        nation["n_name"].combine_chunks(),
        pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"].combine_chunks()),
    )
    nation_of = _lookup(cust["c_custkey"], nation_of_cust)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "n_name": nation_of(batch["o_custkey"]),
                "o_year": pc.year(batch["o_orderdate"]),
                "tp_c": pc.cast(
                    pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )
        return (
            t.group_by(["n_name", "o_year"])
            .aggregate([("tp_c", "sum"), ([], "count_all")])
            .rename_columns(["n_name", "o_year", "rev_c", "n_orders"])
        )

    from ray.data.aggregate import Sum

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("rev_c", alias_name="rev_c"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()  # tiny: one row per (nation, year)
    )
    sub = (
        fine.groupby("n_name", as_index=False)[["rev_c", "n_orders"]]
        .sum()
        .assign(o_year=-1)
    )
    grand = pd.DataFrame(
        {
            "n_name": ["ALL"],
            "o_year": [-1],
            "rev_c": [fine["rev_c"].sum()],
            "n_orders": [fine["n_orders"].sum()],
        }
    )
    out = pd.concat([fine, sub, grand], ignore_index=True)
    out = out.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "o_year": pa.array(out["o_year"].astype("int64"), pa.int64()),
            "revenue": pa.array(out["rev_c"].astype("int64") / 100.0, pa.float64()),
            "n_orders": pa.array(out["n_orders"].astype("int64"), pa.int64()),
        }
    )


REVENUE_ROLLUP_SQL = """
SELECT coalesce(n_name, 'ALL') AS n_name,
       CAST(coalesce(o_year, -1) AS BIGINT) AS o_year,
       sum(tp_c) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS tp_c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
) t
GROUP BY ROLLUP(n_name, o_year)
ORDER BY n_name, o_year
"""

RELATIONAL_QUERIES["revenue_rollup"] = (revenue_rollup, REVENUE_ROLLUP_SQL)


# ---------------------------------------------------------------------------
# pivot (long -> wide conditional aggregation)
# ---------------------------------------------------------------------------

def events_pivot_hourly(sf_dir: str) -> ray.data.Dataset:
    """Pivot event counts to one column per event type, one row per hour —
    long->wide conditional aggregation.

    The pivot columns come from a tiny distinct pre-scan (bounded by type
    cardinality); the pivot itself is a per-batch partial producing the
    wide indicator sums followed by one small groupby(hour) — the fact
    table crosses the shuffle pre-aggregated to (hours x 1) rows per
    batch, never as raw events."""
    types = sorted(
        distinct_event_types(sf_dir).to_pandas()["event_type"].tolist()
    )
    cols = [f"n_{t}" for t in types]

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        data = {"hour": hour}
        for t, c in zip(types, cols):
            data[c] = pc.cast(pc.equal(batch["event_type"], pa.scalar(t)), pa.int64())
        return (
            pa.table(data)
            .group_by("hour")
            .aggregate([(c, "sum") for c in cols])
            .rename_columns(["hour", *cols])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def recast(batch: pa.Table) -> pa.Table:
        # pin the timestamp unit through the shuffle's pandas round-trip
        return batch.set_column(
            batch.column_names.index("hour"),
            "hour",
            pc.cast(batch["hour"], pa.timestamp("us")),
        )

    return out.map_batches(recast, batch_format="pyarrow", zero_copy_batch=True).sort("hour")


EVENTS_PIVOT_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY 1
ORDER BY hour
"""

RELATIONAL_QUERIES["events_pivot_hourly"] = (events_pivot_hourly, EVENTS_PIVOT_HOURLY_SQL)


def events_unpivot_hourly(sf_dir: str) -> ray.data.Dataset:
    """Wide->long UNPIVOT of the hourly pivot: one (hour, event_type,
    n_events) row per cell of the wide matrix, zero cells kept — the melt
    transform (the inverse of ``events_pivot_hourly``; the pair gives the
    engine both reshape directions).

    The melt itself is trivially parallel: each wide batch emits one long
    slice per type column (pa.concat of k column-projections — no Python
    row loop), and the input is already the pivot's tiny (hours x types)
    matrix, so the only real work is the upstream pivot."""
    types = sorted(
        distinct_event_types(sf_dir).to_pandas()["event_type"].tolist()
    )
    wide = events_pivot_hourly(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = [
            pa.table(
                {
                    "hour": batch["hour"],
                    "event_type": pa.array([t] * n, pa.string()),
                    "n_events": pc.cast(batch[f"n_{t}"], pa.int64()),
                }
            )
            for t in types
        ]
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["hour", "event_type"]
    )


EVENTS_UNPIVOT_HOURLY_SQL = """
WITH wide AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
         CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
  FROM events GROUP BY 1
)
SELECT hour, substr(name, 3) AS event_type, CAST(value AS BIGINT) AS n_events
FROM (UNPIVOT wide ON n_click, n_error, n_purchase, n_signup, n_view
      INTO NAME name VALUE value)
ORDER BY hour, event_type
"""

RELATIONAL_QUERIES["events_unpivot_hourly"] = (
    events_unpivot_hourly,
    EVENTS_UNPIVOT_HOURLY_SQL,
)


def event_type_share_hourly(sf_dir: str) -> ray.data.Dataset:
    """Each event type's share of its hour's total value — the
    ratio-to-report window (``value / sum(value) OVER (PARTITION BY
    hour)``), the last classic window shape the surface lacked.

    The fact table folds to exact (hour, type, int-cents) partials per
    batch, one small groupby, then a per-hour share pass: grouping directly
    on ``hour`` is safe HERE because the grouped result is bounded by the
    TIME DOMAIN x |types| (hours of data, not rows — a year is ~9k groups
    of ~5 rows), unlike per-user/per-doc keys which must bucket.  The share
    is one float division of two exact int64 sums, mirroring the oracle's
    DOUBLE cast bit-for-bit; a zero-total hour yields NULL on both engines
    (NULLIF)."""
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour": pc.floor_temporal(batch["ts"], unit="hour"),
                "event_type": batch["event_type"],
                "value_c": pc.cast(
                    pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )
        return (
            t.group_by(["hour", "event_type"])
            .aggregate([("value_c", "sum")])
            .rename_columns(["hour", "event_type", "value_c"])
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("value_c", alias_name="value_c"))
    )

    def share_group(g: pd.DataFrame) -> pd.DataFrame:
        tot = int(g["value_c"].sum())
        out = pd.DataFrame(
            {
                "hour": g["hour"].astype("datetime64[us]"),
                "event_type": g["event_type"],
                "sum_value": g["value_c"].astype("int64") / 100.0,
                "share": (
                    g["value_c"].astype("int64").astype("float64") / float(tot)
                    if tot != 0
                    else pd.Series([None] * len(g), dtype="float64")
                ),
            }
        )
        return out

    return (
        agg.groupby("hour")
        .map_groups(share_group, batch_format="pandas")
        .sort(["hour", "event_type"])
    )


EVENT_TYPE_SHARE_HOURLY_SQL = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, value_c / 100.0 AS sum_value,
       CAST(value_c AS DOUBLE)
         / CAST(NULLIF(sum(value_c) OVER (PARTITION BY hour), 0) AS DOUBLE)
         AS share
FROM agg
ORDER BY hour, event_type
"""

RELATIONAL_QUERIES["event_type_share_hourly"] = (
    event_type_share_hourly,
    EVENT_TYPE_SHARE_HOURLY_SQL,
)


# ---------------------------------------------------------------------------
# distributed two-variable statistics (grouped Pearson correlation)
# ---------------------------------------------------------------------------

def events_hour_value_corr(sf_dir: str) -> pa.Table:
    """Pearson correlation between hour-of-day and value, per event type —
    the distributed co-moment aggregate (corr/covar family).

    All five co-moments (n, Sx, Sy, Sxy, Sx2, Sy2) accumulate as EXACT
    int64 (x = hour 0..23, y = int cents; Sy2 stays exact below ~9e10
    rows per group at 1e4-cent values — at larger scale shard the group
    and sum co-moments, they are associative).  The final correlation is
    ONE fixed float expression over identical integers, mirrored term for
    term in the oracle, so the values hash-match bitwise (same recipe as
    events_value_zscore).  Zero-variance groups yield NULL (NULLIF both
    sides)."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.hour(batch["ts"]), pa.int64())
        y = pc.cast(pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "x2": pc.multiply(x, x),
                "y2": pc.multiply(y, y),
            }
        )
        return (
            t.group_by("event_type")
            .aggregate(
                [([], "count_all"), ("x", "sum"), ("y", "sum"), ("xy", "sum"),
                 ("x2", "sum"), ("y2", "sum")]
            )
            .rename_columns(["event_type", "n", "sx", "sy", "sxy", "sx2", "sy2"])
        )

    from ray.data.aggregate import Sum

    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")])
        .sort("event_type")
        .to_pandas()  # tiny: one row per event type
    )
    n = stats["n"].to_numpy().astype(np.float64)
    sx = stats["sx"].to_numpy().astype(np.float64)
    sy = stats["sy"].to_numpy().astype(np.float64)
    sxy = stats["sxy"].to_numpy().astype(np.float64)
    sx2 = stats["sx2"].to_numpy().astype(np.float64)
    sy2 = stats["sy2"].to_numpy().astype(np.float64)
    num = n * sxy - sx * sy
    den = np.sqrt(np.maximum(n * sx2 - sx * sx, 0.0)) * np.sqrt(
        np.maximum(n * sy2 - sy * sy, 0.0)
    )
    zero = den == 0.0
    corr = num / np.where(zero, 1.0, den)
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"], pa.string()),
            "n": pa.array(stats["n"].astype("int64"), pa.int64()),
            "corr_hour_value": pa.array(corr, pa.float64(), mask=zero),
        }
    )


EVENTS_HOUR_VALUE_CORR_SQL = """
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sx2, sum(y * y) AS sy2
  FROM (
    SELECT event_type,
           CAST(hour(ts) AS BIGINT) AS x,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
  ) t
  GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / NULLIF(sqrt(greatest(CAST(n AS DOUBLE) * sx2
                              - CAST(sx AS DOUBLE) * sx, 0))
                * sqrt(greatest(CAST(n AS DOUBLE) * sy2
                                - CAST(sy AS DOUBLE) * sy, 0)), 0)
         AS corr_hour_value
FROM m
ORDER BY event_type
"""

RELATIONAL_QUERIES["events_hour_value_corr"] = (
    events_hour_value_corr,
    EVENTS_HOUR_VALUE_CORR_SQL,
)


# ---------------------------------------------------------------------------
# round-4 TPC-H plan shapes: EXISTS-semi count, returned-revenue top-k join,
# CASE bucket counts, conditional-sum ratio, scalar-subquery + anti join
# ---------------------------------------------------------------------------

def _ts(s: str) -> pa.Scalar:
    return pa.scalar(pc.strptime(s, format="%Y-%m-%d", unit="us"))


def q4_priority_with_returns(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 shape: orders in a date window with EXISTS(matching
    lineitem) — grouped count by priority.

    The EXISTS probe side pre-collapses to per-batch DISTINCT orderkeys (a
    key column, never lineitem rows), then ONE tagged-union bucket shuffle
    evaluates the semi join; each bucket emits (priority, count) partials,
    so the final groupby exchanges at most 5 x n_buckets rows."""
    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())
    lo, hi = _ts("1996-01-01"), _ts("1997-01-01")

    def li_keys(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        t = pa.table({"key": f["l_orderkey"]}).group_by("key").aggregate([])
        n = t.num_rows
        return pa.table(
            {
                "key": t["key"],
                "o_orderpriority": pa.nulls(n, pa.string()),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                pc.greater_equal(batch["o_orderdate"], lo),
                pc.less(batch["o_orderdate"], hi),
            )
        )
        n = f.num_rows
        return pa.table(
            {
                "key": f["o_orderkey"],
                "o_orderpriority": f["o_orderpriority"],
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(f["o_orderkey"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("o_orderpriority", pa.string()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]).map_batches(
        li_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def semi_count_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        have = pc.unique(group.filter(pc.equal(group["side"], 0))["key"].combine_chunks())
        od = group.filter(pc.equal(group["side"], 1))
        hit = od.filter(pc.is_in(od["key"], value_set=have))
        return (
            hit.select(["o_orderpriority"])
            .group_by("o_orderpriority")
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "order_count"])
        )

    from ray.data.aggregate import Sum

    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(semi_count_bucket, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .sort("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.

    lineitem 'R' rows pre-fold to per-order int-cents revenue partials;
    date-filtered orders carry (orderkey -> custkey); ONE bucket shuffle on
    orderkey joins + re-keys the revenue to custkey; a second SMALL groupby
    folds per-customer revenue (rows bounded by distinct customers, not
    lineitems); the <=20 survivors attach names via broadcast AFTER the
    limit, then re-sort (map stages do not preserve block order)."""
    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())
    lo, hi = _ts("1996-01-01"), _ts("1996-07-01")

    def li_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        price_c = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(f["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = (
            pa.table({"key": f["l_orderkey"], "rev_c4": rev_c4})
            .group_by("key")
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["key", "rev_c4"])
        )
        n = t.num_rows
        return pa.table(
            {
                "key": t["key"],
                "rev_c4": t["rev_c4"],
                "o_custkey": pa.nulls(n, pa.int64()),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                pc.greater_equal(batch["o_orderdate"], lo),
                pc.less(batch["o_orderdate"], hi),
            )
        )
        n = f.num_rows
        return pa.table(
            {
                "key": f["o_orderkey"],
                "rev_c4": pa.nulls(n, pa.int64()),
                "o_custkey": f["o_custkey"],
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(f["o_orderkey"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("rev_c4", pa.int64()),
            ("o_custkey", pa.int64()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def join_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        li_rows = (
            group.filter(pc.equal(group["side"], 0))
            .select(["key", "rev_c4"])
            .group_by("key")
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["key", "rev_c4"])
        )
        od = group.filter(pc.equal(group["side"], 1)).select(["key", "o_custkey"])
        j = li_rows.join(od, keys=["key"], join_type="inner")
        # partial per-customer fold inside the bucket
        return (
            j.select(["o_custkey", "rev_c4"])
            .group_by("o_custkey")
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["c_custkey", "rev_c4"])
        )

    from ray.data.aggregate import Sum

    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_name"])
    name_of = _lookup(cust["c_custkey"], cust["c_name"])

    def attach_name(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": name_of(batch["c_custkey"]),
                "revenue": pc.divide(
                    pc.cast(batch["rev_c4"], pa.float64()), pa.scalar(10000.0)
                ),
            }
        )

    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        .map_batches(
            lambda b: b.append_column(
                "neg_rev", pc.negate_checked(b["rev_c4"])
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["neg_rev", "c_custkey"])
        .limit(20)
        .map_batches(attach_name, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["revenue", "c_custkey"], descending=[True, False])
    )


Q10_SQL = """
SELECT c.c_custkey, c_name,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c.c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_linestatus(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q12 shape: CASE-bucket counts per line status — how many
    shipped lineitems belong to high- vs low-priority orders.

    lineitem pre-folds to (orderkey, linestatus, n) partials; orders carry
    one boolean (priority in the high set) per key; ONE bucket shuffle
    joins them and each bucket emits (linestatus, high_n, low_n) partials —
    the final groupby exchanges rows bounded by |linestatus| x n_buckets."""
    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())
    lo, hi = _ts("1997-01-01"), _ts("1998-01-01")
    high = pa.array(["1-URGENT", "2-HIGH"], pa.string())

    def li_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        t = (
            pa.table({"key": f["l_orderkey"], "l_linestatus": f["l_linestatus"]})
            .group_by(["key", "l_linestatus"])
            .aggregate([([], "count_all")])
            .rename_columns(["key", "l_linestatus", "n"])
        )
        m = t.num_rows
        return pa.table(
            {
                "key": t["key"],
                "l_linestatus": t["l_linestatus"],
                "n": t["n"],
                "is_high": pa.nulls(m, pa.bool_()),
                "side": pa.array([0] * m, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["o_orderkey"],
                "l_linestatus": pa.nulls(n, pa.string()),
                "n": pa.nulls(n, pa.int64()),
                "is_high": pc.is_in(batch["o_orderpriority"], value_set=high),
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(batch["o_orderkey"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("l_linestatus", pa.string()),
            ("n", pa.int64()),
            ("is_high", pa.bool_()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def fold_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        li_rows = group.filter(pc.equal(group["side"], 0)).select(
            ["key", "l_linestatus", "n"]
        )
        od = group.filter(pc.equal(group["side"], 1)).select(["key", "is_high"])
        j = li_rows.join(od, keys=["key"], join_type="inner")
        hi_n = pc.if_else(j["is_high"], j["n"], pa.scalar(0, pa.int64()))
        lo_n = pc.if_else(j["is_high"], pa.scalar(0, pa.int64()), j["n"])
        return (
            pa.table(
                {
                    "l_linestatus": j["l_linestatus"],
                    "high_line_count": hi_n,
                    "low_line_count": lo_n,
                }
            )
            .group_by("l_linestatus")
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(["l_linestatus", "high_line_count", "low_line_count"])
        )

    from ray.data.aggregate import Sum

    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
        .sort("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q14_promo_revenue(sf_dir: str) -> ray.data.Dataset | pa.Table:
    """TPC-H Q14 shape: promo revenue share in a date window.

    ``part`` is a broadcast dimension (partkey -> is-promo boolean in the
    UDF closure); each lineitem batch folds to ONE (promo_c4, total_c4)
    partial row, so the exchange is a trivial gather and the final ratio
    divides two exact int64 sums — bitwise-identical doubles on both
    engines."""
    part = _broadcast_table(sf_dir, "part", ["p_partkey", "p_type"])
    promo_keys = part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"].combine_chunks()
    lo, hi = _ts("1997-01-01"), _ts("1997-07-01")

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        price_c = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(f["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        is_promo = pc.is_in(f["l_partkey"], value_set=promo_keys)
        promo = pc.sum(pc.if_else(is_promo, rev_c4, pa.scalar(0, pa.int64()))).as_py() or 0
        total = pc.sum(rev_c4).as_py() or 0
        return pa.table(
            {
                "promo_c4": pa.array([promo], pa.int64()),
                "total_c4": pa.array([total], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Sum("promo_c4", alias_name="promo_c4"), Sum("total_c4", alias_name="total_c4")
    )
    return pa.table(
        {
            "promo_revenue": pa.array(
                [100.0 * out["promo_c4"] / out["total_c4"]], pa.float64()
            )
        }
    )


Q14_SQL = """
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice*100) AS BIGINT)
                             * (100 - CAST(round(l_discount*100) AS BIGINT))
                        ELSE 0 END)
       / sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


def q22_idle_customers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q22 shape: customers above the average positive balance with
    no RECENT orders (none since 1999-01-01; every customer in the driver
    tables has some order, so the un-windowed variant is empty at every
    scale), counted per market segment.

    The scalar subquery (global average) is computed DISTRIBUTEDLY in exact
    int64 cents then broadcast as one double — the SQL mirrors the same
    cents arithmetic because a float avg's accumulation order is
    engine-specific.  The anti join re-uses the tagged-union bucket recipe:
    per-batch DISTINCT order custkeys + threshold-filtered customers in one
    shuffle; each bucket emits (segment, count, balance-cents) partials."""
    from ray.data.aggregate import Sum
    from ..scale import bucket_count, estimate_rows

    # pass 1 (distributed): exact average of positive balances
    def bal_partial(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["c_acctbal"], pa.scalar(0.0)))
        bal_c = pc.cast(pc.round(pc.multiply(f["c_acctbal"], pa.scalar(100.0))), pa.int64())
        return pa.table(
            {
                "sum_c": pa.array([pc.sum(bal_c).as_py() or 0], pa.int64()),
                "n": pa.array([f.num_rows], pa.int64()),
            }
        )

    cust_cols = ["c_custkey", "c_mktsegment", "c_acctbal"]
    agg = (
        read_table(sf_dir, "customer", columns=["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("sum_c", alias_name="sum_c"), Sum("n", alias_name="n"))
    )
    threshold = (agg["sum_c"] / 100.0) / agg["n"]

    n_buckets = bucket_count(estimate_rows(sf_dir, "customer"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())

    recent = _ts("1999-01-01")

    def order_keys(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater_equal(batch["o_orderdate"], recent))
        t = pa.table({"key": f["o_custkey"]}).group_by("key").aggregate([])
        n = t.num_rows
        return pa.table(
            {
                "key": t["key"],
                "c_mktsegment": pa.nulls(n, pa.string()),
                "bal_c": pa.nulls(n, pa.int64()),
                "side": pa.array([0] * n, pa.int8()),
                "bucket": pc.bit_wise_and(t["key"], mask),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.greater(batch["c_acctbal"], pa.scalar(threshold)))
        bal_c = pc.cast(pc.round(pc.multiply(f["c_acctbal"], pa.scalar(100.0))), pa.int64())
        n = f.num_rows
        return pa.table(
            {
                "key": f["c_custkey"],
                "c_mktsegment": f["c_mktsegment"],
                "bal_c": bal_c,
                "side": pa.array([1] * n, pa.int8()),
                "bucket": pc.bit_wise_and(f["c_custkey"], mask),
            }
        )

    superset = pa.schema(
        [
            ("key", pa.int64()),
            ("c_mktsegment", pa.string()),
            ("bal_c", pa.int64()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
        order_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = read_table(sf_dir, "customer", columns=cust_cols).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )

    def anti_bucket(group: pa.Table) -> pa.Table:
        group = group.select(superset.names).cast(superset)
        have = pc.unique(group.filter(pc.equal(group["side"], 0))["key"].combine_chunks())
        cu = group.filter(pc.equal(group["side"], 1))
        idle = cu.filter(pc.invert(pc.is_in(cu["key"], value_set=have)))
        return (
            pa.table(
                {
                    "c_mktsegment": idle["c_mktsegment"],
                    "numcust": pa.array([1] * idle.num_rows, pa.int64()),
                    "bal_c": idle["bal_c"],
                }
            )
            .group_by("c_mktsegment")
            .aggregate([("numcust", "sum"), ("bal_c", "sum")])
            .rename_columns(["c_mktsegment", "numcust", "bal_c"])
        )

    return (
        orders.union(cust)
        .groupby("bucket")
        .map_groups(anti_bucket, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("numcust", alias_name="numcust"), Sum("bal_c", alias_name="bal_c"))
        .map_batches(
            _descale({"bal_c": 100.0}), batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(
            lambda b: b.rename_columns(["c_mktsegment", "numcust", "totacctbal"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("c_mktsegment")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT (sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, count(*) AS numcust,
       sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


RELATIONAL_QUERIES.update(
    {
        "q4_priority_with_returns": (q4_priority_with_returns, Q4_SQL),
        "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
        "q12_priority_linestatus": (q12_priority_linestatus, Q12_SQL),
        "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
        "q22_idle_customers": (q22_idle_customers, Q22_SQL),
    }
)


# ---------------------------------------------------------------------------
# ordered funnel analysis (sequential-pattern counts per user)
# ---------------------------------------------------------------------------

def events_funnel(
    sf_dir: str,
    *,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Ordered funnel: how many users completed steps 1..k IN ORDER (each
    step strictly after the previous one's earliest completion).  The
    greedy-earliest rule (take the min ts for step 1, then the min ts
    strictly after it for step 2, ...) is exact for funnel existence and
    gives both engines the same deterministic integer counts.

    Scale shape: events are filtered to the step types BEFORE the
    exchange, then one user-bucket shuffle (a user lives in exactly one
    bucket, so per-bucket user counts are disjoint partials) and a
    len(steps)-row final fold.  The per-bucket pass is len(steps)
    vectorized pandas scans, never a Python loop per user."""
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    wanted = pa.array(list(steps), pa.string())
    add_bucket = _user_bucket_adder(_user_buckets(sf_dir, n_buckets))

    def pre(batch: pa.Table) -> pa.Table:
        return add_bucket(batch.filter(pc.is_in(batch["event_type"], value_set=wanted)))

    _EMPTY = {
        "step": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
        "n_users": pd.Series([], dtype="int64"),
    }

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "user_id" not in g.columns:
            return pd.DataFrame(_EMPTY)
        cur = None  # per-user earliest completion ts of the previous step
        out_rows = []
        for i, st in enumerate(steps, 1):
            sel = g[g["event_type"] == st]
            if cur is not None:
                thr = sel["user_id"].map(cur)
                sel = sel[thr.notna() & (sel["ts"] > thr)]
            cur = sel.groupby("user_id")["ts"].min()
            out_rows.append((i, st, len(cur)))
        return pd.DataFrame(
            {
                "step": pd.Series([r[0] for r in out_rows], dtype="int64"),
                "event_type": [r[1] for r in out_rows],
                "n_users": pd.Series([r[2] for r in out_rows], dtype="int64"),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["step", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort("step")
    )


def events_funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    ctes = []
    selects = []
    prev = None
    for i, st in enumerate(steps, 1):
        name = f"s{i}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN {prev} USING (user_id) "
                f"WHERE e.event_type = '{st}' AND e.ts > {prev}.t GROUP BY e.user_id)"
            )
        selects.append(
            f"SELECT {i} AS step, '{st}' AS event_type, "
            f"(SELECT count(*) FROM {name}) AS n_users"
        )
        prev = name
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects) + "\nORDER BY step"
    )


RELATIONAL_QUERIES["events_funnel"] = (events_funnel, events_funnel_sql())

# Supplementary TPC-H plan shapes live in tpch_supp.py (this import sits at
# the very end of the module so tpch_supp's `from .relational import ...`
# finds every helper already bound; keep it last).
from .tpch_supp import TPCH_SUPP_QUERIES  # noqa: E402

RELATIONAL_QUERIES.update(TPCH_SUPP_QUERIES)

from .behavior import BEHAVIOR_QUERIES  # noqa: E402

RELATIONAL_QUERIES.update(BEHAVIOR_QUERIES)

from .warehouse import WAREHOUSE_QUERIES  # noqa: E402

RELATIONAL_QUERIES.update(WAREHOUSE_QUERIES)


# ---------------------------------------------------------------------------
# RFM customer segmentation (multi-metric global-quantile bucketize)
# ---------------------------------------------------------------------------

def rfm_segments(sf_dir: str) -> ray.data.Dataset:
    """Recency / Frequency / Monetary quartile codes per customer — the
    classic lifecycle-segmentation shape: per-key aggregates, then THREE
    independent global-quantile bucketizations stitched into one code.

    The per-customer aggregate (one row per customer, bounded) is
    ``materialize()``d once so the three quantile histograms and the final
    labeling map share blocks instead of re-running the orders scan 4x
    (CLAUDE.md branching rule — the parent here is the expensive part).
    Recency rides as int64 epoch-us CAST BEFORE any shuffle (the pinned
    timestamp-resolution hazard), money in exact int64 cents."""
    import numpy as np

    from ray.data.aggregate import Max, Sum

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("r_us", pa.int64()),
                    ("f", pa.int64()),
                    ("m_cents", pa.int64()),
                ]
            ).empty_table()
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        return (
            pa.table(
                {
                    "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                    "r_us": pc.cast(batch["o_orderdate"], pa.int64()),
                    "f": pa.array(np.ones(batch.num_rows, np.int64)),
                    "m_cents": cents,
                }
            )
            .group_by("o_custkey")
            .aggregate([("r_us", "max"), ("f", "sum"), ("m_cents", "sum")])
            .rename_columns(["o_custkey", "r_us", "f", "m_cents"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(
            Max("r_us", alias_name="r_us"),
            Sum("f", alias_name="f"),
            Sum("m_cents", alias_name="m_cents"),
        )
        .materialize()  # one row per customer — bounded at any order count
    )
    qs = [0.25, 0.5, 0.75]
    th = {c: exact_global_quantiles(agg, c, qs) for c in ("r_us", "f", "m_cents")}

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("r_us", pa.int64()),
                    ("f", pa.int64()),
                    ("m_cents", pa.int64()),
                    ("r_score", pa.int64()),
                    ("f_score", pa.int64()),
                    ("m_score", pa.int64()),
                    ("rfm_code", pa.int64()),
                ]
            ).empty_table()
        scores = {}
        for c in ("r_us", "f", "m_cents"):
            v = batch[c].to_numpy(zero_copy_only=False)
            # 1 + #thresholds strictly below v == the oracle's count(t < v)
            scores[c] = 1 + np.searchsorted(th[c], v, side="left")
        return pa.table(
            {
                "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "r_us": pc.cast(batch["r_us"], pa.int64()),
                "f": pc.cast(batch["f"], pa.int64()),
                "m_cents": pc.cast(batch["m_cents"], pa.int64()),
                "r_score": pa.array(scores["r_us"].astype(np.int64)),
                "f_score": pa.array(scores["f"].astype(np.int64)),
                "m_score": pa.array(scores["m_cents"].astype(np.int64)),
                "rfm_code": pa.array(
                    (
                        100 * scores["r_us"] + 10 * scores["f"] + scores["m_cents"]
                    ).astype(np.int64)
                ),
            }
        )

    return agg.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).sort(
        "o_custkey"
    )


RFM_SEGMENTS_SQL = """
WITH c AS (
  SELECT o_custkey, epoch_us(max(o_orderdate)) AS r_us,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
  FROM orders GROUP BY o_custkey
),
rt AS (SELECT unnest(quantile_disc(r_us, [0.25, 0.5, 0.75])) AS t FROM c),
ft AS (SELECT unnest(quantile_disc(f, [0.25, 0.5, 0.75])) AS t FROM c),
mt AS (SELECT unnest(quantile_disc(m_cents, [0.25, 0.5, 0.75])) AS t FROM c),
v AS (
  SELECT c.o_custkey, c.r_us, c.f, c.m_cents,
         CAST(1 + (SELECT count(*) FROM rt WHERE rt.t < c.r_us) AS BIGINT) AS r_score,
         CAST(1 + (SELECT count(*) FROM ft WHERE ft.t < c.f) AS BIGINT) AS f_score,
         CAST(1 + (SELECT count(*) FROM mt WHERE mt.t < c.m_cents) AS BIGINT) AS m_score
  FROM c
)
SELECT o_custkey, r_us, f, m_cents, r_score, f_score, m_score,
       CAST(100 * r_score + 10 * f_score + m_score AS BIGINT) AS rfm_code
FROM v ORDER BY o_custkey
"""

RELATIONAL_QUERIES["rfm_segments"] = (rfm_segments, RFM_SEGMENTS_SQL)


# ---------------------------------------------------------------------------
# MERGE / upsert (lakehouse MERGE INTO: delta overrides base by key)
# ---------------------------------------------------------------------------

def orders_merge_upsert(sf_dir: str) -> ray.data.Dataset:
    """MERGE INTO shape: a DELTA batch (here the deterministic slice
    ``o_orderkey % 5 == 0`` with repriced totals, standing in for a CDC
    feed) upserts into the BASE orders table — matched keys take the delta
    row, unmatched keys keep the base row, delta-only keys insert.

    One tagged-union co-shuffle keyed by orderkey bucket (base and delta
    rows ride the SAME exchange; no join materializes); per bucket a
    vectorized last-writer-wins mask picks the surviving row.  Money in
    int64 cents end-to-end."""
    import numpy as np

    from ..scale import bucket_count, estimate_rows

    n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=32)

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    union_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("price_cents", pa.int64()),
            ("src", pa.int64()),  # 0 = base, 1 = delta
        ]
    )
    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("price_cents", pa.int64()),
            ("src", pa.int64()),
        ]
    )

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return union_schema.empty_table()
        keys = pc.cast(batch["o_orderkey"], pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        kn = keys.to_numpy()
        bucket = pa.array((kn % n_buckets).astype(np.int64))
        base = pa.table(
            {
                "bucket": bucket,
                "o_orderkey": keys,
                "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "price_cents": cents,
                "src": pa.array(np.zeros(len(kn), np.int64)),
            }
        )
        is_delta = kn % 5 == 0
        if not is_delta.any():
            return base
        idx = pa.array(np.flatnonzero(is_delta))
        delta = pa.table(
            {
                "bucket": pc.take(base["bucket"], idx),
                "o_orderkey": pc.take(keys, idx),
                "o_custkey": pc.take(base["o_custkey"], idx),
                "price_cents": pc.add(
                    pc.take(cents, idx), pa.scalar(100_000, pa.int64())
                ),
                "src": pa.array(np.ones(len(idx), np.int64)),
            }
        )
        return pa.concat_tables([base, delta])

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return out_schema.empty_table()
        group = group.cast(union_schema)
        keys = group["o_orderkey"].to_numpy()
        src = group["src"].to_numpy()
        # last-writer-wins: sort by (key, src) and keep each key's LAST row
        order = np.lexsort((src, keys))
        k_sorted = keys[order]
        keep = np.ones(len(order), bool)
        keep[:-1] = k_sorted[1:] != k_sorted[:-1]
        take = pa.array(order[keep])
        return pa.table(
            {
                "o_orderkey": pc.take(group["o_orderkey"], take),
                "o_custkey": pc.take(group["o_custkey"], take),
                "price_cents": pc.take(group["price_cents"], take),
                "src": pc.take(group["src"], take),
            }
        )

    return (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .sort("o_orderkey")
    )


ORDERS_MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(0 AS BIGINT) AS src
  FROM orders
),
delta AS (
  SELECT o_orderkey, o_custkey, price_cents + 100000 AS price_cents,
         CAST(1 AS BIGINT) AS src
  FROM base WHERE o_orderkey % 5 = 0
)
SELECT o_orderkey, o_custkey, price_cents, src
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
)
WHERE rn = 1
ORDER BY o_orderkey
"""

RELATIONAL_QUERIES["orders_merge_upsert"] = (orders_merge_upsert, ORDERS_MERGE_UPSERT_SQL)


# ---------------------------------------------------------------------------
# distributed skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def _pareto_sweep(date_us: "np.ndarray", price: "np.ndarray"):
    """Indices on the (min date, max price) Pareto frontier: a row
    survives iff it carries its date's max price AND that max strictly
    beats every earlier date's max.  O(n log n) vectorized sweep."""
    import numpy as np

    order = np.lexsort((-price, date_us))
    d, p = date_us[order], price[order]
    new_date = np.ones(len(d), bool)
    new_date[1:] = d[1:] != d[:-1]
    # per-row: its date's max price (first row of each date after the sort)
    date_max = p[new_date][np.cumsum(new_date) - 1]
    # strictly-earlier-date running max
    dm = p[new_date]
    prev = np.empty(len(dm))
    prev[0] = -np.inf
    np.maximum.accumulate(dm[:-1], out=prev[1:]) if len(dm) > 1 else None
    prev_max = prev[np.cumsum(new_date) - 1]
    keep = (p == date_max) & (date_max > prev_max)
    return order[keep]


def orders_pareto_frontier(sf_dir: str) -> ray.data.Dataset | pa.Table:
    """Skyline query: orders not dominated on (earlier date, higher price)
    — the multi-criteria "best tradeoffs" operator (Börzsönyi et al. 2001).

    Distributed shape: the local frontier of any block is a SUPERSET
    restriction of the global one (a globally undominated row is
    undominated in its block), so each batch emits only its local frontier
    (~log-size on non-adversarial data), a <=64-group fold re-sweeps, and
    the driver's final sweep sees a bounded candidate set.  Money int64
    cents, dates as int64 epoch-us cast before any exchange."""
    import numpy as np

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )

    cand_schema = pa.schema(
        [
            ("fk", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("date_us", pa.int64()),
            ("price_cents", pa.int64()),
        ]
    )

    def local_frontier(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return cand_schema.empty_table()
        date_us = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy()
        price = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        ).to_numpy()
        keep = _pareto_sweep(date_us, price)
        keys = batch["o_orderkey"].to_numpy()[keep]
        return pa.table(
            {
                "fk": pa.array((keys % 64).astype(np.int64)),
                "o_orderkey": pa.array(keys.astype(np.int64)),
                "date_us": pa.array(date_us[keep]),
                "price_cents": pa.array(price[keep]),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return cand_schema.empty_table()
        group = group.cast(cand_schema)
        keep = _pareto_sweep(
            group["date_us"].to_numpy(), group["price_cents"].to_numpy()
        )
        return group.take(pa.array(np.sort(keep)))

    cands = (
        ds.map_batches(local_frontier, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fk")
        .map_groups(fold, batch_format="pyarrow")
        .to_pandas()  # bounded: <=64 folded local frontiers of a skyline
    )
    if cands.empty:
        return pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("date_us", pa.int64()),
                ("price_cents", pa.int64()),
            ]
        ).empty_table()
    keep = _pareto_sweep(
        cands["date_us"].to_numpy(np.int64), cands["price_cents"].to_numpy(np.int64)
    )
    out = cands.iloc[np.sort(keep)].sort_values("o_orderkey", ignore_index=True)
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
            "date_us": pa.array(out["date_us"].to_numpy(np.int64)),
            "price_cents": pa.array(out["price_cents"].to_numpy(np.int64)),
        }
    )


ORDERS_PARETO_FRONTIER_SQL = """
WITH b AS (
  SELECT o_orderkey, epoch_us(o_orderdate) AS date_us,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
w AS (
  SELECT *,
         max(price_cents) OVER (PARTITION BY date_us) AS date_max,
         max(price_cents) OVER (ORDER BY date_us
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           EXCLUDE GROUP) AS prev_max
  FROM b
)
SELECT o_orderkey, date_us, price_cents
FROM w
WHERE price_cents = date_max AND (prev_max IS NULL OR date_max > prev_max)
ORDER BY o_orderkey
"""

RELATIONAL_QUERIES["orders_pareto_frontier"] = (
    orders_pareto_frontier,
    ORDERS_PARETO_FRONTIER_SQL,
)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-dimensional data clustering
# ---------------------------------------------------------------------------

_Z_BITS = 16


def orders_zorder_keys(sf_dir: str) -> ray.data.Dataset:
    """Morton/Z-order key per order over (customer, order-hour) — the
    lakehouse layout operator (Delta/Iceberg OPTIMIZE ZORDER BY): sorting
    or partitioning by the interleaved key co-locates rows that are close
    in BOTH dimensions, so per-customer AND per-time-range scans both prune
    well from one layout.

    The key interleaves the low ``_Z_BITS`` bits of each dimension
    (bit i of custkey -> bit 2i, bit i of hour -> bit 2i+1) — pure int64
    vectorized shifts, and the same 32-term expression generated into the
    SQL oracle.  One map + the global sort a layout rewrite performs
    anyway."""
    import numpy as np

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("zkey", pa.int64()),
                ]
            ).empty_table()
        a = batch["o_custkey"].to_numpy().astype(np.int64) & ((1 << _Z_BITS) - 1)
        hour = (
            pc.cast(batch["o_orderdate"], pa.int64()).to_numpy() // 3_600_000_000
        ) & ((1 << _Z_BITS) - 1)
        z = np.zeros(len(a), np.int64)
        for i in range(_Z_BITS):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((hour >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "zkey": pa.array(z),
            }
        )

    return ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["zkey", "o_orderkey"]
    )


def _zorder_sql_expr(a: str, b: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ORDERS_ZORDER_KEYS_SQL = f"""
WITH b AS (
  SELECT o_orderkey,
         o_custkey & {(1 << _Z_BITS) - 1} AS a,
         (epoch_us(o_orderdate) // 3600000000) & {(1 << _Z_BITS) - 1} AS h
  FROM orders
)
SELECT o_orderkey, CAST({_zorder_sql_expr("a", "h")} AS BIGINT) AS zkey
FROM b ORDER BY zkey, o_orderkey
"""

RELATIONAL_QUERIES["orders_zorder_keys"] = (orders_zorder_keys, ORDERS_ZORDER_KEYS_SQL)


# ---------------------------------------------------------------------------
# grouped robust statistics (median / trimmed mean / MAD) via ONE
# group-encoded bounded rank refine — no per-group sort, no t-digest
# ---------------------------------------------------------------------------

_ROBUST_SHIFT = 1 << 40  # value slot per group: 0 <= cents < 2^40


def orders_robust_stats(sf_dir: str) -> pa.Table:
    """Grouped ROBUST statistics of order value per priority class —
    exact median, 10%-trimmed sum/count, and MAD (median absolute
    deviation), all in EXACT int64 cents, with no per-group sort, no full
    value-domain histogram, and a hard-bounded driver pull.

    The outlier-resistant health profile of a revenue stream (or, on a
    corpus, of a score column): mean/stddev move with a single corrupted
    row; median/trimmed-mean/MAD do not.  Distinct from the t-digest path
    (``approx_quantiles_by`` — approximate) and the exact histogram path
    (``doc_length_percentiles_by_lang`` — needs a bounded value DOMAIN):
    this is exact over an unbounded domain.

    Scheme — grouped order statistics through ONE refine:
      1. tiny groupby: per-group row counts -> prefix offsets O_g over
         lexicographic group order;
      2. encode group into the value domain: ``combined = gid*2^40 +
         cents`` (cents >= 0 and << 2^40, so every group's values occupy a
         disjoint ascending slot — a per-group rank r becomes the GLOBAL
         rank O_g + r);
      3. one :func:`exact_global_quantiles` call with explicit ``ranks``
         selects ALL per-group order statistics at once: the k-th smallest
         (k = n//10, the trim boundary), the median (rank ceil(n/2),
         ``quantile_disc`` semantics), and the (n-k+1)-th smallest (the
         smallest of the top k);
      4. one counting pass with the boundary values broadcast turns
         boundary-tie counts into the exact trimmed sum: dropping the k
         smallest ROWS removes ``sum(v < lo) + (k - count(v < lo))*lo`` —
         deterministic even though WHICH tied row is dropped is not, since
         tied rows carry equal values (mirrors the oracle's row_number
         window);
      5. a second refine on ``gid*2^40 + |cents - median_g|`` yields the
         MADs with the same rank translation.

    Driver pull per refine level stays O(groups * refine_factor) histogram
    rows at any input size; the counting pass folds to one row per group.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def size_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema([("grp", pa.string()), ("n", pa.int64())]).empty_table()
        return (
            pa.table({"grp": batch["o_orderpriority"]})
            .group_by("grp")
            .aggregate([([], "count_all")])
            .rename_columns(["grp", "n"])
        )

    sizes = (
        ds.map_batches(size_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("grp")
        .aggregate(Sum("n", alias_name="n"))
        .sort("grp")
        .to_pandas()  # one row per priority class
    )
    groups: list[str] = sizes["grp"].tolist()
    ns = sizes["n"].astype(int).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(ns)[:-1]]).astype(np.int64)
    grp_arr = pa.array(groups, pa.string())

    # per-group order-statistic ranks -> global ranks (ascending: groups in
    # gid order; within a group k <= ceil(n/2) <= n-k+1 for k = n//10)
    ranks: list[int] = []
    slots: list[tuple[int, str]] = []
    for gid, n in enumerate(ns):
        n = int(n)
        k = n // 10
        off = int(offsets[gid])
        if k >= 1:
            ranks.append(off + k)
            slots.append((gid, "lo"))
        ranks.append(off + (n + 1) // 2)
        slots.append((gid, "med"))
        if k >= 1:
            ranks.append(off + n - k + 1)
            slots.append((gid, "hi"))

    def _cents_gid(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        gid = pc.cast(
            pc.index_in(batch["o_orderpriority"], value_set=grp_arr), pa.int64()
        )
        return cents, gid

    def to_combined(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema([("combined", pa.int64())]).empty_table()
        cents, gid = _cents_gid(batch)
        return pa.table(
            {"combined": pc.add(pc.multiply(gid, pa.scalar(_ROBUST_SHIFT)), cents)}
        )

    combined = ds.map_batches(to_combined, batch_format="pyarrow", zero_copy_batch=True)
    vals = exact_global_quantiles(
        combined, "combined", [], ranks=ranks, bin_width=float(1 << 20)
    )

    n_groups = len(groups)
    # sentinels: lo=-1 (cents >= 0 -> count(v < -1) == 0) / hi=2^40 make the
    # k == 0 groups trim nothing in the counting pass
    lo = np.full(n_groups, -1, np.int64)
    hi = np.full(n_groups, _ROBUST_SHIFT, np.int64)
    med = np.zeros(n_groups, np.int64)
    for (gid, which), v in zip(slots, vals):
        c = int(round(v)) - gid * _ROBUST_SHIFT
        if which == "lo":
            lo[gid] = c
        elif which == "hi":
            hi[gid] = c
        else:
            med[gid] = c

    def count_partial(batch: pa.Table, *, _lo=lo, _hi=hi) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("gid", pa.int64()),
                    ("n", pa.int64()),
                    ("s", pa.int64()),
                    ("n_lt", pa.int64()),
                    ("s_lt", pa.int64()),
                    ("n_gt", pa.int64()),
                    ("s_gt", pa.int64()),
                ]
            ).empty_table()
        cents_a, gid_a = _cents_gid(batch)
        cents = cents_a.to_numpy()
        gid = gid_a.to_numpy()
        lt = cents < _lo[gid]
        gt = cents > _hi[gid]
        return (
            pa.table(
                {
                    "gid": gid_a,
                    "n": pa.array(np.ones(len(cents), np.int64)),
                    "s": cents_a,
                    "n_lt": pa.array(lt.astype(np.int64)),
                    "s_lt": pa.array(np.where(lt, cents, 0)),
                    "n_gt": pa.array(gt.astype(np.int64)),
                    "s_gt": pa.array(np.where(gt, cents, 0)),
                }
            )
            .group_by("gid")
            .aggregate(
                [("n", "sum"), ("s", "sum"), ("n_lt", "sum"), ("s_lt", "sum"),
                 ("n_gt", "sum"), ("s_gt", "sum")]
            )
            .rename_columns(["gid", "n", "s", "n_lt", "s_lt", "n_gt", "s_gt"])
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gid")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("n_lt", alias_name="n_lt"),
            Sum("s_lt", alias_name="s_lt"),
            Sum("n_gt", alias_name="n_gt"),
            Sum("s_gt", alias_name="s_gt"),
        )
        .sort("gid")
        .to_pandas()  # one row per group
    )

    # MAD: second refine on the group-encoded absolute deviations
    med_b = med

    def to_absdev(batch: pa.Table, *, _med=med_b) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema([("combined", pa.int64())]).empty_table()
        cents_a, gid_a = _cents_gid(batch)
        cents = cents_a.to_numpy()
        gid = gid_a.to_numpy()
        dev = np.abs(cents - _med[gid])
        return pa.table({"combined": pa.array(gid * _ROBUST_SHIFT + dev)})

    mad_ranks = [int(offsets[g]) + (int(n) + 1) // 2 for g, n in enumerate(ns)]
    absdev = ds.map_batches(to_absdev, batch_format="pyarrow", zero_copy_batch=True)
    mad_vals = exact_global_quantiles(
        absdev, "combined", [], ranks=mad_ranks, bin_width=float(1 << 20)
    )
    mad = np.array(
        [int(round(v)) - g * _ROBUST_SHIFT for g, v in enumerate(mad_vals)], np.int64
    )

    by_gid = counts.set_index("gid")
    out_n, out_trim_n, out_trim_sum = [], [], []
    for gid, n in enumerate(ns):
        n = int(n)
        k = n // 10
        row = by_gid.loc[gid]
        total_sum = int(row["s"])
        assert int(row["n"]) == n
        if k == 0:
            trim_sum = total_sum
        else:
            drop_bottom = int(row["s_lt"]) + (k - int(row["n_lt"])) * int(lo[gid])
            drop_top = int(row["s_gt"]) + (k - int(row["n_gt"])) * int(hi[gid])
            trim_sum = total_sum - drop_bottom - drop_top
        out_n.append(n)
        out_trim_n.append(n - 2 * k)
        out_trim_sum.append(trim_sum)

    return pa.table(
        {
            "grp": grp_arr,
            "n": pa.array(out_n, pa.int64()),
            "median_cents": pa.array(med),
            "trim_n": pa.array(out_trim_n, pa.int64()),
            "trim_sum_cents": pa.array(out_trim_sum, pa.int64()),
            "mad_cents": pa.array(mad),
        }
    )


ORDERS_ROBUST_STATS_SQL = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), med AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
  FROM base GROUP BY grp
), ranked AS (
  SELECT grp, cents,
         row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM base
), trimmed AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS trim_n,
         CAST(sum(cents) AS BIGINT) AS trim_sum_cents
  FROM ranked
  WHERE rn > n // 10 AND rn <= n - n // 10
  GROUP BY grp
), mad AS (
  SELECT b.grp,
         CAST(quantile_disc(abs(b.cents - m.median_cents), 0.5) AS BIGINT)
           AS mad_cents
  FROM base b JOIN med m USING (grp)
  GROUP BY b.grp
)
SELECT m.grp AS grp, m.n AS n, m.median_cents, t.trim_n, t.trim_sum_cents,
       d.mad_cents
FROM med m JOIN trimmed t USING (grp) JOIN mad d USING (grp)
ORDER BY grp
"""

RELATIONAL_QUERIES["orders_robust_stats"] = (
    orders_robust_stats,
    ORDERS_ROBUST_STATS_SQL,
)


def orders_outliers_mad(sf_dir: str, *, k_mad_tenths: int = 19) -> ray.data.Dataset:
    """Row-level robust outlier detection: orders whose value deviates from
    their priority class's median by more than ``k_mad_tenths/10`` MADs —
    the median/MAD rule that a single corrupted row cannot shift (unlike
    mean/stddev z-scores, cf. ``events_value_zscore``).  The threshold is
    in TENTHS of a MAD so the cut stays pure int64
    (``|dev| * 10 > k * mad``); 1.9 MADs keeps ~5% of a uniform
    distribution (whose max deviation is 2 MADs — the classic 3-MAD cut is
    vacuous on bounded-support data).

    The per-group (median, MAD) table comes from
    :func:`orders_robust_stats` (bounded rank refine — 5 rows) and is
    BROADCAST into one vectorized filter pass; exact int64 cents
    throughout, so the cut is hash-exact."""
    import numpy as np

    stats = orders_robust_stats(sf_dir)
    groups = stats["grp"].to_pylist()
    med = stats["median_cents"].to_numpy()
    mad = stats["mad_cents"].to_numpy()
    grp_arr = pa.array(groups, pa.string())

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def flag(batch: pa.Table, *, _med=med, _mad=mad, _k=k_mad_tenths) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("grp", pa.string()),
                    ("cents", pa.int64()),
                    ("absdev_cents", pa.int64()),
                ]
            ).empty_table()
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        ).to_numpy()
        gid = (
            pc.index_in(batch["o_orderpriority"], value_set=grp_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dev = np.abs(cents - _med[gid])
        keep = dev * 10 > _k * _mad[gid]
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "grp": batch["o_orderpriority"].filter(pa.array(keep)),
                "cents": pa.array(cents[keep]),
                "absdev_cents": pa.array(dev[keep]),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True).sort(
        "o_orderkey"
    )


ORDERS_OUTLIERS_MAD_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), med AS (
  SELECT grp, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
  FROM base GROUP BY grp
), mad AS (
  SELECT b.grp,
         CAST(quantile_disc(abs(b.cents - m.median_cents), 0.5) AS BIGINT)
           AS mad_cents
  FROM base b JOIN med m USING (grp)
  GROUP BY b.grp
)
SELECT b.o_orderkey, b.grp, b.cents,
       CAST(abs(b.cents - m.median_cents) AS BIGINT) AS absdev_cents
FROM base b JOIN med m USING (grp) JOIN mad d ON d.grp = b.grp
WHERE abs(b.cents - m.median_cents) * 10 > 19 * d.mad_cents
ORDER BY b.o_orderkey
"""

RELATIONAL_QUERIES["orders_outliers_mad"] = (
    orders_outliers_mad,
    ORDERS_OUTLIERS_MAD_SQL,
)


# ---------------------------------------------------------------------------
# CDC table diff (the read-side complement of orders_merge_upsert)
# ---------------------------------------------------------------------------

_CDC_INSERT_OFF = 1_000_000_000_000


def orders_cdc_diff(sf_dir: str, *, n_buckets: int | None = None) -> ray.data.Dataset:
    """Row-level diff between two table versions — the reconciliation /
    audit read that MERGE-writing systems pair with ``orders_merge_upsert``:
    which keys were added, removed, or changed, with both sides' values.

    Version B derives deterministically from base A inside the SAME scan
    (one pass builds both sides): keys ``% 7 == 3`` deleted, keys
    ``% 5 == 0`` repriced +1000.00, and keys ``% 11 == 1`` re-inserted at
    ``key + 10^12`` (past the key domain at any tier).  Absent sides carry a ``-1``
    cents sentinel rather than NULL so every column stays non-null int64
    through the shuffle and the comparison (the nullable-int64 pandas
    coercion hazard, CLAUDE.md).

    Plan shape: ONE tagged-union key-bucketed co-shuffle; per bucket both
    sides' keys are unique by construction, so the diff is two
    ``np.searchsorted`` probes and three vectorized masks — no join
    materializes, unchanged rows never leave the bucket.
    """
    import numpy as np

    from ..scale import bucket_count, estimate_rows

    n_b = n_buckets or bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=32)

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    union_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("k", pa.int64()),
            ("cents", pa.int64()),
            ("src", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("change", pa.string()),
            ("base_cents", pa.int64()),
            ("new_cents", pa.int64()),
        ]
    )

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return union_schema.empty_table()
        k = pc.cast(batch["o_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        # side A: the base rows
        ka, ca = k, cents
        # side B: delete % 7 == 3, reprice % 5 == 0, insert % 11 == 1 high
        keep = k % 7 != 3
        kb = k[keep]
        cb = np.where(kb % 5 == 0, cents[keep] + 100_000, cents[keep])
        ins = k % 11 == 1
        kb = np.concatenate([kb, k[ins] + _CDC_INSERT_OFF])
        cb = np.concatenate([cb, cents[ins]])
        keys = np.concatenate([ka, kb])
        vals = np.concatenate([ca, cb])
        src = np.concatenate(
            [np.zeros(len(ka), np.int64), np.ones(len(kb), np.int64)]
        )
        return pa.table(
            {
                "bucket": pa.array(keys % n_b, pa.int64()),
                "k": pa.array(keys, pa.int64()),
                "cents": pa.array(vals, pa.int64()),
                "src": pa.array(src, pa.int64()),
            }
        )

    def diff_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return out_schema.empty_table()
        group = group.select(union_schema.names).cast(union_schema)
        k = group["k"].to_numpy(zero_copy_only=False)
        c = group["cents"].to_numpy(zero_copy_only=False)
        src = group["src"].to_numpy(zero_copy_only=False)
        a_mask = src == 0
        ka, ca = k[a_mask], c[a_mask]
        kb, cb = k[~a_mask], c[~a_mask]
        oa, ob = np.argsort(ka), np.argsort(kb)
        ka, ca, kb, cb = ka[oa], ca[oa], kb[ob], cb[ob]
        # A side classification
        pos = np.searchsorted(kb, ka)
        in_b = (pos < len(kb)) & (kb[np.minimum(pos, len(kb) - 1)] == ka) if len(kb) else np.zeros(len(ka), bool)
        removed = ~in_b
        changed = in_b & (cb[np.minimum(pos, max(len(kb) - 1, 0))] != ca) if len(kb) else np.zeros(len(ka), bool)
        # B-only keys = added
        pos_a = np.searchsorted(ka, kb)
        in_a = (pos_a < len(ka)) & (ka[np.minimum(pos_a, len(ka) - 1)] == kb) if len(ka) else np.zeros(len(kb), bool)
        added = ~in_a
        out_k = np.concatenate([ka[removed], ka[changed], kb[added]])
        out_change = np.concatenate(
            [
                np.full(removed.sum(), "removed"),
                np.full(changed.sum(), "changed"),
                np.full(added.sum(), "added"),
            ]
        )
        out_base = np.concatenate(
            [ca[removed], ca[changed], np.full(added.sum(), -1, np.int64)]
        )
        new_for_changed = (
            cb[np.minimum(pos, len(kb) - 1)][changed] if len(kb) else np.array([], np.int64)
        )
        out_new = np.concatenate(
            [np.full(removed.sum(), -1, np.int64), new_for_changed, cb[added]]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(out_k, pa.int64()),
                "change": pa.array(out_change.astype(str), pa.string()),
                "base_cents": pa.array(out_base, pa.int64()),
                "new_cents": pa.array(out_new, pa.int64()),
            }
        )

    return (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(diff_bucket, batch_format="pyarrow")
        .sort("o_orderkey")
    )


ORDERS_CDC_DIFF_SQL = f"""
WITH a AS (SELECT o_orderkey AS k,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
b AS (
  SELECT k, CASE WHEN k % 5 = 0 THEN cents + 100000 ELSE cents END AS cents
  FROM a WHERE k % 7 <> 3
  UNION ALL
  SELECT k + {_CDC_INSERT_OFF}, cents FROM a WHERE k % 11 = 1
)
SELECT coalesce(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       coalesce(a.cents, -1) AS base_cents,
       coalesce(b.cents, -1) AS new_cents
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.cents <> b.cents
ORDER BY o_orderkey
"""

RELATIONAL_QUERIES["orders_cdc_diff"] = (orders_cdc_diff, ORDERS_CDC_DIFF_SQL)


# ---------------------------------------------------------------------------
# repeat-purchase intervals with an EXACT grouped median (med2 trick)
# ---------------------------------------------------------------------------

def customer_reorder_intervals(
    sf_dir: str, *, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-customer repeat-purchase profile: number of orders and the
    EXACT median gap in days between consecutive orders — the
    LAG-then-grouped-order-statistic combo (RFM's missing cadence axis).

    The median of an even-sized group is conventionally the float mean of
    the two middle values, which reintroduces the cross-engine float
    hazard; instead the output is ``med2 = 2 x median`` as an exact
    integer — the sum of the two middle order statistics (the SAME middle
    element twice for odd groups), expressed identically in the oracle as
    two rank-picked window sums.  Gaps come from the per-customer sorted
    DATE multiset, so tie order between same-day orders cannot affect
    them.

    Plan shape: ONE customer-bucketed exchange; per bucket a single
    lexsort yields both the consecutive-date gaps and, after a second
    in-bucket lexsort of (customer, gap), every customer's middle indices
    by pure segment arithmetic.  Customers with one order have no gap and
    are excluded on both engines.
    """
    import numpy as np

    from ..scale import bucket_count, estimate_rows

    n_b = n_buckets or bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=32)
    mask = pa.scalar(n_b - 1, pa.int64())

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    union_schema = pa.schema(
        [("cust", pa.int64()), ("date_us", pa.int64()), ("bucket", pa.int64())]
    )
    out_schema = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("n_orders", pa.int64()),
            ("med2_gap_days", pa.int64()),
        ]
    )

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return union_schema.empty_table()
        cust = pc.cast(batch["o_custkey"], pa.int64())
        t = pa.table(
            {
                "cust": cust,
                "date_us": pc.cast(
                    pc.cast(batch["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        )
        return t.append_column("bucket", pc.bit_wise_and(t["cust"], mask))

    day_us = 86_400_000_000

    def median_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return out_schema.empty_table()
        group = group.select(union_schema.names).cast(union_schema)
        cust = group["cust"].to_numpy(zero_copy_only=False)
        date = group["date_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((date, cust))
        cust, date = cust[order], date[order]
        same = np.zeros(len(cust), bool)
        same[1:] = cust[1:] == cust[:-1]
        gaps = (date - np.roll(date, 1)) // day_us
        g_cust, g = cust[same], gaps[same]
        if len(g) == 0:
            return out_schema.empty_table()
        o2 = np.lexsort((g, g_cust))
        g_cust, g = g_cust[o2], g[o2]
        uids, starts, counts = np.unique(
            g_cust, return_index=True, return_counts=True
        )
        # two middle 1-based ranks: (m+1)//2 and m//2 + 1 (equal when odd)
        lo = starts + (counts + 1) // 2 - 1
        hi = starts + counts // 2
        return pa.table(
            {
                "o_custkey": pa.array(uids, pa.int64()),
                "n_orders": pa.array(counts + 1, pa.int64()),
                "med2_gap_days": pa.array(g[lo] + g[hi], pa.int64()),
            }
        )

    return (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(median_bucket, batch_format="pyarrow")
        .sort("o_custkey")
    )


CUSTOMER_REORDER_INTERVALS_SQL = """
WITH g AS (
  SELECT o_custkey,
         (epoch_us(o_orderdate)
          - epoch_us(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate)))
           // 86400000000 AS gap
  FROM orders),
gg AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL),
r AS (SELECT o_custkey, gap,
             row_number() OVER (PARTITION BY o_custkey ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS m
      FROM gg)
SELECT o_custkey,
       CAST(max(m) + 1 AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN rn = (m + 1) // 2 THEN gap ELSE 0 END)
            + sum(CASE WHEN rn = m // 2 + 1 THEN gap ELSE 0 END)
            AS BIGINT) AS med2_gap_days
FROM r
GROUP BY o_custkey
ORDER BY o_custkey
"""

RELATIONAL_QUERIES["customer_reorder_intervals"] = (
    customer_reorder_intervals,
    CUSTOMER_REORDER_INTERVALS_SQL,
)


# ---------------------------------------------------------------------------
# inequality / concentration metrics (Gini + HHI per nation)
# ---------------------------------------------------------------------------

def revenue_gini_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Revenue-concentration report per nation: the Gini coefficient and a
    Herfindahl-Hirschman index over per-customer revenue — the inequality
    metrics a corpus curator runs on source/domain contribution shares
    ("is 1% of domains 90% of the tokens?"), expressed on the TPC-H side
    of the testdata so the result is SQL-checkable.

    Exactness contract (cross-engine hash-equal):
    - per-customer revenue folds in int64 CENTS (per-row quantize, exact
      integer sum);
    - Gini uses the sorted-rank identity
      ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` with x ascending
      and i = row_number; equal values make the rank-weighted sum
      permutation-invariant, so ties cost nothing.  Emitted as ppm by
      integer floor division (round() is cross-engine hazardous).
    - HHI quantizes each customer's share to ppm FIRST
      (``share = cents*1e6 // S``), then sums the squares and floor-divides
      once — every intermediate is an exact integer in both engines (the
      quantize-per-row trick from the DSIR family).

    Plan shape: one custkey exchange folds per-customer cents (per-batch
    Arrow partials first); the customer->nation hop is the composed
    broadcast lookup (revenue_by_nation's pattern — at real scale this
    dimension hop becomes a bucketed join, see pipelines/joins.py); the
    nation groupby has 25 groups, each a slim int64 vector, so the
    rank-weighted sums run vectorized per group.  The two big sums use
    Python-int (object) accumulation: rank*cents and share^2 exceed int64
    once a nation holds ~1e6 heavy customers, and numpy overflow is
    SILENT (CLAUDE.md bincount hazard).
    """
    from ray.data.aggregate import Sum

    cust = _broadcast_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _broadcast_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nation_of_cust = pc.take(
        nation["n_name"].combine_chunks(),
        pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"].combine_chunks()),
    )
    nation_of = _lookup(cust["c_custkey"], nation_of_cust)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        t = pa.table({"custkey": batch["o_custkey"], "cents": cents})
        return t.group_by("custkey").aggregate([("cents", "sum")]).rename_columns(
            ["custkey", "cents"]
        )

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("custkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def add_nation(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [("nation", pa.string()), ("cents", pa.int64())]
            ).empty_table()
        return pa.table({"nation": nation_of(batch["custkey"]), "cents": batch["cents"]})

    _GINI_SCHEMA = pa.schema(
        [
            ("nation", pa.string()),
            ("n_customers", pa.int64()),
            ("total_revenue", pa.float64()),
            ("gini_ppm", pa.int64()),
            ("hhi_ppm", pa.int64()),
        ]
    )

    def per_nation(group: pa.Table) -> pa.Table:
        import numpy as np

        if group.num_rows == 0 or group.num_columns == 0:
            return _GINI_SCHEMA.empty_table()
        group = group.select(["nation", "cents"]).cast(
            pa.schema([("nation", pa.string()), ("cents", pa.int64())])
        )
        x = np.sort(group["cents"].to_numpy(zero_copy_only=False))
        n = int(len(x))
        s = int(x.sum(dtype=np.int64) if n < 1 << 20 else sum(map(int, x)))
        xo = x.astype(object)
        rs = int((np.arange(1, n + 1, dtype=object) * xo).sum())
        shares = x * 1_000_000 // s  # each < 1e6: int64-safe per row
        hhi_num = int((shares.astype(object) * shares.astype(object)).sum())
        gini = (2 * rs - (n + 1) * s) * 1_000_000 // (n * s)
        return pa.table(
            {
                "nation": [group["nation"][0].as_py()],
                "n_customers": pa.array([n], pa.int64()),
                "total_revenue": pa.array([s / 100.0], pa.float64()),
                "gini_ppm": pa.array([gini], pa.int64()),
                "hhi_ppm": pa.array([hhi_num // 1_000_000], pa.int64()),
            }
        )

    return (
        per_cust.map_batches(add_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nation")
        .map_groups(per_nation, batch_format="pyarrow")
        .sort("nation")
    )


REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
tagged AS (
  SELECT n.n_name AS nation, r.cents,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY r.cents, r.o_custkey) AS rn,
         sum(r.cents) OVER (PARTITION BY n.n_name) AS s
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey),
agg AS (
  SELECT nation,
         count(*) AS n_customers,
         max(s) AS s,
         sum(CAST(rn AS HUGEINT) * cents) AS rs,
         sum((CAST(cents AS HUGEINT) * 1000000 // s)
             * (CAST(cents AS HUGEINT) * 1000000 // s)) AS hhi_num
  FROM tagged GROUP BY nation)
SELECT nation,
       n_customers,
       CAST(s AS BIGINT) / 100.0 AS total_revenue,
       CAST((2 * rs - (CAST(n_customers AS HUGEINT) + 1) * s) * 1000000
            // (CAST(n_customers AS HUGEINT) * s) AS BIGINT) AS gini_ppm,
       CAST(hhi_num // 1000000 AS BIGINT) AS hhi_ppm
FROM agg
ORDER BY nation
"""

RELATIONAL_QUERIES["revenue_gini_by_nation"] = (
    revenue_gini_by_nation,
    REVENUE_GINI_SQL,
)


# ---------------------------------------------------------------------------
# running-record window: record-breaking orders per customer
# ---------------------------------------------------------------------------

def record_orders(sf_dir: str, *, n_buckets: int | None = None) -> ray.data.Dataset:
    """Record-breaking orders per customer: how many of a customer's
    orders strictly exceeded every EARLIER order's total (ordered by
    o_orderdate, o_orderkey — the unique key makes the ROWS frame
    deterministic under date ties).  The running-extreme window shape
    (cummax + strict-record flag) the window family did not yet cover;
    the first order is always a record.

    Exactness: totals compare in int64 cents (per-row quantize); the
    record flag is a pure integer comparison, so the per-customer record
    count is hash-exact.  Plan: custkey-bucketed exchange (bucket count
    from the orders footer row count), one vectorized pandas pass per
    bucket — sort, per-customer shifted cummax, flag-sum.
    """
    import numpy as np
    import pandas as pd

    from ..scale import bucket_count, estimate_rows

    if n_buckets is None:
        n_buckets = bucket_count(estimate_rows(sf_dir, "orders"), min_buckets=64)
    mask = pa.scalar(n_buckets - 1, pa.int64())

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "cents": cents,
                "bucket": pc.bit_wise_and(batch["o_custkey"], mask),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(
            drop=True
        )
        prev_max = g.groupby("o_custkey")["cents"].transform(
            lambda s: s.cummax().shift()
        )
        is_record = prev_max.isna() | (g["cents"] > prev_max)
        out = (
            g.assign(rec=is_record.astype("int64"))
            .groupby("o_custkey", sort=True)
            .agg(n_orders=("rec", "size"), n_records=("rec", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "o_custkey": pa.array(out["o_custkey"].to_numpy(np.int64), pa.int64()),
                "n_orders": pa.array(out["n_orders"].to_numpy(np.int64), pa.int64()),
                "n_records": pa.array(out["n_records"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort("o_custkey")
    )


RECORD_ORDERS_SQL = """
WITH r AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         max(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM orders)
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN prev_max IS NULL OR cents > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_records
FROM r GROUP BY o_custkey ORDER BY o_custkey
"""

RELATIONAL_QUERIES["record_orders"] = (record_orders, RECORD_ORDERS_SQL)
