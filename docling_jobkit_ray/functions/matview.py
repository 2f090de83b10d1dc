"""Incremental materialized-view maintenance — refresh a persisted
aggregate from a DELTA batch without recomputing the base.

The lakehouse pattern the reference's queue/worker kit has no analogue
for: a standing aggregate (here hourly event counts + int-cents value
sums) lives as a versioned parquet artifact; each new increment folds
its OWN partial aggregate into the artifact (read artifact + delta
partials through one small groupby — cost proportional to the DELTA and
the view, never the base corpus).  SUM/COUNT are self-maintainable
aggregates, so refresh(base_view, delta) == full_recompute(base ∪ delta)
EXACTLY — that equivalence is the test oracle.

Versioned commit protocol shared with the bloom index (`ingest.py`):
write `v{N+1}` staged, `_SUCCESS`, atomic rename; readers always see a
complete version; `gc` keeps live+N.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = [
    "hourly_event_counts",
    "init_view",
    "refresh_view",
    "current_view",
]

_VIEW_SCHEMA = pa.schema(
    [
        ("hour", pa.int64()),  # epoch hours (us // 3_600_000_000)
        ("event_type", pa.string()),
        ("n", pa.int64()),
        ("value_cents", pa.int64()),
    ]
)


def hourly_event_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """The view definition: (hour, event_type) -> count + exact int-cents
    value sum.  Per-batch partials pre-combine before the small groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _VIEW_SCHEMA.empty_table()
        hour = pc.divide(
            pc.cast(batch["ts"], pa.int64()), pa.scalar(3_600_000_000, pa.int64())
        )
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
        )
        return (
            pa.table(
                {
                    "hour": hour,
                    "event_type": batch["event_type"],
                    "n": pa.array([1] * batch.num_rows, pa.int64()),
                    "value_cents": cents,
                }
            )
            .group_by(["hour", "event_type"])
            .aggregate([("n", "sum"), ("value_cents", "sum")])
            .rename_columns(["hour", "event_type", "n", "value_cents"])
        )

    return (
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )


def _versions(view_dir: str) -> list[int]:
    if not os.path.isdir(view_dir):
        return []
    out = []
    for name in os.listdir(view_dir):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(view_dir, name, "_SUCCESS")):
                out.append(int(name[1:]))
    return sorted(out)


def _commit(ds: ray.data.Dataset, view_dir: str, version: int, meta: dict) -> str:
    os.makedirs(view_dir, exist_ok=True)
    staging = os.path.join(view_dir, f"v{version}.staging")
    final = os.path.join(view_dir, f"v{version}")
    if os.path.exists(staging):
        import shutil

        shutil.rmtree(staging)  # torn previous attempt
    ds.write_parquet(staging)
    with open(os.path.join(staging, "_SUCCESS"), "w") as fh:
        json.dump(meta, fh)
    os.rename(staging, final)
    return final


def init_view(events: ray.data.Dataset, view_dir: str) -> str:
    """Materialize v1 of the view over the base corpus."""
    return _commit(hourly_event_counts(events), view_dir, 1, {"op": "init"})


def current_view(view_dir: str) -> ray.data.Dataset | None:
    vs = _versions(view_dir)
    if not vs:
        return None
    return ray.data.read_parquet(os.path.join(view_dir, f"v{vs[-1]}"))


def refresh_view(view_dir: str, delta: ray.data.Dataset) -> str:
    """Fold a delta's partial aggregate into the live view: read the
    artifact (view-sized, not base-sized) and the delta's own aggregate
    through ONE union + groupby, commit v{N+1}.  SUM/COUNT are
    self-maintainable, so the result is bit-equal to a full recompute."""
    from ray.data.aggregate import Sum

    vs = _versions(view_dir)
    if not vs:
        raise FileNotFoundError(f"no committed view version under {view_dir}")
    live = current_view(view_dir)
    merged = (
        live.union(hourly_event_counts(delta))
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )
    return _commit(merged, view_dir, vs[-1] + 1, {"op": "refresh", "prev": vs[-1]})


def incremental_hourly_view(sf_dir: str) -> ray.data.Dataset:
    """Driver-checkable end-to-end: initialize the view from the even
    event_ids, REFRESH with the odd half, return the refreshed artifact —
    whose contents must equal the full-corpus aggregate exactly (the
    self-maintainability property, checked against plain SQL over the
    whole table)."""
    import tempfile

    import pyarrow.compute as _pc

    from ..sources.pages import read_table

    def _half(parity: int) -> ray.data.Dataset:
        ds = read_table(
            sf_dir, "events", columns=["ts", "event_type", "value", "event_id"]
        )
        return ds.map_batches(
            lambda b, p=parity: b.filter(
                _pc.equal(
                    _pc.bit_wise_and(b["event_id"], pa.scalar(1, pa.int64())), p
                )
            ).drop_columns(["event_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    with tempfile.TemporaryDirectory() as tmp:
        view_dir = os.path.join(tmp, "view")
        init_view(_half(0), view_dir)
        refresh_view(view_dir, _half(1))
        out = current_view(view_dir).to_pandas()  # view-sized: (hours x types)
    out = out.sort_values(["hour", "event_type"], ignore_index=True)
    return pa.Table.from_pandas(out, schema=_VIEW_SCHEMA, preserve_index=False)


INCREMENTAL_HOURLY_VIEW_SQL = """
SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""
