"""Semi-structured (JSON) property extraction over the events table — the
schema-on-read surface: payloads land as opaque JSON strings and queries
project typed fields out of them at scan time.

The extractor is a VECTORIZED Arrow kernel (``pc.extract_regex``) for the
flat integer-key case the corpus carries (``{"key": 123}``), with the same
null-on-missing semantics as DuckDB ``json_extract`` — a general nested
parser would be an actor-pool ``map_batches`` stage (one parser instance
per actor), but the flat fast path covers the hash-checked contract and
never drops to per-row Python.  Extraction happens INSIDE the same
map_batches as the downstream partial aggregate, so the JSON string never
crosses an exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table


def extract_int_key(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """Vectorized ``json_extract(col, '$.key')::BIGINT`` for flat integer
    values: null where the key is absent or the payload malformed."""
    hit = pc.extract_regex(col, pattern=f'"{key}"\\s*:\\s*(?P<v>-?\\d+)')
    return pc.cast(pc.struct_field(hit, "v"), pa.int64())


def events_props_extract(sf_dir: str) -> ray.data.Dataset:
    """Row-level projection of the ``k`` property: (event_id, k) — the
    pure schema-on-read extraction, null-preserving."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [("event_id", pa.int64()), ("k", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "k": extract_int_key(batch["props"], "k"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    )


EVENTS_PROPS_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id
"""


def events_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Aggregate over an extracted JSON field: event count and exact money
    sum per (event_type, k // 10) decile — the extract-then-aggregate
    chain, with the JSON string consumed inside the partial map (only the
    small (type, decile) partials reach the exchange)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props", "value"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("k_decile", pa.int64()),
            ("n_events", pa.int64()),
            ("value_c", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return part_schema.empty_table()
        k = extract_int_key(batch["props"], "k")
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k_decile": pc.divide(k, pa.scalar(10, pa.int64())),
                "value_c": pc.cast(
                    pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )
        return (
            t.group_by(["event_type", "k_decile"])
            .aggregate([([], "count_all"), ("value_c", "sum")])
            .rename_columns(["event_type", "k_decile", "n_events", "value_c"])
        )

    from ray.data.aggregate import Sum

    def descale(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [
                    ("event_type", pa.string()),
                    ("k_decile", pa.int64()),
                    ("n_events", pa.int64()),
                    ("sum_value", pa.float64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "event_type": batch["event_type"],
                "k_decile": pc.cast(batch["k_decile"], pa.int64()),
                "n_events": pc.cast(batch["n_events"], pa.int64()),
                "sum_value": pc.divide(
                    pc.cast(batch["value_c"], pa.float64()), pa.scalar(100.0)
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "k_decile"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_c", alias_name="value_c"),
        )
        .map_batches(descale, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["event_type", "k_decile"])
    )


EVENTS_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_decile,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_decile
"""
