"""Data-quality constraint checker (functions/quality_checks.py): SQL
parity on the clean corpus + planted violations for every constraint
shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from docling_jobkit_ray.functions.quality_checks import (
    DATA_QUALITY_REPORT_SQL,
    data_quality_report,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["documents", "events", "orders", "customer", "lineitem"]


def _duck(d, sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_clean_corpus_matches_sql_and_is_clean(ray_session):
    got = data_quality_report(SF_DIR).to_pandas().reset_index(drop=True)
    want = _duck(SF_DIR, DATA_QUALITY_REPORT_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_violations"] == 0).all()
    assert (got["n_checked"] > 0).all()


def test_planted_violations_all_shapes(ray_session, tmp_path):
    """One violation of each constraint shape, counted exactly."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 1, 2], pa.int64()),  # dup key: 1 extra row
                "text": pa.array(["abc", "x", "yy"]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["web"] * 3),
                "n_chars": pa.array([3, 1, 99], pa.int64()),  # 99 != 2: 1 bad
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([pd.Timestamp("2024-01-01")] * 2, pa.timestamp("us")),
                "user_id": pa.array([10, 999], pa.int64()),  # 999 not a customer
                "event_type": pa.array(["a", "b"]),
                "value": pa.array([1.0, -2.0], pa.float64()),  # one negative
                "props": pa.array(["{}"] * 2),
            }
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10], pa.int64()),
                "c_name": pa.array(["c"]),
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([0.0]),
                "c_mktsegment": pa.array(["m"]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101], pa.int64()),
                "o_custkey": pa.array([10, 777], pa.int64()),  # 777 orphan
                "o_orderstatus": pa.array(["O", "F"]),
                "o_totalprice": pa.array([1.0, 2.0]),
                "o_orderdate": pa.array([pd.Timestamp("1995-01-01")] * 2, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1", "2"]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([100, 100, 555], pa.int64()),  # 555 orphan
                "l_partkey": pa.array([1, 2, 3], pa.int64()),
                "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = data_quality_report(str(tmp_path)).to_pandas().set_index("check_name")
    assert got.loc["docs_nchars_consistent", "n_violations"] == 1
    assert got.loc["events_value_nonneg", "n_violations"] == 1
    assert got.loc["fk_events_customer", "n_violations"] == 1
    assert got.loc["fk_orders_customer", "n_violations"] == 1
    assert got.loc["fk_lineitem_orders", "n_violations"] == 1
    assert got.loc["unique_doc_id", "n_violations"] == 1
    want = _duck(str(tmp_path), DATA_QUALITY_REPORT_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(), want, check_dtype=False
    )
