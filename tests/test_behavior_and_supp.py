"""Crafted-input semantics tests for the round-4 late additions:
behavior analytics (events_intervals / cohort_retention), the weighted
mixture sampler, word-repetition stats, and the subtle invariants of the
supplementary TPC-H shapes (q16's cross-bucket distinct-supplier counting,
q2's argmin tie-break).

SQL-oracle parity for all of these runs in test_driver_contract.py; here
the semantics are pinned directly on hand-built tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_events_intervals_gaps_and_exclusions(ray_session, tmp_path):
    """Users with one event are excluded; span/max-gap/mean-gap are exact
    microsecond integers."""
    from docling_jobkit_ray.pipelines.behavior import events_intervals

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: gaps of 10s and 30s -> span 40s, max 30s, mean 20s
        (1, base),
        (1, base + pd.Timedelta(seconds=10)),
        (1, base + pd.Timedelta(seconds=40)),
        # user 2: single event -> excluded
        (2, base),
        # user 3: two identical timestamps -> span 0, max gap 0
        (3, base),
        (3, base),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = events_intervals(str(tmp_path), n_buckets=4).to_pandas().set_index("user_id")
    assert list(out.index) == [1, 3]
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "span_us"] == 40_000_000
    assert out.loc[1, "max_gap_us"] == 30_000_000
    assert out.loc[1, "mean_gap_us"] == 20_000_000.0
    assert out.loc[3, "span_us"] == 0 and out.loc[3, "max_gap_us"] == 0


def test_cohort_retention_offsets(ray_session, tmp_path):
    """Cohorts are the per-user min week; every active (cohort, offset)
    cell counts each user once regardless of how many events they had."""
    from docling_jobkit_ray.pipelines.behavior import _WEEK_US, cohort_retention

    def ts_of(week, extra_us=0):
        return pd.Timestamp(int(week) * _WEEK_US + extra_us, unit="us")

    rows = [
        # user 1: weeks 2800, 2801, 2801 (dup week collapses)
        (1, ts_of(2800)),
        (1, ts_of(2801)),
        (1, ts_of(2801, 5)),
        # user 2: weeks 2800, 2802
        (2, ts_of(2800, 123)),
        (2, ts_of(2802)),
        # user 3: cohort 2801 only
        (3, ts_of(2801, 7)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = cohort_retention(str(tmp_path), n_buckets=4).to_pandas()
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {
        (2800, 0): 2,  # users 1 and 2
        (2800, 1): 1,  # user 1 at week 2801
        (2800, 2): 1,  # user 2 at week 2802
        (2801, 0): 1,  # user 3
    }


def test_mixture_sample_rates_and_validation(ray_session):
    """Sampled rates track the requested rationals; bad weights raise."""
    from docling_jobkit_ray.functions.webtext import mixture_sample

    sf = "/root/testdata/sf0.1"
    out = mixture_sample(
        sf, weights={"src0": (1, 1), "src1": (0, 1)}, rest=(1, 2)
    ).to_pandas()
    by_src = out.groupby("source").size()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["source"]).to_pandas()
    n_per = docs.groupby("source").size()
    assert by_src.get("src0", 0) == n_per["src0"]          # rate 1 keeps all
    assert "src1" not in by_src.index                       # rate 0 keeps none
    for s in n_per.index:
        if s in ("src0", "src1"):
            continue
        rate = by_src.get(s, 0) / n_per[s]
        assert 0.3 < rate < 0.7, (s, rate)                  # ~1/2 within noise

    with pytest.raises(ValueError):
        mixture_sample(sf, weights={"src0": (3, 2)})
    with pytest.raises(ValueError):
        mixture_sample(sf, weights={"src0": (1, 2)}, rest=(2, 1))


def test_doc_repetition_stats_crafted(ray_session, tmp_path):
    """Counts, argmax tie-break and the integer keep rule on crafted docs."""
    from docling_jobkit_ray.functions.webtext import doc_repetition_stats

    texts = [
        "a a a b",                      # top a(3)/4 words, dup mass 3
        "b a a b",                      # tie a=2,b=2 -> lexicographic a
        " ".join(["w%d" % i for i in range(20)]),  # all unique -> keep
    ]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    _write(tmp_path, "documents", t)
    out = doc_repetition_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "top_word"] == "a" and out.loc[0, "top_word_count"] == 3
    assert out.loc[0, "n_words"] == 4 and out.loc[0, "dup_word_count"] == 3
    assert not out.loc[0, "keep"]                  # top 3/4 > 10%
    assert out.loc[1, "top_word"] == "a"           # tie -> lexicographic
    assert out.loc[1, "dup_word_count"] == 4       # both words duplicated
    assert out.loc[2, "top_word_count"] == 1 and bool(out.loc[2, "keep"])


def test_q16_distinct_suppliers_across_buckets(ray_session, tmp_path):
    """A (brand,type,size,supplier) combo seen through MANY partkeys and
    MANY input blocks must count once: the supplier-bucketed exchange is
    what makes per-bucket distinct globally correct.  Forced tiny bucket
    count exercises multi-pair buckets."""
    from docling_jobkit_ray.pipelines.tpch_supp import q16_supplier_part_counts

    # two parts sharing one attribute triple, one part with another
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["x", "y", "z"]),
            "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#2"]),
            "p_type": pa.array(["SMALL", "SMALL", "LARGE"]),
            "p_size": pa.array([4, 4, 9], pa.int32()),
            "p_retailprice": pa.array([1.0, 1.0, 1.0]),
        }
    )
    # supplier 7 ships parts 1 AND 2 (same triple -> one distinct count);
    # suppliers 7,8 ship part 3; duplicate lineitem rows are noise
    li_rows = [(1, 7), (2, 7), (2, 7), (3, 7), (3, 8), (1, 7)]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(len(li_rows)), pa.int64()),
            "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
            "l_linenumber": pa.array([1] * len(li_rows), pa.int32()),
            "l_quantity": pa.array([1.0] * len(li_rows)),
            "l_extendedprice": pa.array([1.0] * len(li_rows)),
            "l_discount": pa.array([0.0] * len(li_rows)),
            "l_tax": pa.array([0.0] * len(li_rows)),
            "l_returnflag": pa.array(["N"] * len(li_rows)),
            "l_linestatus": pa.array(["O"] * len(li_rows)),
            "l_shipdate": pa.array([pd.Timestamp("1997-01-01")] * len(li_rows)),
        }
    )
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", lineitem)
    out = (
        q16_supplier_part_counts(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index(["p_brand", "p_type", "p_size"])
    )
    assert out.loc[("Brand#1", "SMALL", 4), "supplier_cnt"] == 1
    assert out.loc[("Brand#2", "LARGE", 9), "supplier_cnt"] == 2


def test_q2_argmin_tie_break(ray_session, tmp_path):
    """Equal balances tie-break by suppkey; the per-part winner is the
    global min even when pairs arrive through different batches."""
    from docling_jobkit_ray.pipelines.tpch_supp import q2_min_balance_supplier

    region = pa.table(
        {"r_regionkey": pa.array([3], pa.int32()), "r_name": pa.array(["EUROPE"])}
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([3], pa.int32()),
            "n_name": pa.array(["NATION_3"]),
            "n_regionkey": pa.array([3], pa.int32()),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([10, 11, 12], pa.int64()),
            "s_name": pa.array(["sa", "sb", "sc"]),
            "s_nationkey": pa.array([3, 3, 3], pa.int32()),
            "s_acctbal": pa.array([5.0, 5.0, 1.0]),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_name": pa.array(["p one", "p two"]),
            "p_brand": pa.array(["Brand#1", "Brand#1"]),
            "p_type": pa.array(["STANDARD", "STANDARD"]),
            "p_size": pa.array([5, 5], pa.int32()),
            "p_retailprice": pa.array([1.0, 1.0]),
        }
    )
    li_rows = [(1, 10), (1, 11), (2, 11), (2, 12)]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(len(li_rows)), pa.int64()),
            "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
            "l_linenumber": pa.array([1] * len(li_rows), pa.int32()),
            "l_quantity": pa.array([1.0] * len(li_rows)),
            "l_extendedprice": pa.array([1.0] * len(li_rows)),
            "l_discount": pa.array([0.0] * len(li_rows)),
            "l_tax": pa.array([0.0] * len(li_rows)),
            "l_returnflag": pa.array(["N"] * len(li_rows)),
            "l_linestatus": pa.array(["O"] * len(li_rows)),
            "l_shipdate": pa.array([pd.Timestamp("1997-01-01")] * len(li_rows)),
        }
    )
    for name, t in [
        ("region", region), ("nation", nation), ("supplier", supplier),
        ("part", part), ("lineitem", lineitem),
    ]:
        _write(tmp_path, name, t)
    out = (
        q2_min_balance_supplier(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("p_partkey")
    )
    # part 1: balances tie at 5.0 -> lower suppkey (10) wins
    assert out.loc[1, "s_suppkey"] == 10 and out.loc[1, "s_name"] == "sa"
    # part 2: 1.0 < 5.0 -> supplier 12
    assert out.loc[2, "s_suppkey"] == 12 and out.loc[2, "s_acctbal"] == 1.0


def test_user_activity_setops_statuses(ray_session, tmp_path):
    """retained = both halves (INTERSECT), churned = first only (EXCEPT),
    new = second only (reverse EXCEPT)."""
    from docling_jobkit_ray.pipelines.behavior import user_activity_setops

    first = pd.Timestamp("2024-01-05")
    second = pd.Timestamp("2024-01-20")
    rows = [(1, first), (1, second), (2, first), (3, second), (2, first)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = (
        user_activity_setops(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("user_id")["status"]
    )
    assert out.to_dict() == {1: "retained", 2: "churned", 3: "new"}


def test_events_cube_margins_agree(ray_session):
    """Every CUBE margin must equal the exact sum of its detail rows (the
    integer-cents discipline makes this bitwise, not approximate)."""
    from docling_jobkit_ray.pipelines.behavior import events_cube_type_dow

    out = events_cube_type_dow("/root/testdata/sf0.001").to_pandas()
    detail = out[(out["event_type"] != "ALL") & (out["dow"] != -1)]
    grand = out[(out["event_type"] == "ALL") & (out["dow"] == -1)].iloc[0]
    assert grand["n_events"] == detail["n_events"].sum()
    assert abs(grand["sum_value"] - detail["sum_value"].sum()) < 1e-9
    for et, g in detail.groupby("event_type"):
        m = out[(out["event_type"] == et) & (out["dow"] == -1)].iloc[0]
        assert m["n_events"] == g["n_events"].sum()
        assert abs(m["sum_value"] - g["sum_value"].sum()) < 1e-9
    for dow, g in detail.groupby("dow"):
        m = out[(out["event_type"] == "ALL") & (out["dow"] == dow)].iloc[0]
        assert m["n_events"] == g["n_events"].sum()
        assert abs(m["sum_value"] - g["sum_value"].sum()) < 1e-9


def test_q20_fair_share_threshold(ray_session, tmp_path):
    """A supplier qualifies only when its qty exceeds 2x the part's
    per-supplier average; sole suppliers can never qualify (q*1 > 2*q is
    false); non-widget parts and out-of-window shipments are ignored."""
    from docling_jobkit_ray.pipelines.tpch_supp import q20_excess_suppliers

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["red widget", "blue widget", "red bolt"]),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([10, 11, 12], pa.int64()),
            "s_name": pa.array(["sa", "sb", "sc"]),
        }
    )
    inw = pd.Timestamp("1997-06-01")
    outw = pd.Timestamp("1999-01-01")
    # part 1: supp 10 qty 7 (7*3=21 > 2*10=20 -> qualifies), 11 qty 2, 12 qty 1
    # part 2: supp 11 sole supplier qty 5 -> never qualifies
    # part 3 (non-widget): supp 12 huge qty -> ignored
    # supp 12 out-of-window widget shipment -> ignored
    rows = [
        (1, 10, 7.0, inw), (1, 11, 2.0, inw), (1, 12, 1.0, inw),
        (2, 11, 5.0, inw),
        (3, 12, 99.0, inw),
        (1, 12, 99.0, outw),
    ]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(len(rows)), pa.int64()),
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_quantity": pa.array([r[2] for r in rows]),
            "l_shipdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    for name, t in [("part", part), ("supplier", supplier), ("lineitem", lineitem)]:
        _write(tmp_path, name, t)
    out = q20_excess_suppliers(str(tmp_path), n_buckets=2).to_pandas()
    assert out["s_suppkey"].tolist() == [10]
    assert out["s_name"].tolist() == ["sa"]


def test_q21_sole_returning_supplier(ray_session, tmp_path):
    """numwait counts only F-orders where the supplier returned, another
    supplier exists (EXISTS) and no other supplier returned (NOT EXISTS)."""
    from docling_jobkit_ray.pipelines.tpch_supp import q21_waiting_suppliers

    supplier = pa.table(
        {
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_name": pa.array(["sa", "sb"]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "F", "O"]),
        }
    )
    # order 1: 10 returned, 11 clean        -> 10 waits
    # order 2: both returned (nr=2)         -> nobody
    # order 3: 10 returned but sole (ns=1)  -> nobody
    # order 4: status O                     -> nobody
    rows = [
        (1, 10, "R"), (1, 11, "N"),
        (2, 10, "R"), (2, 11, "R"),
        (3, 10, "R"),
        (4, 11, "R"), (4, 10, "N"),
    ]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[2] for r in rows]),
        }
    )
    for name, t in [("supplier", supplier), ("orders", orders), ("lineitem", lineitem)]:
        _write(tmp_path, name, t)
    out = q21_waiting_suppliers(str(tmp_path)).to_pandas()
    assert out.set_index("s_suppkey")["numwait"].to_dict() == {10: 1}


def test_events_transitions_order_and_isolation(ray_session, tmp_path):
    """Transitions follow (ts, event_id) order — simultaneous events break
    ties by event_id — and never cross users."""
    from docling_jobkit_ray.pipelines.behavior import events_transitions

    t0 = pd.Timestamp("2024-01-01")
    t1 = t0 + pd.Timedelta(minutes=1)
    # user 1: a(t0,id0) -> b(t0,id1) tie broken by id -> c(t1,id2)
    # user 2: c(t0,id3) -> a(t1,id4); no b->c or a->c leakage across users
    rows = [
        (0, 1, t0, "a"), (1, 1, t0, "b"), (2, 1, t1, "c"),
        (3, 2, t0, "c"), (4, 2, t1, "a"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = events_transitions(str(tmp_path), n_buckets=4).to_pandas()
    got = {(r.from_type, r.to_type): r.n_transitions for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_user_event_paths_ordered_concatenation(ray_session, tmp_path):
    """Paths join event types in (ts, event_id) order with the -> separator."""
    from docling_jobkit_ray.pipelines.behavior import user_event_paths

    t0 = pd.Timestamp("2024-01-01")
    t1 = t0 + pd.Timedelta(minutes=1)
    rows = [
        (0, 1, t0, "a"), (1, 1, t0, "b"), (2, 1, t1, "c"),
        (3, 2, t1, "z"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = user_event_paths(str(tmp_path), n_buckets=4).to_pandas().set_index("user_id")
    assert out.loc[1, "path"] == "a->b->c" and out.loc[1, "n_events"] == 3
    assert out.loc[2, "path"] == "z" and out.loc[2, "n_events"] == 1


def test_events_since_purchase_reset_semantics(ray_session, tmp_path):
    """Purchase resets the count to 0; pre-first-purchase events count from
    the user's first event; users never interleave."""
    from docling_jobkit_ray.pipelines.behavior import events_since_purchase

    t0 = pd.Timestamp("2024-01-01")
    mk = lambda m: t0 + pd.Timedelta(minutes=m)
    rows = [
        (0, 1, mk(0), "view"),      # since=0 (no purchase yet)
        (1, 1, mk(1), "view"),      # 1
        (2, 1, mk(2), "purchase"),  # 0 (reset)
        (3, 1, mk(3), "click"),     # 1
        (4, 1, mk(4), "purchase"),  # 0 (reset again)
        (5, 2, mk(0), "click"),     # other user: 0
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "events", t)
    out = (
        events_since_purchase(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("event_id")["events_since_purchase"]
    )
    assert out.to_dict() == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0, 5: 0}


def _events_table(rows):
    """rows: (event_id, user_id, ts, event_type)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )


def test_events_asof_semantics(ray_session, tmp_path):
    """Backward asof with exact-match inclusion, deterministic tie
    collapse (max event_id at equal click ts), per-user isolation, and
    inner semantics for purchases with no prior click."""
    from docling_jobkit_ray.pipelines.behavior import events_asof_last_click

    base = pd.Timestamp("2024-01-01")
    s = lambda n: base + pd.Timedelta(seconds=n)
    rows = [
        # user 1: clicks at 0 (ids 10 and 11 — tie) and 100; purchases at
        # 0 (exact match -> tie collapsed to id 11), 50 (-> tie pair at 0),
        # 150 (-> click at 100)
        (10, 1, s(0), "click"),
        (11, 1, s(0), "click"),
        (12, 1, s(100), "click"),
        (20, 1, s(0), "purchase"),
        (21, 1, s(50), "purchase"),
        (22, 1, s(150), "purchase"),
        # user 2: purchase BEFORE its only click -> dropped (inner asof)
        (30, 2, s(10), "purchase"),
        (31, 2, s(20), "click"),
        # user 3: clicks only -> no output; must not leak into user 1
        (40, 3, s(40), "click"),
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = (
        events_asof_last_click(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("event_id")
    )
    assert list(out.index) == [20, 21, 22]
    assert out.loc[20, "click_event_id"] == 11 and out.loc[20, "gap_us"] == 0
    assert out.loc[21, "click_event_id"] == 11
    assert out.loc[21, "gap_us"] == 50_000_000
    assert out.loc[22, "click_event_id"] == 12
    assert out.loc[22, "gap_us"] == 50_000_000
    assert str(out.loc[22, "click_ts"]) == str(s(100))


def test_events_band_join_boundaries(ray_session, tmp_path):
    """The +-band window is CLOSED on both ends; zero-click purchases are
    kept at 0; users never see each other's clicks."""
    from docling_jobkit_ray.pipelines.behavior import events_band_join

    base = pd.Timestamp("2024-01-01")
    s = lambda n: base + pd.Timedelta(seconds=n)
    band_us = 10 * 1_000_000  # +-10 s
    rows = [
        # user 1 purchase at t=100; clicks at 89.999999 (out), 90 (in,
        # boundary), 100 (in), 110 (in, boundary), 110.000001 (out)
        (1, 1, s(100), "purchase"),
        (2, 1, base + pd.Timedelta(microseconds=89_999_999), "click"),
        (3, 1, s(90), "click"),
        (4, 1, s(100), "click"),
        (5, 1, s(110), "click"),
        (6, 1, base + pd.Timedelta(microseconds=110_000_001), "click"),
        # user 2: purchase with NO clicks anywhere near -> count 0
        (7, 2, s(100), "purchase"),
        # user 3: a click inside user 1's window must not count for user 1
        (8, 3, s(100), "click"),
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = (
        events_band_join(str(tmp_path), n_buckets=4, band_us=band_us)
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[1, "n_clicks_band"] == 3
    assert out.loc[7, "n_clicks_band"] == 0


def test_scd2_runs_versions_sentinel(ray_session, tmp_path):
    """Run collapse, per-customer versioning, next-run valid_to chaining,
    and the open-run sentinel; same-date runs tie-break by orderkey."""
    from docling_jobkit_ray.pipelines.tpch_supp import scd2_customer_status

    d = lambda s: pd.Timestamp(s)
    rows = [
        # cust 1: O,O (run1) -> F (run2) -> O (run3); run2 and run3 share a
        # date, disambiguated by orderkey
        (100, 1, "O", d("1995-01-01")),
        (101, 1, "O", d("1995-02-01")),
        (102, 1, "F", d("1995-03-01")),
        (103, 1, "O", d("1995-03-01")),
        # cust 2: single order -> one open run
        (200, 2, "P", d("1996-01-01")),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows]),
            "o_totalprice": pa.array([0.0] * len(rows)),
            "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "orders", t)
    out = scd2_customer_status(str(tmp_path)).to_pandas()
    c1 = out[out["o_custkey"] == 1].reset_index(drop=True)
    assert list(c1["version"]) == [1, 2, 3]
    assert list(c1["o_orderstatus"]) == ["O", "F", "O"]
    assert list(c1["n_orders"]) == [2, 1, 1]
    assert c1.loc[0, "valid_to"] == d("1995-03-01")
    assert c1.loc[1, "valid_from"] == d("1995-03-01")
    assert c1.loc[1, "valid_to"] == d("1995-03-01")
    assert str(c1.loc[2, "valid_to"]) == "9999-12-31 00:00:00"
    c2 = out[out["o_custkey"] == 2].reset_index(drop=True)
    assert len(c2) == 1 and str(c2.loc[0, "valid_to"]).startswith("9999")


def test_events_gapfill_zero_hours(ray_session, tmp_path):
    """Silent hours inside a user's span appear with n_events=0; a
    single-hour user gets exactly one grid row; spans never leak across
    users."""
    from docling_jobkit_ray.pipelines.behavior import events_gapfill_hourly

    base = pd.Timestamp("2024-01-01 00:30:00")
    h = lambda n: base + pd.Timedelta(hours=n)
    rows = [
        # user 1: events in hours 0 (x2) and 3 -> grid 0..3 with gaps 1,2
        (1, 1, h(0), "e"),
        (2, 1, h(0) + pd.Timedelta(minutes=10), "e"),
        (3, 1, h(3), "e"),
        # user 2: one event -> one row
        (4, 2, h(10), "e"),
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = events_gapfill_hourly(str(tmp_path), n_buckets=4).to_pandas()
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    assert list(u1["n_events"]) == [2, 0, 0, 1]
    assert list(u1["hour_ts"]) == [
        pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(hours=k) for k in range(4)
    ]
    u2 = out[out["user_id"] == 2].reset_index(drop=True)
    assert len(u2) == 1 and u2.loc[0, "n_events"] == 1


def test_events_trigram_paths_user_isolation(ray_session, tmp_path):
    """Triples never span users; ordering ties break by event_id; counts
    fold across buckets."""
    from docling_jobkit_ray.pipelines.behavior import events_trigram_paths

    base = pd.Timestamp("2024-01-01")
    s = lambda n: base + pd.Timedelta(seconds=n)
    rows = [
        # user 1: a b c a b c -> abc x2, bca, cab
        (1, 1, s(0), "a"), (2, 1, s(1), "b"), (3, 1, s(2), "c"),
        (4, 1, s(3), "a"), (5, 1, s(4), "b"), (6, 1, s(5), "c"),
        # user 2: c a b — must NOT extend user 1's stream
        (7, 2, s(0), "c"), (8, 2, s(1), "a"), (9, 2, s(2), "b"),
        # user 3: same-ts tie broken by event_id: a(10) b(11) at t=0, c at 1
        (10, 3, s(0), "a"), (11, 3, s(0), "b"), (12, 3, s(1), "c"),
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = events_trigram_paths(str(tmp_path), n_buckets=4).to_pandas()
    m = out.set_index(["e1", "e2", "e3"])["n"]
    assert m[("a", "b", "c")] == 3  # 2 from user 1 + 1 from user 3
    assert m[("b", "c", "a")] == 1 and m[("c", "a", "b")] == 2
    assert len(out) == 3


def test_events_debounced_semantics(ray_session, tmp_path):
    """Per-(user, type) silence window: boundary gap (== window) drops,
    just-over keeps; types don't suppress each other; same-ts duplicate
    drops deterministically."""
    from docling_jobkit_ray.pipelines.behavior import events_debounced

    base = pd.Timestamp("2024-01-01")
    w = 60 * 1_000_000  # 60 s window for the test
    s = lambda us: base + pd.Timedelta(microseconds=us)
    rows = [
        (1, 1, s(0), "a"),            # keep (first)
        (2, 1, s(60_000_000), "a"),   # gap == window -> DROP (strict >)
        (3, 1, s(120_000_001), "a"),  # gap 60.000001s from #2 -> keep
        (4, 1, s(1), "b"),            # other type: keep (own stream)
        (5, 2, s(2), "a"),            # other user: keep
        (6, 2, s(2), "a"),            # same-ts duplicate -> drop
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = events_debounced(str(tmp_path), window_us=w, n_buckets=4).to_pandas()
    assert list(out["event_id"]) == [1, 3, 4, 5]


def test_top_orders_diversified_quota(ray_session, tmp_path):
    """A whale customer caps at per_cust rows; remaining slots fill from
    other customers in global price order."""
    from docling_jobkit_ray.pipelines.tpch_supp import top_orders_diversified

    rows = []
    # whale customer 1: five orders priced 100..96 — only top 3 survive
    for i in range(5):
        rows.append((100 + i, 1, 100.0 - i))
    # customer 2: two mid orders
    rows.append((200, 2, 50.0))
    rows.append((201, 2, 40.0))
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows)),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1995-01-01")] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array([""] * len(rows)),
        }
    )
    _write(tmp_path, "orders", t)
    out = top_orders_diversified(str(tmp_path), k=4, per_cust=3).to_pandas()
    assert list(out["o_orderkey"]) == [100, 101, 102, 200]


def test_events_hourly_uniques_exact_distinct(ray_session, tmp_path):
    from docling_jobkit_ray.pipelines.behavior import events_hourly_uniques

    base = pd.Timestamp("2024-01-01 05:00:00")
    rows = [
        (1, 1, base, "a"),
        (2, 1, base + pd.Timedelta(minutes=5), "a"),  # same user, same hour
        (3, 2, base + pd.Timedelta(minutes=9), "a"),
        (4, 1, base + pd.Timedelta(hours=1), "a"),
    ]
    _write(tmp_path, "events", _events_table(rows))
    out = events_hourly_uniques(str(tmp_path)).to_pandas()
    assert list(out["n_users"]) == [2, 1]
    assert list(out["n_events"]) == [3, 1]


def test_events_cusum_detects_planted_shift(ray_session, tmp_path):
    """In-control first half (1 event/hour), 4x burst second half: no
    alarms before the shift, alarms accumulate after it."""
    from docling_jobkit_ray.pipelines.behavior import events_cusum_alarm

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for h in range(48):
        per = 1 if h < 24 else 4
        for j in range(per):
            rows.append((eid, 1, base + pd.Timedelta(hours=h, minutes=j), "a"))
            eid += 1
    _write(tmp_path, "events", _events_table(rows))
    out = events_cusum_alarm(str(tmp_path)).to_pandas()
    assert len(out) == 48
    first_alarm = out[out["alarm"] == 1].index.min()
    assert first_alarm >= 24, "alarm before the planted shift"
    assert out["alarm"].iloc[30:].all(), "burst half should stay in alarm"
    # CUSUM resets: the statistic is 0 throughout the in-control half
    assert (out["s_scaled"].iloc[:24] == 0).all()
