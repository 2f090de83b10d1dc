"""Crafted-input semantics for the eleventh round-5 batch: LIX
readability, l-diversity audit, point-in-time churn features, integer
EWMA, and RRF hybrid search.  SQL-oracle parity runs in
test_driver_contract.py; here the exact arithmetic and the boundary
conditions are pinned on hand-built tables.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(sources or ["s0"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )


def _events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, value)."""
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
    )


def test_lix_readability_hand_values(ray_session, tmp_path):
    """Hand-computed LIX ppm: the two floor-divided terms, the sentence
    floor of 1, and the word-less zero."""
    from docling_jobkit_ray.functions.textstats import lix_readability

    _docs(
        tmp_path,
        [
            "Aa bb cc. Dd ee!",  # 5 words, 0 long, 2 sentences
            "Abcdefg.",  # 1 word, 1 long, 1 sentence
            "no sentence marks here",  # 4 words, 1 long (8 letters), 0 sents
            "...!!!",  # 0 words
        ],
    )
    got = lix_readability(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "lix_ppm"] == 5 * 1_000_000 // 2
    assert got.loc[1, "lix_ppm"] == 1 * 1_000_000 + 1 * 100_000_000
    # sentences floor to 1; 'sentence' is 8 letters -> long
    assert got.loc[2, "n_sentences"] == 0
    assert got.loc[2, "lix_ppm"] == 4 * 1_000_000 + 100_000_000 // 4
    assert got.loc[3, "n_words"] == 0 and got.loc[3, "lix_ppm"] == 0


def test_l_diversity_at_risk_flag(ray_session, tmp_path):
    """A class whose members share one source is flagged even though it
    clears k-anonymity by size."""
    from docling_jobkit_ray.functions.quality_checks import l_diversity_report

    # 6 docs, all lang=en, same length bucket (short texts), sources:
    # class en/0 has sources s0 x4 (at risk: 1 distinct), class fr/0 has
    # s0, s1, s2 (3 distinct -> clears l=3)
    texts = ["a"] * 7
    langs = ["en"] * 4 + ["fr"] * 3
    sources = ["s0"] * 4 + ["s0", "s1", "s2"]
    _docs(tmp_path, texts, langs=langs, sources=sources)
    got = l_diversity_report(str(tmp_path)).to_pandas()
    en = got[got["lang"] == "en"].iloc[0]
    fr = got[got["lang"] == "fr"].iloc[0]
    assert en["class_size"] == 4 and en["n_sources"] == 1 and en["at_risk"] == 1
    assert fr["class_size"] == 3 and fr["n_sources"] == 3 and fr["at_risk"] == 0


def test_user_churn_feature_boundaries(ray_session, tmp_path):
    """Window boundaries are half-open exactly at the cutoff: an event AT
    T belongs to the label window only; T-14d is inside the feature
    window; a user with only post-T events is excluded."""
    from docling_jobkit_ray.pipelines.behavior import user_churn_features

    T = dt.datetime(2024, 1, 21)
    rows = [
        # user 1: one pre-window, two in-window, one label event
        (1, dt.datetime(2024, 1, 6, 23, 59), 1, 99.0),
        (2, dt.datetime(2024, 1, 7, 0, 0), 1, 10.0),
        (3, dt.datetime(2024, 1, 14, 0, 0), 1, 5.25),
        (4, T, 1, 1.0),
        # user 2: active 1h before T, silent after -> churned
        (5, dt.datetime(2024, 1, 20, 23, 0), 2, 1.0),
        # user 3: only post-T -> excluded from the snapshot
        (6, dt.datetime(2024, 1, 22), 3, 1.0),
        # user 4: old activity only; an event exactly at T+7d is OUTSIDE
        # the label window -> churned
        (7, dt.datetime(2024, 1, 1), 4, 2.0),
        (8, dt.datetime(2024, 1, 28), 4, 2.0),
    ]
    _events(tmp_path, rows)
    got = (
        user_churn_features(str(tmp_path)).to_pandas().set_index("user_id")
    )
    assert sorted(got.index) == [1, 2, 4]
    u1 = got.loc[1]
    assert u1["n_events_7d"] == 1 and u1["n_events_14d"] == 2
    assert u1["value_cents_14d"] == 1000 + 525
    assert u1["recency_hours"] == 7 * 24 and u1["churned"] == 0
    u2 = got.loc[2]
    assert u2["recency_hours"] == 1 and u2["churned"] == 1
    u4 = got.loc[4]
    assert u4["n_events_14d"] == 0 and u4["churned"] == 1
    assert u4["recency_hours"] == 20 * 24


def test_events_ewma_exact_chain(ray_session, tmp_path):
    """Hand-computed integer recurrence, with a timestamp tie broken by
    event_id."""
    from docling_jobkit_ray.pipelines.behavior import events_ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (10, t0, 1, 0.80),
        # tie: two events at the same ts -- event 11 precedes 12
        (11, t0 + dt.timedelta(hours=1), 1, 0.16),
        (12, t0 + dt.timedelta(hours=1), 1, 0.40),
        (20, t0, 2, 3.00),
    ]
    _events(tmp_path, rows)
    got = events_ewma(str(tmp_path)).to_pandas().set_index("event_id")
    assert got.loc[10, "ewma_cents"] == 80
    assert got.loc[11, "ewma_cents"] == (16 + 7 * 80) // 8  # 72
    assert got.loc[12, "ewma_cents"] == (40 + 7 * 72) // 8  # 68
    assert got.loc[20, "ewma_cents"] == 300


def test_rrf_fusion_math(ray_session):
    """The fused score is exactly the floor-divided reciprocal-rank sum of
    the two component rankings run standalone."""
    from docling_jobkit_ray.functions.index import (
        bm25_search,
        rrf_hybrid_search,
        search_corpus,
    )

    sf = "/root/testdata/sf0.001"
    terms = ["table", "spark", "window"]
    bm = bm25_search(sf, terms, k=20).take_all()
    sc = search_corpus(sf, terms, k=20).take_all()
    bm_rank = {int(r["doc_id"]): i + 1 for i, r in enumerate(bm)}
    sc_rank = {int(r["doc_id"]): i + 1 for i, r in enumerate(sc)}
    got = rrf_hybrid_search(sf, terms, k=20).to_pandas()
    assert len(got) > 0
    for _, row in got.iterrows():
        rb = bm_rank.get(row["doc_id"], 0)
        rs = sc_rank.get(row["doc_id"], 0)
        want = (1_000_000 // (60 + rb) if rb else 0) + (
            1_000_000 // (60 + rs) if rs else 0
        )
        assert row["rrf_score"] == want
        assert row["bm25_rank"] == rb and row["bool_rank"] == rs
    # scores are non-increasing with doc_id tiebreak
    s = list(got["rrf_score"])
    assert s == sorted(s, reverse=True)
