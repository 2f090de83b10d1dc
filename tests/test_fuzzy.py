"""Fuzzy entity-resolution join (functions/fuzzy.py): PassJoin pigeonhole
blocking + exact Levenshtein verify.

Checks: (1) the verify kernel matches DuckDB ``levenshtein`` on fuzzed
strings (same cost model); (2) end-to-end SQL parity at sf0.001; (3)
recall-completeness on a PLANTED corpus where every qualifying pair is
known by construction (insert / delete / substitute edits at d=1..2,
including edits that change the prefix length across segment boundaries).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_jobkit_ray.functions.fuzzy import (
    FUZZY_PREFIX_PAIRS_SQL,
    _seg_bounds,
    fuzzy_prefix_pairs,
    levenshtein,
)

SF_DIR = "/root/testdata/sf0.001"


def test_levenshtein_matches_duckdb_fuzz():
    rng = np.random.default_rng(7)
    alpha = list("abcde ")
    con = duckdb.connect()
    for _ in range(300):
        la, lb = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        a = "".join(rng.choice(alpha, la))
        b = "".join(rng.choice(alpha, lb))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_seg_bounds_cover_string():
    for length in range(0, 40):
        bounds = _seg_bounds(length)
        assert len(bounds) == 3
        pos = 0
        for start, slen in bounds:
            assert start == pos and slen >= 0
            pos += slen
        assert pos == length


def test_fuzzy_prefix_pairs_matches_sql_sf0001(ray_session):
    got = fuzzy_prefix_pairs(SF_DIR).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(FUZZY_PREFIX_PAIRS_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fuzzy_planted_recall_complete(ray_session, tmp_path):
    """Plant base strings plus edited variants at every edit kind and
    position class (head / segment boundary / tail; length-changing edits
    included) and assert the blocked join finds EVERY qualifying pair that
    the quadratic oracle finds — completeness, not just precision."""
    rng = np.random.default_rng(11)
    alpha = list("abcdefghij ")
    texts: list[str] = []
    for i in range(12):
        base = "".join(rng.choice(alpha, int(rng.integers(20, 45))))
        texts.append(base)
        # substitution at head, middle, boundary-ish, tail
        for pos in (0, len(base) // 3, 2 * len(base) // 3, len(base) - 1):
            texts.append(base[:pos] + "#" + base[pos + 1 :])
        # deletions and insertions (length-changing)
        texts.append(base[1:])
        texts.append(base[:-2])
        texts.append(base[: len(base) // 2] + "zz" + base[len(base) // 2 :])
        # distance-2 double substitution
        texts.append("##" + base[2:])
    # plus unrelated noise rows
    for _ in range(30):
        texts.append("".join(rng.choice(alpha, int(rng.integers(20, 45)))))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))

    got = fuzzy_prefix_pairs(str(tmp_path)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(FUZZY_PREFIX_PAIRS_SQL).fetchdf()
    assert len(want) > 50, "planted corpus should yield many qualifying pairs"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fuzzy_rejects_other_max_dist():
    with pytest.raises(ValueError):
        fuzzy_prefix_pairs(SF_DIR, max_dist=3)


def test_fuzzy_entity_resolution_matches_sql_sf0001(ray_session):
    from docling_jobkit_ray.functions.fuzzy import (
        FUZZY_ENTITY_RESOLUTION_SQL,
        fuzzy_entity_resolution,
    )

    got = fuzzy_entity_resolution(SF_DIR).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(FUZZY_ENTITY_RESOLUTION_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # survivorship invariants: each cluster's canonical is a member and is
    # its own canonical; the map covers every doc exactly once
    canon = dict(zip(got["doc_id"], got["canonical_id"]))
    assert all(canon[c] == c for c in set(got["canonical_id"]))
    assert got["doc_id"].is_unique and len(got) == 500
