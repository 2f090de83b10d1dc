"""Sequence packing (functions/packing.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from docling_jobkit_ray.functions.packing import pack_batch, pack_sequences


def test_pack_batch_respects_budget_and_covers_all():
    rng = np.random.RandomState(3)
    tokens = rng.randint(1, 400, size=500)
    doc_ids = np.arange(500)
    bin_of, bin_tot = pack_batch(doc_ids, tokens, budget=512)
    assert len(bin_of) == 500
    # every bin within budget (no doc exceeds it here)
    sums = pd.Series(tokens).groupby(bin_of).sum()
    assert (sums <= 512).all()
    # FFD waste bound: bins <= 11/9 * OPT + 1, OPT >= ceil(total/budget)
    opt_lb = int(np.ceil(tokens.sum() / 512))
    assert sums.size <= np.ceil(11 / 9 * opt_lb) + 1


def test_pack_batch_overflow_docs_get_own_bin():
    tokens = np.array([600, 100, 700, 50])
    bin_of, bin_tot = pack_batch(np.arange(4), tokens, budget=512)
    # the two oversize docs are alone in their bins
    assert bin_tot[0] == 600 and bin_tot[2] == 700
    assert bin_of[0] != bin_of[2]
    # the two small docs share one bin
    assert bin_of[1] == bin_of[3]


def test_pack_sequences_dataset(ray_session):
    out = pack_sequences("/root/testdata/sf0.001", budget_tokens=256).to_pandas()
    assert len(out) == 500  # every document assigned exactly once
    assert out["doc_id"].is_unique
    # per-pack totals consistent and within budget (or single-doc overflow)
    grp = out.groupby("pack_id")
    for pid, g in grp:
        total = g["n_tokens"].sum()
        assert (g["pack_tokens"] == total).all()
        assert total <= 256 or len(g) == 1
        assert pid == g["doc_id"].min()  # pack_id contract
    # determinism
    again = pack_sequences("/root/testdata/sf0.001", budget_tokens=256).to_pandas()
    assert out.equals(again)
