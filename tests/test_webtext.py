"""Webtext hygiene operators (functions/webtext.py): gram builder edge
cases, decontamination semantics, duplicated-passage counting, repetition
stats, and PII scrubbing with planted PII.

The SQL-oracle parity for decontaminate / duplicated_passages /
top_bigram_stats runs in test_driver_contract.py like every other
SQL-backed query; here we test the semantics directly on crafted inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from docling_jobkit_ray.functions.webtext import (
    PII_PATTERNS,
    ScrubPii,
    _gram_frame,
    scrub_pii,
)


def test_gram_frame_basic_and_boundaries():
    texts = pa.array(
        [
            "a b c d e",  # 2 4-grams
            "x y z",  # too short for 4-grams
            "",  # splits to one empty word
            "p q r s",  # exactly one 4-gram
        ]
    )
    doc_idx, grams = _gram_frame(texts, 4)
    grams = grams.to_pylist()
    assert list(doc_idx) == [0, 0, 3]
    assert list(grams) == ["a b c d", "b c d e", "p q r s"]
    # grams never cross document boundaries: no gram mixes doc 0 and doc 1
    assert "d e x y" not in set(grams)


def test_gram_frame_preserves_empty_words_like_duckdb():
    # double space -> empty word, matching DuckDB string_split(text, ' ')
    doc_idx, grams = _gram_frame(pa.array(["a  b c"]), 2)
    assert grams.to_pylist() == ["a ", " b", "b c"]


def test_gram_frame_empty_batch():
    doc_idx, grams = _gram_frame(pa.array([], type=pa.string()), 3)
    assert len(doc_idx) == 0 and len(grams) == 0


def test_decontaminate_counts_distinct_overlaps(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import decontaminate

    # doc 0 is the benchmark (0 % 97 == 0); doc 1 repeats a benchmark 4-gram
    # twice (distinct count must be 1); doc 2 shares two distinct grams;
    # doc 3 is clean; doc 4 is too short to gram.
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta x alpha beta gamma delta",
                    "beta gamma delta epsilon zeta q",
                    "one two three four five",
                    "hi",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 0 not in out.index  # benchmark docs excluded
    assert out.loc[1, "n_contaminated"] == 1
    # doc 2: "beta gamma delta epsilon" and "gamma delta epsilon zeta"
    assert out.loc[2, "n_contaminated"] == 2
    assert out.loc[3, "n_contaminated"] == 0
    assert 4 not in out.index  # no grams -> no row (matches the oracle)


def test_duplicated_passages_counts_distinct_docs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import duplicated_passages

    boiler = "all rights reserved contact us"
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    f"intro words {boiler}",
                    f"{boiler} more text here",
                    # repeated WITHIN one doc: still one distinct doc
                    f"{boiler} mid {boiler}",
                    "unique text one two three four",
                    "another unique document body here now",
                    f"tail {boiler}",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = duplicated_passages(str(tmp_path), n=5, min_docs=3, k=10).to_pandas()
    row = out[out["passage"] == boiler]
    assert len(row) == 1
    assert int(row["n_docs"].iloc[0]) == 4  # docs 0,1,2,5 — doc 2 once
    # ordered by n_docs desc then passage asc
    assert list(out["n_docs"]) == sorted(out["n_docs"], reverse=True)


def test_top_bigram_stats_exact(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import top_bigram_stats

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "a b a b a b",  # bigrams: ab ba ab ba ab -> top 'a b' x3, total 5
                    "x y z",  # xy yz -> top 1, total 2
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = top_bigram_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "top_bigram_count"] == 3 and out.loc[0, "n_bigrams"] == 5
    assert out.loc[1, "top_bigram_count"] == 1 and out.loc[1, "n_bigrams"] == 2


def test_stratified_sample_rates_are_accurate(ray_session):
    """The keep fraction per language must track the configured rate (the
    round-3 small-multiplier bug kept a doc_id PREFIX: 100% of everything
    below the threshold id, 0% above — rate-accuracy catches that class)."""
    from docling_jobkit_ray.functions.webtext import stratified_sample

    sf = "/root/testdata/sf0.1"
    out = stratified_sample(sf, rates={"en": 0.5, "zh": 0.2}, default_rate=1.0).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    for lang, rate in [("en", 0.5), ("zh", 0.2)]:
        n_all = (docs["lang"] == lang).sum()
        n_kept = (out["lang"] == lang).sum()
        frac = n_kept / n_all
        assert abs(frac - rate) < 0.08, f"{lang}: kept {frac:.3f}, want ~{rate}"
    # default_rate=1.0 languages all survive
    for lang in ("es", "de", "fr"):
        assert (out["lang"] == lang).sum() == (docs["lang"] == lang).sum()
    # determinism: same call, same sample
    again = stratified_sample(sf, rates={"en": 0.5, "zh": 0.2}, default_rate=1.0).to_pandas()
    assert out.equals(again)


PII_TEXT = (
    "Contact Jane Doe at jane.doe+spam@example.co.uk or call +1 (555) 123-4567. "
    "Server 192.168.001.1 logged ssn 123-45-6789 at noon. "
    "No pii in this clause."
)


def test_scrub_pii_redacts_and_counts():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([PII_TEXT, "clean text only"]),
        }
    )
    out = ScrubPii()(batch)
    scrubbed = out["text"][0].as_py()
    assert "<EMAIL>" in scrubbed and "jane.doe" not in scrubbed
    assert "<IP>" in scrubbed and "192.168" not in scrubbed
    assert "<PHONE>" in scrubbed and "123-4567" not in scrubbed
    assert "<SSN>" in scrubbed and "123-45-6789" not in scrubbed
    assert "No pii in this clause." in scrubbed
    assert out["n_email"][0].as_py() == 1
    assert out["n_ipv4"][0].as_py() == 1
    assert out["n_ssn"][0].as_py() == 1
    # clean row untouched, zero counts
    assert out["text"][1].as_py() == "clean text only"
    assert all(out[f"n_{k}"][1].as_py() == 0 for k, _, _ in PII_PATTERNS)


def test_scrub_pii_dataset_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    rows = 200
    texts = [PII_TEXT if i % 10 == 0 else f"plain body {i} words" for i in range(rows)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(rows), pa.int64()), "text": pa.array(texts)}),
        str(tmp_path / "d.parquet"),
    )
    ds = ray.data.read_parquet(str(tmp_path / "d.parquet"))
    out = scrub_pii(ds).to_pandas()
    assert len(out) == rows
    assert out["n_email"].sum() == rows // 10
    assert not out["text"].str.contains("example.co.uk").any()


def test_strip_duplicated_passages_matches_bruteforce(ray_session, tmp_path):
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import strip_duplicated_passages

    boiler = "subscribe to our newsletter now"
    docs = []
    for i in range(30):
        body = f"unique body {i} content words here"
        # boilerplate rides 20 of 30 docs, twice in some
        if i % 3 != 0:
            docs.append(f"{body} {boiler} tail {i}" + (f" {boiler}" if i % 5 == 0 else ""))
        else:
            docs.append(body)
    t = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array(["en"] * 30),
            "text": pa.array(docs),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    n = 4
    out = strip_duplicated_passages(str(d), n=n, min_docs=5).to_pandas()

    # brute-force oracle: find grams in >=5 docs, mark covered words
    def grams_of(words):
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]

    from collections import Counter

    df = Counter()
    for txt in docs:
        for g in set(grams_of(txt.split(" "))):
            df[g] += 1
    boiler_grams = {g for g, c in df.items() if c >= 5}
    want = []
    for txt in docs:
        words = txt.split(" ")
        cov = np.zeros(len(words), bool)
        for i, g in enumerate(grams_of(words)):
            if g in boiler_grams:
                cov[i : i + n] = True
        want.append(" ".join(w for w, c in zip(words, cov) if not c))
    assert out["text"].tolist() == want
    # the boilerplate phrase is gone from every cleaned doc
    assert not out["text"].str.contains(boiler, regex=False).any()


def test_term_rarity_scores_matches_bruteforce(ray_session, tmp_path):
    """Crafted corpus where corpus frequencies are hand-countable: the
    bucketed join-aggregate must equal a plain Python computation."""
    import collections

    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import term_rarity_scores

    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "rare unicorn words here",
        "the the the",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (
        term_rarity_scores(str(tmp_path), min_count=2)
        .to_pandas()
        .set_index("doc_id")
    )
    freq = collections.Counter(w for t in texts for w in t.split(" "))
    for i, t in enumerate(texts):
        words = t.split(" ")
        assert out.loc[i, "n_tokens"] == len(words)
        assert out.loc[i, "n_rare"] == sum(1 for w in words if freq[w] < 2)
        assert out.loc[i, "sum_freq"] == sum(freq[w] for w in words)


def test_lang_balanced_sample_flattens_to_minority(ray_session):
    """Every language's kept count must land near the minority language's
    size (expected value c_min for all languages), the minority language
    survives at a high rate, and the sample is deterministic."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import lang_balanced_sample

    sf = "/root/testdata/sf0.1"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]).to_pandas()
    c = docs["lang"].value_counts()
    cmin = int(c.min())
    out = lang_balanced_sample(sf).to_pandas()
    kept = out["lang"].value_counts()
    for lang, n_all in c.items():
        n_kept = int(kept.get(lang, 0))
        assert n_kept <= n_all
        # expected cmin keeps per language; Lehmer residues are near-uniform
        assert abs(n_kept - cmin) <= max(6, int(0.35 * cmin)), (
            f"{lang}: kept {n_kept}, want ~{cmin} of {n_all}"
        )
    again = lang_balanced_sample(sf).to_pandas()
    assert out.equals(again)


def test_epoch_shuffle_order_is_deterministic_permutation(ray_session):
    """order_idx must be exactly 0..N-1, the same call must replay the
    identical order, and the order must not be the input doc_id order
    (i.e. it actually shuffles)."""
    from docling_jobkit_ray.functions.webtext import epoch_shuffle_order

    sf = "/root/testdata/sf0.01"
    out = epoch_shuffle_order(sf).to_pandas()
    n = len(out)
    assert sorted(out["order_idx"]) == list(range(n))
    assert sorted(out["doc_id"]) == list(range(n))  # a permutation of the corpus
    assert list(out["doc_id"]) != sorted(out["doc_id"])  # genuinely shuffled
    again = epoch_shuffle_order(sf).to_pandas()
    assert out.equals(again)


def test_curated_corpus_exclusion_reasons(ray_session, tmp_path):
    """Crafted corpus where each exclusion rule fires independently:
    a benchmark doc, an exact-duplicate loser, a gopher-failing doc, and a
    contaminated doc must each drop; one clean doc survives."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import curated_corpus

    # 30+ [a-z]+ words with mean word length in [3.9, 5.2] and a stopword —
    # passes gopher; doc_ids chosen so none is % 97 == 0 except doc 0
    good = (
        "the quick brown foxes lived near small green hills and they often "
        "went down long dusty roads with their good old dogs every early "
        "sunny day while birds sang soft tunes over warm quiet fields"
    )  # 35 words, mean word length 4.46, 2 stop hits -> passes gopher
    bench_text = "unique benchmark marker phrase appearing nowhere else at all"
    contaminated = good + " unique benchmark marker phrase appearing nowhere else"
    texts = [
        bench_text,            # doc 0: benchmark slice (0 % 97 == 0)
        good,                  # doc 1: clean winner -> KEPT
        good,                  # doc 2: exact dup of 1, loses to min doc_id
        "short text",          # doc 3: fails gopher min words
        contaminated,          # doc 4: shares a benchmark 4-gram
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = curated_corpus(str(tmp_path)).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert list(out.columns) == ["doc_id", "lang", "n_chars"]


def test_doc_signature_terms_tie_breaks(ray_session, tmp_path):
    """Hand-crafted corpus pinning all three ordering levels: tf desc,
    then df asc (rarer wins), then lexicographic."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import doc_signature_terms

    texts = [
        "apple apple banana",        # tf: apple=2 wins outright
        "cherry date cherry date",   # tf tie (2,2); df: cherry appears in 2 docs, date in 1 -> date wins
        "cherry kiwi",               # tf tie (1,1); df tie (cherry df=2? no: cherry docs={1,2}=2, kiwi=1) -> kiwi
        "zebra yak",                 # tf tie, df tie (both 1) -> lexicographic: yak
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = doc_signature_terms(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "term"] == "apple" and out.loc[0, "tf"] == 2
    assert out.loc[1, "term"] == "date"   # rarer of the tf-tied pair
    assert out.loc[2, "term"] == "kiwi"   # df 1 beats cherry's df 2
    assert out.loc[3, "term"] == "yak"    # full tie -> lexicographic


def test_top_quartile_docs_by_lang_threshold_semantics(ray_session):
    """Per-language thresholds: every kept doc is >= its own language's
    quantile_disc threshold, and roughly the top quarter per language
    survives (>= because of ties at the threshold value)."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import top_quartile_docs_by_lang

    sf = "/root/testdata/sf0.1"
    out = top_quartile_docs_by_lang(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    for lang, g in docs.groupby("lang"):
        kept = out[out["lang"] == lang]
        n_all = len(g)
        assert len(kept) >= 0.25 * n_all - 1          # at least the quartile
        assert len(kept) <= 0.35 * n_all + 1          # ties can't explode it
        thr = kept["n_chars"].min()
        # nothing below the kept minimum was wrongly kept, and everything
        # at/above the language's own threshold IS kept
        assert (g["n_chars"] >= thr).sum() == len(kept)


def test_dup_span_stats_merges_maximal_runs(ray_session, tmp_path):
    """Consecutive corpus-duplicated gram positions must merge into ONE
    maximal span even though each gram hashes to a different bucket; a
    within-doc-only repeat is NOT duplicated; short docs get n_grams=0."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import dup_span_stats

    shared = "alpha beta gamma delta epsilon"  # 3 shared trigram positions
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # doc 0: shared run at pos 2..4 (one span of 3), tail clean
                    "x y " + shared + " u v w",
                    # doc 1: the other copy, shared run at pos 0..2, then a
                    # SECOND shared island ("p q r" also in doc 2) at 4..4
                    shared + " z p q r",
                    # doc 2: provides the second island's other copy
                    "p q r s t",
                    # doc 3: repeats ITS OWN trigram twice but shares nothing
                    "m n o m n o m n o",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = dup_span_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    # doc 0: 10 words -> 8 positions; "alpha beta gamma","beta gamma delta",
    # "gamma delta epsilon" at pos 2,3,4 -> one 3-long span
    assert out.loc[0].tolist() == [8, 3, 1, 3]
    # doc 1: 9 words -> 7 positions; span 0..2 plus "p q r" at pos 6 (island)
    assert out.loc[1, "n_dup_grams"] == 4
    assert out.loc[1, "n_spans"] == 2
    assert out.loc[1, "max_span"] == 3
    # doc 2: only "p q r" is shared
    assert out.loc[2].tolist() == [3, 1, 1, 1]
    # doc 3: self-repetition only -> count(DISTINCT doc) == 1, no dups
    assert out.loc[3].tolist() == [7, 0, 0, 0]


def test_dup_span_stats_short_docs_zero_grams(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import dup_span_stats

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hi there", "alpha"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = dup_span_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out["n_grams"].tolist() == [0, 0]
    assert out["n_dup_grams"].tolist() == [0, 0]


def test_scrub_eval_spans_surgical_removal(ray_session, tmp_path):
    """Words under any benchmark-overlapping 4-gram window are cut and the
    remainder re-joins; overlapping windows merge; clean docs pass through
    unchanged; benchmark docs are excluded from the output."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import scrub_eval_spans

    bench = "alpha beta gamma delta epsilon"  # doc 0 (0 % 97 == 0)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    bench,
                    # two overlapping hit windows (pos 2 and 3) cover words
                    # 2..6 -> "x y ... u v" survives
                    "x y alpha beta gamma delta epsilon u v",
                    # whole doc is one hit window -> empty remainder
                    "alpha beta gamma delta",
                    "totally clean words here now",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = scrub_eval_spans(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 0 not in out.index
    assert out.loc[1, "text_clean"] == "x y u v"
    assert out.loc[1, "n_removed"] == 5
    assert out.loc[2, "text_clean"] == "" and out.loc[2, "n_removed"] == 4
    assert out.loc[3, "text_clean"] == "totally clean words here now"
    assert out.loc[3, "n_removed"] == 0


def test_bigram_fluency_exact_counts(ray_session, tmp_path):
    """Exact conditional counts on a crafted corpus: 'a b' occurs 3x
    corpus-wide, context 'a' occurs 4x as a prefix; the garbled doc's rare
    transition scores minimum frequency."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import bigram_fluency_scores

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b a b",      # bigrams: ab, ba, ab
                    "a b c",        # ab, bc
                    "a z",          # az (rare transition, common words)
                    "solo",         # no bigrams -> no row
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = bigram_fluency_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    # corpus: f(ab)=3, f(ba)=1, f(bc)=1, f(az)=1; ctx f(a)=4, f(b)=2
    assert 3 not in out.index
    assert out.loc[0].tolist() == [3, 3 + 1 + 3, 4 + 2 + 4]
    assert out.loc[1].tolist() == [2, 3 + 1, 4 + 2]
    # doc 2: common word 'a' but rare transition -> minimal bigram freq
    assert out.loc[2].tolist() == [1, 1, 4]


def test_kwic_concordance_windows_and_edges(ray_session, tmp_path):
    """Clamped windows at doc edges, multiple hits per doc, 1-based pos."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import kwic_concordance

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "vector a b c vector",   # hit at start (empty left) and end
                    "x y z vector p q r s",  # full windows both sides
                    "no hits here",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = kwic_concordance(str(tmp_path), term="vector", window=3).to_pandas()
    rows = [tuple(r) for r in out.itertuples(index=False)]
    assert rows == [
        (0, 1, "", "a b c"),
        (0, 5, "a b c", ""),
        (1, 4, "x y z", "p q r"),
    ]


def test_balanced_eval_sample_exact_k_and_small_groups(ray_session, tmp_path):
    """Exactly k per language; groups smaller than k keep everything; the
    pick is hash-deterministic (same result on re-run)."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import balanced_eval_sample

    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array(["en"] * 20 + ["fr"] * 8 + ["de"] * 2),
            "text": pa.array(["x"] * 30),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    a = balanced_eval_sample(str(tmp_path), k=5).to_pandas()
    b = balanced_eval_sample(str(tmp_path), k=5).to_pandas()
    assert a.equals(b)
    counts = a.groupby("lang")["doc_id"].count().to_dict()
    assert counts == {"en": 5, "fr": 5, "de": 2}


def test_length_percentile_rank_tie_semantics(ray_session, tmp_path):
    """Ties share the minimum rank (SQL percent_rank); singleton group -> 0."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.webtext import length_percentile_rank

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en", "en", "en", "en", "fr"]),
            "n_chars": pa.array([10, 20, 20, 30, 99], pa.int64()),
            "text": pa.array(["x"] * 5),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = length_percentile_rank(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "pct_rank"] == 0.0
    assert out.loc[1, "pct_rank"] == out.loc[2, "pct_rank"] == 1 / 3
    assert out.loc[3, "pct_rank"] == 1.0
    assert out.loc[4, "pct_rank"] == 0.0  # singleton group
