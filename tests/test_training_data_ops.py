"""Semantics tests for dedup / similarity / text-analysis / chunking /
multimodal operators (beyond the driver's SQL gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session, tmp_path_factory):
    """A documents.parquet with planted exact and near duplicates."""
    import pyarrow.parquet as pq

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest where nobody can find it anymore"
    )
    near = base.replace("lazy dog", "sleepy dog")  # high jaccard
    other = "completely different content about ray data pipelines and arrow batches in a distributed cluster environment"
    rows = {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [base, base, near, other, other, "tiny"],
        "lang": ["en"] * 6,
        "source": ["t"] * 6,
        "n_chars": [len(base), len(base), len(near), len(other), len(other), 4],
    }
    d = tmp_path_factory.mktemp("dups")
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    # embeddings with planted near-dups
    rng = np.random.RandomState(3)
    v = rng.standard_normal((4, 16)).astype(np.float32)
    embs = [v[0], v[0] * 1.001, v[1], v[2]]  # 0 and 1 nearly identical
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([10, 11, 12, 13], pa.int64()),
                "embedding": pa.array([e.tolist() for e in embs], pa.list_(pa.float32())),
                "label": pa.array([0, 0, 1, 2], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_dedup_exact_keeps_min_id(docs_with_dups):
    from docling_jobkit_ray.functions.dedup import dedup_exact

    df = dedup_exact(docs_with_dups).to_pandas()
    by_keep = dict(zip(df["keep_doc_id"], df["n_dups"]))
    assert by_keep[1] == 2  # docs 1,2 identical -> kept 1
    assert by_keep[4] == 2  # docs 4,5 identical -> kept 4
    assert by_keep[3] == 1 and by_keep[6] == 1


def test_minhash_dedup_finds_near_dups(docs_with_dups):
    from docling_jobkit_ray.functions.dedup import minhash_dedup, ngram_jaccard

    pairs = minhash_dedup(docs_with_dups, threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (1, 2) in found  # exact dups
    assert (1, 3) in found or (2, 3) in found  # near dup found via LSH
    assert all(j >= 0.5 for j in pairs["jaccard"])
    # the verify kernel agrees with a direct computation
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


def test_simhash_groups(docs_with_dups):
    from docling_jobkit_ray.functions.dedup import simhash_dup_groups

    df = simhash_dup_groups(docs_with_dups).to_pandas()
    by_keep = dict(zip(df["keep_doc_id"], df["n_docs"]))
    assert by_keep[1] == 2  # identical texts share a simhash
    assert by_keep[4] == 2


def test_embedding_near_dup(docs_with_dups):
    from docling_jobkit_ray.functions.dedup import embedding_near_dup

    df = embedding_near_dup(docs_with_dups, cos_threshold=0.95).to_pandas()
    assert (10, 11) in set(zip(df["vec_a"], df["vec_b"]))
    assert all(df["cosine"] >= 0.95)


def test_knn_brute_force_self_is_top1(ray_session):
    from docling_jobkit_ray.functions.similarity import knn_brute_force

    df = knn_brute_force("/root/testdata/sf0.001", k=3, n_queries=2).to_pandas()
    top1 = df[df["rank"] == 1]
    # each query's nearest neighbour is itself (cosine 1.0)
    assert (top1["query_id"] == top1["vec_id"]).all()
    assert (top1["cosine"] > 0.999).all()


def test_lang_id_detects_english(ray_session, docs_with_dups):
    from docling_jobkit_ray.functions.textstats import lang_id

    df = lang_id(docs_with_dups).to_pandas()
    by_id = dict(zip(df["doc_id"], df["lang_pred"]))
    assert by_id[1] == "en"
    assert by_id[6] == "und"  # "tiny" has no stopword signal


def test_quality_scores_range(ray_session):
    from docling_jobkit_ray.functions.textstats import quality_scores

    df = quality_scores("/root/testdata/sf0.001").to_pandas()
    assert ((df["quality_score"] >= 0) & (df["quality_score"] <= 1)).all()
    assert (df["n_chars"] >= 0).all()


def test_chunking_token_budget(ray_session, corpus_dir):
    from docling_jobkit_ray.pipelines.extract import extract_pipeline
    from docling_jobkit_ray.stages.chunking import ChunkDocuments, chunk_pipeline

    chunks = chunk_pipeline(
        extract_pipeline(corpus_dir, concurrency=(1, 2)), max_tokens=64
    ).to_pandas()
    assert len(chunks) > 0
    # chunk_index dense per url
    for url, g in chunks.groupby("url"):
        assert sorted(g["chunk_index"]) == list(range(len(g)))
    # single-span chunks exceeding the budget are allowed; multi-span are not
    cd = ChunkDocuments(max_tokens=64)
    text = "word " * 300
    spans = [
        {"start": 0, "end": 500, "kind": "paragraph"},
        {"start": 500, "end": 1000, "kind": "paragraph"},
    ]
    out = cd.chunk_doc("u", text, spans)
    assert len(out) == 2  # each oversized span its own chunk


def test_chunking_pluggable_tokenizer(ray_session):
    """A non-whitespace tokenizer must change the packing: a char-count
     'tokenizer' makes the budget much tighter than \\S+ runs, so the same
    doc yields more chunks, and num_tokens comes from the injected counter
    (the reference's HybridChunker tokenizer hook, convert/chunking.py:136-148)."""
    from docling_jobkit_ray.stages.chunking import ChunkDocuments

    text = ("alpha beta gamma delta. " * 8).strip()
    spans = [
        {"start": i * 24, "end": min((i + 1) * 24, len(text)), "kind": "paragraph"}
        for i in range(8)
    ]
    default = ChunkDocuments(max_tokens=16).chunk_doc("u", text, spans)
    by_chars = ChunkDocuments(max_tokens=16, tokenizer=len).chunk_doc("u", text, spans)
    assert len(by_chars) > len(default)
    assert all(c["num_tokens"] == len(c["text"]) for c in by_chars)

    class BpeIsh:
        def count_tokens(self, t: str) -> int:
            return len(t) // 4 + 1

    by_obj = ChunkDocuments(max_tokens=16, tokenizer=BpeIsh()).chunk_doc("u", text, spans)
    assert all(c["num_tokens"] == len(c["text"]) // 4 + 1 for c in by_obj)
    import pytest as _pytest

    with _pytest.raises(TypeError):
        ChunkDocuments(tokenizer=object())


def test_multimodal_plumbing(ray_session):
    import ray.data

    from docling_jobkit_ray.stages.multimodal import (
        frame_sample_pipeline,
        media_features_pipeline,
        synthesize_media_table,
    )

    media = ray.data.from_arrow(synthesize_media_table(60, seed=5))
    feats = media_features_pipeline(media).to_pandas()
    assert len(feats) == 60
    assert all(len(f) == 32 for f in feats["features"])
    # deterministic across runs
    feats2 = media_features_pipeline(
        ray.data.from_arrow(synthesize_media_table(60, seed=5))
    ).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id", ignore_index=True)[["media_id", "content_hash"]],
        feats2.sort_values("media_id", ignore_index=True)[["media_id", "content_hash"]],
    )
    frames = frame_sample_pipeline(media).to_pandas()
    assert (frames["frame_index"] >= 0).all()
    n_videos = 60 // 3
    assert frames["media_id"].nunique() == n_videos


def test_hll_sketch_accuracy_and_merge(ray_session):
    import numpy as np

    from docling_jobkit_ray.functions.sketches import HyperLogLog, approx_distinct_users

    # direct accuracy on a known cardinality
    hll = HyperLogLog(p=12)
    hll.add_values([f"item-{i}" for i in range(10000)])
    est = hll.estimate()
    assert abs(est - 10000) / 10000 < 0.05  # ~1.6% std error at p=12

    # merge associativity: sketch(A) ⊔ sketch(B) == sketch(A ∪ B)
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add_values([f"x{i}" for i in range(5000)])
    b.add_values([f"x{i}" for i in range(2500, 7500)])
    merged = a.merge(b)
    both = HyperLogLog(p=12)
    both.add_values([f"x{i}" for i in range(7500)])
    assert np.array_equal(merged.registers, both.registers)

    # distributed estimate vs exact over the events table
    import duckdb

    exact = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    est2 = approx_distinct_users("/root/testdata/sf0.001")
    assert abs(est2 - exact) / exact < 0.1

    # serialization round-trip
    rt = HyperLogLog.deserialize(a.serialize())
    assert rt.estimate() == a.estimate()


def test_hll_leading_zeros_exact():
    """The clz ladder must be exact where float64 log2 rounds up (values
    just below a power of two) and across random uint64s."""
    import numpy as np

    from docling_jobkit_ray.functions.sketches import HyperLogLog

    vals = [1, 2, 3, (1 << 60) - 1, 1 << 60, (1 << 63) - 1, 1 << 63, (1 << 64) - 1]
    rng = np.random.RandomState(7)
    vals += [int(x) for x in rng.randint(1, 1 << 62, size=200, dtype=np.uint64)]
    arr = np.array(vals, dtype=np.uint64)
    got = HyperLogLog._leading_zeros64(arr)
    want = [64 - int(v).bit_length() for v in vals]
    assert got.tolist() == want


def test_embedding_near_dup_multi_table_recall(docs_with_dups, tmp_path_factory):
    """Multi-table LSH must find at least what one table finds, plus it
    recovers planted near-pairs a single unlucky table can split: with
    8-plane tables, the (10, 11) planted pair survives in >=1 of 6 tables."""
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.dedup import embedding_near_dup

    one = embedding_near_dup(docs_with_dups, n_planes=16, n_tables=1).to_pandas()
    multi = embedding_near_dup(docs_with_dups, n_planes=8, n_tables=6).to_pandas()
    found_multi = set(zip(multi["vec_a"], multi["vec_b"]))
    assert (10, 11) in found_multi
    # pair keys are unique after the cross-table collapse
    assert len(found_multi) == len(multi)
    # every single-table discovery at 16 planes is a true >=0.95 pair; the
    # multi-table run verifies with the same exact-cosine kernel
    assert all(multi["cosine"] >= 0.95)
    assert set(zip(one["vec_a"], one["vec_b"])) <= found_multi | set()


def test_embedding_clusters(ray_session):
    from docling_jobkit_ray.functions.similarity import embedding_clusters

    df = embedding_clusters("/root/testdata/sf0.001", n_cells=8).to_pandas()
    assert len(df) == 500 and df["vec_id"].is_unique
    assert df["cell"].between(0, 7).all()
    # deterministic across runs
    df2 = embedding_clusters("/root/testdata/sf0.001", n_cells=8).to_pandas()
    assert df.equals(df2)


def test_minhash_dedup_fallback_join_path(docs_with_dups):
    """broadcast_pair_limit=0 forces the bucketed-join fallback; output
    must equal the broadcast path exactly (pins the join column order the
    positional rename depends on)."""
    from docling_jobkit_ray.functions.dedup import minhash_dedup

    a = minhash_dedup(docs_with_dups, threshold=0.5).to_pandas()
    b = minhash_dedup(docs_with_dups, threshold=0.5, broadcast_pair_limit=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_minhash_dedup_byte_limit_forces_fallback(docs_with_dups):
    """VERDICT r2 item 3: few pairs of large texts must take the
    bucketed-join fallback — the broadcast decision is byte-aware, not just
    pair-count-aware.  broadcast_byte_limit=1 rejects any candidate set,
    and the result must still equal the broadcast path exactly."""
    from docling_jobkit_ray.functions.dedup import minhash_dedup

    a = minhash_dedup(docs_with_dups, threshold=0.5).to_pandas()
    b = minhash_dedup(
        docs_with_dups, threshold=0.5, broadcast_byte_limit=1
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_simhash_near_dups_matches_bruteforce(docs_with_dups):
    """Manku block-key candidates + XOR/popcount verify must find EXACTLY
    the pairs a brute-force all-pairs Hamming scan finds (completeness is
    guaranteed by the 4x16-block pigeonhole for Hamming <= 3)."""
    import itertools

    import numpy as np

    from docling_jobkit_ray.functions.dedup import (
        SimHasher,
        _popcount64,
        simhash_near_dups,
        simhash_signatures,
    )

    got = simhash_near_dups(docs_with_dups, max_hamming=3).to_pandas()
    sigs = simhash_signatures(docs_with_dups).to_pandas()
    expected = set()
    ids = sigs["doc_id"].to_numpy()
    hs = sigs["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    for i, j in itertools.combinations(range(len(ids)), 2):
        ham = int(_popcount64(np.array([hs[i] ^ hs[j]], dtype=np.uint64))[0])
        if ham <= 3:
            a, b = sorted((int(ids[i]), int(ids[j])))
            expected.add((a, b, ham))
    assert {
        (int(r.doc_a), int(r.doc_b), int(r.hamming)) for r in got.itertuples()
    } == expected
    assert len(expected) > 0  # the planted duplicates guarantee hits


@pytest.fixture(scope="module")
def mutated_corpus(ray_session, tmp_path_factory):
    """40 docs: 8 seeded base texts plus mutated copies at varying word
    replacement rates, so pairwise Jaccard values straddle any threshold."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for b in range(8):
        words = [vocab[rng.randint(len(vocab))] for _ in range(40)]
        texts.append(" ".join(words))
        for rate in (0.05, 0.15, 0.35, 0.7):
            mut = [
                vocab[rng.randint(len(vocab))] if rng.rand() < rate else w
                for w in words
            ]
            texts.append(" ".join(mut))
    d = tmp_path_factory.mktemp("mut")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d), texts


@pytest.mark.parametrize("threshold", [0.4, 0.6, 0.8])
def test_ngram_jaccard_pairs_matches_bruteforce(mutated_corpus, threshold):
    """Prefix filtering is EXACT: the operator must find precisely the
    pairs an exhaustive all-pairs scan finds, at any threshold (the prefix
    lemma guarantees completeness; the verify guarantees precision)."""
    import itertools

    from docling_jobkit_ray.functions.dedup import (
        ngram_jaccard_pairs,
        string_shingle_jaccard,
    )

    sf_dir, texts = mutated_corpus
    got = ngram_jaccard_pairs(sf_dir, threshold=threshold).to_pandas()
    expected = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        jac = string_shingle_jaccard(texts[i], texts[j])
        if jac >= threshold:
            expected[(i + 1, j + 1)] = jac
    assert {
        (int(r.doc_a), int(r.doc_b)): r.jaccard for r in got.itertuples()
    } == expected
    assert len(expected) > 0  # mutation rates guarantee hits at every level


def test_ngram_jaccard_pairs_fallback_parity(docs_with_dups):
    """Forcing the bucketed-join verify path must give the broadcast
    path's exact result."""
    from docling_jobkit_ray.functions.dedup import ngram_jaccard_pairs

    a = ngram_jaccard_pairs(docs_with_dups, threshold=0.5).to_pandas()
    b = ngram_jaccard_pairs(
        docs_with_dups, threshold=0.5, broadcast_pair_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (1, 2) in set(zip(a["doc_a"], a["doc_b"]))  # exact dups: jaccard 1.0


def test_string_shingle_jaccard_kernel():
    from docling_jobkit_ray.functions.dedup import (
        _string_shingles,
        string_shingle_jaccard,
    )

    assert _string_shingles("a b", 3) == set()  # < k words: no shingles
    assert _string_shingles("A b-C d", 3) == {"a b c", "b c d"}  # lower+split
    assert string_shingle_jaccard("a b c d", "a b c d") == 1.0
    assert string_shingle_jaccard("a b c", "x y z") == 0.0
    assert string_shingle_jaccard("tiny", "tiny") == 0.0  # both empty sets


def test_minhash_arrow_path_matches_python_reference():
    """The Arrow-native signing kernel (flat-buffer byte polynomial +
    reduceat) must stay byte-identical to the pure-Python per-doc reference
    — every LSH band and index artifact derives from these hashes."""
    import string as _string
    import random

    import numpy as np
    import pyarrow as pa

    from docling_jobkit_ray.functions.dedup import (
        MinHasher,
        _shingle_hash_frame,
        _shingles,
    )

    edge = [
        "Hello, World! foo_bar baz qux quux",
        "", "  x  ", "a b", "one two", "one two three",
        "punct... only !!! ??? ---", "single",
        "a  b   c\t d \n e f g h",
        "the quick brown fox jumps over the lazy dog " * 5,
    ]
    rng = random.Random(13)
    alphabet = _string.ascii_letters + _string.digits + " .,!_-\t\n"
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 300)))
        for _ in range(200)
    ]
    texts = edge + fuzz
    for k in (1, 2, 3, 5):
        h = MinHasher(num_perm=32, shingle_k=k)
        ref = h.signatures_batch(texts)
        assert np.array_equal(ref, h.signatures_from_arrow(pa.array(texts)))
        # chunked and sliced views exercise the buffer-offset handling
        ch = pa.chunked_array([pa.array(texts[:7]), pa.array(texts[7:])])
        assert np.array_equal(ref, h.signatures_from_arrow(ch))
        sl = pa.array(texts)[3:50]
        assert np.array_equal(
            h.signatures_batch(texts[3:50]), h.signatures_from_arrow(sl)
        )
        # the shingle hash streams themselves agree per doc
        lens, cat = _shingle_hash_frame(pa.array(texts), k)
        pos = 0
        for i, t in enumerate(texts):
            seg = cat[pos : pos + lens[i]]
            pos += lens[i]
            assert np.array_equal(_shingles(t, k), seg), (k, i, t[:40])


# ---------------------------------------------------------------------------
# t-digest approximate quantiles
# ---------------------------------------------------------------------------

def test_tdigest_accuracy_and_merge():
    import numpy as np

    from docling_jobkit_ray.functions.sketches import TDigest

    rng = np.random.RandomState(0)
    x = rng.lognormal(5, 1.2, size=100_000)
    td = TDigest.from_values(x)
    assert len(td.means) <= 2 * td.delta  # bounded sketch size
    # rank error at the quantiles that matter
    for q in (0.5, 0.9, 0.99):
        est = td.quantile(q)
        assert abs((x <= est).mean() - q) < 0.005
    # merge associativity: many-way merged sketch matches the one-shot one
    merged = TDigest(200)
    for part in np.array_split(x, 23):
        merged = merged.merge(TDigest.from_values(part))
    for q in (0.5, 0.99):
        assert abs((x <= merged.quantile(q)).mean() - q) < 0.005
    # serialization round trip
    back = TDigest.deserialize(merged.serialize())
    assert back.quantile(0.5) == merged.quantile(0.5)


def test_doc_length_quantiles_approx_vs_exact(ray_session):
    """The t-digest path must land within a small rank band of the exact
    distributed histogram percentiles."""
    import duckdb

    from docling_jobkit_ray.functions.sketches import doc_length_quantiles_approx

    out = doc_length_quantiles_approx("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM parquet_scan('/root/testdata/sf0.001/documents.parquet')"
    )
    for q, col in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
        exact = con.execute(
            f"SELECT quantile_cont(n_chars, {q}) FROM documents"
        ).fetchone()[0]
        est = float(out[col].iloc[0])
        # 500 docs: the digest is near-exact at this size
        assert abs(est - exact) / exact < 0.05, (col, est, exact)


def test_misra_gries_guarantees():
    """MG contract: estimated count within N/k below true count, and any
    item with frequency > N/k is present after a many-way merged stream."""
    import numpy as np
    import pandas as pd

    from docling_jobkit_ray.functions.sketches import MisraGries

    rng = np.random.RandomState(1)
    vals = rng.zipf(1.5, 200_000) % 5000
    true = pd.Series(vals).value_counts()
    mg = MisraGries(256)
    for chunk in np.array_split(vals, 40):
        mg.add_counts(pd.Series(chunk).value_counts())
    assert len(mg.counters) <= 256
    n_total = len(vals)
    bound = n_total / 256
    for item, c in true.head(10).items():
        est = mg.counters.get(item, 0)
        assert c - bound <= est <= c, (item, c, est)
    for item, c in true.items():
        if c > bound:
            assert item in mg.counters.index


def test_approx_top_terms_vs_exact(ray_session):
    """MG top terms must recover the exact head of the distribution (the
    31-word driver vocabulary fits the budget, so heads must agree)."""
    from docling_jobkit_ray.functions.sketches import approx_top_terms
    from docling_jobkit_ray.functions.textstats import top_terms

    approx = approx_top_terms("/root/testdata/sf0.001", n=10).to_pandas()
    exact = top_terms("/root/testdata/sf0.001", k=10).to_pandas()
    assert list(approx["term"].head(5)) == list(exact["word"].head(5))


def test_ngram_jaccard_pairs_rejects_degenerate_threshold(tmp_path):
    """t=0 would make the prefix longer than the shingle list (column
    length mismatch at table build); t>1 a negative prefix (ADVICE r3)."""
    import pytest

    from docling_jobkit_ray.functions.dedup import ngram_jaccard_pairs

    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            ngram_jaccard_pairs(str(tmp_path), threshold=bad)


def test_sketch_tree_fold_reduces_and_preserves_estimate(ray_session):
    """The distributed fold round must (a) bound the driver-side sketch
    count by n_groups regardless of block count and (b) leave the merged
    estimate identical (merges are associative)."""
    import ray.data

    from docling_jobkit_ray.functions.sketches import (
        HyperLogLog,
        _key_by_sketch_bytes,
        _tree_fold_sketches,
        approx_distinct,
    )

    # 40 blocks of 500 values each -> 40 per-batch sketches
    tables = [
        pa.table({"v": pa.array(range(i * 500, (i + 1) * 500), pa.int64())})
        for i in range(40)
    ]
    ds = ray.data.from_arrow(tables)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 20_000) / 20_000 < 0.05

    # structural: folding 40 sketches into 8 groups leaves <= 8 rows
    def partial(batch):
        h = HyperLogLog(12)
        h.add_values(batch.column("v").to_pylist())
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    def fold(batch):
        m = HyperLogLog(12)
        for s in batch["sketch"].to_pylist():
            m = m.merge(HyperLogLog.deserialize(s))
        return pa.table({"sketch": pa.array([m.serialize()], pa.binary())})

    sketches = ds.map_batches(partial, batch_format="pyarrow")
    folded = _tree_fold_sketches(
        sketches, fold, key_of=_key_by_sketch_bytes, n_groups=8
    )
    assert folded.count() <= 8
    # and the folded estimate equals the unfolded one bit-for-bit
    def drain(d):
        m = HyperLogLog(12)
        for row in d.take_all():
            m = m.merge(HyperLogLog.deserialize(row["sketch"]))
        return m.estimate()

    assert drain(folded) == drain(sketches)


def _chunk_spans(parts):
    """Build (text, spans) from [(kind, seg), ...]."""
    text = ""
    spans = []
    for kind, seg in parts:
        spans.append({"kind": kind, "start": len(text), "end": len(text) + len(seg)})
        text += seg
    return text, spans


def test_chunker_merge_peers_respects_heading_context():
    """merge_peers packs SAME-section elements only: content under two
    different headings never shares a chunk (HybridChunker merge_peers,
    reference convert/chunking.py:136-150)."""
    from docling_jobkit_ray.stages.chunking import ChunkDocuments

    text, spans = _chunk_spans(
        [
            ("heading", "Intro"),
            ("paragraph", "a b c"),
            ("paragraph", "d e f"),
            ("heading", "Methods"),
            ("paragraph", "g h i"),
        ]
    )
    merged = ChunkDocuments(max_tokens=100).chunk_doc("u", text, spans)
    assert len(merged) == 2  # two sections -> two chunks despite the budget
    assert merged[0].get("headings") == ["Intro"]
    assert merged[0]["text"] == "a b c\nd e f"
    assert merged[1].get("headings") == ["Methods"]

    # merge_peers=False: one chunk per element
    solo = ChunkDocuments(max_tokens=100, merge_peers=False).chunk_doc("u", text, spans)
    assert [c["text"] for c in solo] == ["a b c", "d e f", "g h i"]
    assert solo[1]["headings"] == ["Intro"]


def test_chunker_hierarchical_variant_one_chunk_per_element():
    from docling_jobkit_ray.stages.chunking import ChunkDocuments

    text, spans = _chunk_spans(
        [
            ("heading", "H1"),
            ("heading", "H2"),
            ("paragraph", " ".join(f"w{i}" for i in range(500))),  # oversized
            ("list_item", "item one"),
        ]
    )
    out = ChunkDocuments(max_tokens=16, variant="hierarchical").chunk_doc(
        "u", text, spans
    )
    assert len(out) == 2  # no budget, no split: one chunk per element
    assert out[0]["headings"] == ["H1", "H2"]  # consecutive headings stack
    assert out[0]["num_tokens"] == 500

    import pytest

    with pytest.raises(ValueError, match="variant"):
        ChunkDocuments(variant="nope")


def test_chunker_split_oversized_token_budget():
    from docling_jobkit_ray.stages.chunking import ChunkDocuments

    words = " ".join(f"w{i}" for i in range(70))
    text, spans = _chunk_spans([("paragraph", words)])
    out = ChunkDocuments(max_tokens=32, split_oversized=True).chunk_doc(
        "u", text, spans
    )
    assert [c["num_tokens"] for c in out] == [32, 32, 6]
    assert " ".join(c["text"] for c in out) == words  # lossless split
    # custom tokenizer path: budget respected through the injected counter
    out2 = ChunkDocuments(
        max_tokens=40, tokenizer=len, split_oversized=True
    ).chunk_doc("u", text, spans)
    assert all(c["num_tokens"] <= 40 for c in out2)
    assert " ".join(c["text"] for c in out2) == words


def test_semantic_dedup_embeddings_planted_clusters(ray_session, tmp_path):
    """Planted identical-vector clusters must collapse to their min vec_id;
    everything else survives untouched."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.dedup import semantic_dedup_embeddings

    rng = np.random.default_rng(7)
    dim, n = 8, 20
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[1] = vecs[0]
    vecs[2] = vecs[0]       # cluster {0,1,2}
    vecs[6] = vecs[5]       # cluster {5,6}
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = semantic_dedup_embeddings(str(tmp_path), cos_threshold=0.999).to_pandas()
    assert sorted(out["vec_id"]) == sorted(set(range(n)) - {1, 2, 6})
    # representative keeps its vector intact
    row0 = out[out["vec_id"] == 0]["embedding"].iloc[0]
    assert np.allclose(np.asarray(row0, dtype=np.float32), vecs[0])


def test_text_embedder_deterministic_and_semantic():
    """The hashed-n-gram projection stand-in must be deterministic across
    instances and give near-dup texts near-dup embeddings (the geometry the
    ANN/semantic-dedup machinery relies on)."""
    import numpy as np
    import pyarrow as pa

    from docling_jobkit_ray.functions.embed import TextEmbedder

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep woods tonight without any further delay"
    )
    texts = [
        base,
        base.replace("lazy", "sleepy"),  # one-word edit: near-dup
        "completely different content about database engines and queries",
        "",
    ]
    a = TextEmbedder().embed_arrow(pa.array(texts))
    b = TextEmbedder().embed_arrow(pa.array(texts))  # fresh instance
    assert np.array_equal(a, b)
    # unit norm (except the empty doc, which may be zero-bag -> stays 0 row)
    norms = np.linalg.norm(a, axis=1)
    assert np.allclose(norms[:3], 1.0, atol=1e-5)
    assert a[0] @ a[1] > 0.8  # near-dup pair
    assert a[0] @ a[2] < 0.5  # unrelated pair
    # batch split invariance (per-doc determinism regardless of batching)
    c = TextEmbedder().embed_arrow(pa.array(texts[:2]))
    assert np.array_equal(a[:2], c)


def test_semantic_dedup_text_planted_clusters(ray_session, tmp_path):
    """End-to-end SemDeDup FROM RAW TEXT: planted duplicate texts collapse
    to their min doc_id; distinct docs survive with text intact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.embed import semantic_dedup_text

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    n = 24
    texts = [
        " ".join(rng.choice(vocab, size=40).tolist()) for _ in range(n)
    ]
    texts[1] = texts[0]
    texts[2] = texts[0]  # cluster {0,1,2}
    texts[7] = texts[6]  # cluster {6,7}
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = semantic_dedup_text(str(tmp_path), cos_threshold=0.999).to_pandas()
    assert sorted(out["doc_id"]) == sorted(set(range(n)) - {1, 2, 7})
    assert out.set_index("doc_id")["text"].loc[0] == texts[0]
    assert (out["doc_id"].values == np.sort(out["doc_id"].values)).all()


def test_events_funnel_ordering_semantics(ray_session, tmp_path):
    """Crafted users where order matters: completing steps out of order
    must NOT count, and the greedy-earliest rule uses the FIRST qualifying
    event of each step."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.pipelines.relational import events_funnel

    T = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: view(0) -> click(1) -> purchase(2): completes all 3
        (1, T + 0 * m, "view"), (1, T + 1 * m, "click"), (1, T + 2 * m, "purchase"),
        # user 2: click BEFORE view, no click after -> stops at step 1
        (2, T + 0 * m, "click"), (2, T + 1 * m, "view"),
        # user 3: purchase before click -> reaches step 2 only
        (3, T + 0 * m, "view"), (3, T + 1 * m, "purchase"), (3, T + 2 * m, "click"),
        # user 4: view only
        (4, T + 0 * m, "view"),
        # user 5: simultaneous view+click (strict > excludes), later click rescues
        (5, T + 0 * m, "view"), (5, T + 0 * m, "click"), (5, T + 3 * m, "click"),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = events_funnel(str(tmp_path), n_buckets=8).to_pandas().set_index("step")
    assert out.loc[1, "n_users"] == 5   # everyone has a view
    assert out.loc[2, "n_users"] == 3   # users 1, 3, 5 click after their view
    assert out.loc[3, "n_users"] == 1   # only user 1 purchases after the click


def test_minhash_eval_report_borderline_recall(ray_session, tmp_path):
    """Dedup-index quality report: on a borderline corpus (pair jaccard
    ~0.54 vs threshold 0.5) the LSH candidate stage measurably misses
    pairs (recall < 1) while verified precision is exactly 1 by
    construction (the verify IS the exact jaccard)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_jobkit_ray.functions.dedup import minhash_eval_report

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(500)]
    texts = []
    for _ in range(60):
        common = list(rng.choice(vocab, 30))
        texts.append(" ".join(common + list(rng.choice(vocab, 12))))
        texts.append(" ".join(common + list(rng.choice(vocab, 12))))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["web"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = minhash_eval_report(str(tmp_path), threshold=0.5).to_pandas().iloc[0]
    assert out["n_exact"] == 60  # every planted pair qualifies exactly
    assert out["verified_precision_ppm"] == 1_000_000
    assert 300_000 <= out["candidate_recall_ppm"] < 1_000_000
    assert out["candidate_recall_ppm"] >= out["verified_recall_ppm"]


def test_minhash_eval_report_clean_corpus(ray_session):
    """On the synthetic corpus the planted near-identical dups are caught
    perfectly — every metric pins at 1e6 with equal set sizes."""
    from docling_jobkit_ray.functions.dedup import minhash_eval_report

    out = minhash_eval_report("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert out["n_exact"] == out["n_candidates"] == out["n_verified"] == 28
    assert out["candidate_recall_ppm"] == out["verified_precision_ppm"] == 1_000_000
