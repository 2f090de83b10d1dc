"""Driver-contract tests: mimic the driver's correctness gate.

Every ``queries()`` entry runs at sf0.001; the SQL-backed subset is compared
against DuckDB (row count + column names + order-insensitive values), the
same check the driver performs at sf0.01.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (np.integer,)):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    assert ds.count() > 0
    assert "url" in ds.schema().names


def test_oracle_keys_subset_of_queries(entrymod):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle_sql keys missing from queries: {missing}"


def test_every_query_locally_checked(entrymod):
    """Completeness gate: every queries() key must appear in SQL_BACKED or
    ROWS_ONLY, so a new operator cannot silently skip the local contract
    tests; and every SQL_BACKED key must have oracle SQL."""
    q = set(entrymod.queries())
    covered = set(SQL_BACKED) | set(ROWS_ONLY)
    assert q - covered == set(), f"queries missing local checks: {sorted(q - covered)}"
    assert covered - q == set(), f"stale test-list entries: {sorted(covered - q)}"
    o = set(entrymod.oracle_sql())
    assert set(SQL_BACKED) <= o, f"SQL_BACKED without oracle: {sorted(set(SQL_BACKED) - o)}"
    assert o <= set(SQL_BACKED), f"oracle queries not SQL-tested locally: {sorted(o - set(SQL_BACKED))}"


SQL_BACKED = [
    "q1_pricing_summary",
    "filter_project_lineitem",
    "join_orders_customer",
    "revenue_by_nation",
    "topk_orders",
    "distinct_event_types",
    "events_hourly_window",
    "events_user_stats",
    "token_counts",
    "fingerprints_sha",
    "doc_stats_by_lang",
    "dedup_exact",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "events_asof_login",
    "sample_orders",
    "events_sessionize",
    "top_orders_per_customer",
    "join_orders_customer_shuffle",
    "union_order_segments",
    "count_distinct_users",
    "normalize_documents",
    "top_terms",
    "customers_without_orders",
    "order_priority_semi",
    "revenue_by_year",
    "parts_named_bolt",
    "events_value_zscore",
    "events_sliding_window",
    "token_counts_bpe",
    "dedup_exact_docs",
    "doc_frequency",
    "doc_length_percentiles",
    "events_rolling_sum",
    "events_orders_range_join",
    "ngram_jaccard_pairs",
    "q5_local_supplier_revenue",
    "q18_large_volume_orders",
    "decontaminate",
    "duplicated_passages",
    "top_bigram_stats",
    "stratified_sample",
    "decontaminate_docs",
    "q13_customer_distribution",
    "inverted_index_stats",
    "gopher_quality_docs",
    "suppliers_per_part",
    "doc_length_percentiles_by_lang",
    "order_priority_semi_bloom",
    "top_event_type_per_hour",
    "orders_price_deciles",
    "revenue_rollup",
    "dup_components",
    "dedup_cluster_docs",
    "events_pivot_hourly",
    "events_unpivot_hourly",
    "event_type_share_hourly",
    "events_hour_value_corr",
    "q4_priority_with_returns",
    "q10_returned_revenue",
    "q12_priority_linestatus",
    "q14_promo_revenue",
    "q22_idle_customers",
    "term_rarity_scores",
    "lang_balanced_sample",
    "epoch_shuffle_order",
    "curated_corpus",
    "doc_signature_terms",
    "search_corpus",
    "top_quartile_docs_by_lang",
    "events_funnel",
    "q2_min_balance_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "doc_repetition_stats",
    "events_intervals",
    "cohort_retention",
    "mixture_sample",
    "user_activity_setops",
    "events_cube_type_dow",
    "events_transitions",
    "user_event_paths",
    "events_since_purchase",
    "dup_span_stats",
    "scrub_eval_spans",
    "bigram_fluency_scores",
    "kwic_concordance",
    "balanced_eval_sample",
    "length_percentile_rank",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    # round-5: learned quality classifier + the embedding family's
    # value-hash-checkable forms
    "classifier_quality_scores",
    "knn_exact_ranks",
    "embedding_assign_seeds",
    "embedding_near_dup_planted",
    # round-5: BPE tokenizer family's exact word-frequency exchange
    "bpe_word_counts",
    # round-5: DSIR importance resampling (int64-quantized log-ratios)
    "dsir_importance_weights",
    # round-5: per-eval-item contamination coverage (integer-exact ppm)
    "benchmark_leakage_report",
    # round-5: three-filter contingency audit (gopher x classifier x dsir)
    "filter_agreement_matrix",
    # round-5: CCNet quality terciles + dedup health histogram
    "ccnet_perplexity_buckets",
    "dup_cluster_size_histogram",
    # round-5: RFM quartile segmentation (3x global-quantile bucketize)
    "rfm_segments",
    # round-5: per-column table profiler (exact-int long form)
    "profile_events",
    # round-5: PMI collocations (quantize-per-bigram)
    "pmi_collocations",
    # round-5: PSI distribution-drift monitor
    "score_drift_psi",
    # round-5: deterministic train/val/test partition
    "train_val_test_split",
    # round-5: Efraimidis-Spirakis weighted sample
    "length_weighted_sample",
    # round-5: lakehouse MERGE INTO / upsert
    "orders_merge_upsert",
    # round-5: distributed skyline
    "orders_pareto_frontier",
    # round-5: incremental materialized-view refresh == full recompute
    "incremental_hourly_view",
    # round-5: Z-order layout keys
    "orders_zorder_keys",
    # round-5: SQL-portable language-evidence profile
    "lang_stopword_profile",
    "lang_confusion_matrix",
    # round-5: evaluation family (chance-corrected agreement, operating point)
    "lang_agreement_kappa",
    "classifier_threshold_calibration",
    "classifier_auc_vs_gopher",
    "classifier_calibration_bins",
    "pagerank_part_supplier",
    "part_triangle_counts",
    "events_attribution",
    "user_survival_km",
    "orders_pruned_revenue",
    "phrase_search",
    "basket_association_rules",
    "k_anonymity_report",
    "orders_cdc_diff",
    "quantile_normalize_lengths",
    "user_event_entropy",
    "customer_reorder_intervals",
    "hourly_view_after_cdc",
    "orders_zorder_box_revenue",
    "cumulative_unique_users",
    "events_quota_filter",
    # round-5: grouped robust stats (median / trimmed sum / MAD, exact cents)
    "orders_robust_stats",
    "orders_outliers_mad",
    # round-5 continuation: fuzzy ER, temporal joins, SCD2/gapfill, sketches
    # and stats (tests/test_fuzzy.py, test_behavior_and_supp.py, test_cms.py,
    # test_stats_tests.py, test_jsontools.py pin each at sf0.001 + crafted)
    "fuzzy_prefix_pairs",
    "fuzzy_entity_resolution",
    "events_asof_last_click",
    "events_band_join",
    "scd2_customer_status",
    "events_gapfill_hourly",
    "cms_term_counts",
    "lang_source_chisq",
    "events_hourly_ols",
    "events_props_extract",
    "events_props_stats",
    "score_drift_ks",
    "bfs_hops_part_supplier",
    "events_trigram_paths",
    "events_debounced",
    "hourly_view_version_diff",
    "data_quality_report",
    "bm25_search",
    "events_hourly_uniques",
    "top_orders_diversified",
    "revenue_mom_growth",
    "bootstrap_ci_value",
    "verified_heavy_hitters",
    "events_cusum_alarm",
    "rolling_active_users",
    "revenue_gini_by_nation",
    "sessions_peak_concurrency",
    "part_clustering_coeff",
    "record_orders",
    "hourly_seasonal_anomalies",
    "events_hourly_theilsen",
    "coordinated_sample_join",
    "weighted_median_doclen_by_lang",
    "vocab_growth_curve",
    "vocab_coverage_curve",
    "lexical_diversity_by_lang",
    "hapax_rate_by_lang",
    "lineitem_status_pit",
    "revenue_time_rollup",
    "events_time_weighted_value",
    "orders_content_checksum",
    "benford_digit_audit",
    "orders_checksum_diff",
    "events_ohlc_daily",
    "bitmap_doc_query",
    "bitmap_index_stats",
    "events_encoding_stats",
    "join_cardinality_estimate",
    "order_ship_latency_quantiles",
    "prefix_autocomplete_top",
    "orders_seasonality_index",
    "session_type_affinity",
    "events_leadlag_xcorr",
    "gdpr_erasure_report",
    "domain_quality_blocklist",
    "events_changepoint",
    "corpus_card",
    "events_max_burst",
    "labeled_pair_sample",
    "lix_readability",
    "l_diversity_report",
    "user_churn_features",
    "rrf_hybrid_search",
    "events_ewma",
    "item_cooccurrence_topk",
    "rake_keywords",
    "mmr_rerank_search",
    "customer_spend_trend",
    "nation_target_encoding",
    "t_closeness_report",
    "kruskal_rank_means",
    "orders_trend_mann_kendall",
    "term_dispersion_dp",
    "adamic_adar_part_pairs",
    "text_shape_templates",
    "char_entropy_docs",
    "orders_runs_test",
    "parts_abc_classification",
    "theil_index_by_nation",
    "customer_ltv_triangle",
    "head_dup_matrix",
    "revenue_share_of_parent",
    "zipf_slope_fit",
    "events_dispersion_index",
    "events_hourly_entropy",
    "user_jaccard_matrix",
    "hourly_profile_similarity",
    "customer_order_regularity",
    "key_skew_report",
    "customers_with_all_brands",
    "functional_dependency_report",
    "order_band_transitions",
    "pps_sample_orders",
    "session_entry_exit_matrix",
    "ab_median_uplift",
    "source_token_apportionment",
    "markup_balance_docs",
    "revenue_lorenz_deciles",
    "orderkey_gap_audit",
    "search_ndcg_report",
    "ranking_overlap_rbo",
    "substring_search_indexed",
    "percolate_routes",
    "term_drift_halves",
    "decayed_customer_value",
    "revenue_max_drawdown",
    "holt_revenue_forecast",
    "customer_top2_share",
    "head_dup_rate_by_source",
    "events_asof_next_purchase",
    "events_hourly_harmonic",
    "sssp_cost_part_supplier",
    "kcore_part_supplier",
    "inventory_balance_by_type",
    "light_stem_vocab_by_lang",
    "cluster_silhouette_report",
    "more_like_this_tfidf",
    "orders_daily_acf",
    "events_daily_ccf",
    "kmeans_lloyd_embeddings",
    "doc_novelty_scores",
    "degree_assortativity_ps",
    "naive_bayes_lang_scores",
    "simpson_diversity_by_lang",
    "lang_source_mutual_info",
    "epoch_shuffle_autocorr",
    "events_transition_entropy",
    "customer_recommendations",
    "source_vocab_ablation",
    "interleaved_curriculum",
    "dedup_keep_best_docs",
    "split_leakage_report",
    "phrase_search_indexed",
    "proximity_search_indexed",
    "kcenter_coreset",
    "contrastive_pairs_mining",
    "sq8_knn_ranks",
    "padding_waste_report",
    "k_anonymize_generalize",
    "stratified_kfold_assign",
    "query_expansion_search",
    "word_dropout_augment",
    "ngram_vocab_sizes",
    "dedup_threshold_profile",
    "token_budget_select",
    "ngram_containment_pairs",
    "ab_sprt_decision",
    "mood_median_test",
    "ab_cuped_uplift",
    "error_trend_by_dow",
    "fleiss_kappa_filters",
]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_duckdb(entrymod, name):
    q = entrymod.queries()
    sql = entrymod.oracle_sql()[name]
    # dtype-kind check BEFORE canonicalization: the driver hashes raw values,
    # so an int64-vs-float64 drift (e.g. DuckDB HUGEINT sums) fails its hash
    # even when every value is equal — catch it here, not in CORRECTNESS_r{N}
    got_raw = _to_pandas(q[name](SF_DIR))
    want_raw = _duck(sql)
    for c in sorted(got_raw.columns):
        gk = got_raw[c].dtype.kind
        wk = want_raw[c].dtype.kind if c in want_raw.columns else "?"
        if {gk, wk} <= {"i", "u"}:
            continue
        assert gk == wk, f"{name}.{c}: dtype kind {gk!r} != oracle {wk!r}"
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # strict: rounded aggregates must be bitwise-equal doubles across
    # engines (the driver hashes values; loose rtol would mask real skew)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-12, atol=1e-12)


ROWS_ONLY = [
    "ann_recall_report",
    "minhash_eval_report",
    "dedup_bloom_incremental",
    "quality_scores",
    "lang_id",
    "fingerprints_rolling",
    "minhash_dedup",
    "simhash_dup_groups",
    "simhash_near_dups",
    "embedding_lsh_buckets",
    "knn_brute_force",
    "knn_ivf",
    "knn_pq",
    "pack_sequences",
    "training_shards",
    "domain_stats",
    "doc_length_quantiles_approx",
    "approx_top_terms",
    "extract_inline",
    "extract_sliced",
    "extract_size_bucketed",
    "extract_fused",
    "extract_vlm",
    "embedding_near_dup",
    "embedding_clusters",
    "extract_dead_letter",
    "chunk_documents",
    "media_features",
    "frame_samples",
    "export_projections",
    "doc_stats",
    "approx_distinct_users",
    "url_canonical_dups",
    "strip_duplicated_passages",
    "semantic_dedup_embeddings",
    "semantic_dedup_text",
    "minhash_index_probe",
    "ivf_index_probe",
    "bpe_token_stats",
    "approx_distinct_users_by_type",
    "embedding_top_component",
    "bpe_fertility_by_lang",
    "compression_ratio_scores",
    "doc_length_quantiles_by_lang_approx",
    "approx_top_terms_by_lang",
    "bpe_packed_sequences",
    "table_stats_events",
    "user_overlap_estimate",
    "extract_ab_compare",
    "extract_elements",
    "rag_ingest_search",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(entrymod, name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None
    # named result with a stable schema
    assert len(df.columns) > 0


def test_knn_ivf_recall_vs_brute(entrymod):
    """IVF with n_probe=n_cells must equal brute force exactly; with fewer
    probes, recall should still be decent on this small corpus."""
    from docling_jobkit_ray.functions.similarity import knn_brute_force, knn_ivf

    bf = _to_pandas(knn_brute_force(SF_DIR, k=5, n_queries=3))
    ivf = _to_pandas(knn_ivf(SF_DIR, k=5, n_queries=3, n_cells=8, n_probe=8))
    got = set(zip(ivf["query_id"], ivf["vec_id"]))
    want = set(zip(bf["query_id"], bf["vec_id"]))
    assert got == want  # full probe == exact
