"""Registry integrity: every operator module must import (the
incremental-build ModuleNotFoundError guard in registry.load_all must
never silently hide a broken module), every query name must be unique
and oracle-covered unless explicitly waived."""

from __future__ import annotations

from importlib import import_module

from pitlapetl_spark import registry

# queries intentionally without a DuckDB oracle (driver records a
# rows-only check; the reason must be documented in the module).
# EMPTY since round 9 (VERDICT r8 item 7): agg_approx_sketches — the
# last waiver — carries the deterministic boolean-contract oracle
# (exact counts + tolerance booleans the oracle asserts TRUE), and
# the replayable sketch family (agg_hll_distinct,
# agg_hll_set_operations, agg_theta_sketch_distinct_sum) is value-
# hash-checked outright. Every registered query is oracle-covered.
ROWS_ONLY_WAIVERS: set[str] = set()

# floor for the registered surface — grows as operators are added;
# a drop means a module silently fell out of the registry
MIN_QUERIES = 105


def test_all_operator_modules_import():
    for mod in registry._MODULES:
        import_module(mod)  # raises on any breakage — no silent skip


def test_priority_names_exist_and_lead_the_ordering():
    """Every _PRIORITY name must be a real registered query (a typo
    would silently waste a driver-verification slot), and the first
    len(_PRIORITY) entries of all_queries() must be exactly the
    priority list, in order — that's what puts the r1-unverified
    surface inside the driver's ~50-query budget."""
    queries = registry.all_queries()
    missing = set(registry._PRIORITY) - set(queries)
    assert not missing, f"_PRIORITY names not registered: {sorted(missing)}"
    head = list(queries)[: len(registry._PRIORITY)]
    assert head == list(registry._PRIORITY)
    # oracles follow the same ordering for the names they cover
    oracle_head = list(registry.all_oracles())[:10]
    want = [n for n in registry._PRIORITY if n in registry.all_oracles()][:10]
    assert oracle_head == want


def test_registry_size_and_oracle_coverage():
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    assert len(queries) >= MIN_QUERIES, sorted(queries)
    missing = set(queries) - set(oracles) - ROWS_ONLY_WAIVERS
    assert not missing, f"queries without oracle or waiver: {sorted(missing)}"
    stale = set(oracles) - set(queries)
    assert not stale, f"oracles without queries: {sorted(stale)}"


def test_round8_rotation_window_composition():
    """The round-8 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the 42 never-verified
    round-7 cohort-(d)/(e)/(f) queries lead, any new round-8
    cohort-(g) queries follow, and the r2-era refresh queue (oldest
    driver evidence) fills the window in ledger order — an accidental
    reorder or insertion would silently spend verification slots
    differently than the documented policy."""
    first50 = list(registry.all_queries())[:50]
    # cohorts (d)+(e)+(f): the 42 never-driver-verified round-7
    # queries, exactly and in order
    never_verified = [
        "ops_ship_latency_trend",
        "dq_freshness_audit",
        "stats_qq_deciles",
        "stats_benford_first_digit",
        "stats_welch_ttest",
        "analytics_abc_pareto",
        "analytics_new_vs_returning",
        "privacy_t_closeness",
        "graph_jaccard_linkpred",
        "stats_fdr_bh",
        "ml_ridge_closed_form",
        "ml_isotonic_calibration",
        "ab_srm_check",
        "attribution_position_based",
        "analytics_price_volume_bridge",
        "stats_jarque_bera",
        "stats_levene_variance",
        "stats_runs_test",
        "graph_degree_assortativity",
        "ml_pca_2d_closed_form",
        "ml_calibration_reliability",
        "dq_referential_integrity",
        "seq_user_path_topk",
        "text_collocation_llr",
        "survival_nelson_aalen",
        "stats_permutation_test",
        "privacy_dp_count_laplace",
        "ab_power_two_proportions",
        "window_bounce_rate_daily",
        "dq_order_total_reconciliation",
        "analytics_net_revenue_retention",
        "dq_error_rate_wilson",
        "stream_error_rate_wilson",
        "layout_zorder_locality",
        "ml_cohens_kappa_langid",
        "ab_sequential_sprt",
        "dq_volume_anomaly_weekday",
        "analytics_repeat_interval",
        "text_vocab_coverage",
        "ml_auc_roc_rank",
        "window_rolling_median",
        "ml_mcc_confusion",
    ]
    assert first50[:42] == never_verified
    # the remaining 8 slots: each is either a round-8 cohort-(g) entry
    # (listed in _PRIORITY between the never-verified block and the
    # r2-era queue) or drawn from the r2-era refresh queue, in ledger
    # order as a prefix of the queue
    r2_era_ledger = [
        "pipeline_pretrain_filter",
        "dedup_embedding_cosine",
        "dedup_ngram_jaccard_capped",
        "dedup_cluster_components",
        "sim_topk_bruteforce",
        "sim_topk_lsh",
        "sim_label_centroid_knn",
        "pandas_udf_normalize",
        "apply_in_pandas_zscore",
        "mm_binary_features",
        "mm_frame_sample",
        "mm_metadata_stats",
        "agg_collect_set_ordered",
        "agg_grouping_sets",
        "agg_percentiles",
        "agg_salted_group_max",
        "agg_stats_corr",
        "dq_constraint_checks",
        "dq_profile_lineitem",
        "join_right_outer",
        "sample_hash_systematic",
        "sample_stratified_topn",
        "scalar_array_ops",
        "subquery_exists_semi",
        "text_bigram_lm_score",
        "text_fingerprint",
        "text_gopher_rules",
        "text_lang_id",
        "text_pii_scrub",
        "text_quality_score",
        "text_repetition_ratios",
        "text_tfidf_top_term",
        "text_token_stats",
        "window_ntile_distribution",
    ]
    tail = first50[42:]
    r2_in_window = [n for n in tail if n in r2_era_ledger]
    assert r2_in_window == r2_era_ledger[: len(r2_in_window)]
    # everything else in the window is a round-8 cohort-(g) entry,
    # i.e. listed in _PRIORITY between the two pinned cohorts
    cohort_g = [n for n in tail if n not in r2_era_ledger]
    pri = list(registry._PRIORITY)
    for name in cohort_g:
        assert (
            pri.index("ml_mcc_confusion")
            < pri.index(name)
            < pri.index("pipeline_pretrain_filter")
        ), name
