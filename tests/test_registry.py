"""Registry integrity: every operator module must import (the
incremental-build ModuleNotFoundError guard in registry.load_all must
never silently hide a broken module), every query name must be unique
and oracle-covered unless explicitly waived."""

from __future__ import annotations

from importlib import import_module

from pitlapetl_spark import registry

# queries intentionally without a DuckDB oracle (driver records a
# rows-only check; the reason must be documented in the module)
ROWS_ONLY_WAIVERS = {"agg_approx_sketches"}

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


def test_round7_rotation_window_composition():
    """The round-7 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the 19 never-verified
    session-3 queries lead, any new round-7 queries follow, and the
    r2-era cohort (oldest driver evidence on the board) fills the
    window in ledger order — an accidental reorder or insertion would
    silently spend verification slots differently than the documented
    policy."""
    first50 = list(registry.all_queries())[:50]
    # cohort (a): the 19 session-3 queries, exactly and in order
    assert first50[:19] == [
        "graph_kcore_decomposition",
        "sim_quantize_int8",
        "dedup_containment_capped",
        "sample_neyman_allocation",
        "analytics_herfindahl_market",
        "text_bm25_search",
        "privacy_k_anonymity",
        "analytics_theil_decomposition",
        "dedup_jaccard_prefix_filter",
        "ml_theil_sen_trend",
        "ts_forecast_baseline_mase",
        "rec_item_item_cosine",
        "ab_cuped_adjustment",
        "ml_conformal_interval",
        "stats_diff_in_diff",
        "text_oov_rate",
        "seq_markov_next_event",
        "graph_hits_authorities",
        "pipeline_release_waterfall",
    ]
    # cohorts (b)+(c) fill the rest of the window: every remaining
    # slot is either a round-7-new query (no driver row by
    # construction) or drawn from the r2-era ledger in order
    r2_era_ledger = [
        "job_race_results",
        "job_qualifying_results",
        "job_practice_laps",
        "job_schedule",
        "job_driver_standings",
        "job_constructor_standings",
        "rest_driver_standings",
        "json_corrupt_quarantine",
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
    tail = first50[19:]
    r2_in_window = [n for n in tail if n in r2_era_ledger]
    # r2-era names appear in ledger order, as a prefix of the ledger
    assert r2_in_window == r2_era_ledger[: len(r2_in_window)]
    # and everything else in the window is a round-7 cohort-(b) entry,
    # i.e. listed in _PRIORITY between the two pinned cohorts
    cohort_b = [
        n
        for n in tail
        if n not in r2_era_ledger
    ]
    pri = list(registry._PRIORITY)
    for name in cohort_b:
        assert 19 <= pri.index(name) < pri.index("job_race_results"), name
