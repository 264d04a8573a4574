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


def test_round9_rotation_window_composition():
    """The round-9 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the 8 never-verified
    round-8 cohort-(g) spill queries lead, the privacy_dp_sum_bounded
    red-row retest follows (a red latest row outranks stale
    evidence), then the round-9 cohort-(i) additions (capped at 7),
    then the FULL 34-row r2-era refresh queue in ledger order — an
    accidental reorder or insertion would silently spend verification
    slots differently than the documented policy."""
    pri = list(registry._PRIORITY)
    g_spill = [
        "window_reflected_balance",
        "text_phrase_search",
        "sessionize_capped",
        "ml_cross_validation_stump",
        "geo_dbscan_grid",
        "graph_pagerank_personalized",
        "agg_hll_set_operations",
        "ts_holt_linear_trend",
    ]
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
    # ledger structure: spill cohort, retest, cohort (i), r2-era queue
    assert pri[:8] == g_spill
    assert pri[8] == "privacy_dp_sum_bounded"
    assert pri[-34:] == r2_era_ledger
    cohort_i = pri[9:-34]
    # the written arithmetic: 8 + 1 + N_new + 34 <= 50, so N_new <= 7
    assert len(cohort_i) <= 7, cohort_i
    # every ledger name must actually be registered (a typo here
    # would silently drop a pinned slot from the driver window)
    queries = registry.all_queries()
    missing = [n for n in pri if n not in queries]
    assert not missing, missing
    # and the driver window is exactly the ledger head plus
    # registration-order overflow for any spare slots
    first50 = list(queries)[:50]
    assert first50[: len(pri)] == pri
    for name in first50[len(pri) :]:
        assert name not in pri
