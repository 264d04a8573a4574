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


def test_round10_rotation_window_composition():
    """The round-10 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the board opened
    clean (zero never-verified, zero red after round 9), so the one
    round-10 cohort-(i) addition leads (never-verified outranks
    stale, standing policy since r4), then the FULL 49-row r3-era
    refresh queue in ledger order. Arithmetic: N_new + 49 = 50
    exactly at the N_new = 1 cap — an accidental second addition or
    a reorder would silently spend verification slots differently
    than the documented policy."""
    pri = list(registry._PRIORITY)
    r3_era_ledger = [
        "flagship_top_value_per_user",
        "agg_approx_sketches",
        "agg_group_minmax_stats",
        "window_range_frame",
        "asof_join_last_order",
        "dedup_minhash_lsh",
        "stream_tumbling_counts",
        "stream_sliding_avg",
        "stream_session_windows",
        "sink_upsert_roundtrip",
        "window_forward_fill",
        "rollup_hierarchy_day_from_hour",
        "sink_merge_scoped_roundtrip",
        "text_boilerplate_lines",
        "shuffle_epoch_shards",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "interval_merge_activity",
        "sketch_mv_union",
        "anomaly_rolling_zscore",
        "dq_skew_profile",
        "market_basket_pairs",
        "window_cumulative_distinct_users",
        "dedup_winnowing",
        "temporal_pit_join",
        "asof_join_tolerance",
        "sessionize_events",
        "window_share_of_total",
        "scd2_user_value_history",
        "funnel_view_click_purchase",
        "cohort_retention_matrix",
        "sim_topk_lsh_multiprobe",
        "join_range_binned",
        "incremental_mv_merge",
        "kmeans_lloyd_clusters",
        "sample_weighted_mix",
        "agg_histogram_equi_width",
        "pandas_udaf_weighted_mean",
        "join_salted_skew",
        "text_kl_domain_drift",
        "dedup_keep_best",
        "fuzzy_match_blocking",
        "table_diff_reconcile",
        "contamination_eval_overlap",
        "pack_token_budget",
        "split_train_holdout",
        "scalar_date_math",
        "scalar_regex_suite",
    ]
    # ledger structure: cohort (i) additions, then the r3-era queue
    assert pri[-49:] == r3_era_ledger
    cohort_i = pri[:-49]
    # the written arithmetic: N_new + 49 <= 50, so N_new <= 1
    assert len(cohort_i) <= 1, cohort_i
    assert cohort_i == ["stream_semantic_compacted_parity"]
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
