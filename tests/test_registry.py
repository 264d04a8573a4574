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


def test_round11_rotation_window_composition():
    """The round-11 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the 3 round-10
    spills lead (never-verified outranks stale, standing policy
    since r4), then the FIRST 47 of the 50-row r4-era refresh queue
    in CORRECTNESS_r04 order. Arithmetic: 3 + 47 = 50 exactly; the
    last 3 r4-era rows (agg_pricing_summary, agg_cube,
    agg_distinct_counts) carry to round 12, and the round's own
    additions (the two ingest-sink parity queries) spill to round
    12's cohort — they must NOT be in this window, or they would
    silently displace a pinned refresh slot."""
    pri = list(registry._PRIORITY)
    never_verified = [
        "dedup_semantic_top3",
        "text_url_canonicalize_gate",
        "text_quality_classifier_score",
    ]
    assert pri[:3] == never_verified
    r4_era_head = [
        "resample_daily_grid",
        "agg_argmax_mode",
        "sequence_event_trigrams",
        "udtf_chunk_spans",
        "dedup_winnowing_fast",
        "dedup_incremental_minhash",
        "dedup_repeated_spans",
        "dedup_repeated_spans_fast",
        "dedup_repeated_spans_apply",
        "cdc_latest_state",
        "winsorize_group_values",
        "mix_token_allocation",
        "agg_histogram_equi_depth",
        "attribution_last_touch",
        "featurize_hashed_ngrams",
        "graph_pagerank_copurchase",
        "window_ewma_daily",
        "ab_test_variant_zscore",
        "q6_forecast_revenue",
        "q12_late_shipment_priority",
        "q18_large_volume_customers",
        "q4_order_priority_check",
        "q7_volume_shipping",
        "q8_market_share",
        "q13_customer_distribution",
        "q14_promo_effect",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q19_discounted_revenue",
        "q21_suppliers_kept_waiting",
        "q22_dormant_high_balance",
        "q2_min_cost_supplier",
        "q9_product_type_profit",
        "q11_important_stock",
        "q16_supplier_part_breadth",
        "q20_excess_suppliers",
        "sim_topk_ivf_nprobe",
        "dedup_semantic_semdedup",
        "dsir_importance_weights",
        "report_corpus_datacard",
        "source_csv_roundtrip",
        "source_jsonl_roundtrip",
        "source_orc_roundtrip",
        "source_schema_evolution",
        "sink_delete_roundtrip",
        "churn_yearly_customers",
        "rfm_customer_segments",
    ]
    assert pri[3:] == r4_era_head and len(pri) == 50
    # the r12-carry rows and the round-11 spills stay OUT of the window
    for name in (
        "agg_pricing_summary",
        "agg_cube",
        "agg_distinct_counts",
        "stream_url_gate_compacted_parity",
        "stream_span_dedup_compacted_parity",
    ):
        assert name not in pri, name
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
