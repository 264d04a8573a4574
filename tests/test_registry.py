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


def test_round6_rotation_window_composition():
    """The round-6 driver window (first 50 names) must be exactly the
    ledger's plan: the 42 session-1/2 new queries, then the 7 r1-era
    spill, then the spatial join as the single session-3
    representative — an accidental reorder or insertion would
    silently spend verification slots differently than the documented
    policy."""
    first50 = list(registry.all_queries())[:50]
    assert first50[42:49] == [
        "setop_unpivot",
        "topk_global",
        "window_standings_rank",
        "window_topk_per_group",
        "window_lag_lead_gap",
        "window_running_total",
        "window_rolling_frame",
    ]
    assert first50[49] == "geo_cell_radius_join"
