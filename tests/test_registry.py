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
MIN_QUERIES = 92


def test_all_operator_modules_import():
    for mod in registry._MODULES:
        import_module(mod)  # raises on any breakage — no silent skip


def test_registry_size_and_oracle_coverage():
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    assert len(queries) >= MIN_QUERIES, sorted(queries)
    missing = set(queries) - set(oracles) - ROWS_ONLY_WAIVERS
    assert not missing, f"queries without oracle or waiver: {sorted(missing)}"
    stale = set(oracles) - set(queries)
    assert not stale, f"oracles without queries: {sorted(stale)}"
