"""Non-vacuousness guard (the r3 lesson): an oracle-parity pass on
0-vs-0 rows proves nothing — resample_daily_grid was green for a full
round while its spine/zero-fill/LOCF logic had never executed. Every
registered oracle must return at least one row at the driver's
correctness scale. DuckDB-only: no Spark session, so the whole sweep
is cheap."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECTNESS as SF_DIR
from tests.oracle_harness import duckdb_connection


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


_ORACLES = sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_oracle_nonvacuous_at_driver_scale(con, name, sql):
    n = len(con.execute(sql).fetchall())
    assert n > 0, f"{name}: oracle returns 0 rows at sf0.01 — vacuous parity"
