"""Replicates the driver's t2 gate locally: every query with an oracle
must match DuckDB on row count, column names, and canonical values.

Runs at sf0.001 by default for speed; set PITLAP_PARITY_SF=0.01 to run
at the driver's correctness scale.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_query

SF_DIR = f"/root/testdata/sf{os.environ.get('PITLAP_PARITY_SF', '0.001')}"


def _pairs():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    return [(name, qs[name], sql) for name, sql in sorted(oracles.items())]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_parity(spark, name, fn, sql):
    problems = compare_query(name, spark, SF_DIR, fn, sql)
    assert not problems, "\n".join(problems)
