"""Local replica of the driver's DuckDB-oracle comparison.

For every registered query with an oracle, run the Spark plan and the
DuckDB SQL on the same parquet tables and compare: row count, column
names, and an order-insensitive canonical value comparison. Used by
tests/test_oracle_parity.py so oracle drift is caught locally before
the driver's per-round verify.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from pitlapetl_spark.sources import TABLES

# exact comparison is the goal; this tolerance only forgives the last
# ulp of double accumulation differences that rounding already bounds
REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # pyspark Row
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (pd.Timedelta,)):
        return v.total_seconds()
    if type(v).__name__ in ("int64", "int32", "int16", "int8", "uint64"):
        return int(v)
    if type(v).__name__ in ("float64", "float32"):
        return round(float(v), 9)
    if type(v).__name__ == "bool_":
        return bool(v)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(df.iloc[i][c]) for c in cols) for i in range(len(df))
    ]
    return sorted(rows, key=repr)


def compare_query(name: str, spark, sf_dir: str, query_fn, oracle: str) -> list[str]:
    """Run both sides; return a list of problems (empty = parity)."""
    problems: list[str] = []
    sdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    odf = con.execute(oracle).df()
    con.close()

    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    if len(sdf) != len(odf):
        problems.append(f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        return problems

    srows, orows = canonical_rows(sdf), canonical_rows(odf)
    n_bad = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a == b:
            continue
        if not _row_close(a, b):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} spark={a!r} oracle={b!r}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} mismatched rows total")
    return problems


def _row_close(a: tuple, b: tuple) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=REL_TOL, abs_tol=ABS_TOL):
                continue
        return False
    return True
