"""Fresh-process driver emulation per .claude/skills/verify: smoke
entry(), then every queries()[name] vs oracle_sql()[name] at sf0.01.
Writes per-query results to PARITY_LOCAL.json — the artifact
tools/gen_coverage.py folds into COVERAGE.md's generated status table."""
import sys, hashlib, json
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
    .appName("drive_contract")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
assert len(rows) > 0, "entry() returned 0 rows"
print(f"entry() OK: {len(rows)} rows", flush=True)

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from contract_canon import canon_hash  # shared with parity_subset.py

qs, oracles = e.queries(), e.oracle_sql()
fails, results = [], {}
for name, fn in qs.items():
    sql = oracles.get(name)
    try:
        sdf = fn(spark, SF).toPandas()
        if sql is None:
            print(f"{name}: rows-only rows={len(sdf)}", flush=True)
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            continue
        odf = con.execute(sql).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and canon_hash(sdf) == canon_hash(odf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else f"FAIL rows={ok_rows} cols={ok_cols} hash={ok_hash} ({len(sdf)} vs {len(odf)})"
        if not (ok_rows and ok_cols and ok_hash):
            fails.append(name)
        results[name] = {
            "status": "ok" if (ok_rows and ok_cols and ok_hash) else "fail",
            "spark_rows": len(sdf), "oracle_rows": len(odf),
        }
        print(f"{name}: {status}", flush=True)
    except Exception as ex:
        fails.append(name)
        results[name] = {"status": "err", "err": f"{type(ex).__name__}: {str(ex)[:200]}"}
        print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:200]}", flush=True)

with open("/root/repo/PARITY_LOCAL.json", "w") as f:
    json.dump({"sf": SF, "results": results}, f, indent=1)
print(f"\n{len(qs)} queries, {len(fails)} failing: {fails}")
sys.exit(1 if fails else 0)
