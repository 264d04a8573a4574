"""Run the drive_contract parity comparison for a NAMED SUBSET of
queries (CLI args), for fast iteration on new operators. Same
comparison as tools/drive_contract.py; writes nothing."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
from pyspark.sql import SparkSession

from contract_canon import canon_rows  # THE contract comparison rules

names = sys.argv[1:]
spark = (SparkSession.builder.master("local[8]")
    .appName("parity_subset")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from pitlapetl_spark.registry import all_queries, all_oracles

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = all_queries(), all_oracles()
fails = []
for name in names:
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(oracles[name]).df()
        sc, oc = canon_rows(sdf), canon_rows(odf)
        ok = sc == oc and sorted(sdf.columns) == sorted(odf.columns)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(sdf)} vs {len(odf)} rows)")
        if not ok:
            fails.append(name)
            for i, (a, b) in enumerate(zip(sc, oc)):
                if a != b:
                    print("  spark :", a[:220])
                    print("  oracle:", b[:220])
                    if i > 3:
                        break
            if len(sc) != len(oc):
                print("  row counts differ; spark cols", list(sdf.columns),
                      "oracle cols", list(odf.columns))
    except Exception as ex:
        fails.append(name)
        import traceback
        print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:500]}")
        traceback.print_exc(limit=3)
print(f"\n{len(names)} queries, {len(fails)} failing: {fails}")
sys.exit(1 if fails else 0)
