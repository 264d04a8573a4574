from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"c_custkey", "c_name", "top_value", "n_events"} == set(df.columns)


def test_every_query_runs_at_smoke_sf(spark, sf_dir):
    qs = entrymod.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)


def test_approx_sketches_scalar_and_within_tolerance(spark, sf_dir):
    """agg_approx_sketches must emit only scalar columns (r1's
    array<double> column broke the driver canonicalizer) and its
    sketches must land near the exact answers: HLL++ distinct within
    its configured 2% rsd (x5 slack for small groups), quantiles
    ordered and inside the observed value range."""
    from pyspark.sql import functions as F

    from pitlapetl_spark import registry

    df = registry.all_queries()["agg_approx_sketches"](spark, sf_dir)
    import pyspark.sql.types as T

    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"non-scalar column {f.name}: {f.dataType}"

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in df.collect():
        e = exact[r["l_returnflag"]]
        assert abs(r["approx_parts"] - e["n"]) <= max(3, 0.10 * e["n"])
        assert e["lo"] <= r["p50_price"] <= r["p95_price"] <= r["p99_price"] <= e["hi"]
