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
    array<double> column broke the driver canonicalizer) and every
    tolerance boolean must be TRUE — the same contract its DuckDB
    oracle asserts via TRUE literals, so a sketch drifting out of
    tolerance fails both this test and the driver's hash compare."""
    import pyspark.sql.types as T

    from pitlapetl_spark import registry

    df = registry.all_queries()["agg_approx_sketches"](spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"non-scalar column {f.name}: {f.dataType}"

    rows = df.collect()
    assert rows
    for r in rows:
        assert r["approx_parts_within_tol"] is True, r
        assert r["quantiles_ordered_in_range"] is True, r
