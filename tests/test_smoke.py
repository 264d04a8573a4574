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
