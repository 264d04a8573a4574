"""Bucketing (co-located joins) and the dual SQL surface.

Bucketed tables pre-shuffle data at WRITE time so repeated joins on
the bucket key skip the exchange entirely — at 100 TB this converts
the dominant per-query cost (shuffling the fact table) into a one-time
layout cost. The test asserts the physical plan has NO shuffle
exchange on the bucketed join."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from pitlapetl_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, no_broadcast):
    tmp = tempfile.mkdtemp(prefix="pitlap_bucket_")
    suffix = uuid.uuid4().hex[:8]
    t_events, t_cust = f"b_events_{suffix}", f"b_cust_{suffix}"
    try:
        events = load_table(spark, SF_SMOKE, "events").select(
            "event_id", "user_id", "value"
        )
        customer = load_table(spark, SF_SMOKE, "customer").select(
            "c_custkey", "c_name"
        )
        (
            events.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", f"{tmp}/{t_events}")
            .saveAsTable(t_events)
        )
        (
            customer.write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{tmp}/{t_cust}")
            .saveAsTable(t_cust)
        )
        joined = spark.table(t_events).join(
            spark.table(t_cust),
            F.col("user_id") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        expect = events.join(
            customer, events.user_id == customer.c_custkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_events}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
        shutil.rmtree(tmp, ignore_errors=True)


def test_sql_surface_matches_dataframe(spark):
    """Every operator is also runnable as SQL over registered views
    (SURVEY §7.1 dual surface) — same Catalyst plan, same rows."""
    from pitlapetl_spark import registry
    from pitlapetl_spark.sources import register_views

    registry.load_all()
    register_views(spark, SF_SMOKE, "events", "customer")
    sql_df = spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               coalesce(e.max_value, 0.0) AS top_value,
               coalesce(e.n_events, 0) AS n_events
        FROM customer c
        LEFT JOIN (
            SELECT user_id, max(value) AS max_value, count(*) AS n_events
            FROM events WHERE event_type <> 'error' GROUP BY user_id
        ) e ON e.user_id = c.c_custkey
        """
    )
    df = registry.QUERIES["flagship_top_value_per_user"](spark, SF_SMOKE)
    cols = sorted(df.columns)
    assert sorted(sql_df.columns) == cols
    assert sorted(map(tuple, sql_df.select(*cols).collect())) == sorted(
        map(tuple, df.select(*cols).collect())
    )
