"""Set operators — SURVEY.md §2.9 (absent from the reference; owed by
the target engine): union / unionByName, intersect, except, plus
unpivot (stack), all native Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two keyed projections — per-session lap
    tables unioned across rounds is the domain analog (SURVEY.md
    §2.9)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return cust.union(supp).distinct()


@query(
    "setop_union_all_by_name",
    oracle="""
    SELECT event_id AS id, 'event' AS kind FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT o_orderkey AS id, 'order' AS kind FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_union_all_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — name-based (not positional)
    alignment, the safe form when schemas evolve."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    ).select(F.col("event_id").alias("id"), F.lit("event").alias("kind"))
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    ).select(F.col("o_orderkey").alias("id"), F.lit("order").alias("kind"))
    return ev.unionByName(od)


@query(
    "setop_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users that both purchased and errored."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, keeps multiplicity)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.exceptAll(b)


@query(
    "setop_unpivot",
    oracle="""
    SELECT p_partkey, 'retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def setop_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide -> long) via the native unpivot operator —
    the inverse of agg_pivot."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot("p_partkey", ["retailprice", "size"], "measure", "value")
