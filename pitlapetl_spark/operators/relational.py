"""Core relational operators: filters, projections, scalar expressions.

Covers SURVEY.md §2.3 (F1-F7), §2.4 (P1-P6), §2.8 (O1-O2) and §2.10
(X1-X8) on the driver's synthetic tables, per the domain->driver
mapping in FIXTURES.md §C (lineitem/events stand in for the laps fact,
orders for the dated schedule header).

Everything here is a single declarative plan: filters and projections
reach the parquet scan via Catalyst pushdown (visible as
``PushedFilters`` / narrowed ``ReadSchema`` in ``.explain``), and the
scalar expressions are native Catalyst exprs inside whole-stage
codegen — no Python in the row path, which is what makes these free
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import composite_key, format_iso8601, format_laptime
from ..registry import query
from ..sources import load_table


# --------------------------------------------------------------------------
# Flagship: the topspeed pipeline restated (SURVEY.md §3.3, §7.2 M0).
# Reference: /root/reference/dags/topspeed.py:55-83 — an O(drivers x laps)
# nested loop computing max speed-trap speed per driver over non-deleted
# laps, emitting 0 for drivers with no laps.
# Spark restatement: filter -> hash agg (map-side partial) -> broadcast
# right join to the dimension -> coalesce(0).
# --------------------------------------------------------------------------
@query(
    "flagship_top_value_per_user",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(coalesce(m.max_value, 0.0) AS DOUBLE) AS top_value,
           CAST(coalesce(m.n_events, 0) AS BIGINT)    AS n_events
    FROM customer c
    LEFT JOIN (
        SELECT user_id,
               max(value)       AS max_value,
               count(*)         AS n_events
        FROM events
        WHERE event_type <> 'error'
        GROUP BY user_id
    ) m ON m.user_id = c.c_custkey
    """,
)
def flagship_top_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    per_user = (
        events.filter(F.col("event_type") != "error")  # F5 boolean-flag filter
        .groupBy("user_id")  # A1 group-max (hash agg, partial+final)
        .agg(
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # Right side is the dimension: preserve the reference's 0-for-no-laps
    # semantic (topspeed.py:61 init `max_speed = 0`) via right join +
    # coalesce. The agg output is small (<= |users|) -> broadcast it, so
    # the dimension never shuffles.
    return (
        F.broadcast(per_user)
        .join(customer, per_user.user_id == customer.c_custkey, "right")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("max_value"), F.lit(0.0)).alias("top_value"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


# ------------------------------------------------------------------ filters
@query(
    "filter_equality_first_row",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey
    LIMIT 1
    """,
)
def filter_equality_first_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 equality selection + F2 first-row limit (racedag.py:43 —
    ``schedule.loc[schedule['RoundNumber'] == round].iloc[0]``).

    The reference relies on source order for ``iloc[0]``; Spark has no
    implicit order, so the limit is made deterministic with an
    explicit sort on the key (SURVEY.md O2)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(1)
    )


@query(
    "filter_notnull_derived",
    oracle="""
    SELECT event_id, value_fmt
    FROM (
        SELECT event_id,
               CASE WHEN value < 300 THEN printf('%02d:%06.3f',
                    CAST(floor(value / 60) AS BIGINT), value % 60)
               END AS value_fmt
        FROM events
    )
    WHERE value_fmt IS NOT NULL
    """,
)
def filter_notnull_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 not-null filter on a derived column (practicedag.py:63-64:
    add ``lapTimeStr`` then ``dropna`` on it) + X1 lap-time formatting
    as a native expression."""
    events = load_table(spark, sf_dir, "events")
    fmt = F.when(
        F.col("value") < 300,
        F.format_string(
            "%02d:%06.3f",
            F.floor(F.col("value") / 60).cast("long"),
            F.col("value") % 60,
        ),
    )
    return (
        events.withColumn("value_fmt", fmt)
        .na.drop(subset=["value_fmt"])
        .select("event_id", "value_fmt")
    )


@query(
    "filter_flag_and_range",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS l_quantity,
           CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
    FROM lineitem
    WHERE l_returnflag <> 'R' AND l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def filter_flag_and_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 boolean-flag filter (pick_not_deleted, topspeed.py:59 —
    l_returnflag<>'R' is the Deleted-flag analog per FIXTURES.md §C)
    plus conjunctive range predicates; all three reach the parquet
    scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") != "R")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= "1995-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_isin_null_safe",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type IN ('signup', 'purchase') AND value IS NOT NULL
    """,
)
def filter_isin_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 null predicates (pd.isna -> isNull, qualifyingdag.py:50) and
    membership predicate."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("event_type").isin("signup", "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", "event_type")


# -------------------------------------------------------------- projections
@query(
    "project_rename_camel",
    oracle="""
    SELECT c_custkey AS customerId, c_name AS fullName,
           c_mktsegment AS segment,
           CAST(c_acctbal AS DOUBLE) AS accountBalance
    FROM customer
    """,
)
def project_rename_camel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column pruning + P3 camelCase rename (qualifyingdag.py:53-56,
    racedag.py:52-60 dict-construction renames). Column pruning reaches
    the scan: ReadSchema lists exactly four columns."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("customerId"),
        F.col("c_name").alias("fullName"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("accountBalance"),
    )


@query(
    "project_composite_key",
    oracle="""
    SELECT concat(CAST(o_custkey AS VARCHAR), '_', CAST(o_orderkey AS VARCHAR)) AS key,
           concat(CAST(o_orderkey AS VARCHAR), '-', o_orderstatus) AS rev_key,
           o_orderkey
    FROM orders
    """,
)
def project_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/X7 composite-key construction — both variants the reference
    uses: ``{year}_{round}`` (racedag.py:49) and the reversed
    ``{round}-{year}`` (scheduledag.py:43)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        composite_key("o_custkey", "o_orderkey").alias("key"),
        F.concat_ws("-", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")).alias("rev_key"),
        "o_orderkey",
    )


@query(
    "project_literal_params",
    oracle="""
    SELECT 2024 AS year, 7 AS round, 'FP2' AS session_name,
           event_id, CAST(value AS DOUBLE) AS value
    FROM events WHERE event_type = 'view'
    """,
)
def project_literal_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 literal/parameter columns copied into every output row
    (practicedag.py:80-82, topspeed.py:78-80)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "view").select(
        F.lit(2024).alias("year"),
        F.lit(7).alias("round"),
        F.lit("FP2").alias("session_name"),
        "event_id",
        "value",
    )


# ---------------------------------------------------------------- scalar fns
@query(
    "scalar_format_laptime",
    oracle="""
    SELECT event_id,
           printf('%02d:%02d.%03d',
                  CAST(round(value * 1000) AS BIGINT) // 60000,
                  (CAST(round(value * 1000) AS BIGINT) % 60000) // 1000,
                  CAST(round(value * 1000) AS BIGINT) % 1000) AS lap_time
    FROM events
    WHERE value IS NOT NULL
    """,
)
def scalar_format_laptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 timedelta -> MM:SS.mmm as a native expression
    (practicedag.py:54-60 semantics; see functions.format_laptime)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("value").isNotNull()).select(
        "event_id", format_laptime(F.col("value")).alias("lap_time")
    )


@query(
    "scalar_format_iso8601",
    oracle="""
    SELECT o_orderkey,
           coalesce(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'), '') AS order_ts
    FROM orders
    """,
)
def scalar_format_iso8601(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 datetime -> ISO-8601 with empty string for NULL
    (scheduledag.py:35-40 ``format_date``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", format_iso8601(F.col("o_orderdate")).alias("order_ts")
    )


@query(
    "scalar_conditional_default",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type <> 'error'
                THEN CAST(floor(value) AS INT) ELSE 0 END AS position,
           coalesce(nullif(event_type, 'view'), 'Unknown') AS kind
    FROM events
    """,
)
def scalar_conditional_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 conditional default (driverstandings.py:36 — ``int(position)
    if position != 'Unknown' else 0``) + X6 missing-field default
    (coalesce). floor() is explicit on both sides because Spark's
    double->int cast truncates while DuckDB's rounds."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.col("event_type") != "error", F.floor("value").cast("int"))
        .otherwise(F.lit(0))
        .alias("position"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("Unknown")).alias(
            "kind"
        ),
    )


@query(
    "scalar_string_math",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           CAST(round(p_retailprice * 1.1, 2) AS DOUBLE) AS taxed_price,
           greatest(p_size, 25) AS size_floor25
    FROM part
    """,
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 casts, X8 numeric compare/greatest, plus the string/math
    surface (substring, upper, length, round) the target engine gets
    from the built-in function library (SURVEY.md §2.10 closing note)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price"),
        F.greatest("p_size", F.lit(25)).alias("size_floor25"),
    )


# ------------------------------------------------------------- sorts / top-k
@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/top-k: global fastest-N. Spark executes order-by-limit as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver, no full sort at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)
    )
