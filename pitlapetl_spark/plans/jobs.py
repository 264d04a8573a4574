"""The seven reference DAGs restated as single Spark jobs.

Each Airflow DAG in the reference is a chain of task functions crossing
a process boundary at every edge (SURVEY.md §3: XCom dict/JSON IR).
Here each pipeline is ONE DataFrame plan — the only remaining boundary
is driver->executors, and Catalyst sees the whole pipeline at once, so
filters push into the scan and the nested-doc assembly runs as a hash
aggregation.

Domain -> driver-table mapping (FIXTURES.md §C): events stands in for
the laps fact (value ≈ lap seconds / SpeedST, event_type ≈ Compound,
user_id ≈ Driver), customer for the drivers dim, orders for the
schedule/header rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import format_iso8601, format_laptime
from ..registry import query
from ..sources import load_table


@query(
    "job_race_results",
    oracle="""
    SELECT concat(CAST(o_custkey AS VARCHAR), '_', CAST(o_orderkey AS VARCHAR)) AS key,
           o_orderstatus AS eventFormat,
           CAST(count(*) AS BIGINT) AS n_results,
           to_json(list(struct_pack(pos := l_linenumber,
                                    partKey := l_partkey,
                                    price := l_extendedprice)
                        ORDER BY l_linenumber, l_partkey, l_extendedprice))::VARCHAR AS results
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey, o_orderstatus
    """,
)
def job_race_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """racedag.py:20-75 restated: validate -> filter schedule -> load
    results -> per-row dict build -> nested doc -> upsert becomes
    scan -> join -> groupBy(key).agg(sort_array(collect_list(struct)))
    in one plan. Key = ``{year}_{round}`` analog (racedag.py:49)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("pos"),
                        F.col("l_partkey").alias("partKey"),
                        F.col("l_extendedprice").alias("price"),
                    )
                )
            ).alias("results_arr"),
        )
        .select(
            F.concat_ws(
                "_", F.col("o_custkey").cast("string"), F.col("o_orderkey").cast("string")
            ).alias("key"),
            F.col("o_orderstatus").alias("eventFormat"),
            "n_results",
            F.to_json("results_arr").alias("results"),
        )
    )


@query(
    "job_qualifying_results",
    oracle="""
    SELECT user_id AS driverId,
           printf('%02d:%02d.%03d',
                  CAST(round(q1 * 1000) AS BIGINT) // 60000,
                  (CAST(round(q1 * 1000) AS BIGINT) % 60000) // 1000,
                  CAST(round(q1 * 1000) AS BIGINT) % 1000) AS q1,
           CASE WHEN q2 IS NOT NULL THEN printf('%02d:%02d.%03d',
                  CAST(round(q2 * 1000) AS BIGINT) // 60000,
                  (CAST(round(q2 * 1000) AS BIGINT) % 60000) // 1000,
                  CAST(round(q2 * 1000) AS BIGINT) % 1000) END AS q2,
           CASE WHEN q3 IS NOT NULL THEN printf('%02d:%02d.%03d',
                  CAST(round(q3 * 1000) AS BIGINT) // 60000,
                  (CAST(round(q3 * 1000) AS BIGINT) % 60000) // 1000,
                  CAST(round(q3 * 1000) AS BIGINT) % 1000) END AS q3
    FROM (
        SELECT user_id,
               min(value)                                          AS q1,
               min(value) FILTER (WHERE event_type = 'view')       AS q2,
               min(value) FILTER (WHERE event_type = 'purchase')   AS q3
        FROM events
        GROUP BY user_id
    )
    """,
)
def job_qualifying_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qualifyingdag.py:41-91 restated: session results with Q1/Q2/Q3
    lap times formatted ``MM:SS.mmm`` and NULL-safe (pd.isna ->
    isNull, qualifyingdag.py:49-51). Q1/Q2/Q3 analogs are per-user
    minima over progressively stricter event subsets — like quali
    sessions, later stages may be NULL."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min("value").alias("q1"),
        F.min(F.when(F.col("event_type") == "view", F.col("value"))).alias("q2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("q3"),
    )
    return per_user.select(
        F.col("user_id").alias("driverId"),
        format_laptime(F.col("q1")).alias("q1"),
        format_laptime(F.col("q2")).alias("q2"),
        format_laptime(F.col("q3")).alias("q3"),
    )


@query(
    "job_practice_laps",
    oracle="""
    SELECT e.user_id AS driver,
           c.c_name AS fullName,
           CAST(count(*) AS BIGINT) AS n_laps,
           to_json(list(struct_pack(
                lapNumber := e.event_id,
                compound  := e.event_type,
                lapTimeStr := printf('%02d:%02d.%03d',
                    CAST(round(e.value * 1000) AS BIGINT) // 60000,
                    (CAST(round(e.value * 1000) AS BIGINT) % 60000) // 1000,
                    CAST(round(e.value * 1000) AS BIGINT) % 1000))
            ORDER BY e.event_id))::VARCHAR AS laps
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.value < 300 AND e.event_type <> 'error'
    GROUP BY e.user_id, c.c_name
    """,
)
def job_practice_laps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """practicedag.py:28-106 restated (the reference's richest
    pipeline, SURVEY.md §3.3): project -> derive lapTimeStr -> dropna
    -> broadcast-join the drivers dim (J1, replacing the per-row
    ``session.get_driver`` lookup practicedag.py:68) -> nested doc per
    driver. One plan, one shuffle (the groupBy)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    laps = (
        events.filter((F.col("value") < 300) & (F.col("event_type") != "error"))
        .withColumn("lapTimeStr", format_laptime(F.col("value")))
        .na.drop(subset=["lapTimeStr"])
    )
    return (
        laps.join(F.broadcast(customer), laps.user_id == customer.c_custkey)
        .groupBy("user_id", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_laps"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("event_id").alias("lapNumber"),
                        F.col("event_type").alias("compound"),
                        F.col("lapTimeStr"),
                    )
                )
            ).alias("laps_arr"),
        )
        .select(
            F.col("user_id").alias("driver"),
            F.col("c_name").alias("fullName"),
            "n_laps",
            F.to_json("laps_arr").alias("laps"),
        )
    )


@query(
    "job_schedule",
    oracle="""
    SELECT concat(CAST(o_orderkey AS VARCHAR), '-', CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)) AS key,
           o_orderpriority AS eventName,
           coalesce(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'), '') AS sessionDate,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def job_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduledag.py:25-82 restated: schedule scan -> per-row dict
    with ISO-formatted session dates (X2, scheduledag.py:35-40) and
    the REVERSED ``{round}-{year}`` key (scheduledag.py:43 — note the
    different separator and order vs racedag.py:49, preserved here)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        F.concat_ws(
            "-",
            F.col("o_orderkey").cast("string"),
            F.year("o_orderdate").cast("string"),
        ).alias("key"),
        F.col("o_orderpriority").alias("eventName"),
        format_iso8601(F.col("o_orderdate")).alias("sessionDate"),
        F.year("o_orderdate").cast("int").alias("year"),
    )


@query(
    "job_driver_standings",
    oracle="""
    SELECT CAST(rank() OVER (ORDER BY points DESC, c_custkey) AS INT) AS position,
           c_custkey AS driverId, c_name AS driverName,
           points,
           CAST(wins AS BIGINT) AS wins
    FROM (
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS points,
               count(*) FILTER (WHERE o.o_orderstatus = 'F') AS wins
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    )
    """,
)
def job_driver_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """driverstandings.py:46-88 restated: instead of flattening the
    API's pre-computed standings (J3), recompute them: points = sum of
    order totals per customer, wins = finished orders, position = rank
    (SURVEY.md §2.7 — the engine computes what the reference merely
    copies).

    The output is CUSTOMER-grain (millions of rows at scale), so the
    global position comes from the two-stage distributed rank
    (operators/distributed_rank.py), never an unpartitioned window —
    r1's ``Window.orderBy`` here collapsed the whole grain into one
    task. The (points DESC, c_custkey) ordering is total, so
    rank == row_number, matching the oracle's rank() exactly."""
    from ..operators.distributed_rank import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    standings = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("points"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("wins"),
        )
    )
    ranked = global_row_number(
        standings, [F.col("points").desc(), F.col("c_custkey")], "position"
    )
    return ranked.select(
        "position",
        F.col("c_custkey").alias("driverId"),
        F.col("c_name").alias("driverName"),
        "points",
        F.col("wins").cast("long").alias("wins"),
    )


@query(
    "job_constructor_standings",
    oracle="""
    SELECT CAST(rank() OVER (ORDER BY points DESC, n_name) AS INT) AS position,
           n_name AS constructorName,
           points,
           CAST(wins AS BIGINT) AS wins
    FROM (
        SELECT n.n_name,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS points,
               count(*) FILTER (WHERE o.o_orderstatus = 'F') AS wins
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    """,
)
def job_constructor_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """constructorstandings.py:43-73 restated: team-level (nation)
    standings — aggregate the drivers' points through the dim
    hierarchy (broadcast joins) and rank.

    Cardinality contract: the unpartitioned rank window here runs over
    the POST-aggregation nation grain (25 rows, bounded by the nation
    dimension at any data scale) — never the fact table. A grain that
    grows with the data must use distributed_rank.global_row_number
    instead (see job_driver_standings)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    standings = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("points"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("wins"),
        )
    )
    w = Window.orderBy(F.col("points").desc(), "n_name")
    return standings.select(
        F.rank().over(w).cast("int").alias("position"),
        F.col("n_name").alias("constructorName"),
        "points",
        F.col("wins").cast("long").alias("wins"),
    )
