"""Join operators — SURVEY.md §2.5 (J1-J3) plus the full join-type
surface the target engine owes (outer/semi/anti/theta-band).

The reference hides its two real joins inside Python loops:
per-row ``session.get_driver(...)`` lookups (practicedag.py:67-77, J1)
and an O(drivers x laps) nested loop (topspeed.py:55-75, J2). Here
every join is declarative so Catalyst picks the physical strategy;
dimension sides get explicit ``broadcast()`` hints where the survey
identifies a lookup join, so the fact table never shuffles for them —
the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "join_broadcast_lookup",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name, n.n_name AS nation_name
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE l.l_quantity > 45
    """,
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 lookup join restated: fact -> broadcast dim -> broadcast dim
    (practicedag.py:67-77 per-row ``get_driver`` lookup). Both dims are
    broadcast so the lineitem scan streams through two
    BroadcastHashJoins with zero shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "s_name",
            F.col("n_name").alias("nation_name"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, e.event_id, e.event_type
    FROM customer c
    LEFT JOIN events e ON e.user_id = c.c_custkey AND e.event_type = 'purchase'
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a pushed join-side predicate; customers
    without purchase events survive with NULLs (events only cover
    user_id 0-149, so most customers are NULL rows)."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return customer.join(
        events, events.user_id == customer.c_custkey, "left"
    ).select("c_custkey", "event_id", "event_type")


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(s.s_nationkey, c.c_nationkey) AS nationkey,
           s.n_suppliers, c.n_customers
    FROM (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) s
    FULL OUTER JOIN
         (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
          FROM customer GROUP BY c_nationkey) c
    ON s.s_nationkey = c.c_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nation coverage differs by
    side)."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return supp.join(cust, supp.s_nationkey == cust.c_nationkey, "full").select(
        F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
        "n_suppliers",
        "n_customers",
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM events e
                  WHERE e.user_id = c.c_custkey AND e.event_type = 'signup')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that ever signed up."""
    customer = load_table(spark, sf_dir, "customer")
    signups = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return customer.join(
        signups, signups.user_id == customer.c_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no events at all
    (non-empty by construction — events cover only user_id 0-149)."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    return customer.join(
        events, events.user_id == customer.c_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_theta_band",
    oracle="""
    SELECT e.event_id, b.band_name
    FROM events e
    JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0),
                 ('high', 250.0, 1000.0)) AS b(band_name, lo, hi)
    ON e.value >= b.lo AND e.value < b.hi
    """,
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (band/range) join: bucket a measure against a tiny
    interval dimension. The band table is broadcast, so this executes
    as a BroadcastNestedLoopJoin — the only sane physical plan for a
    non-equi join against a small dim; at scale the alternative is
    binning (see asof.py for the sort-based pattern)."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 1000.0)],
        "band_name string, lo double, hi double",
    )
    return events.join(
        F.broadcast(bands),
        (events.value >= bands.lo) & (events.value < bands.hi),
    ).select("event_id", "band_name")


# ------------------------------------------------------ binned range join
# A range join where BOTH sides are large is the case broadcast can't
# save: Spark's only native plan for `point BETWEEN lo AND hi` is a
# nested-loop join. The scalable form bins the number line: each
# interval replicates to every bin it overlaps, each point lands in
# exactly ONE bin, and the join becomes an equi-join on bin followed by
# the exact range predicate. Replication factor = interval_span / bin
# width + 1 (bounded, chosen), pair space = per-bin products instead of
# |build| x |probe| — the same strategy as Databricks' RANGE_JOIN hint
# binning, expressed with plain DataFrame ops.

RANGE_BIN_DAYS = 64  # transit windows are <= 50 days -> <= 2 bins/interval


@query(
    "join_range_binned",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS d0,
               CAST(floor(epoch(l_shipdate) / 86400) + floor(l_quantity) AS BIGINT) AS d1
        FROM lineitem WHERE l_quantity >= 48
    ),
    ord AS (
        SELECT o_orderkey,
               CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS od
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT li.l_orderkey, li.l_linenumber,
           CAST(li.d1 - li.d0 AS BIGINT) AS window_days,
           CAST(count(ord.o_orderkey) AS BIGINT) AS n_urgent_in_window
    FROM li LEFT JOIN ord ON ord.od BETWEEN li.d0 AND li.d1
    GROUP BY 1, 2, 3
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large range join via binning: for every bulk lineitem
    (quantity >= 48) count the urgent orders placed during its transit
    window [shipdate, shipdate + quantity days]. Intervals explode to
    the <= 2 RANGE_BIN_DAYS-wide bins they overlap; points map to one
    bin; the join is a shuffled EQUI-join on bin with the exact
    BETWEEN applied after — no BroadcastNestedLoopJoin anywhere
    (asserted in tests/test_plan_hygiene.py). A matched (interval,
    point) pair meets in exactly one bin (the point's), so no
    post-join dedup is needed; zero-match intervals survive via the
    left join + count(non-null)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.unix_timestamp("l_shipdate") / 86400).alias("d0"),
            (
                F.floor(F.unix_timestamp("l_shipdate") / 86400)
                + F.floor(F.col("l_quantity"))
            )
            .cast("long")
            .alias("d1"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("d0") / RANGE_BIN_DAYS),
                    F.floor(F.col("d1") / RANGE_BIN_DAYS),
                )
            ),
        )
    )
    # pre-aggregate the point side to the DAY grain before the join
    # (guide §2.3 / §3.4: collapse the build side before an exploding
    # join): the count an interval wants is additive over days, so
    # joining per-day counts instead of per-order rows cuts the join
    # output from (intervals x matching orders) to (intervals x
    # matching days) — ~12x fewer rows at sf0.1 (~12.5 urgent
    # orders/day) and growing with data density at scale, while the
    # day-grain frame itself is calendar-bounded (one row per day
    # regardless of data size), which is also what makes it safely
    # broadcastable at ANY scale factor.
    ord_ = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.floor(F.unix_timestamp("o_orderdate") / 86400).alias("od"))
        .groupBy("od")
        .agg(F.count(F.lit(1)).alias("n_od"))
        .withColumn("bin", F.floor(F.col("od") / RANGE_BIN_DAYS))
    )
    joined = li.join(
        F.broadcast(ord_),
        (li.bin == ord_.bin)
        & (ord_.od >= li.d0)
        & (ord_.od <= li.d1),
        "left",
    )
    return joined.groupBy(
        "l_orderkey", "l_linenumber", (F.col("d1") - F.col("d0")).alias("window_days")
    ).agg(
        F.coalesce(F.sum("n_od"), F.lit(0))
        .cast("long")
        .alias("n_urgent_in_window")
    )


# -------------------------------------------------------- salted skew join
# When one join key dominates (a "null day", a bot user, one viral
# item), the task holding that key becomes the straggler no matter how
# many executors exist. AQE's skew-join splitting handles sort-merge
# inputs; the manual fix — demonstrated here with oracle parity — is
# salting: the probe side splits each key into SALT_N sub-keys via a
# deterministic row hash, the build side replicates each row SALT_N
# times (explode over the salt range), and the join runs on
# (key, salt) — every hot key now spreads over SALT_N tasks. The
# replicate-build x salt-probe construction preserves exactly the
# plain-join multiset, which the unsalted oracle pins.

JOIN_SALT_N = 8


@query(
    "join_salted_skew",
    oracle="""
    SELECT e.event_type, n.n_name AS region_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e
    JOIN nation n ON n.n_nationkey = e.user_id % 25
    GROUP BY 1, 2
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join: events hash to (key, salt in 0..N),
    the dimension explodes to one replica per salt value, the join key
    is (key, salt) — identical result to the plain join (the oracle),
    but a key owning 90% of the rows occupies SALT_N tasks instead of
    one. The merge hint forces the shuffle path the technique exists
    for (a broadcastable dim needs no salt)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "nkey", F.col("user_id") % 25
    )
    nation = load_table(spark, sf_dir, "nation")
    salted_ev = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(JOIN_SALT_N))
    )
    salted_dim = nation.withColumn(
        "salt",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT_N - 1)).cast("array<long>")),
    )
    joined = salted_ev.hint("merge").join(
        salted_dim,
        (salted_ev.nkey == salted_dim.n_nationkey)
        & (salted_ev.salt == salted_dim.salt),
    )
    return joined.groupBy(
        "event_type", F.col("n_name").alias("region_name")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
