"""Window / ranking operators — SURVEY.md §2.7.

The reference never computes ranks (positions arrive pre-computed from
its sources, racedag.py:55-59); the target engine recomputes standings
natively. Every query here is a single window exchange: rows shuffle
once on the partition key, sort within partitions, and all frames are
evaluated in one pass — the pattern that replaces the reference's
"re-fetch the standings" with a computation that scales.

Window sums use the same exact-decimal trick as aggregates.py so frame
accumulation order can't flip the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DEC = "decimal(18,2)"


@query(
    "window_standings_rank",
    oracle="""
    SELECT c_nationkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS points,
           CAST(rank()       OVER (ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,2))) DESC) AS INT) AS position,
           CAST(dense_rank() OVER (ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,2))) DESC) AS INT) AS dense_position
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def window_standings_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standings recomputation (driver-standings analog,
    driverstandings.py:24-25 consumed pre-computed ranks): aggregate
    points per entity, then rank over the global ordering. The rank
    window is a single partition — fine here because it runs over the
    already-aggregated (25-row) result, never the raw fact table."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    points = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("points_dec"))
    )
    w = Window.orderBy(F.col("points_dec").desc())
    return points.select(
        "c_nationkey",
        F.col("points_dec").cast("double").alias("points"),
        F.rank().over(w).cast("int").alias("position"),
        F.dense_rank().over(w).cast("int").alias("dense_position"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT user_id, event_id,
               CAST(value AS DOUBLE) AS value,
               CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY value DESC, event_id) AS INT) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group ("fastest N laps per driver", SURVEY.md §2.8):
    row_number over (group, order) then filter rn<=k. Catalyst rewrites
    the rn<=k filter into a per-partition top-k sort (WindowGroupLimit)
    so no group ever fully sorts. Ties broken on event_id for
    determinism."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead_gap",
    oracle="""
    SELECT user_id, event_id,
           CAST(value AS DOUBLE) AS value,
           CAST(value - lag(value)  OVER w AS DOUBLE) AS delta_prev,
           CAST(lead(value) OVER w AS DOUBLE)         AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead for gap-to-previous (gap-to-leader analog, SURVEY.md
    §2.7). Two-decimal doubles subtract exactly enough to hash stably
    (same two operands on both engines -> same IEEE result)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_rolling_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum3,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_frame
    FROM events
    """,
)
def window_rolling_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-row frame per key ordered by time (rolling lap-time
    average analog, SURVEY.md §2.7 frame specs)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("rolling_sum3"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
               AS seq
    FROM events WHERE event_type <> 'error'
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative running total per key (unbounded-preceding frame)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).cast("int").alias("seq"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS events_last_hour
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: events in the trailing
    hour per user — value-based frames, not row-count frames."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    )


SESSION_GAP_S = 1800  # 30 min inactivity ends a session


@query(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           user_id || '-' || CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
               AS session_id
    FROM flagged
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session-ID assignment by inactivity gap — the
    feature-engineering primitive behind every session-grain dataset
    (the session_window AGGREGATE in streaming/batch_windows.py emits
    per-session rollups; this emits the id each EVENT belongs to, so
    downstream features can join on it). Two stacked windows on the
    same (user_id ORDER BY ts) spec — one sort, one shuffle; the
    gap>lag flag cumulative-sums into a per-user session ordinal. The
    (ts, event_id) tiebreak makes the assignment total-order stable."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: unix_timestamp truncates to whole seconds
    # while the oracle's epoch() keeps fractions — a gap inside
    # (GAP, GAP+1) seconds would split sessions on one engine only
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_S * 1_000_000), 1).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.concat_ws("-", F.col("user_id"), F.sum("new_sess").over(run)).alias(
            "session_id"
        ),
    )


@query(
    "window_share_of_total",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               round(sum(value), 4) AS day_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, day_value,
           round(day_value / CAST(sum(CAST(day_value AS DECIMAL(18,4)))
                 OVER (PARTITION BY event_type) AS DOUBLE), 6)
               AS share_of_type,
           round(day_value / CAST(sum(CAST(day_value AS DECIMAL(18,4)))
                 OVER () AS DOUBLE), 6) AS share_of_total
    FROM daily
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (type, day) aggregate as a share of its
    type's total and of the grand total. The partitioned share is a
    plain window; the GRAND-total share is an unpartitioned window —
    safe ONLY because it runs over the already-aggregated (type, day)
    grain (150 rows here, bounded at any corpus size), never the fact
    table — the same cardinality contract as the standings rank
    (operators/distributed_rank.py documents the unbounded-grain
    alternative)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.floor(F.unix_timestamp("ts") / 86400).alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("day_value"))
    w_type = Window.partitionBy("event_type")
    w_all = Window.partitionBy()
    return daily.select(
        "event_type",
        "day",
        "day_value",
        # denominators accumulate in exact decimal (the file-wide window
        # discipline): raw-double window sums are shuffle-order
        # dependent and a 1-ulp associativity flip at a 5e-7 boundary
        # would break the round(6) hash cross-engine
        F.round(
            F.col("day_value")
            / F.sum(F.col("day_value").cast("decimal(18,4)"))
            .over(w_type)
            .cast("double"),
            6,
        ).alias("share_of_type"),
        F.round(
            F.col("day_value")
            / F.sum(F.col("day_value").cast("decimal(18,4)"))
            .over(w_all)
            .cast("double"),
            6,
        ).alias("share_of_total"),
    )


# ------------------------------------------------- interval merge

IVAL_BASE_MIN = 1  # event activity lasts 1 + (event_id % 59) minutes


@query(
    "interval_merge_activity",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id, ts AS s,
               ts + INTERVAL 1 MINUTE * ({IVAL_BASE_MIN} + event_id % 59) AS e
        FROM events
    ),
    x AS (
        SELECT user_id, event_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max_e
        FROM iv
    ),
    y AS (
        SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                       THEN 1 ELSE 0 END AS new_island
        FROM x
    ),
    z AS (
        SELECT *, sum(new_island) OVER (PARTITION BY user_id
                                        ORDER BY s, e, event_id
                                        ROWS UNBOUNDED PRECEDING) AS island
        FROM y
    )
    SELECT user_id,
           min(s) AS interval_start,
           max(e) AS interval_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM z
    GROUP BY user_id, island
    """,
)
def interval_merge_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval union (gaps-and-islands): each event opens
    an activity interval of VARYING length (1 + event_id % 59 minutes);
    intervals of one user that overlap or touch are merged into
    maximal busy periods. Differs from ``sessionize_events``: that
    chains on gap-since-last-START, this on gap-past-max-END — with
    varying durations a long interval can swallow later short ones, a
    case start-gap sessionization splits incorrectly.

    Shape: running max(end) over (user ORDER BY start) flags island
    starts; a cumulative sum numbers them; one groupBy collapses each
    island. Two stacked windows on the SAME (user_id, ts) spec — one
    sort, one shuffle — then an agg keyed on (user, island): the exact
    sessionize plan, so the same per-user cardinality contract
    (windows.py:227) holds at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + F.make_interval(mins=F.lit(IVAL_BASE_MIN) + F.col("event_id") % 59)
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    x = iv.withColumn(
        "prev_max_e",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    y = x.withColumn(
        "new_island",
        F.when(F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1)
        .otherwise(0),
    )
    z = y.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return z.groupBy("user_id", "island").agg(
        F.min("s").alias("interval_start"),
        F.max("e").alias("interval_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).select("user_id", "interval_start", "interval_end", "n_events")


# ------------------------------------------------- rolling anomaly

ZSCORE_WINDOW_DAYS = 7
ZSCORE_THRESHOLD = 2.0


@query(
    "anomaly_rolling_zscore",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               round(sum(value), 4) AS day_value
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day, day_value,
               avg(day_value) OVER w AS roll_mean,
               stddev_samp(day_value) OVER w AS roll_std
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {ZSCORE_WINDOW_DAYS - 1} PRECEDING
                     AND 1 PRECEDING)
    )
    SELECT event_type, day, day_value,
           round(roll_mean, 6) AS roll_mean,
           round(coalesce(roll_std, 0.0), 6) AS roll_std,
           coalesce(roll_std, 0.0) > 0 AND
               abs(day_value - roll_mean) > {ZSCORE_THRESHOLD} * roll_std
               AS is_anomaly
    FROM scored
    """,
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag on the daily rollup: each day's
    value scored against the TRAILING window (6 prior days, current
    day excluded — scoring a point against a window containing itself
    dilutes the signal). Window sits on the aggregated (type, day)
    grain — bounded rows per partition regardless of raw volume, the
    standard pre-aggregate-then-window discipline (share-of-total,
    windows.py:272). First days have no baseline: roll_std coalesces
    to 0 and the flag is false, never null."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).agg(F.round(F.sum("value"), 4).alias("day_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(ZSCORE_WINDOW_DAYS - 1), -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "day_value",
        F.avg("day_value").over(w).alias("m"),
        F.stddev_samp("day_value").over(w).alias("s"),
    )
    return scored.select(
        "event_type",
        "day",
        "day_value",
        F.round("m", 6).alias("roll_mean"),
        F.round(F.coalesce("s", F.lit(0.0)), 6).alias("roll_std"),
        (
            (F.coalesce("s", F.lit(0.0)) > 0)
            & (F.abs(F.col("day_value") - F.col("m")) > ZSCORE_THRESHOLD * F.col("s"))
        ).alias("is_anomaly"),
    )


# --------------------------------------- cumulative distinct count


@query(
    "window_cumulative_distinct_users",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               user_id
        FROM events
    ),
    first_seen AS (
        SELECT event_type, user_id, min(day) AS first_day
        FROM d GROUP BY 1, 2
    ),
    news AS (
        SELECT event_type, first_day AS day,
               CAST(count(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY 1, 2
    ),
    days AS (
        SELECT DISTINCT event_type, day FROM d
    )
    SELECT dy.event_type, dy.day,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (
               PARTITION BY dy.event_type ORDER BY dy.day
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_distinct_users
    FROM days dy LEFT JOIN news n
      ON dy.event_type = n.event_type AND dy.day = n.day
    """,
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event_type by day — COUNT(DISTINCT)
    OVER, which Spark's window functions don't support directly. The
    scalable restatement: a user contributes to the running distinct
    count exactly once, on their FIRST day — so aggregate first-seen
    days per (type, user) (one hash agg on a user-grain key), count
    new users per (type, day), and run a plain cumulative SUM over the
    tiny aggregated grain. No distinct-state ever lives inside a
    window frame; the only windowed input is O(types x days). The
    day-spine left join keeps days with zero new users in the output."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        "user_id",
    )
    first_seen = d.groupBy("event_type", "user_id").agg(F.min("day").alias("first_day"))
    news = first_seen.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    days = d.select("event_type", "day").distinct()
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        days.join(news, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cum_distinct_users", F.sum("new_users").over(w))
    )


# --------------------------------------------- sequence n-grams

SEQ_TOP_K = 20


@query(
    "sequence_event_trigrams",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS e1, e2, e3,
           CAST(count(*) AS BIGINT) AS n
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
    LIMIT {SEQ_TOP_K}
    """,
)
def sequence_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the most common 3-event paths
    across users (the n-gram statistics a next-event model or a UX
    funnel review starts from). Per-user double-lead window (one
    shuffle on user_id, per-user frame bounded), low-cardinality
    trigram aggregate (|types|^3 groups max), TakeOrderedAndProject
    top-K with full lexical tie-break."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(SEQ_TOP_K)
    )


# ------------------------------------------------- EWMA smoothing

EWMA_ALPHA = 0.3


@query(
    "window_ewma_daily",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               round(sum(value), 4) AS x
        FROM events GROUP BY 1, 2
    ),
    numbered AS (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day)
                      AS rn
        FROM daily
    ),
    rec AS (
        SELECT event_type, rn, day, x,
               CAST(round(x, 6) AS DOUBLE) AS y
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, d.day, d.x,
               CAST(round(CAST({EWMA_ALPHA} AS DOUBLE) * d.x
                          + CAST({1 - EWMA_ALPHA} AS DOUBLE) * r.y, 6)
                    AS DOUBLE)
        FROM numbered d
        JOIN rec r ON d.event_type = r.event_type AND d.rn = r.rn + 1
    )
    SELECT event_type, day, x AS day_value, y AS ewma FROM rec
    """,
)
def window_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over each event type's
    daily series — the recursive time-series smoother (y_t = a*x_t +
    (1-a)*y_{t-1}) that NO window frame expresses: every output
    depends on the entire prefix with decaying weights. Implemented as
    collect-sorted-series per key + one higher-order ``aggregate``
    building the smoothed array doc-locally, then an explode back to
    rows — the per-key memory bound is the series length, which at a
    DAILY grain is bounded (36.5k rows per century per key), the same
    bound sessionization already accepts. Each step rounds to 6
    places on BOTH engines, so the recursion cannot accumulate
    cross-engine FP drift (the DuckDB oracle replays it as a
    recursive CTE). At 100 TB the daily pre-aggregate is the only
    corpus-sized stage — one shuffle on (type, day)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).agg(F.round(F.sum("value"), 4).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    smoothed = F.expr(
        f"""
        aggregate(
            s,
            CAST(array() AS array<struct<day:bigint, x:double, y:double>>),
            (acc, e) -> acc || array(struct(
                e.day AS day, e.x AS x,
                round(CASE WHEN size(acc) = 0 THEN e.x
                      ELSE CAST({EWMA_ALPHA} AS DOUBLE) * e.x
                           + CAST({1 - EWMA_ALPHA} AS DOUBLE)
                             * element_at(acc, -1).y END, 6) AS y))
        )
        """
    )
    return (
        series.select("event_type", F.explode(smoothed).alias("r"))
        .select(
            "event_type",
            F.col("r.day").alias("day"),
            F.col("r.x").alias("day_value"),
            F.col("r.y").alias("ewma"),
        )
    )


# ----------------------------------------------------------- debounce

DEBOUNCE_US = 60_000_000  # 60 s: a repeat within this window is noise


@query(
    "window_debounce_events",
    oracle=f"""
    SELECT event_id, user_id, event_type,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS BIGINT) AS gap_us,
           COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) >= {DEBOUNCE_US}, TRUE) AS kept
    FROM events
    """,
)
def window_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce dedup: a repeat of the same (user, event_type) within
    DEBOUNCE_US of the previous occurrence is flagged as noise
    (double-click, retry storm, duplicate webhook) — the classic
    event-stream hygiene filter. First occurrence per key is always
    kept. One lag window on the (user, type) key — uniform, one
    shuffle; the streaming twin is a keyed state holding one
    timestamp per (user, type), same decision rule."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        gap.cast("long").alias("gap_us"),
        F.coalesce(gap >= DEBOUNCE_US, F.lit(True)).alias("kept"),
    )


@query(
    "window_month_spine_densify",
    oracle="""
    WITH m AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot
        FROM orders GROUP BY 1, 2
    ),
    s AS (SELECT o_custkey, min(mon) AS mn, max(mon) AS mx FROM m GROUP BY 1),
    spine AS (
        SELECT o_custkey, unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS mon
        FROM s
    )
    SELECT sp.o_custkey AS custkey, sp.mon AS month,
           COALESCE(m.n_orders, 0) AS n_orders,
           round(COALESCE(m.tot, 0), 2) AS month_total
    FROM spine sp
    LEFT JOIN m ON sp.o_custkey = m.o_custkey AND sp.mon = m.mon
    """,
)
def window_month_spine_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine densification: every customer's order history
    gap-filled to a contiguous MONTH grain between their first and
    last order (zero rows for silent months) — the prerequisite for
    any time-series model or rolling metric that assumes a dense
    axis (a rolling-3-month average computed over sparse months is
    silently wrong). The spine is generated per key with
    sequence()+explode from the key's own [min, max] span — no global
    calendar cross join, so output is Σ_key span_months, not
    |keys| × |all months|.

    100-TB shape: one hash aggregate to (key, month) grain, one tiny
    per-key min/max aggregate, the sequence explode (narrow — no
    shuffle), and a left join back on the SAME (key, month) grain the
    first aggregate produced. Monetary sums are decimal-cast before
    summing (order independent) and rounded identically on both
    engines."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        "o_totalprice",
    )
    monthly = o.groupBy("custkey", "mon").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("tot"),
    )
    # one lazy lineage cut: the (key, month) aggregate feeds BOTH the
    # spine derivation and the join back — without it the fact scan
    # and the aggregate run twice (guide §1.2)
    monthly = monthly.localCheckpoint(eager=False)
    spine = (
        monthly.groupBy("custkey")
        .agg(F.min("mon").alias("mn"), F.max("mon").alias("mx"))
        .select(
            "custkey",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 month"))
            ).alias("mon"),
        )
    )
    return spine.join(monthly, ["custkey", "mon"], "left").select(
        "custkey",
        F.col("mon").alias("month"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("tot", F.lit(0.0)), 2).alias("month_total"),
    )


@query(
    "window_twap_value",
    oracle="""
    WITH d AS (
        SELECT user_id,
               CAST(round(value, 8) AS DECIMAL(18,8)) AS v,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) - epoch_us(ts) AS dt
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(CAST(sum(v * dt) AS DOUBLE) / NULLIF(sum(dt), 0), 6)
               AS twap,
           round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value
    FROM d
    WHERE dt IS NOT NULL
    GROUP BY user_id
    """,
)
def window_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the finance /
    metering aggregate): each observation is weighted by how long it
    stayed current, i.e. the microseconds until the user's NEXT event,
    so a value held for an hour counts 3600x one held a second. The
    plain arithmetic mean rides along to show the gap time-weighting
    closes. Irregular event spacing is exactly the case where mean and
    TWAP diverge — the reason billing and OHLC-adjacent systems never
    use the plain mean.

    Semantics: the last event of each user has no successor (no
    holding period) and is excluded, the standard left-closed TWAP
    convention; a user whose events all share one timestamp yields
    NULL (zero total holding time, NULLIF on both engines).

    Determinism: the lead() ordering breaks ts ties on event_id;
    holding times are exact integer microseconds (unix_micros /
    epoch_us); value*dt accumulates as exact DECIMAL, divided and
    rounded once at the end on both engines.

    100-TB shape: ONE shuffle on user_id; the lead window and the
    final aggregate ride the same partitioning (Catalyst collapses
    them into a single exchange); output is user-grain. No joins."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.select(
        "user_id",
        F.round("value", 8).cast("decimal(18,8)").alias("v"),
        (F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts"))).alias(
            "dt"
        ),
    ).filter(F.col("dt").isNotNull())
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        # dt is cast to DECIMAL(18,0): decimal(18,8) x long would hit
        # Spark's precision-loss scale truncation (-> scale 7) and
        # diverge from DuckDB's exact scale-8 product (found by review)
        F.round(
            F.sum(F.col("v") * F.col("dt").cast("decimal(18,0)")).cast("double")
            / F.nullif(F.sum("dt"), F.lit(0)),
            6,
        ).alias("twap"),
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("mean_value"),
    )


@query(
    "window_interpolate_linear",
    oracle="""
    WITH obs AS (
        SELECT user_id, event_type, date_trunc('day', ts) AS dy,
               CAST(round(CAST(sum(CAST(round(value, 8) AS DECIMAL(18,8)))
                               AS DOUBLE) / count(*), 8)
                    AS DECIMAL(18,8)) AS m
        FROM events GROUP BY 1, 2, 3
    ),
    spine AS (
        SELECT user_id, event_type,
               unnest(generate_series(min(dy), max(dy), INTERVAL 1 DAY))
                   AS dy
        FROM obs GROUP BY user_id, event_type
    ),
    j AS (
        SELECT s.user_id, s.event_type, s.dy, o.m
        FROM spine s LEFT JOIN obs o
          ON o.user_id = s.user_id AND o.event_type = s.event_type
         AND o.dy = s.dy
    ),
    f AS (
        SELECT user_id, event_type, dy, m,
               last_value(m IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN m IS NOT NULL THEN dy END IGNORE NULLS)
                   OVER w_prev AS pd,
               first_value(m IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN m IS NOT NULL THEN dy END IGNORE NULLS)
                   OVER w_next AS nd
        FROM j
        WINDOW w_prev AS (PARTITION BY user_id, event_type ORDER BY dy
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY user_id, event_type ORDER BY dy
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_type, dy AS day,
           (m IS NOT NULL) AS is_observed,
           round(CASE WHEN m IS NOT NULL THEN CAST(m AS DOUBLE)
                      ELSE CAST(pv AS DOUBLE)
                           + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                             * date_diff('day', pd, dy) * 1.0
                             / date_diff('day', pd, nd)
                 END, 6) AS value
    FROM f
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on a per-(user, event_type) daily
    grid: densify each series between its first and last observed day,
    then fill missing days by interpolating between the NEAREST
    observed neighbors — the time-series repair step between
    forward-fill (LOCF, window_forward_fill) and model-based
    imputation, and the one a metering/sensor pipeline actually wants
    when the quantity varies smoothly. Endpoints are observed by
    spine construction, so every gap is interior and both neighbors
    exist.

    Determinism: observed daily means are exact DECIMAL sums rounded
    to 8; the interpolation weight is an exact integer day-diff ratio;
    the same double expression rounds once on both engines.

    100-TB shape: one (user, type, day) aggregate, a per-series
    min/max + sequence explode (the month-spine device at day grain),
    a co-partitioned left join, and two frames over ONE
    (user, type)-key exchange. Spine size is bounded by series span —
    the explode multiplies rows by observed-range days, never by the
    table."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("day", F.col("ts")).alias("dy"), "value"
    )
    from .stats import decimal_mean8

    obs = events.groupBy("user_id", "event_type", "dy").agg(
        decimal_mean8("value").alias("m")
    )
    obs = obs.localCheckpoint(eager=False)  # spine + join share one agg
    spine = (
        obs.groupBy("user_id", "event_type")
        .agg(F.min("dy").alias("mn"), F.max("dy").alias("mx"))
        .select(
            "user_id",
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))
            ).alias("dy"),
        )
    )
    j = spine.join(obs, ["user_id", "event_type", "dy"], "left")
    wp = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("dy")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("m").isNotNull(), F.col("dy"))
    f = j.select(
        "user_id",
        "event_type",
        "dy",
        "m",
        F.last("m", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("m", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    interp = F.col("pv").cast("double") + (
        F.col("nv").cast("double") - F.col("pv").cast("double")
    ) * F.datediff(F.col("dy"), F.col("pd")) * 1.0 / F.datediff(
        F.col("nd"), F.col("pd")
    )
    return f.select(
        "user_id",
        "event_type",
        F.col("dy").alias("day"),
        F.col("m").isNotNull().alias("is_observed"),
        F.round(
            F.when(F.col("m").isNotNull(), F.col("m").cast("double")).otherwise(
                interp
            ),
            6,
        ).alias("value"),
    )
