"""Slowly-changing-dimension (SCD type 2) history building — the CDC
surface a warehouse load needs next to the MERGE sink (sinks
``merge_upsert``): turn an event stream into a versioned interval
table (one row per value REGIME, with valid_from / valid_to / current
flag).

Shape: entirely window functions on one key — two shuffles total
(daily-last pick, then change detection + interval close), no joins,
no Python. At 100 TB this is the canonical "change capture from
snapshots" plan: partition by the entity key, order by time, compare
against lag, close intervals with lead. Skew follows the entity key's
history length, which is bounded by the calendar — uniform enough
that no salting is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "scd2_user_value_history",
    oracle="""
    WITH daily AS (
        SELECT user_id, day, value FROM (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   value,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    changes AS (
        SELECT user_id, day, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY day) AS prev_value
        FROM daily
    ),
    versions AS (
        SELECT user_id, day AS valid_from, value
        FROM changes
        WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT user_id,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                AS TIMESTAMP) AS valid_to,
           CAST(value AS DOUBLE) AS value,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               IS NULL AS is_current
    FROM versions
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from the events table: each user's end-of-day
    value becomes a version row only when it CHANGES vs the previous
    day; versions carry [valid_from, valid_to) intervals and the open
    interval is flagged current. Reference parity: the reference keeps
    only latest state via upsert (racedag.py:68-73) — this operator is
    the history-preserving upgrade a warehouse expects."""
    events = load_table(spark, sf_dir, "events")
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        events.select(
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
            "value",
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    w_hist = Window.partitionBy("user_id").orderBy("day")
    versions = (
        daily.withColumn("prev_value", F.lag("value").over(w_hist))
        .filter(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .select("user_id", F.col("day").alias("valid_from"), "value")
    )
    w_close = Window.partitionBy("user_id").orderBy("valid_from")
    return versions.select(
        "user_id",
        "valid_from",
        F.lead("valid_from").over(w_close).alias("valid_to"),
        "value",
        F.lead("valid_from").over(w_close).isNull().alias("is_current"),
    )


@query(
    "temporal_pit_join",
    oracle="""
    WITH daily AS (
        SELECT user_id, day, value FROM (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   value,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    changes AS (
        SELECT user_id, day, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY day) AS prev_value
        FROM daily
    ),
    versions AS (
        SELECT user_id, day AS valid_from, value
        FROM changes
        WHERE prev_value IS NULL OR value <> prev_value
    ),
    dim AS (
        SELECT user_id,
               CAST(valid_from AS TIMESTAMP) AS valid_from,
               CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                    AS TIMESTAMP) AS valid_to,
               CAST(value AS DOUBLE) AS dim_value
        FROM versions
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(p.value AS DOUBLE) AS amount,
           d.dim_value, d.valid_from
    FROM events p JOIN dim d
      ON p.user_id = d.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    """,
)
def temporal_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join: each purchase event is
    enriched with the SCD2 dimension version that was valid AT THE
    EVENT'S TIMESTAMP — the correctness contract every as-was report
    and ML feature backfill needs (joining to the CURRENT version
    leaks the future into training data). Reuses the oracle-checked
    `scd2_user_value_history` interval table as the dimension.

    Shape: equi-join on user_id carrying the interval predicates as
    join filters — co-partitioned, per-user match work bounded by that
    user's version count (versions-per-key is small by SCD2's
    change-only construction). Every event matches exactly ONE version
    (intervals partition the timeline from the user's first day), so
    cardinality is preserved — asserted by the fact that row counts
    equal the purchase count under the oracle's hash gate."""
    events = load_table(spark, sf_dir, "events")
    dim = scd2_user_value_history(spark, sf_dir).select(
        "user_id",
        "valid_from",
        "valid_to",
        F.col("value").alias("dim_value"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    return p.join(
        dim,
        (p.user_id == dim.user_id)
        & (p.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (p.ts < dim.valid_to)),
    ).select(
        "event_id",
        p.user_id.alias("user_id"),
        "ts",
        "amount",
        "dim_value",
        "valid_from",
    )


# ------------------------------------------------- CDC changelog apply

# The change-data-capture companion to the SCD2/PIT operators above:
# instead of building a history, collapse an ordered change log into
# the CURRENT snapshot, honoring tombstones. This is the Debezium/
# binlog-ingestion shape: at 100 TB of accumulated log the plan is a
# single shuffle on the key (the window) with no self-join and no
# state — and because only rn=1 survives, AQE's partial top-1
# (rank-limit pushdown) can prune per-partition before the final sort.
# Event mapping on the synthetic log: 'error' is the delete tombstone,
# every other event upserts the key's value.

CDC_TOMBSTONE = "error"


@query(
    "cdc_latest_state",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, ts, event_type, value, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_changes
        FROM events
    )
    SELECT user_id,
           ts AS last_ts,
           event_type AS last_type,
           round(value, 6) AS last_value,
           n_changes
    FROM ranked
    WHERE rn = 1 AND event_type <> '{CDC_TOMBSTONE}'
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog: last writer wins per key, a trailing
    tombstone deletes the key entirely. One window over (user_id,
    ts DESC, event_id DESC) — the unique event_id tiebreak makes the
    winner deterministic even under equal timestamps, which real
    binlogs produce constantly. Complements scd2_user_value_history
    (full history) and the MERGE sinks (persisted upsert): this is the
    stateless log->snapshot collapse."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_changes", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") != CDC_TOMBSTONE))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            "n_changes",
        )
    )
