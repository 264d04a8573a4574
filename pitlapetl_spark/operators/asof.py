"""As-of (temporal lookup) join — owed by the target engine
(SURVEY.md §2.5 gap list: "as-of joins for the time-series
extension"). Spark has no native ASOF JOIN; the scalable composition
is the union + window trick:

1. tag both inputs and union them on (key, time);
2. one window per key ordered by (time, right-first) carries the most
   recent right-side payload forward with ``last(..., ignorenulls)``;
3. keep only left rows.

Cost: ONE shuffle on the join key + a per-key sort — same as a single
sort-merge join, with no O(left x right-per-key) blow-up and no
Python in the row path. This beats the ``applyInPandas``/merge_asof
alternative because it stays JVM-side inside Tungsten and a hot key's
full history never has to fit in one pandas frame.

Ties: a right row at exactly t matches a left row at t (>= semantics,
like pandas merge_asof / DuckDB ASOF JOIN); among right rows sharing
the max timestamp, the highest tiebreak value wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row attach ``payload`` of
    the most recent right row with ``right_time <= left_time`` on the
    same key; left rows with no match keep NULL payload columns.

    ``tiebreak`` (a right payload column) makes the pick deterministic
    when several right rows share the max right_time.

    ``tolerance`` (an SQL interval string like ``"30 days"``) bounds
    how stale a match may be: a carried-forward right row older than
    ``left_time - tolerance`` is nulled out, exactly pandas
    ``merge_asof(tolerance=...)`` semantics. The bound is applied to
    the already-selected winner — same single shuffle, one extra
    narrow conditional."""
    left_cols = left.columns
    payload_fields = [F.col(c) for c in payload]
    if tolerance is not None:
        # carry the match's own event time so staleness is checkable
        # after the window picks the winner
        payload_fields.append(F.col(right_time).alias("__rt"))
    payload_struct = F.struct(*payload_fields).alias("__payload")
    right_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        payload_struct,
    )
    left_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(right_tagged.schema["__payload"].dataType).alias("__payload"),
        *left_cols,
    )
    left_types = dict(left.dtypes)
    unioned = left_tagged.unionByName(
        right_tagged.select(
            "__k",
            "__t",
            "__is_right",
            "__payload",
            *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols],
        )
    )
    # Right rows sort BEFORE left rows at equal time (desc on the tag)
    # so >= tie semantics hold; among equal-time right rows the last
    # (highest tiebreak) wins.
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_right").desc(),
            F.col(f"__payload.{tiebreak}").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__is_right") == 0)
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("__m"),
            ),
        )
    return matched.select(*left_cols, *[F.col(f"__m.{c}") for c in payload])


@query(
    "asof_join_last_order",
    oracle="""
    WITH m AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS last_order_key,
           CAST(m.o_totalprice AS DOUBLE) AS last_order_price
    FROM events e
    LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the customer's most recent order at-or-before
    the event time (backward as-of). Ties on (o_custkey, o_orderdate)
    exist in the data — broken toward the highest o_orderkey on both
    sides."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_price"),
    )
    return asof_join(
        left=events,
        right=orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["last_order_key", "last_order_price"],
        tiebreak="last_order_key",
    ).select("event_id", "user_id", "last_order_key", "last_order_price")


ASOF_TOLERANCE = "6 hours"


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
    ),
    m AS (
        SELECT p.event_id, c.event_id AS click_id, c.value AS click_value,
               row_number() OVER (PARTITION BY p.event_id
                    ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM p JOIN c ON c.user_id = p.user_id
                     AND c.ts <= p.ts
                     AND c.ts >= p.ts - INTERVAL 6 HOUR
    )
    SELECT p.event_id, p.user_id,
           m.click_id AS last_click_id,
           CAST(m.click_value AS DOUBLE) AS last_click_value
    FROM p
    LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of (attribution lookup): for each
    purchase, the same user's most recent click at-or-before it — but
    only if within the last 6 hours; staler matches become NULL
    (pandas merge_asof tolerance semantics; on this corpus both
    outcomes occur). Same one-shuffle union+window plan as the
    unbounded as-of; the staleness check is a narrow conditional on
    the already-picked winner — the batch twin of the watermarked
    stream-stream attribution join (streaming/runtime.py)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("last_click_id"),
        F.col("value").alias("last_click_value"),
    )
    return asof_join(
        left=purchases,
        right=clicks,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["last_click_id", "last_click_value"],
        tiebreak="last_click_id",
        tolerance=ASOF_TOLERANCE,
    ).select("event_id", "user_id", "last_click_id", "last_click_value")


# ------------------------------------------------------ nearest as-of


@query(
    "asof_join_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    m AS (
        SELECT p.event_id, p.user_id,
               c.event_id AS click_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)) ASC NULLS LAST,
                            (c.ts <= p.ts) DESC,
                            c.event_id DESC) AS rn
        FROM p LEFT JOIN c ON c.user_id = p.user_id
    )
    SELECT event_id, user_id,
           CAST(click_id AS BIGINT) AS click_id,
           CAST(gap_us AS BIGINT) AS gap_us
    FROM m WHERE rn = 1
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (pandas ``merge_asof(direction="nearest")``):
    for each purchase, the same user's click CLOSEST in time in
    EITHER direction — backward preferred on exact gap ties, highest
    click id on exact time ties (matching the backward as-of's
    tie-break).

    One-shuffle plan, same union device as ``asof_join`` but with TWO
    window passes over the one sorted layout: ``last(payload)`` over
    the backward frame and ``first(payload)`` over the forward frame
    share the partitioning exchange (the second pass re-sorts within
    partitions, no second shuffle), then a narrow conditional picks
    the closer side. The oracle replays it as the per-user pairwise
    join + rank — O(purchases x clicks) per user, fine for an oracle,
    exactly what the engine plan avoids."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    payload = F.struct(
        F.col("click_id"), F.unix_micros(F.col("ts")).alias("cus")
    ).alias("__pay")
    right = c.select(
        F.col("user_id").alias("__k"),
        F.unix_micros(F.col("ts")).alias("__t"),
        F.lit(1).alias("__r"),
        payload,
    )
    left = p.select(
        F.col("user_id").alias("__k"),
        F.unix_micros(F.col("ts")).alias("__t"),
        F.lit(0).alias("__r"),
        F.lit(None).cast(right.schema["__pay"].dataType).alias("__pay"),
        "event_id",
        "user_id",
    )
    u = left.unionByName(
        right.select(
            "__k", "__t", "__r", "__pay",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("user_id"),
        )
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(), F.col("__r").desc(),
            F.col("__pay.click_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(), F.col("__r").asc(),
            F.col("__pay.click_id").desc_nulls_last(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = (
        u.withColumn("__b", F.last("__pay", ignorenulls=True).over(wb))
        .withColumn("__f", F.first("__pay", ignorenulls=True).over(wf))
        .filter(F.col("__r") == 0)
    )
    gb = F.col("__t") - F.col("__b.cus")  # >= 0 (click at/before purchase)
    gf = F.col("__t") - F.col("__f.cus")  # <= 0 (click after purchase)
    pick_back = F.col("__f").isNull() | (
        F.col("__b").isNotNull() & (gb <= -gf)  # tie -> backward
    )
    chosen = F.when(pick_back, F.col("__b")).otherwise(F.col("__f"))
    return m.select(
        "event_id",
        "user_id",
        chosen.getField("click_id").alias("click_id"),
        (F.col("__t") - chosen.getField("cus")).alias("gap_us"),
    )
