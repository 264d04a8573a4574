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
) -> DataFrame:
    """Backward as-of join: for each left row attach ``payload`` of
    the most recent right row with ``right_time <= left_time`` on the
    same key; left rows with no match keep NULL payload columns.

    ``tiebreak`` (a right payload column) makes the pick deterministic
    when several right rows share the max right_time.
    """
    left_cols = left.columns
    payload_struct = F.struct(*payload).alias("__payload")
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
    return (
        unioned.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
        .select(*left_cols, F.col("__m.*"))
    )


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
