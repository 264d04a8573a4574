"""Table diff / reconciliation — the regression gate between two
versions of the same table (yesterday's load vs today's, pipeline v1
vs v2, pre- vs post-migration). Every production ETL needs this
operator; at 100 TB it is one full-outer join on the key plus a
row-hash comparison — no row ever leaves the cluster, and the output
is the per-status profile (added / removed / changed / same), i.e.
grain-sized, not data-sized.

The second table here is DERIVED from the first by deterministic id
rules (drop every 97th key, bump value on every 89th, append copies of
every 83rd under new ids), so the expected diff is exactly knowable
and the oracle replays it end-to-end — the operator is tested on a
diff with all four statuses populated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_ADD_OFFSET = 10_000_000


def _v2(events: DataFrame) -> DataFrame:
    """The 'new version' of events: deterministic removes / changes /
    adds keyed off event_id."""
    kept = events.filter(F.col("event_id") % 97 != 0)
    changed = kept.withColumn(
        "value",
        F.when(F.col("event_id") % 89 == 0, F.col("value") + 1).otherwise(
            F.col("value")
        ),
    )
    added = events.filter(F.col("event_id") % 83 == 0).withColumn(
        "event_id", F.col("event_id") + _ADD_OFFSET
    )
    return changed.unionByName(added)


def table_diff(
    v1: DataFrame, v2: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Per-key diff status between two table versions: full outer join
    on ``key``, row-hash over ``compare_cols`` on each side, status in
    {added, removed, changed, same}. One shuffle per side on the key
    (co-partitioned), hashes computed map-side.

    Float columns never hash as the raw double's string — Spark's
    Double.toString and DuckDB's VARCHAR cast disagree in the
    scientific-notation bands (|v| < 1e-3 on the Spark side), a
    value-dependent cross-engine trap (the
    tools/round_headroom_audit.py audit class). The key is piecewise
    (review catch — a bigint-micros cast saturates on Spark past
    2^63/1e6 and collides all huge values to one key):

    - |v| < 4e9: micro resolution, ``format('%.0f', round(v*1e6))``.
      Below 2^52 micros the integer rounding of the shortest repr
      (Spark's BigDecimal path) and of the exact binary value
      (DuckDB) provably agree — a non-dyadic double's shortest form
      never sits on an x.5 boundary, and dyadic ties round away from
      zero on both engines — so the key is bit-identical.
    - otherwise: ``format('%.9e', v)`` — 10 significant digits in
      scientific form, verified byte-identical across engines from
      subnormals to 1e300 (tests/test_round9_ops.py).

    Comparison grain is the documented contract: half a micro below
    4e9, 1e-10 relative above — deltas under the grain compare as
    'same'."""
    from pyspark.sql import types as T

    def hkey(df: DataFrame, c: str):
        if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            v = F.col(c).cast("double")
            return F.when(
                F.abs(v) < 4e9,
                F.format_string("%.0f", F.round(v * 1_000_000)),
            ).otherwise(F.format_string("%.9e", v))
        return F.col(c).cast("string")

    def hashed(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            key,
            F.md5(
                F.concat_ws("|", *[hkey(df, c) for c in compare_cols])
            ).alias(out),
        )

    a = hashed(v1, "h1")
    b = hashed(v2, "h2")
    return a.join(b, key, "full").select(
        key,
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("same")
        .alias("status"),
    )


@query(
    "table_diff_reconcile",
    oracle=f"""
    WITH v2 AS (
        SELECT event_id,
               CASE WHEN event_id % 89 = 0 THEN value + 1 ELSE value END AS value,
               event_type
        FROM events WHERE event_id % 97 <> 0
        UNION ALL
        SELECT event_id + {_ADD_OFFSET}, value, event_type
        FROM events WHERE event_id % 83 = 0
    ),
    h1 AS (SELECT event_id,
               md5(CASE WHEN abs(value) < 4e9
                        THEN printf('%.0f', round(value * 1000000))
                        ELSE printf('%.9e', value) END
                   || '|' || event_type) AS h FROM events),
    h2 AS (SELECT event_id,
               md5(CASE WHEN abs(value) < 4e9
                        THEN printf('%.0f', round(value * 1000000))
                        ELSE printf('%.9e', value) END
                   || '|' || event_type) AS h FROM v2)
    SELECT CASE WHEN h1.h IS NULL THEN 'added'
                WHEN h2.h IS NULL THEN 'removed'
                WHEN h1.h <> h2.h THEN 'changed'
                ELSE 'same' END AS status,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM h1 FULL OUTER JOIN h2 ON h1.event_id = h2.event_id
    GROUP BY 1
    """,
)
def table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation profile between events and a deterministically
    perturbed second version: counts of added / removed / changed /
    same keys from one co-partitioned full-outer join over row hashes.
    All four statuses are populated by construction, so the query
    proves every branch of the diff logic."""
    events = load_table(spark, sf_dir, "events")
    diff = table_diff(events, _v2(events), "event_id", ["value", "event_type"])
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
