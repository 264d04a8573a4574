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


def hex_float_key(v):
    """Cross-engine-stable string key for a double column: the EXACT
    hex-float form (``%a``) with explicit tokens for null / nan /
    +-inf / +-0.0. No rounding step exists, so no decimal-tie can
    diverge at any magnitude (see table_diff docstring).

    Two spelling gaps between Java Formatter and C printf are
    canonicalized here:

    * exponent sign — Java writes ``p3`` where C writes ``p+3``
      (handled on the DuckDB side with ``replace(.., 'p+', 'p')``);
    * zero-fraction mantissas — Java keeps one fraction digit
      (``0x1.0p0`` for 1.0) where glibc/DuckDB prints the shortest
      form (``0x1p+0``). Without this rewrite the device silently
      diverged on the MOST COMMON doubles — every power of two
      (1.0, 2.0, 0.5, 1024.0 …; round-9 ADVICE catch). The regex
      ``\\.0p`` can only match a mantissa whose entire fraction is
      the single digit ``0`` (Java emits minimal digits, so a
      nonzero fraction never ends in ``0``), making the rewrite
      exact, not a heuristic.

    Byte equality vs DuckDB ``printf('%a', ..)`` is verified in
    tests/test_round9_ops.py over subnormals, dyadics, ties, 1e300,
    and now the zero-fraction family.
    """
    return (
        F.when(v.isNull(), F.lit("null"))
        .when(F.isnan(v), F.lit("nan"))
        .when(v == F.lit(float("inf")), F.lit("inf"))
        .when(v == F.lit(float("-inf")), F.lit("-inf"))
        .when(v == 0, F.lit("0"))
        .otherwise(
            F.regexp_replace(F.format_string("%a", v), r"\.0p", "p")
        )
    )


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
    scientific-notation bands, and EVERY fixed-precision decimal
    conversion carries a tie hazard (Java Formatter rounds HALF_UP
    where C printf rounds half-even — measured divergence at e.g.
    4000000000.5 under %.9e; review catch). The key is therefore the
    EXACT hex-float form (%a) — no rounding step exists, so no tie
    can diverge, at any magnitude from subnormals to 1e300 (byte
    equality verified in tests/test_round9_ops.py; DuckDB's p+NN
    exponent normalizes to Java's pNN spelling, and Java's
    zero-fraction '0x1.0pN' normalizes to the shortest '0x1pN' —
    see hex_float_key). Non-finite and zero
    values get explicit tokens: 'null' / 'nan' / 'inf' / '-inf', and
    both +-0.0 map to '0' (engines disagree on the hex spelling of
    zero, and IEEE equality says they ARE equal). NULLs in any key
    column hash as the 'null' token on BOTH sides — the previous
    code diverged here (Spark's concat_ws silently dropped the
    column while the oracle's || null-propagated the whole hash).
    The comparison contract is exact bit equality of the value.
    """
    from pyspark.sql import types as T

    def hkey(df: DataFrame, c: str):
        if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            return hex_float_key(F.col(c).cast("double"))
        return F.coalesce(F.col(c).cast("string"), F.lit("null"))

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
               md5(CASE WHEN value IS NULL THEN 'null'
                        WHEN isnan(value) THEN 'nan'
                        WHEN value = 'infinity'::DOUBLE THEN 'inf'
                        WHEN value = '-infinity'::DOUBLE THEN '-inf'
                        WHEN value = 0 THEN '0'
                        ELSE replace(replace(printf('%a', value), '.0p', 'p'), 'p+', 'p') END
                   || '|' || coalesce(event_type, 'null')) AS h FROM events),
    h2 AS (SELECT event_id,
               md5(CASE WHEN value IS NULL THEN 'null'
                        WHEN isnan(value) THEN 'nan'
                        WHEN value = 'infinity'::DOUBLE THEN 'inf'
                        WHEN value = '-infinity'::DOUBLE THEN '-inf'
                        WHEN value = 0 THEN '0'
                        ELSE replace(replace(printf('%a', value), '.0p', 'p'), 'p+', 'p') END
                   || '|' || coalesce(event_type, 'null')) AS h FROM v2)
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
    # lazy cut of the projected fact: the v1 hash side and BOTH v2
    # union branches re-scanned events without it (observed: 3 events
    # scans; guide §1.2)
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "value", "event_type")
        .localCheckpoint(eager=False)
    )
    diff = table_diff(events, _v2(events), "event_id", ["value", "event_type"])
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
