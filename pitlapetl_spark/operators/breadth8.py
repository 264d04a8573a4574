"""Round-8 breadth operators.

Cross-engine determinism devices as established: md5-derived hashes
(Spark ``conv(substr(md5(..)))`` == DuckDB ``'0x' || substr(md5(..))``
via functions.text.hash_bucket / oracle_hash_bucket), integer
arithmetic wherever a ratio or count is compared, round(6) on any
accumulated double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash_bucket, oracle_hash_bucket
from ..registry import query
from ..sources import load_table

# ------------------------- heavy hitters, gated two-pass (count-min)
#
# The production completion of stats.py's agg_heavy_hitters_cms: that
# operator probes EVERY distinct key against the sketch because its
# job is verifying the overestimate property against exact truth, and
# its docstring defers the real shape — "in production the candidate
# set comes from a cheap pre-pass, not a full distinct". This is that
# pre-pass, shipped: at 100 TB you cannot groupBy every key to find
# the hot ones — the full-key shuffle IS the problem the answer is
# supposed to prevent. Two passes instead:
#   1. SKETCH: a count-min sketch as a plain aggregation — every row
#      contributes one count to one bucket per depth, so the state is
#      DEPTH x WIDTH longs (fixed, map-side combinable, broadcastable).
#   2. GATE + VERIFY: re-scan, estimate each row's key as the min of
#      its bucket counts (CMS never underestimates -> no false
#      negatives), keep only rows whose estimate clears the threshold,
#      and exact-count just those — the groupBy now touches only the
#      handful of candidate keys, and map-side combine collapses their
#      (numerous) rows inside each partition.
# The result is EXACT (the verify pass removes CMS false positives);
# the sketch decides what is worth counting, never what the count is.
# cms_estimate is emitted alongside so the sketch arithmetic itself is
# hash-checked against the oracle's replay of the same md5 buckets.

CMS_DEPTH = 4  # independent hash rows (seeds "cms{j}|")
CMS_WIDTH = 256
HH_THRESHOLD = 80  # absolute support; phi*N in a production pipeline


def _cms_oracle() -> str:
    b_exprs = ", ".join(
        oracle_hash_bucket(f"'cms{j}|' || key", CMS_WIDTH) + f" AS b{j}"
        for j in range(CMS_DEPTH)
    )
    unions = "\n          UNION ALL ".join(
        f"SELECT {j} AS depth, b{j} AS bucket FROM b"
        for j in range(CMS_DEPTH)
    )
    est_joins = "\n        ".join(
        f"JOIN sketch s{j} ON s{j}.depth = {j} AND s{j}.bucket = b.b{j}"
        for j in range(CMS_DEPTH)
    )
    least = ", ".join(f"s{j}.c" for j in range(CMS_DEPTH))
    return f"""
    WITH k AS (
        SELECT user_id, CAST(user_id AS VARCHAR) AS key FROM events
    ),
    b AS (SELECT user_id, {b_exprs} FROM k),
    sketch AS (
        SELECT depth, bucket, CAST(count(*) AS BIGINT) AS c FROM (
          {unions}
        ) GROUP BY 1, 2
    ),
    est AS (
        SELECT b.user_id, least({least}) AS est
        FROM b
        {est_joins}
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS exact_count,
           CAST(min(est) AS BIGINT) AS cms_estimate
    FROM est
    GROUP BY 1
    HAVING count(*) >= {HH_THRESHOLD}
    """


@query("agg_heavy_hitters_gated", oracle=_cms_oracle())
def agg_heavy_hitters_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (users with >= {HH_THRESHOLD} events) found
    via the count-min two-pass plan (block comment above)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("user_id").cast("string").alias("key")
    )
    rows = ev.select(
        "user_id",
        *[
            hash_bucket(
                F.concat(F.lit(f"cms{j}|"), F.col("key")), CMS_WIDTH
            ).alias(f"b{j}")
            for j in range(CMS_DEPTH)
        ],
    )
    sketch = (
        rows.select(
            F.posexplode(
                F.array(*[F.col(f"b{j}") for j in range(CMS_DEPTH)])
            ).alias("depth", "bucket")
        )
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    est = rows
    for j in range(CMS_DEPTH):
        sj = sketch.filter(F.col("depth") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("c").alias(f"c{j}")
        )
        est = est.join(F.broadcast(sj), f"b{j}")
    est = est.select(
        "user_id",
        F.least(*[F.col(f"c{j}") for j in range(CMS_DEPTH)]).alias("est"),
    )
    # gate rows on the (never-underestimating) sketch, THEN exact-count
    # only the surviving candidate keys; the having-filter removes CMS
    # false positives so the output is exact
    return (
        est.filter(F.col("est") >= HH_THRESHOLD)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("exact_count"),
            F.min("est").alias("cms_estimate"),
        )
        .filter(F.col("exact_count") >= HH_THRESHOLD)
    )
