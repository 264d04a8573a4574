"""Round-9 breadth operators.

Same cross-engine determinism devices as breadth8: md5-derived
uniform hashes (Spark ``conv(substr(md5(..)))`` == DuckDB
``'0x' || substr(md5(..))``), integer/decimal arithmetic up to one
final correctly-rounded double expression, and rounding precision
chosen with >=1e3x ulp headroom at the column's magnitude
(tools/round_headroom_audit.py — the r8 DP-sum lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# -------------------- theta/KMV sketch: distinct count + distinct sum
#
# The mergeable-sketch family's third member (after the HLL register
# pair): a K-MINIMUM-VALUES (theta) sketch, the device behind
# DataSketches' theta/tuple sketches. Every key hashes to a uniform
# 60-bit integer u; the sketch keeps the K smallest DISTINCT u values
# with each key's payload riding along. theta = u_(K) (the K-th
# smallest, as a fraction of 2^60); every distinct key lands below
# theta independently with probability theta, so the K-1 retained
# entries strictly below it give the classic unbiased estimators
#
#   distinct_count ~= (K-1) / theta
#   distinct_sum   ~= sum(value over retained) / theta     (tuple sketch)
#
# — the second being what HLL cannot do: estimate an ADDITIVE metric
# over the distinct-key set (revenue over distinct customers, bytes
# over distinct documents) without a full distinct shuffle. With
# fewer than K distinct keys the sketch holds everything and both
# answers are exact (the documented small-set mode). Relative error
# ~ 1/sqrt(K-2) ~= 8.9% at K=128.
#
# 100-TB shape: the row scan hashes keys map-side; the only wide op
# is distinct-then-TakeOrdered on (u, value) — partial map-side
# dedup plus per-partition top-K, so shuffle volume is O(partitions
# x K), exactly how a per-partition KMV merge behaves. The exact
# count/sum verifier columns exist only to price the estimate at test
# scale; production drops them (same contract as agg_hll_distinct).
# Sketches merge by unioning retained sets and re-taking the K
# smallest — the same mergeability contract agg_hll_set_operations
# demonstrates for HLL registers.
#
# Determinism: u is an exact bigint both engines derive from the same
# md5 prefix; theta_num stays bigint; each estimate is TWO correctly-
# rounded IEEE ops (cast, multiply-by-exact-2^60, divide) from exact
# integers/decimals — no libm, no accumulation-order dependence.
# Rounding at 2 dp leaves ~2e6x ulp headroom at the ~1e7 sum
# magnitude (audit above).

THETA_K = 128
_POW2_60 = 1 << 60


def _theta_oracle() -> str:
    return f"""
    WITH rows_ AS (
        SELECT o.o_custkey AS custkey,
               CAST(c.c_acctbal AS DECIMAL(18,2)) AS val
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    hashed AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS u,
               val
        FROM rows_
    ),
    sketch AS (SELECT u, val FROM hashed ORDER BY u LIMIT {THETA_K}),
    th AS (
        SELECT CAST(count(*) AS BIGINT) AS n_retained,
               max(u) AS theta_num
        FROM sketch
    ),
    below AS (
        SELECT CAST(count(*) AS BIGINT) AS n_below,
               coalesce(sum(CASE WHEN s.u < t.theta_num THEN s.val END),
                        CAST(0 AS DECIMAL(18,2))) AS sum_below,
               sum(s.val) AS sum_all,
               max(t.n_retained) AS n_retained,
               max(t.theta_num) AS theta_num
        FROM sketch s CROSS JOIN th t
        WHERE s.u < t.theta_num OR {THETA_K} > (SELECT n_retained FROM th)
    ),
    exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n_exact,
               sum(val) AS sum_exact
        FROM hashed
    )
    SELECT CAST({THETA_K} AS INT) AS k,
           b.n_retained,
           b.theta_num,
           e.n_exact,
           round(CAST(e.sum_exact AS DOUBLE), 2) AS sum_exact,
           CASE WHEN b.n_retained < {THETA_K}
                THEN CAST(b.n_retained AS DOUBLE)
                ELSE round(CAST(b.n_below AS DOUBLE) * {float(_POW2_60)!r}
                           / CAST(b.theta_num AS DOUBLE), 2)
           END AS est_distinct,
           CASE WHEN b.n_retained < {THETA_K}
                THEN round(CAST(b.sum_all AS DOUBLE), 2)
                ELSE round(CAST(b.sum_below AS DOUBLE) * {float(_POW2_60)!r}
                           / CAST(b.theta_num AS DOUBLE), 2)
           END AS est_sum
    FROM below b CROSS JOIN exact e
    """


@query("agg_theta_sketch_distinct_sum", oracle=_theta_oracle())
def agg_theta_sketch_distinct_sum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV/theta sketch over customers-with-orders: estimated distinct
    customer count AND estimated account-balance sum over that
    distinct set, exact verifiers alongside (block comment above)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("val")
    )
    rows = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("o_custkey").alias("custkey"), "val"
    )
    hashed = rows.select(
        F.conv(F.substring(F.md5(F.col("custkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("u"),
        "val",
    ).distinct()
    sketch = hashed.orderBy("u").limit(THETA_K)
    th = sketch.agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.max("u").alias("theta_num"),
    )
    # one-row scalar broadcast join (the repo's standing pattern for
    # data-dependent scalars), then conditional fold over <=K rows
    below = (
        sketch.crossJoin(F.broadcast(th))
        .filter(
            (F.col("u") < F.col("theta_num"))
            | (F.lit(THETA_K) > F.col("n_retained"))
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_below"),
            F.coalesce(
                F.sum(F.when(F.col("u") < F.col("theta_num"), F.col("val"))),
                F.lit(0).cast("decimal(18,2)"),
            ).alias("sum_below"),
            F.sum("val").alias("sum_all"),
            F.max("n_retained").alias("n_retained"),
            F.max("theta_num").alias("theta_num"),
        )
    )
    exact = hashed.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("val").alias("sum_exact"),
    )
    est_d = (
        F.col("n_below").cast("double")
        * F.lit(float(_POW2_60))
        / F.col("theta_num").cast("double")
    )
    est_s = (
        F.col("sum_below").cast("double")
        * F.lit(float(_POW2_60))
        / F.col("theta_num").cast("double")
    )
    return below.crossJoin(F.broadcast(exact)).select(
        F.lit(THETA_K).cast("int").alias("k"),
        "n_retained",
        "theta_num",
        "n_exact",
        F.round(F.col("sum_exact").cast("double"), 2).alias("sum_exact"),
        F.when(
            F.col("n_retained") < THETA_K, F.col("n_retained").cast("double")
        )
        .otherwise(F.round(est_d, 2))
        .alias("est_distinct"),
        F.when(
            F.col("n_retained") < THETA_K,
            F.round(F.col("sum_all").cast("double"), 2),
        )
        .otherwise(F.round(est_s, 2))
        .alias("est_sum"),
    )
