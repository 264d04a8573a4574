"""Alternating least squares matrix factorization (Koren/Bell/Volinsky
2009, "Matrix Factorization Techniques for Recommender Systems" —
public), trained end-to-end as relational plans. The item-item CF
query (rec_item_item_cosine) is memory-based; this is the MODEL-based
member of the recommender family — the one that generalizes to unseen
user-item pairs.

Why rank 2: each ALS half-step solves a per-entity ridge system
(A + λI) x = b with A the k x k Gram of the counterpart factors. At
k = 2 the solve is CLOSED-FORM by Cramer's rule — three Gram sums,
two moment sums, one determinant — which makes the whole trainer
expressible as joins + aggregates on BOTH engines, with an exact
DuckDB oracle replay (no linear-algebra library anywhere). Rank 2 is
small for production but the plan SHAPE is the real distributed-ALS
shape: each half-step is one co-partitioned ratings-to-factors join +
an entity-grain aggregate; factor frames are entity-grain relations.
At 100 TB you raise k and swap Cramer for a per-row k x k solve in a
pandas UDF — the data movement, which is what Spark plans, is
unchanged.

Determinism contract: factors live as DECIMAL(12,8); Gram/moment
terms are exact decimal products summed exactly; the Cramer divisions
run ONCE per entity on identical doubles and round(8) back to
decimal. Init is hash-derived (no RNG): q = 0.5 + ((key * M) % 1000)
/ 1000, exact at 3 decimals. Every alternation is therefore
bit-reproducible across engines and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

ALS_LAMBDA = 0.1
ALS_TOP_USERS = 10
_M1 = 2654435761  # Knuth multiplicative-hash constants for the init
_M2 = 2246822519

_DEC = "decimal(12,8)"


def _oracle_als() -> str:
    lam = ALS_LAMBDA

    def solve(entity: str, other: str, factors: str, out: str) -> str:
        """One ALS half-step in SQL: solve ``entity`` factors given
        ``factors`` on ``other``."""
        return f"""
    {out}_g AS MATERIALIZED (
        SELECT t.{entity} AS e,
               sum(CAST(f.f1 AS DECIMAL(19,8)) * CAST(f.f1 AS DECIMAL(19,8)))
                   AS s11,
               sum(CAST(f.f1 AS DECIMAL(19,8)) * CAST(f.f2 AS DECIMAL(19,8)))
                   AS s12,
               sum(CAST(f.f2 AS DECIMAL(19,8)) * CAST(f.f2 AS DECIMAL(19,8)))
                   AS s22,
               sum(CAST(t.r AS DECIMAL(19,0)) * CAST(f.f1 AS DECIMAL(19,8)))
                   AS b1,
               sum(CAST(t.r AS DECIMAL(19,0)) * CAST(f.f2 AS DECIMAL(19,8)))
                   AS b2
        FROM ratings t JOIN {factors} f ON f.e = t.{other}
        GROUP BY 1
    ),
    {out} AS MATERIALIZED (
        SELECT e,
               CAST(round((CAST(b1 AS DOUBLE) * (CAST(s22 AS DOUBLE) + {lam})
                           - CAST(b2 AS DOUBLE) * CAST(s12 AS DOUBLE))
                          / ((CAST(s11 AS DOUBLE) + {lam})
                             * (CAST(s22 AS DOUBLE) + {lam})
                             - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)),
                          8) AS DECIMAL(12,8)) AS f1,
               CAST(round(((CAST(s11 AS DOUBLE) + {lam})
                           * CAST(b2 AS DOUBLE)
                           - CAST(s12 AS DOUBLE) * CAST(b1 AS DOUBLE))
                          / ((CAST(s11 AS DOUBLE) + {lam})
                             * (CAST(s22 AS DOUBLE) + {lam})
                             - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)),
                          8) AS DECIMAL(12,8)) AS f2
        FROM {out}_g
    )"""

    return f"""
    WITH ratings AS MATERIALIZED (
        SELECT o_custkey AS u, l_partkey AS i,
               CAST(sum(l_quantity) AS BIGINT) AS r
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    ),
    q0 AS MATERIALIZED (
        SELECT i AS e,
               CAST(0.5 + ((i * {_M1}) % 1000) / 1000.0
                    AS DECIMAL(12,8)) AS f1,
               CAST(0.5 + ((i * {_M2}) % 1000) / 1000.0
                    AS DECIMAL(12,8)) AS f2
        FROM (SELECT DISTINCT i FROM ratings)
    ),{solve("u", "i", "q0", "p1")},{solve("i", "u", "p1", "q1")},{solve("u", "i", "q1", "p2")},
    active AS (
        SELECT u, CAST(count(*) AS BIGINT) AS n_rated
        FROM ratings GROUP BY 1
        ORDER BY n_rated DESC, u ASC LIMIT {ALS_TOP_USERS}
    ),
    cand AS (
        SELECT a.u, q.e AS i, a.n_rated,
               round(CAST(p.f1 * q.f1 + p.f2 * q.f2 AS DOUBLE), 6) AS pred
        FROM active a
        JOIN p2 p ON p.e = a.u
        CROSS JOIN q1 q
        WHERE NOT EXISTS (
            SELECT 1 FROM ratings t WHERE t.u = a.u AND t.i = q.e
        )
    )
    SELECT u AS custkey, i AS partkey, n_rated, pred
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY u ORDER BY pred DESC, i ASC) AS rk
        FROM cand
    )
    WHERE rk = 1
    ORDER BY custkey
    """


def als_factors(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[DataFrame, DataFrame]]]:
    """(ratings, stages) where stages is [(p, q), ...] after each
    completed half-step — exposed so tests can assert the regularized
    training objective is non-increasing across alternations."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    ratings = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.sum("l_quantity").cast("long").alias("r"))
        .localCheckpoint(eager=False)  # every half-step re-joins it
    )
    q0 = ratings.select("i").distinct().select(
        F.col("i").alias("e"),
        (F.lit(0.5) + ((F.col("i") * _M1) % 1000) / 1000.0)
        .cast(_DEC)
        .alias("f1"),
        (F.lit(0.5) + ((F.col("i") * _M2) % 1000) / 1000.0)
        .cast(_DEC)
        .alias("f2"),
    )

    def solve(entity: str, other: str, factors: DataFrame) -> DataFrame:
        g = (
            ratings.join(factors, ratings[other] == factors.e)
            .groupBy(F.col(entity).alias("e"))
            .agg(
                F.sum(F.col("f1") * F.col("f1")).alias("s11"),
                F.sum(F.col("f1") * F.col("f2")).alias("s12"),
                F.sum(F.col("f2") * F.col("f2")).alias("s22"),
                F.sum(F.col("r") * F.col("f1")).alias("b1"),
                F.sum(F.col("r") * F.col("f2")).alias("b2"),
            )
        )
        a11 = F.col("s11").cast("double") + ALS_LAMBDA
        a22 = F.col("s22").cast("double") + ALS_LAMBDA
        a12 = F.col("s12").cast("double")
        b1 = F.col("b1").cast("double")
        b2 = F.col("b2").cast("double")
        det = a11 * a22 - a12 * a12
        return g.select(
            "e",
            F.round((b1 * a22 - b2 * a12) / det, 8).cast(_DEC).alias("f1"),
            F.round((a11 * b2 - a12 * b1) / det, 8).cast(_DEC).alias("f2"),
        ).localCheckpoint(eager=False)

    p1 = solve("u", "i", q0)
    q1 = solve("i", "u", p1)
    p2 = solve("u", "i", q1)
    # stages exposed oldest-first so tests can assert the regularized
    # objective is non-increasing across half-steps
    return ratings, [(p1, q0), (p1, q1), (p2, q1)]


@query("rec_als_factorization", oracle=_oracle_als())
def rec_als_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 UNSEEN-item recommendation for the {ALS_TOP_USERS} most
    active customers from the rank-2 ALS factorization (module
    docstring). The scoring pass is a {ALS_TOP_USERS}-row broadcast
    against the item-factor frame with a rated-pairs anti-join — the
    serving shape: factors are entity-grain relations, prediction is
    a dot product, candidate generation is bounded by
    users-scored x catalog."""
    ratings, stages = als_factors(spark, sf_dir)
    p2, q1 = stages[-1]
    active = (
        ratings.groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_rated"))
        .orderBy(F.desc("n_rated"), F.asc("u"))
        .limit(ALS_TOP_USERS)
    )
    pu = p2.select(F.col("e").alias("u"), F.col("f1").alias("pf1"), F.col("f2").alias("pf2"))
    qi = q1.select(F.col("e").alias("i"), F.col("f1").alias("qf1"), F.col("f2").alias("qf2"))
    cand = (
        F.broadcast(active.join(pu, "u"))
        .crossJoin(qi)
        .join(ratings.select("u", "i"), ["u", "i"], "left_anti")
        .select(
            "u",
            "i",
            "n_rated",
            F.round(
                (
                    F.col("pf1") * F.col("qf1") + F.col("pf2") * F.col("qf2")
                ).cast("double"),
                6,
            ).alias("pred"),
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("pred"), F.asc("i"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("u").alias("custkey"),
            F.col("i").alias("partkey"),
            "n_rated",
            "pred",
        )
        .orderBy("custkey")
    )
