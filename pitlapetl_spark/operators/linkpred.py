"""Link prediction over the customer-part co-purchase bipartite graph:
Adamic-Adar scoring of part pairs (Adamic & Adar 2003, "Friends and
neighbors on the Web" — public). Two parts that share customers are
candidate "links" in the part projection; each shared customer
contributes 1/ln(degree) so that promiscuous buyers (who co-occur
with everything) count less than selective ones. This is the
recommender-adjacent graph operator the reference's surface lacks
entirely (its graph story stops at flat lookups, SURVEY.md §2.5) and
the fourth member of the graph family next to PageRank (centrality),
LPA (communities), and triangle counting (cohesion).

Plan shape: ONE distinct on the numeric (custkey, partkey) pair, a
degree aggregate on the customer key, a DEGREE-CAPPED self-join
co-partitioned on the customer key (both sides read the SAME
lineage-cut contribution frame — the fact-scale build runs once), and
one pair-grain aggregate.
The self-join is the same bounded-pair-space discipline as
market_basket_pairs (basket key) and the DF-capped Jaccard dedup:
expansion is at most AA_DEG_CAP² rows per customer, never
corpus-quadratic. The cap is also the textbook semantic choice —
a customer who buys the whole catalog carries ~zero signal
(1/ln(deg) → 0) while costing deg² join rows, so dropping
super-degree hubs removes the skew AND the noise in one move
(the same hub-capping used in the winnowing/Jaccard DF caps).

Determinism contract: per-customer contributions round(1/ln(deg), 12)
are cast to DECIMAL(28,12) and summed EXACTLY (order-independent);
the final score rounds to 6. Top-k ties break on the unique
(part_a, part_b) key on both engines.

100-TB notes: every shuffle keys on a uniform 8-byte long (custkey
then the part pair); the degree frame joins back co-partitioned on
custkey so the self-join and the degree filter share one exchange;
output is top-k via TakeOrderedAndProject (per-partition heaps, K-row
driver merge — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

# Customers with more distinct parts than this are dropped from pair
# generation: deg² join-row cost with ~zero 1/ln(deg) signal (docstring).
# Chosen above the sf0.1 p99.9 customer degree so the cap is a skew
# guard, not a result-shaping knob, at test scale.
AA_DEG_CAP = 256
# Degree-1 customers contribute no pairs; the >= 2 bound also keeps
# ln(deg) strictly positive.
AA_DEG_MIN = 2
AA_TOP_K = 20


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
        SELECT c, CAST(count(*) AS BIGINT) AS d
        FROM cp GROUP BY c
        HAVING count(*) BETWEEN {AA_DEG_MIN} AND {AA_DEG_CAP}
    ),
    contrib AS (
        SELECT cp.c, cp.p,
               CAST(round(1.0 / ln(deg.d), 12) AS DECIMAL(28,12)) AS w
        FROM cp JOIN deg ON cp.c = deg.c
    )
    SELECT a.p AS part_a, b.p AS part_b,
           CAST(count(*) AS BIGINT) AS n_common,
           round(CAST(sum(a.w) AS DOUBLE), 6) AS aa_score
    FROM contrib a JOIN contrib b
      ON a.c = b.c AND a.p < b.p
    GROUP BY a.p, b.p
    ORDER BY aa_score DESC, part_a ASC, part_b ASC
    LIMIT {AA_TOP_K}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k part pairs by Adamic-Adar score over shared customers.

    The weight column rides the LEFT side of the self-join (a.w) so
    the pair aggregate needs no extra join back to the degree frame —
    both sides of the pair share the same customer, hence the same
    1/ln(deg) contribution.
    """
    # the distinct (c, p) bipartite frame is the memoized build shared
    # with the long-keyed edge family (pagerank.py, round 7) — before,
    # this query re-ran the identical orders⋈lineitem + distinct
    from .pagerank import bipartite_copurchase_cached

    cp = bipartite_copurchase_cached(spark, sf_dir)
    deg = (
        cp.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d").between(AA_DEG_MIN, AA_DEG_CAP))
    )
    contrib = cp.join(deg, "c").select(
        "c",
        "p",
        F.round(F.lit(1.0) / F.log(F.col("d")), 12)
        .cast("decimal(28,12)")
        .alias("w"),
    )
    # one fact-scale build shared by both self-join sides: without the
    # lineage cut, each side re-ran the orders-lineitem join + distinct
    # + degree pipeline (found by review; the xcorr self-join pattern)
    contrib = contrib.localCheckpoint(eager=False)
    # The checkpointed frame is AQE-coalesced to a handful of
    # partitions (it is only ~tens of MB) — fine for the broadcast
    # build side, but the PROBE side fans each row out into its
    # pair space map-side, so leaving it on 1-2 partitions would
    # serialize the whole pair generation on as many cores
    # (measured: 22 s vs 9.6 s at sf0.1 without this). Round-robin
    # the cheap pre-explosion rows across the cluster first — the
    # same spread-before-expensive-map device as winnowing's
    # repartition (guide §2.5 input skew).
    a = contrib.repartition(
        spark.sparkContext.defaultParallelism
    ).alias("a")
    b = contrib.select("c", "p").alias("b")
    # Broadcast the (c, p)-only probe side while it fits (two longs
    # per row; the degree cap already bounded the per-customer
    # expansion): pair generation becomes map-side over the one
    # materialized contribution frame and the only exchange left is
    # the partial-aggregated pair count — the old sort-merge
    # self-join shuffled and sorted BOTH full copies on c first
    # (guide §3.1). The row-count gate reads the memoized bipartite
    # frame (an eager localCheckpoint — counting it is metadata-
    # cheap); past the gate the shuffle self-join below is the
    # documented web-scale shape.
    AA_BROADCAST_MAX_ROWS = 5_000_000
    if cp.count() <= AA_BROADCAST_MAX_ROWS:
        b = F.broadcast(b)
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(F.col("a.w")).cast("double"), 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), F.asc("part_a"), F.asc("part_b"))
        .limit(AA_TOP_K)
    )
