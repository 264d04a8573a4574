"""HITS hubs-and-authorities over the customer→part purchase graph —
the DIRECTED-iteration member of the graph family (Kleinberg 1999).

PageRank (pagerank.py) scores one undirected notion of centrality;
HITS separates the two roles a bipartite purchase graph actually has:
a customer is a good HUB when they buy authoritative parts, a part is
a good AUTHORITY when good hubs buy it — the mutually-recursive pair
`auth = Eᵀ·hub`, `hub = E·auth`, L1-normalized per round. On retail
data this surfaces taste-making customers vs consensus products; on a
web/crawl graph the same operator is the classic seed-quality scorer
for crawl frontier prioritization.

Spark-first iterative shape (the pagerank.py discipline): the edge
frame is the SHARED memoized co-purchase build (one exchange per
iteration on the join key); each round is two edge joins + two
aggregates, and the O(nodes) score frames are the only per-round
state. Normalization totals are exact decimal sums folded back as
one-row broadcast scalars. Fixed HITS_ITERS unrolled rounds — the
plan-stability rule every iterative operator here follows.

Determinism contract: per-edge contributions round(12) →
DECIMAL(28,12) exact sums; the L1 normalizer divides two identical
doubles on both engines; the DuckDB oracle unrolls the same rounds
with MATERIALIZED CTEs (each round's score frame is consumed by the
next round AND its own normalizer — the k-core double-reference
lesson, SCALE.md round-6 trap note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .pagerank import PAIRS_ORACLE_CTE

HITS_ITERS = 3
HITS_TOP = 20
_DEC = "decimal(28,12)"


def _purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (custkey, partkey) distinct purchase edges — the same
    pairs relation PAIRS_ORACLE_CTE describes (and that
    copurchase_edges doubles into its undirected long-encoded form)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )


def _oracle() -> str:
    head = f"""
    WITH {PAIRS_ORACLE_CTE},
    hub0 AS MATERIALIZED (
        SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS h FROM pairs
    )"""
    its = ""
    for i in range(1, HITS_ITERS + 1):
        its += f""",
    araw{i} AS MATERIALIZED (
        SELECT e.p,
               CAST(sum(CAST(round(h.h, 12) AS DECIMAL(28,12))) AS DOUBLE) AS a
        FROM pairs e JOIN hub{i - 1} h ON e.c = h.c
        GROUP BY e.p
    ),
    anorm{i} AS (
        SELECT CAST(sum(CAST(round(a, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s
        FROM araw{i}
    ),
    auth{i} AS MATERIALIZED (
        SELECT p, round(a / (SELECT s FROM anorm{i}), 12) AS a FROM araw{i}
    ),
    hraw{i} AS MATERIALIZED (
        SELECT e.c,
               CAST(sum(CAST(round(a.a, 12) AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM pairs e JOIN auth{i} a ON e.p = a.p
        GROUP BY e.c
    ),
    hnorm{i} AS (
        SELECT CAST(sum(CAST(round(h, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s
        FROM hraw{i}
    ),
    hub{i} AS MATERIALIZED (
        SELECT c, round(h / (SELECT s FROM hnorm{i}), 12) AS h FROM hraw{i}
    )"""
    tail = f"""
    SELECT p AS partkey, a AS authority
    FROM auth{HITS_ITERS}
    ORDER BY authority DESC, partkey ASC
    LIMIT {HITS_TOP}
    """
    return head + its + tail


@query("graph_hits_authorities", oracle=_oracle())
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-HITS_TOP authority parts after HITS_ITERS normalized
    hub/authority rounds (module docstring)."""
    pairs = _purchase_pairs(spark, sf_dir).localCheckpoint(eager=True)
    hub = pairs.select("c").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for _ in range(HITS_ITERS):
        araw = (
            pairs.join(hub, "c")
            .groupBy("p")
            .agg(F.sum(F.round("h", 12).cast(_DEC)).cast("double").alias("a"))
        )
        anorm = araw.agg(
            F.sum(F.round("a", 12).cast(_DEC)).cast("double").alias("s")
        )
        auth = araw.crossJoin(F.broadcast(anorm)).select(
            "p", F.round(F.col("a") / F.col("s"), 12).alias("a")
        )
        # cut each round's lineage: the score frames are O(nodes)
        auth = auth.localCheckpoint(eager=True)
        hraw = (
            pairs.join(auth, "p")
            .groupBy("c")
            .agg(F.sum(F.round("a", 12).cast(_DEC)).cast("double").alias("h"))
        )
        hnorm = hraw.agg(
            F.sum(F.round("h", 12).cast(_DEC)).cast("double").alias("s")
        )
        hub = hraw.crossJoin(F.broadcast(hnorm)).select(
            "c", F.round(F.col("h") / F.col("s"), 12).alias("h")
        )
        hub = hub.localCheckpoint(eager=True)
    return (
        auth.select(F.col("p").alias("partkey"), F.col("a").alias("authority"))
        .orderBy(F.desc("authority"), F.asc("partkey"))
        .limit(HITS_TOP)
    )
