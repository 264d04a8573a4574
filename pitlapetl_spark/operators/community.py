"""Label-propagation community detection (LPA, Raghavan et al. 2007)
over the customer-part co-purchase graph — the third iterative graph
operator (after connected components, graph_cluster.py, and PageRank,
pagerank.py): communities are label fixpoints under "adopt the most
frequent neighbor label", surfacing co-purchase cliques rather than
mere connectivity (CC) or centrality (PageRank).

Determinism contract (classic LPA is notoriously order-dependent —
asynchronous updates + random tie-breaks): this is the SYNCHRONOUS
variant with a total tie-break (neighbor-label count DESC, label ASC),
run for a FIXED number of unrolled rounds — fully deterministic, so
the DuckDB oracle replays the exact same label evolution as an
unrolled CTE chain (the kmeans/pagerank precedent for hash-checking
iterative algorithms).

Spark-first iterative shape: each round is ONE src-key edge join +
TWO hash aggregates — (dst, label) counts, then per-dst argmax via a
struct max (max_by semantics with the tie-break encoded as
(count, -label), so NO per-dst sort window) — all map-side-combinable.
Labels are one row per node; lineage cut per round (labels frame is
O(nodes), cheap to materialize; contrast PageRank's cadence note).

100-TB shape: identical to PageRank's Pregel cost model — edges
shuffle once per round on the src key, label frames are node-sized,
node ids are 8-byte longs (shared ``copurchase_edges`` encoding).
Fixed rounds, not convergence-tested, for plan stability at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .pagerank import PAIRS_ORACLE_CTE, copurchase_edges_cached

LPA_ROUNDS = 3


def _oracle() -> str:
    head = f"""
    WITH {PAIRS_ORACLE_CTE},
    edges AS (
        SELECT c * 2 AS src, p * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT p * 2 + 1, c * 2 FROM pairs
    ),
    l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges
    )"""
    its = ""
    for i in range(1, LPA_ROUNDS + 1):
        its += f""",
    l{i} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (
                       PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
            FROM (
                SELECT e.dst AS node, l.label, count(*) AS cnt
                FROM edges e JOIN l{i - 1} l ON e.src = l.node
                GROUP BY e.dst, l.label
            )
        ) WHERE rn = 1
    )"""
    tail = f"""
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_parts,
           CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers
    FROM l{LPA_ROUNDS}
    GROUP BY label
    """
    return head + its + tail


@query("graph_label_propagation", oracle=_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community profile after LPA_ROUNDS synchronous label-propagation
    rounds: per surviving community label, how many nodes adopted it
    and the part/customer split. Every node starts as its own
    community; each round every node adopts its most frequent
    neighbor label (ties -> smallest label)."""
    edges = copurchase_edges_cached(spark, sf_dir)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(LPA_ROUNDS):
        counted = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("n2"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # per-node argmax with total tie-break as ONE struct max —
        # maximize (cnt, -label) => highest count, then smallest label;
        # max_by-equivalent, no per-node sort window
        labels = (
            counted.groupBy("n2")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                ).alias("m")
            )
            .select(
                F.col("n2").alias("node"), (-F.col("m.neg")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum((F.col("node") % 2 == 1).cast("long")).alias("n_parts"),
        F.sum((F.col("node") % 2 == 0).cast("long")).alias("n_customers"),
    )
