"""Dedup clustering: connected components over the near-dup pair
graph — the step that turns pairwise matches (dedup_ngram_jaccard /
dedup_minhash_lsh) into keep-one-per-cluster decisions.

Spark-first iterative algorithm (no GraphFrames dependency): min-label
propagation. Every vertex starts labeled with its own id; each round
every vertex takes the min label among itself and its neighbors; stop
when no label changes. Rounds needed = graph diameter (near-dup
clusters are tiny — a handful of rounds). Each round is ONE join +
ONE aggregate; lineage is cut with ``localCheckpoint`` so the plan
doesn't grow unboundedly — the standard Pregel-style pattern at any
scale.

The oracle replays the fixpoint with a recursive CTE (transitive
closure -> min reachable id), so even this iterative, driver-loop
operator is hash-checked against ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .dedup import _PAIR_JACCARD_SQL, dedup_ngram_jaccard

MAX_ROUNDS = 20  # safety bound; convergence is checked every round


def connected_components(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Min-label propagation over an undirected pair list; returns
    (doc_id, cluster_id) for every vertex appearing in a pair,
    cluster_id = min vertex id in the component."""
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIR_JACCARD_SQL}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS doc FROM edges),
    reach(u, v) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, min(v) AS cluster_id
    FROM reach
    GROUP BY u
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> dedup clusters: connected components over the
    exact-Jaccard pair graph; every doc in a cluster maps to the
    cluster's min doc_id (the canonical keeper). The iterative Spark
    fixpoint must equal the oracle's recursive-CTE transitive
    closure."""
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    return connected_components(pairs)
