"""Connected-components twins: min-label propagation (O(diameter)
rounds) vs alternating big-star/small-star (Kiveris et al. 2014,
O(log n) rounds). VERDICT r5 item 2: identical labels on real dedup
pairs AND a planted path graph where the round counts visibly
diverge."""

from __future__ import annotations

from pyspark.sql import functions as F

from pitlapetl_spark.operators.graph_cluster import (
    MAX_ROUNDS,
    connected_components,
    connected_components_fast,
    connected_components_fast_rounds,
)
from tests.conftest import SF_CORRECTNESS


def _labels(df):
    return sorted((r.doc_id, r.cluster_id) for r in df.collect())


def test_fast_cc_matches_minlabel_on_real_dedup_pairs(spark):
    """Both algorithms over the SAME exact-Jaccard pair graph at
    sf0.01 must emit identical (doc_id, cluster_id) labels — the
    fast twin is a drop-in replacement, not an approximation."""
    from pitlapetl_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, SF_CORRECTNESS).localCheckpoint()
    slow = _labels(connected_components(pairs))
    fast = _labels(connected_components_fast(pairs))
    assert len(slow) > 0
    assert fast == slow


def test_fast_cc_path_graph_round_divergence(spark):
    """A 200-node path (the chain-shaped crawl-mirror component that
    motivates the fast twin): min-label propagation moves the min ONE
    hop per round, so after its MAX_ROUNDS=20 safety bound node i
    still carries label max(0, i - 20) — visibly unconverged.
    Alternating-star must label the whole chain 0 within O(log n)
    iterations."""
    n = 200
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    fast = connected_components_fast(pairs)
    assert _labels(fast) == [(i, 0) for i in range(n)]
    rounds = connected_components_fast_rounds(pairs)
    assert rounds <= 12  # ~log2(200)=7.6 plus the fixpoint-confirm pass

    slow = connected_components(pairs)
    got = dict(_labels(slow))
    # min-label after MAX_ROUNDS rounds: label(i) = max(0, i - MAX_ROUNDS)
    assert got[n - 1] == n - 1 - MAX_ROUNDS  # NOT converged — the point
    assert MAX_ROUNDS < n - 1  # the divergence precondition, kept honest


def test_fast_cc_multi_component_and_star_shapes(spark):
    """Mixed shapes in one edge list: two disjoint chains and a star;
    labels must be each component's min id, every vertex present
    exactly once."""
    edges = [
        # chain 10-11-12-13
        (11, 10), (11, 12), (12, 13),
        # star centered high, min at a leaf
        (100, 7), (100, 8), (100, 9),
        # 2-cycle duplicate edge both orientations
        (50, 51), (51, 50),
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = dict(_labels(connected_components_fast(pairs)))
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10,
        7: 7, 8: 7, 9: 7, 100: 7,
        50: 50, 51: 50,
    }
