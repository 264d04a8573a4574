"""Round-13 optimization-pass pins.

SemDeDup giant-cluster skew cap (VERDICT r12 item 3, guide §2.5):
`cluster_pair_scores` must split labels larger than the cap into
hash-block pairs so no single task holds an unbounded group/Gram,
while emitting EXACTLY the pair set of the unblocked scorer."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pitlapetl_spark.operators.similarity import (  # noqa: E402
    SEMDEDUP_GROUP_CAP,
    cluster_pair_scores,
)


@pytest.fixture(scope="module")
def giant_cluster(spark):
    """One pathological label holding EVERY vector (the SemDeDup
    failure mode the cap exists for) plus a normal small label: 240
    deterministic 8-dim vectors on label 0, 5 on label 1."""
    rows = []
    for i in range(245):
        label = 0 if i < 240 else 1
        v = [((i * 7 + d * 13) % 19) / 19.0 + 0.05 for d in range(8)]
        nrm = sum(x * x for x in v) ** 0.5
        rows.append((i, label, v, nrm))
    return spark.createDataFrame(
        rows, "vec_id long, label int, v array<double>, nrm double"
    ).localCheckpoint(eager=True)


def _pairs(df):
    return sorted(
        (r["vec_a"], r["vec_b"], r["cosine"]) for r in df.collect()
    )


def test_skew_cap_preserves_the_exact_pair_set(giant_cluster):
    base = _pairs(
        cluster_pair_scores(
            giant_cluster,
            0.85,
            schema="vec_a long, vec_b long, cosine double",
            cap=10_000,  # far above both labels: single-group path
        )
    )
    assert len(base) > 100  # non-vacuous fixture
    capped = _pairs(
        cluster_pair_scores(
            giant_cluster,
            0.85,
            schema="vec_a long, vec_b long, cosine double",
            cap=32,  # forces ceil(240/32)=8 blocks on the giant label
        )
    )
    assert capped == base


def test_skew_cap_bounds_per_task_group_rows(giant_cluster):
    """Replicate the fan-out `cluster_pair_scores` performs and check
    the group sizes the executor would see: every (label, gx, gy)
    group must be O(cap) — hash-block assignment makes the bound
    statistical, so assert 4x the nominal 2·cap diagonal/off-diagonal
    bound — and the giant label must actually split into many
    groups instead of one straggler task."""
    cap = 32
    counts = giant_cluster.groupBy("label").agg(
        F.count(F.lit(1)).alias("_n")
    )
    fanned = (
        giant_cluster.join(F.broadcast(counts), "label")
        .withColumn("_nb", F.ceil(F.col("_n") / F.lit(cap)).cast("int"))
        .withColumn(
            "_blk", F.pmod(F.xxhash64("vec_id"), F.col("_nb")).cast("int")
        )
        .withColumn(
            "_t", F.explode(F.sequence(F.lit(0), F.col("_nb") - 1))
        )
        .withColumn("_gx", F.least("_blk", "_t"))
        .withColumn("_gy", F.greatest("_blk", "_t"))
    )
    sizes = (
        fanned.groupBy("label", "_gx", "_gy")
        .count()
        .collect()
    )
    giant_groups = [r for r in sizes if r["label"] == 0]
    assert len(giant_groups) == 8 * 9 // 2  # nb=8 block pairs
    assert max(r["count"] for r in sizes) <= 4 * 2 * cap
    # the small label stays on the pre-cap single-group path
    small = [r for r in sizes if r["label"] == 1]
    assert len(small) == 1 and (small[0]["_gx"], small[0]["_gy"]) == (0, 0)


def test_default_cap_keeps_fixture_labels_unblocked(spark):
    """At the shipped default cap every sf-fixture cluster must stay
    a single (label, 0, 0) group — the guarantee that the cap changes
    nothing (plan OR numerics) until a genuinely giant cluster shows
    up."""
    from pitlapetl_spark.operators.similarity import (
        _centroid_ranked,
        _vectors,
    )

    sf = "/root/testdata/sf0.01"
    ranked = _centroid_ranked(spark, sf)
    assign = ranked.filter(F.col("crk") <= 3).select("vec_id", "label")
    biggest = (
        assign.groupBy("label")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert biggest <= SEMDEDUP_GROUP_CAP
