"""Semantic/property tests for the round-5 operators — the invariants
the DuckDB hash-compare can't express (the oracle proves value
equality; these prove the operators' CLAIMS: Bloom's no-false-negative
guarantee, CMS's overestimate bound, weighted-reservoir inclusion,
chunk coverage, pipeline-composition consistency)."""

from __future__ import annotations

import math

import pytest

from pitlapetl_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def test_bloom_prefilter_never_false_negative(spark):
    """The Bloom guarantee: every true duplicate MUST be bloom_hit
    (false positives are allowed and expected at the tight test
    sizing; false negatives never). The re-crawled half of the batch
    (doc_id offset 1000000) is a dup by construction."""
    rows = Q["dedup_bloom_prefilter"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.is_dup:
            assert r.bloom_hit, f"false negative at doc {r.doc_id}"
        assert r.bloom_fp == (r.bloom_hit and not r.is_dup)
    recrawled = [r for r in rows if r.doc_id < 2_000_000]
    assert recrawled and all(r.is_dup for r in recrawled)


def test_cms_estimate_never_undercounts(spark):
    """Count-min's one-sided error: estimate >= truth for EVERY key,
    and at least one key collides (overcount > 0) at the deliberately
    tight 150-keys-into-64-buckets sizing."""
    from pitlapetl_spark.operators.stats import CMS_W

    rows = Q["agg_heavy_hitters_cms"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    assert all(r.overcount == r.cms_est - r.exact_cnt for r in rows)
    if len(rows) > CMS_W:
        # pigeonhole: more keys than buckets forces a collision
        assert any(r.overcount > 0 for r in rows)


def test_reservoir_exact_k_and_weight_pull(spark, tmp_path):
    """Exactly K rows per group, priorities non-increasing — and the
    A-Res weight property: a row whose weight dwarfs every other is
    (near-)certainly selected (ln(u)/w -> 0, the maximum, as w grows)."""
    from pitlapetl_spark.operators.breadth import RESERVOIR_K

    rows = Q["sample_reservoir_per_group"](spark, SF_SMOKE).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.event_type, []).append(r)
    assert by_group
    for grp in by_group.values():
        assert len(grp) == RESERVOIR_K
        pr = [r.priority for r in sorted(grp, key=lambda r: r.rn)]
        assert pr == sorted(pr, reverse=True)
    # planted heavy row: 60 light rows (w=0.1) + one w=1e9 whale
    ev = [(i, None, i % 3, "view", 0.1, None) for i in range(60)]
    ev.append((999, None, 0, "view", 1e9, None))
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    picked = {
        r.event_id
        for r in Q["sample_reservoir_per_group"](spark, str(tmp_path)).collect()
    }
    assert 999 in picked


def test_chunker_covers_every_token_with_declared_overlap(spark):
    """Sliding chunks must tile each document: starts at stride
    intervals from 0, each chunk len = min(CHUNK_TOKENS, n - start),
    the last chunk reaches exactly the end, interior consecutive
    chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens."""
    from pitlapetl_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS

    rows = Q["text_chunk_sliding_tokens"](spark, SF_SMOKE).collect()
    docs: dict[int, list] = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append(r)
    assert docs
    for chunks in docs.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        last = chunks[-1]  # doc length recomputed from the last chunk
        n = last.start_tok + last.chunk_len
        for i, c in enumerate(chunks):
            assert c.start_tok == i * CHUNK_STRIDE
            assert c.chunk_len == min(CHUNK_TOKENS, n - c.start_tok)
        # number of chunks == ceil(n / stride) given n >= 1
        assert len(chunks) == math.ceil(n / CHUNK_STRIDE)


def test_pipeline_to_shards_consistent_with_gate(spark):
    """The composed plan must agree with its stages: one output row
    per gate-kept doc; within every shard, positions are contiguous
    from 1 and start_offset is the exact running token sum in
    shard_pos order; pack_id = start_offset // PACK_BUDGET."""
    from pitlapetl_spark.operators.training_prep import PACK_BUDGET

    kept = {
        r.doc_id
        for r in Q["pipeline_pretrain_filter"](spark, SF_SMOKE).collect()
        if r.keep
    }
    rows = Q["pipeline_pretrain_to_shards"](spark, SF_SMOKE).collect()
    assert {r.doc_id for r in rows} == kept
    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r)
    for grp in shards.values():
        grp.sort(key=lambda r: r.shard_pos)
        assert [r.shard_pos for r in grp] == list(range(1, len(grp) + 1))
        run = 0
        for r in grp:
            assert r.start_offset == run
            assert r.pack_id == run // PACK_BUDGET
            run += r.n_tokens


def test_bpe_pair_stats_match_python_recount(spark):
    """The distributed pair count equals a direct python recount of
    the same corpus at smoke scale (vocabulary-weighted adjacency)."""
    import re
    from collections import Counter

    from pitlapetl_spark.sources import load_table

    texts = [
        r.text for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]
    counts: Counter = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    rows = Q["text_bpe_pair_stats"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert counts[r.pair] == r.pair_cnt
    # the returned list is the true global top-k (count desc, pair asc)
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r.pair, r.pair_cnt) for r in rows] == expected


def test_curriculum_global_positions_are_a_permutation(spark):
    """global_pos must be a contiguous 1..N permutation over all kept
    docs, ordered phase-major (every phase-p doc before any phase-p+1
    doc)."""
    rows = Q["curriculum_quality_order"](spark, SF_SMOKE).collect()
    assert rows
    assert sorted(r.global_pos for r in rows) == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: r.global_pos)
    phases = [r.phase for r in ordered]
    assert phases == sorted(phases)


def test_paged_datasource_partitions_per_page(spark):
    """The DataSource contract: one input partition PER PAGE — the
    planner's parallelism unit equals the API's pagination unit."""
    from pitlapetl_spark.sources.paged_api import (
        DEFAULT_PAGES,
        PAGE_SIZE,
        register_paged_api,
    )

    register_paged_api(spark)
    df = spark.read.format("paged_api").option("pages", str(DEFAULT_PAGES)).load()
    assert df.rdd.getNumPartitions() == DEFAULT_PAGES
    assert df.count() == DEFAULT_PAGES * PAGE_SIZE
    # pages land whole in their own partition
    per_part = df.rdd.glom().map(len).collect()
    assert per_part == [PAGE_SIZE] * DEFAULT_PAGES


def test_variant_absent_path_is_null_not_error(spark):
    """try_variant_get's schema-drift posture: absent path -> null
    for every row; present path -> non-null int."""
    rows = Q["json_variant_get"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.missing_field is None for r in rows)
    assert all(r.k is not None for r in rows)
    assert all(r.k_mod == r.k % 10 for r in rows)


def test_iqr_fences_bound_inliers(spark):
    """Fence arithmetic: lo <= q1 <= q3 <= hi, outlier counts within
    [0, n_rows], and rate = n_outliers / n_rows."""
    rows = Q["anomaly_iqr_outliers"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.lo_fence <= r.q1 <= r.q3 <= r.hi_fence
        assert 0 <= r.n_outliers <= r.n_rows
        assert r.outlier_rate == pytest.approx(r.n_outliers / r.n_rows, abs=1e-6)


def test_lpa_partitions_all_nodes_with_node_id_labels(spark):
    """LPA invariants: community sizes partition the node set exactly
    (sum over communities == |nodes|), every community id IS a node
    id, and parts + customers == nodes per community."""
    from pitlapetl_spark.operators.pagerank import copurchase_edges

    rows = Q["graph_label_propagation"](spark, SF_SMOKE).collect()
    assert rows
    node_ids = {
        r.src
        for r in copurchase_edges(spark, SF_SMOKE).select("src").distinct().collect()
    }
    assert sum(r.n_nodes for r in rows) == len(node_ids)
    for r in rows:
        assert r.community in node_ids
        assert r.n_parts + r.n_customers == r.n_nodes
