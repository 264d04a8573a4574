"""Invariant tests for the round-7 breadth operators — semantic
properties the DuckDB hash-parity gate cannot see (parity proves the
two engines agree; these prove the agreed-on answer has the right
mathematical shape)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pitlapetl_spark import registry
from pitlapetl_spark.operators.breadth7 import (
    MIX_T_BUDGET,
    SES_ALPHA,
)
from pitlapetl_spark.operators.community import CC_MIN_DEG
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def test_mix_temperature_allocation_is_exact(spark):
    """Largest-remainder apportionment must hand out EXACTLY the
    budget (the whole point over naive rounding), and the ppm weights
    must sum to 10^6 within the floor slack (one ulp per source)."""
    rows = Q["mix_temperature_sampling"](spark, SF_SMOKE).collect()
    assert sum(r.alloc_docs for r in rows) == MIX_T_BUDGET
    wsum = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - len(rows) <= wsum <= 1_000_000
    # temperature upweights small sources: allocation share of every
    # source must be >= its raw share iff it's above-average-squared…
    # the cheap sanity half: allocations follow q-order
    by_n = sorted(rows, key=lambda r: r.n_docs)
    allocs = [r.alloc_docs for r in by_n]
    assert allocs == sorted(allocs)


def test_balanced_downsample_equalizes_classes(spark):
    df = Q["sample_balanced_class_downsample"](spark, SF_SMOKE)
    per_class = {
        r.lang: r.n
        for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    src = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mn = min(r.n for r in src)
    assert set(per_class) == {r.lang for r in src}
    assert all(v == mn for v in per_class.values())


def test_streak_matches_bruteforce_per_user(spark):
    """Recompute the top user's longest streak naively from the raw
    events — the gaps-and-islands window must agree."""
    top = Q["window_streak_active_days"](spark, SF_SMOKE).collect()
    assert top, "streak query returned no rows"
    r0 = top[0]
    days = sorted(
        d[0].date()
        for d in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("user_id") == r0.user_id)
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .collect()
    )
    best = cur = 1
    for a, b in zip(days, days[1:]):
        cur = cur + 1 if (b - a).days == 1 else 1
        best = max(best, cur)
    assert r0.longest_streak_days == best
    # streaks ordered non-increasing
    lens = [r.longest_streak_days for r in top]
    assert lens == sorted(lens, reverse=True)


def test_ses_fold_matches_python_recursion(spark):
    """The fold must replay the SES recursion: recomputing it in
    Python over the (rounded) daily values reproduces every level to
    within the output rounding slack. (True bit-equality is what the
    DuckDB recursive-CTE parity gate asserts — there both sides fold
    the UNROUNDED series; here the outputs expose only round(6)
    values, so the recursion over them carries ≤1e-6 per-step drift
    damped by 1−α.)"""
    rows = Q["ts_exp_smoothing"](spark, SF_SMOKE).orderBy("day").collect()
    level = None
    for r in rows:
        level = (
            r.daily_value
            if level is None
            else SES_ALPHA * r.daily_value + (1 - SES_ALPHA) * level
        )
        assert abs(r.ses_level - level) < 5e-6
    # smoothing stays within the series envelope
    vals = [r.daily_value for r in rows]
    assert min(vals) - 1e-9 <= rows[-1].ses_level <= max(vals) + 1e-9


def test_funnel_windowed_monotone(spark):
    rows = {r.step: r for r in Q["funnel_windowed_steps"](spark, SF_SMOKE).collect()}
    assert rows[1].conv_from_prev == 1.0 and rows[1].conv_from_start == 1.0
    assert rows[1].n_users >= rows[2].n_users >= rows[3].n_users
    # windowed funnel can never beat the unconstrained funnel
    unconstrained = (
        Q["funnel_view_click_purchase"](spark, SF_SMOKE)
        .agg(
            F.sum((F.col("funnel_depth") >= 2).cast("long")).alias("c2"),
            F.sum((F.col("funnel_depth") >= 3).cast("long")).alias("c3"),
        )
        .collect()[0]
    )
    assert rows[2].n_users <= unconstrained.c2
    assert rows[3].n_users <= unconstrained.c3


def test_clustering_coefficient_bounds(spark):
    rows = Q["graph_clustering_coefficient"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.degree >= CC_MIN_DEG
        assert 0 <= r.cc_ppm <= 1_000_000
        # cc_ppm is exactly the integer floor of the ratio
        assert r.cc_ppm == (2 * r.n_triangles * 1_000_000) // (
            r.degree * (r.degree - 1)
        )


def test_l_diversity_entropy_bounded_by_log_bands(spark):
    rows = Q["privacy_l_diversity"](spark, SF_SMOKE).collect()
    for r in rows:
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_bands) + 1e-6
        # the flag is computed on the UNROUNDED entropy; outside a
        # ±1e-6 band of ln(3) it must agree with the rounded output
        if r.entropy_nats > math.log(3) + 1e-6:
            assert r.entropy_l_diverse
        elif r.entropy_nats < math.log(3) - 1e-6:
            assert not r.entropy_l_diverse


def test_kendall_tau_shape(spark):
    rows = Q["stats_kendall_tau"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r.tau_b) <= 1.0
        assert r.concordant + r.discordant <= r.n_pairs


def test_scurve_monotone_in_similarity(spark):
    rows = Q["dedup_lsh_scurve_planner"](spark, SF_SMOKE).collect()
    by_cfg: dict[tuple, list] = {}
    for r in rows:
        by_cfg.setdefault((r.bands, r.rows_per_band), []).append(
            (r.jaccard_s, r.p_candidate)
        )
    for curve in by_cfg.values():
        ps = [p for _, p in sorted(curve)]
        assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
        assert 0.0 <= ps[0] and ps[-1] <= 1.0


def test_rolling_distinct_dominates_dau(spark):
    """WAU(d) >= DAU(d) for every day, and stickiness <= 1."""
    wau = {
        r.day: r.wau
        for r in Q["window_rolling_distinct_users"](spark, SF_SMOKE).collect()
    }
    st = Q["window_dau_mau_stickiness"](spark, SF_SMOKE).collect()
    for r in st:
        assert r.mau >= r.dau
        assert 0 < r.stickiness <= 1.0
        assert wau[r.day] >= r.dau


def test_bpe_trainer_matches_python_reference(spark):
    """The declarative BPE trainer must reproduce an independent
    plain-Python implementation of the same algorithm (word-type
    weighted, self-pairs excluded, greedy non-overlapping apply) —
    merge-for-merge, count-for-count."""
    from collections import Counter

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_freq)
        for r in Q["text_bpe_train_merges"](spark, SF_SMOKE).collect()
    ]
    words: Counter = Counter()
    for (t,) in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ):
        for w in t.split():
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    want = []
    for k in range(len(got)):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                if a != b:
                    pc[(a, b)] += f
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((k + 1, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == want


def test_als_regularized_objective_nonincreasing(spark):
    """ALS guarantee: each exact half-step solve cannot increase the
    regularized objective SSE + λ(Σ|p|² + Σ|q|²). The 1e-8 factor
    rounding between steps allows only negligible slack."""
    from pitlapetl_spark.operators.als import ALS_LAMBDA, als_factors

    ratings, stages = als_factors(spark, SF_SMOKE)
    ratings = ratings.cache()

    def objective(p, q) -> float:
        pu = p.select(F.col("e").alias("u"), F.col("f1").alias("pf1"),
                      F.col("f2").alias("pf2"))
        qi = q.select(F.col("e").alias("i"), F.col("f1").alias("qf1"),
                      F.col("f2").alias("qf2"))
        sse = (
            ratings.join(pu, "u").join(qi, "i")
            .select(
                (
                    F.col("r").cast("double")
                    - (F.col("pf1") * F.col("qf1")
                       + F.col("pf2") * F.col("qf2")).cast("double")
                ).alias("err")
            )
            .agg(F.sum(F.col("err") * F.col("err")))
            .collect()[0][0]
        )
        reg = 0.0
        for f in (p, q):
            reg += (
                f.select(
                    (F.col("f1") * F.col("f1")
                     + F.col("f2") * F.col("f2")).cast("double").alias("n2")
                )
                .agg(F.sum("n2"))
                .collect()[0][0]
            )
        return sse + ALS_LAMBDA * reg

    objs = [objective(p, q) for p, q in stages]
    for a, b in zip(objs, objs[1:]):
        assert b <= a * (1 + 1e-9) + 1e-6, objs
    # and training actually helped: final strictly below first
    assert objs[-1] < objs[0]


def test_bpe_encode_consistent_with_trained_merges(spark):
    """Encoder/trainer consistency on the shared loop: every merged
    symbol the encoder emits must be buildable from the trainer's
    merge table (concatenation closure), and token-count accounting
    sum(freq) over words must equal the corpus word count."""
    from pitlapetl_spark import registry

    merges = registry.QUERIES["text_bpe_train_merges"](spark, SF_SMOKE).collect()
    enc = registry.QUERIES["text_bpe_encode"](spark, SF_SMOKE).collect()
    # closure: start from single chars, apply merges in rank order
    vocab = set()
    for r in enc:
        vocab.update(c for c in r.word)
    for m in sorted(merges, key=lambda m: m.merge_rank):
        vocab.add(m.left_sym + m.right_sym)
    for r in enc:
        for sym in r.encoded.split("|"):
            assert sym in vocab, (r.word, sym)
        assert r.n_syms == len(r.encoded.split("|"))
        assert r.encoded.replace("|", "") == r.word  # lossless
