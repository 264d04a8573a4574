"""Semantic/property tests for the round-6 operators — the invariants
the DuckDB hash-compare can't express: skyline soundness AND
completeness, spine contiguity + mass conservation, LSH-banding
completeness for the hamming near-dup, gradient-descent loss descent,
and a brute-force triangle cross-check independent of the oracle's
degree-ordered formulation."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from pitlapetl_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def test_pareto_frontier_sound_and_complete(spark):
    """Soundness: no returned point is dominated by ANY part.
    Completeness: every part not returned is dominated by some part
    (strict dominance on (price<=, size>=))."""
    from pitlapetl_spark.sources import load_table

    parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    frontier = {
        r.p_partkey for r in Q["analytics_pareto_frontier"](spark, SF_SMOKE).collect()
    }
    assert frontier

    def dominated(p, by):
        return (
            by[1] <= p[1]
            and by[2] >= p[2]
            and (by[1] < p[1] or by[2] > p[2])
        )

    for p in parts:
        is_dom = any(dominated(p, q) for q in parts)
        assert (p[0] in frontier) == (not is_dom), p


def test_month_spine_contiguous_and_mass_conserving(spark):
    """Per customer: the spine covers every month between first and
    last exactly once (contiguity), endpoint months carry orders, and
    the densified totals sum to the customer's raw order total (the
    gap-fill invents no money)."""
    import pandas as pd

    from pitlapetl_spark.sources import load_table

    dens = Q["window_month_spine_densify"](spark, SF_SMOKE).toPandas()
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_totalprice")
        .toPandas()
    )
    for ck, g in dens.groupby("custkey"):
        months = sorted(pd.to_datetime(m) for m in g["month"])
        span = (
            (months[-1].year - months[0].year) * 12
            + months[-1].month
            - months[0].month
            + 1
        )
        assert len(months) == span == len(set(months)), ck
        first = g.loc[g["month"] == g["month"].min(), "n_orders"].iloc[0]
        last = g.loc[g["month"] == g["month"].max(), "n_orders"].iloc[0]
        assert first > 0 and last > 0, ck
    got = dens.groupby("custkey")["month_total"].sum().round(2)
    want = orders.groupby("o_custkey")["o_totalprice"].sum().round(2)
    for ck, total in want.items():
        assert math.isclose(got[ck], total, rel_tol=0, abs_tol=0.05), ck


def test_phash_banding_is_complete_for_ham_max(spark):
    """Pigeonhole guarantee: the banded candidate pipeline must return
    EXACTLY the brute-force hamming<=HAM_MAX pair set — banding may
    only ever add candidates (removed by the verify), never lose a
    pair within the radius."""
    from itertools import combinations

    from pitlapetl_spark.operators.multimodal import (
        PHASH_HAM_MAX,
        phash_frame,
    )
    from pitlapetl_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    hashes = {r.doc_id: r.phash for r in phash_frame(docs).collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= PHASH_HAM_MAX
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in Q["mm_phash_hamming_near_dup"](spark, SF_SMOKE).collect()
    }
    assert got == brute
    assert brute  # the corpus must actually exercise the path


def test_logreg_descends_the_loss(spark):
    """Five GD steps from w=0 must not increase the training NLL —
    replayed in pandas from the returned weights (the hash-compare
    proves engine parity; this proves the optimizer actually
    optimizes)."""
    import numpy as np

    from pitlapetl_spark.sources import load_table

    row = Q["ml_logreg_gradient_descent"](spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").toPandas()
    x1 = docs["n_chars"].astype(float) / 100.0
    n_spaces = docs["text"].str.len() - docs["text"].str.replace(" ", "", regex=False).str.len()
    x2 = n_spaces * 10.0 / docs["n_chars"]
    y = (docs["lang"] == "en").astype(float)

    def nll(w0, w1, w2):
        z = w0 + w1 * x1 + w2 * x2
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        return float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).mean())

    assert nll(row.w0, row.w1, row.w2) <= nll(0.0, 0.0, 0.0) + 1e-9
    assert 0.0 <= row.accuracy <= 1.0


def test_triangle_count_matches_bruteforce_enumeration(spark):
    """The degree-ordered pipeline (and its same-trick oracle) vs a
    formulation-independent brute force: enumerate unordered part
    triples via three joins on the raw canonical pair list in DuckDB
    and compare per-node participation for the query's top-k."""
    sf = SF_SMOKE
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    brute = con.execute(
        """
        WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pr AS (
            SELECT a.l_partkey AS x, b.l_partkey AS y
            FROM bk a JOIN bk b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        tri AS (
            SELECT p1.x AS a, p1.y AS b, p2.y AS c
            FROM pr p1
            JOIN pr p2 ON p2.x = p1.y
            JOIN pr p3 ON p3.x = p1.x AND p3.y = p2.y
        ),
        nodes AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT node, count(*) AS n FROM nodes GROUP BY 1
        ORDER BY n DESC, node ASC
        """
    ).fetchall()
    want = {node: n for node, n in brute}
    got = Q["graph_triangle_count"](spark, sf).collect()
    assert got
    for r in got:
        assert want.get(r.part_key) == r.n_triangles, r


def test_ohlc_candle_invariants(spark):
    """Per candle: low <= open/close <= high, positive event count;
    and the candles partition the events exactly (total n_events
    equals the raw event count — no row lost to the windowing)."""
    from pitlapetl_spark.sources import load_table

    rows = Q["stream_ohlc_candles"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.low_v <= min(r.open_v, r.close_v) <= max(r.open_v, r.close_v) <= r.high_v
        assert r.n_events >= 1
        assert (r.window_end - r.window_start).total_seconds() == 86400
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_zipf_fit_is_nonpositive_slope_over_rank(spark):
    """Frequency is non-increasing in rank by construction, so the
    log-log fitted slope can never be positive (Chebyshev's sum
    inequality); r2 lives in [0, 1]; n_ranks is min(K, vocab)."""
    row = Q["text_zipf_fit"](spark, SF_SMOKE).collect()[0]
    assert row.slope <= 0
    assert 0.0 <= row.r2 <= 1.0
    assert 1 <= row.n_ranks <= 1000


def test_pq_adc_codes_and_distance_floor(spark):
    """PQ invariants: every vector carries exactly M codes in
    [0, Ks); the ADC of every result is >= the structural floor
    sum_s(min_cid dt[s][cid]) (the self-query distance); and the
    returned top-k equals an independent pandas recomputation of ADC
    from the codes + distance table (no join-path trust)."""
    from pitlapetl_spark.operators import pq
    from pitlapetl_spark.sources import load_table

    import pyspark.sql.functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    sub = pq._subvectors(emb)
    cb = pq._codebook_init(sub)
    for _ in range(pq.PQ_ITERS):
        cb = pq._update_codebook(pq._assign_codes(sub, cb))
    codes = {
        (r.vec_id, r.s): r.cid
        for r in pq._assign_codes(sub, cb).select("vec_id", "s", "cid").collect()
    }
    n_vec = emb.count()
    assert len(codes) == n_vec * pq.PQ_M
    assert all(0 <= c < pq.PQ_KS for c in codes.values())

    rows = Q["sim_topk_pq_adc"](spark, SF_SMOKE).collect()
    assert len(rows) == pq.PQ_TOP
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)

    # independent ADC replay: distance table from the collected
    # codebook vs the query subvectors, then sum per vector
    qid = max(r.vec_id for r in emb.select("vec_id").collect())
    qsub = {r.s: r.subv for r in sub.filter(F.col("vec_id") == qid).collect()}
    dt = {}
    for r in cb.collect():
        dt[(r.s, r.cid)] = round(
            sum((a - b) * (a - b) for a, b in zip(qsub[r.s], r.c)), 6
        )
    floor = sum(
        min(dt[(s, c)] for c in range(pq.PQ_KS) if (s, c) in dt)
        for s in range(pq.PQ_M)
    )
    assert all(d >= floor - 1e-9 for d in dists)
    replay = {}
    for vid in {v for v, _ in codes}:
        if vid == qid:
            continue
        replay[vid] = round(
            sum(dt[(s, codes[(vid, s)])] for s in range(pq.PQ_M)), 6
        )
    want = sorted(replay.items(), key=lambda kv: (kv[1], kv[0]))[: pq.PQ_TOP]
    got = [(r.vec_id, round(r.adc_dist, 6)) for r in rows]
    assert got == [(v, d) for v, d in want]


def test_bootstrap_ci_matches_pure_python_replay(spark):
    """Full independence check: replay the Poisson bootstrap in plain
    Python (hashlib md5 uniforms, the same CDF ladder, order-stat CI)
    and compare every output column — no Spark or DuckDB machinery
    trusted. Also: the plain sample mean must fall inside the CI."""
    import hashlib as hl
    from collections import defaultdict
    from decimal import Decimal

    from pitlapetl_spark.operators.stats import (
        BOOT_B,
        BOOT_SEED,
        _BOOT_DENOM,
        _POIS_CDF,
    )
    from pitlapetl_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .collect()
    )
    cdf = [float(c) for c in _POIS_CDF]
    sums = defaultdict(lambda: [Decimal(0)] * BOOT_B)
    cnts = defaultdict(lambda: [0] * BOOT_B)
    nrows = defaultdict(int)
    for row in li:
        nrows[row.l_returnflag] += 1
        xd = Decimal(str(row.l_extendedprice)).quantize(Decimal("0.01"))
        for r in range(BOOT_B):
            s = f"{BOOT_SEED}:{row.l_orderkey}:{row.l_linenumber}:{r}"
            u = (int(hl.md5(s.encode()).hexdigest()[:15], 16) + 1) / _BOOT_DENOM
            k = next((i for i, c in enumerate(cdf) if u < c), len(cdf))
            sums[row.l_returnflag][r] += k * xd
            cnts[row.l_returnflag][r] += k
    want = {}
    for flag in sums:
        means = sorted(
            (round(float(sums[flag][r]) / cnts[flag][r], 6), r)
            for r in range(BOOT_B)
        )
        boot_mean = round(
            float(sum(Decimal(str(m)).quantize(Decimal("0.000001")) for m, _ in means))
            / BOOT_B,
            6,
        )
        want[flag] = (nrows[flag], boot_mean, means[1][0], means[BOOT_B - 2][0])

    got = Q["stats_bootstrap_ci"](spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        wn, wm, wlo, whi = want[r.l_returnflag]
        assert (r.n_rows, r.boot_mean, r.ci_lo, r.ci_hi) == (wn, wm, wlo, whi)
        # sanity: the plain mean sits inside the band
        plain = sum(
            float(x.l_extendedprice) for x in li if x.l_returnflag == r.l_returnflag
        ) / wn
        assert r.ci_lo <= plain <= r.ci_hi


def test_sequence_gaps_invariants_and_replay(spark):
    """Islands arithmetic: n_missing == 0 iff n_islands == 1 for
    every user, totals partition the table, and a pandas replay of
    the id-minus-rownumber device matches exactly."""
    from pitlapetl_spark.sources import load_table

    rows = Q["dq_sequence_gaps"](spark, SF_SMOKE).collect()
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id")
        .toPandas()
    )
    assert sum(r.n_events for r in rows) == len(ev)
    byu = {u: sorted(g["event_id"]) for u, g in ev.groupby("user_id")}
    for r in rows:
        ids = byu[r.user_id]
        islands = 1 + sum(1 for a, b in zip(ids, ids[1:]) if b != a + 1)
        missing = ids[-1] - ids[0] + 1 - len(ids)
        assert (r.n_events, r.n_islands, r.n_missing) == (
            len(ids), islands, missing
        ), r.user_id
        assert (r.n_missing == 0) == (r.n_islands == 1)


def test_mahalanobis_matches_numpy_replay(spark):
    """Independent numpy replay: per-group mean/covariance and the
    closed-form 2x2-inverse distance recomputed from raw rows must
    reproduce the query's top-k (and every d2 is non-negative —
    covariance matrices are PSD)."""
    import numpy as np

    from pitlapetl_spark.operators.stats import MAHA_TOP
    from pitlapetl_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "l_extendedprice",
        )
        .toPandas()
    )
    scored = []
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(float)
        y = g["l_extendedprice"].to_numpy(float)
        mx, my = x.mean(), y.mean()
        vxx, vxy, vyy = (
            ((x - mx) ** 2).mean(),
            ((x - mx) * (y - my)).mean(),
            ((y - my) ** 2).mean(),
        )
        det = vxx * vyy - vxy * vxy
        d2 = ((x - mx) ** 2 * vyy - 2 * (x - mx) * (y - my) * vxy
              + (y - my) ** 2 * vxx) / det
        scored += list(
            zip(g["l_orderkey"], g["l_linenumber"], np.round(d2, 6))
        )
    want = sorted(scored, key=lambda t: (-t[2], t[0], t[1]))[:MAHA_TOP]
    got = Q["anomaly_mahalanobis_2d"](spark, SF_SMOKE).collect()
    assert [(r.l_orderkey, r.l_linenumber) for r in got] == [
        (o, l) for o, l, _ in want
    ]
    for r, (_, _, wd2) in zip(got, want):
        assert r.d2 >= 0
        assert abs(r.d2 - wd2) < 1e-4  # numpy means vs decimal-exact sums


def test_bitmap_distinct_bitmaps_are_batching_invariant(spark):
    """The mergeability claim, property-checked: folding the events in
    2 arbitrary batches vs 4 via bit_or word-merges yields identical
    word bitmaps — and their popcount equals the true distinct count
    (exactness; the incremental-MV batching-invariance discipline
    applied to bitmap state)."""
    import pyspark.sql.functions as F

    from pitlapetl_spark.operators.breadth import BITMAP_WORD_BITS
    from pitlapetl_spark.sources import load_table

    e = load_table(spark, SF_SMOKE, "events").select("user_id")

    def bitmap(df):
        return {
            r.word: r.bits
            for r in df.select(
                (F.col("user_id") / BITMAP_WORD_BITS).cast("long").alias("word"),
                F.expr(
                    f"shiftleft(1L, int(user_id % {BITMAP_WORD_BITS}))"
                ).alias("mask"),
            )
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits"))
            .collect()
        }

    def merge(maps):
        out = {}
        for m in maps:
            for w, b in m.items():
                out[w] = out.get(w, 0) | b
        return out

    two = merge([bitmap(e.filter(F.col("user_id") % 2 == i)) for i in range(2)])
    four = merge([bitmap(e.filter(F.col("user_id") % 4 == i)) for i in range(4)])
    assert two == four
    truth = e.distinct().count()
    assert sum(bin(b & ((1 << 62) - 1)).count("1") for b in two.values()) == truth


def test_adamic_adar_matches_bruteforce_replay(spark):
    """Pure-Python replay: enumerate ALL part pairs sharing a
    customer (within the degree band) at smoke scale, score them
    1/ln(deg), and check the query's top-k is exactly the replay's
    top-k under the same (score desc, part_a, part_b) tie-break."""
    import itertools
    from collections import defaultdict

    from pitlapetl_spark.operators.linkpred import (
        AA_DEG_CAP, AA_DEG_MIN, AA_TOP_K,
    )
    from pitlapetl_spark.sources import load_table

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    cp = {
        (r.o_custkey, r.l_partkey)
        for r in o.join(l, o.o_orderkey == l.l_orderkey).collect()
    }
    parts_by_cust = defaultdict(set)
    for c, p in cp:
        parts_by_cust[c].add(p)
    scores = defaultdict(float)
    common = defaultdict(int)
    for c, ps in parts_by_cust.items():
        d = len(ps)
        if not (AA_DEG_MIN <= d <= AA_DEG_CAP):
            continue
        w = round(1.0 / math.log(d), 12)
        for a, b in itertools.combinations(sorted(ps), 2):
            scores[(a, b)] += w
            common[(a, b)] += 1
    expect = sorted(
        ((round(s, 6), k) for k, s in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )[:AA_TOP_K]
    got = Q["graph_adamic_adar"](spark, SF_SMOKE).collect()
    assert len(got) == AA_TOP_K
    for r, (s, (a, b)) in zip(got, expect):
        assert (r.part_a, r.part_b) == (a, b)
        assert abs(r.aa_score - s) < 1e-6
        assert r.n_common == common[(a, b)]


def test_twap_matches_python_replay_and_bounds(spark):
    """Replay the holding-time weighting per user from raw events;
    TWAP and the plain mean must match, and TWAP must sit inside
    [min, max] of the user's non-final values (it is a convex
    combination of them)."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    byu = defaultdict(list)
    for r in ev:
        byu[r.user_id].append(r)
    got = {r.user_id: r for r in Q["window_twap_value"](spark, SF_SMOKE).collect()}
    checked = 0
    for u, rows in byu.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        if len(rows) < 2:
            assert u not in got
            continue
        num = den = 0
        vals = []
        for a, b in zip(rows, rows[1:]):
            dt = int((b.ts - a.ts).total_seconds() * 1_000_000)
            num += round(a.value, 8) * dt
            den += dt
            vals.append(round(a.value, 8))
        r = got[u]
        assert r.n_intervals == len(rows) - 1
        if den == 0:
            assert r.twap is None
        else:
            assert abs(r.twap - num / den) < 1e-5
            assert min(vals) - 1e-9 <= r.twap <= max(vals) + 1e-9
        assert abs(r.mean_value - sum(vals) / len(vals)) < 1e-6
        checked += 1
    assert checked > 0 and len(got) == checked


def test_cusum_changepoint_matches_python_replay(spark):
    """Replay the daily-mean CUSUM per event_type in pure Python
    (same roundings) and check the argmax day and peak |CUSUM|."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"), "value")
        .collect()
    )
    sums = defaultdict(lambda: defaultdict(list))
    for r in ev:
        sums[r.event_type][r.day].append(round(r.value, 8))
    got = {
        r.event_type: r
        for r in Q["anomaly_cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(sums)
    for et, days in sums.items():
        m = {d: round(sum(vs) / len(vs), 8) for d, vs in days.items()}
        mu = round(sum(m.values()) / len(m), 8)
        best_day, best_abs, cs = None, -1.0, 0.0
        for d in sorted(m):
            cs += m[d] - mu
            if abs(cs) > best_abs + 1e-12:
                best_day, best_abs = d, abs(cs)
        r = got[et]
        assert r.n_days == len(m)
        assert r.changepoint_day == best_day, et
        assert abs(r.max_abs_cusum - best_abs) < 1e-5


def test_benford_fracs_partition_and_law_sums_to_one(spark):
    """Digits are 1..9; observed fractions sum to 1; the Benford
    expected fractions sum to 1 (telescoping product — the law's own
    sanity identity); counts partition the positive-price orders;
    chi-square terms are non-negative."""
    from pitlapetl_spark.sources import load_table

    rows = Q["dq_benford_digits"](spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_frac for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.expected_frac for r in rows) - 1.0) < 1e-5
    n_pos = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.round(F.col("o_totalprice") * 100, 0) > 0)
        .count()
    )
    assert sum(r.n for r in rows) == n_pos
    assert all(r.chi2_term >= 0 for r in rows)


def test_entropy_profile_bounds_and_replay(spark):
    """0 <= H <= log2(k) for every column (norm in [0,1]); exact
    pure-Python replay of one column (events.event_type)."""
    from collections import Counter

    from pitlapetl_spark.sources import load_table

    rows = Q["dq_entropy_profile"](spark, SF_SMOKE).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.entropy_bits >= 0
        if r.norm_entropy is not None:
            assert -1e-9 <= r.norm_entropy <= 1 + 1e-9
        assert r.entropy_bits <= math.log2(max(r.n_distinct, 2)) + 1e-6
    ev = Counter(
        r.event_type
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type")
        .collect()
    )
    n = sum(ev.values())
    h = -sum(round((c / n) * math.log2(c / n), 12) for c in ev.values())
    got = next(r for r in rows if r.column_name == "event_type")
    assert got.n_distinct == len(ev)
    assert abs(got.entropy_bits - h) < 1e-6


def test_kaplan_meier_matches_python_replay(spark):
    """Replay the KM estimator from raw orders: bucketed lifetimes,
    censoring flags, reverse-cumulative risk sets, and the survival
    product. Survival must be non-increasing and start <= 1; n_risk
    must be strictly decreasing in t."""
    from collections import Counter

    from pitlapetl_spark.operators.analytics import (
        KM_BUCKET_DAYS, KM_CENSOR_DAYS,
    )
    from pitlapetl_spark.sources import load_table

    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    first, last = {}, {}
    for r in o:
        d = r.o_orderdate
        first[r.o_custkey] = min(first.get(r.o_custkey, d), d)
        last[r.o_custkey] = max(last.get(r.o_custkey, d), d)
    mxd = max(last.values())
    d_cnt, n_cnt = Counter(), Counter()
    for c in first:
        t = int((last[c] - first[c]).days // KM_BUCKET_DAYS)
        n_cnt[t] += 1
        if (mxd - last[c]).days > KM_CENSOR_DAYS:
            d_cnt[t] += 1
    ts = sorted(n_cnt)
    at_risk, surv, expect = sum(n_cnt.values()), 1.0, {}
    for t in ts:
        if d_cnt[t] >= at_risk:
            surv = 0.0
        else:
            surv *= 1.0 - d_cnt[t] / at_risk
        expect[t] = (at_risk, d_cnt[t], surv)
        at_risk -= n_cnt[t]
    got = sorted(
        Q["survival_kaplan_meier"](spark, SF_SMOKE).collect(),
        key=lambda r: r.duration_months,
    )
    assert [r.duration_months for r in got] == ts
    prev = 1.0 + 1e-12
    prev_risk = None
    for r in got:
        nr, d, s = expect[r.duration_months]
        assert (r.n_risk, r.d_events) == (nr, d)
        assert abs(r.survival - s) < 1e-5
        assert r.survival <= prev
        prev = r.survival
        if prev_risk is not None:
            assert r.n_risk < prev_risk
        prev_risk = r.n_risk


def test_gini_matches_python_replay_and_bounds(spark):
    """Replay the rank identity per nation from raw orders+customer;
    Gini must be in [0, 1)."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rows = o.join(c, o.o_custkey == c.c_custkey).collect()
    spend = defaultdict(lambda: defaultdict(float))
    for r in rows:
        spend[r.c_nationkey][r.o_custkey] += round(r.o_totalprice, 2)
    got = {r.nationkey: r for r in Q["analytics_gini_spend"](spark, SF_SMOKE).collect()}
    assert set(got) == set(spend)
    for nk, by_c in spend.items():
        xs = sorted(round(v, 2) for v in by_c.values())
        n, tot = len(xs), sum(xs)
        g = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1.0
        ) / n
        r = got[nk]
        assert r.n_cust == n
        assert abs(r.gini - g) < 1e-6
        assert 0.0 <= r.gini < 1.0


def test_chi2_independence_marginals_and_replay(spark):
    """Cells partition the table; expected counts reproduce the
    marginal product; chi-square terms match a pandas-crosstab
    replay."""
    from collections import Counter

    from pitlapetl_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .collect()
    )
    obs = Counter((r.l_returnflag, r.l_linestatus) for r in li)
    rown = Counter(r.l_returnflag for r in li)
    coln = Counter(r.l_linestatus for r in li)
    n = len(li)
    rows = Q["stats_chi2_independence"](spark, SF_SMOKE).collect()
    assert sum(r.observed for r in rows) == n
    assert len(rows) == len(obs)
    for r in rows:
        e = rown[r.returnflag] * coln[r.linestatus] / n
        assert r.observed == obs[(r.returnflag, r.linestatus)]
        assert abs(r.expected - e) < 1e-4
        assert abs(r.chi2_term - (r.observed - e) ** 2 / e) < 1e-3
        assert r.chi2_term >= 0


def test_quantile_normalize_target_identity_and_balance(spark):
    """The cross-type target is the n-weighted mean of the per-type
    bucket means (mass conservation of the fit); per type, ntile
    bucket sizes differ by at most 1 and cover all buckets."""
    from collections import defaultdict

    from pitlapetl_spark.operators.stats import QN_BUCKETS

    rows = Q["stats_quantile_normalize"](spark, SF_SMOKE).collect()
    by_bucket = defaultdict(list)
    by_type = defaultdict(list)
    for r in rows:
        by_bucket[r.bucket].append(r)
        by_type[r.event_type].append(r)
        assert abs(r.shift - round(r.target_value - r.raw_mean, 6)) < 1e-9
    for b, rs in by_bucket.items():
        tot_n = sum(r.n for r in rs)
        weighted = sum(r.n * r.raw_mean for r in rs) / tot_n
        assert abs(rs[0].target_value - weighted) < 1e-4, b
        assert all(r.target_value == rs[0].target_value for r in rs)
    for t, rs in by_type.items():
        assert sorted(r.bucket for r in rs) == list(range(1, QN_BUCKETS + 1))
        sizes = [r.n for r in rs]
        assert max(sizes) - min(sizes) <= 1, t


def test_naive_bayes_confusion_partitions_and_replay(spark):
    """The confusion matrix partitions the test split exactly; fracs
    sum to 1 per true class; and a pure-Python multinomial-NB replay
    (same smoothing, same split, same tie-break) reproduces every
    prediction."""
    from collections import Counter, defaultdict

    from pitlapetl_spark.operators.nbayes import NB_TEST_MOD
    from pitlapetl_spark.functions.text import tokens
    from pitlapetl_spark.sources import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
        .collect()
    )
    train = [r for r in docs if r.doc_id % NB_TEST_MOD != 0]
    test = [r for r in docs if r.doc_id % NB_TEST_MOD == 0]
    counts = defaultdict(Counter)
    prior_n = Counter()
    for r in train:
        prior_n[r.lang] += 1
        counts[r.lang].update(r.toks)
    vocab = {w for c in counts.values() for w in c}
    v = len(vocab)
    langs = sorted(prior_n)
    n_train = len(train)
    ntok = {lg: sum(counts[lg].values()) for lg in langs}
    confusion = Counter()
    for r in test:
        feats = Counter(w for w in r.toks if w in vocab)
        best = None
        for lg in langs:
            s = round(math.log(prior_n[lg] / n_train), 12)
            for w, cnt in feats.items():
                s += cnt * round(
                    math.log((counts[lg][w] + 1.0) / (ntok[lg] + v)), 12
                )
            # tie-break lang asc == first lang wins at strict-greater
            if best is None or s > best[0] + 1e-12:
                best = (s, lg)
        confusion[(r.lang, best[1])] += 1
    rows = Q["ml_naive_bayes_langid"](spark, SF_SMOKE).collect()
    assert sum(r.n for r in rows) == len(test)
    per_true = defaultdict(float)
    for r in rows:
        assert confusion[(r.true_lang, r.pred_lang)] == r.n, (
            r.true_lang, r.pred_lang,
        )
        per_true[r.true_lang] += r.frac
    for t, f in per_true.items():
        assert abs(f - 1.0) < 1e-4, t


def test_flesch_replay_one_slice(spark):
    """Recompute the Flesch pipeline for one (lang, source) slice with
    Python re and exact arithmetic."""
    import re
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "source", "text")
        .collect()
    )
    agg = defaultdict(list)
    for r in docs:
        lo = r.text.lower()
        words = len(re.findall("[a-z]+", lo))
        if words == 0:
            continue
        sents = max(len(re.findall("[.!?]", r.text)), 1)
        sylls = len(re.findall("[aeiouy]+", lo))
        agg[(r.lang, r.source)].append(
            round(206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words), 8)
        )
    got = {
        (r.lang, r.source): r
        for r in Q["text_readability_flesch"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(agg)
    for k, fs in agg.items():
        r = got[k]
        assert r.n_docs == len(fs)
        assert abs(r.avg_flesch - sum(fs) / len(fs)) < 1e-5
        assert abs(
            r.frac_readable - sum(1 for f in fs if f >= 60.0) / len(fs)
        ) < 1e-6


def test_funnel_lag_replay(spark):
    """Replay first-view -> first-subsequent-purchase lags per user;
    counts and the interpolated median must match (numpy 'linear'
    percentile == quantile_cont == Spark percentile)."""
    from collections import defaultdict

    import numpy as np

    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    views, purchases = {}, defaultdict(list)
    for r in ev:
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.ts), r.ts)
        elif r.event_type == "purchase":
            purchases[r.user_id].append(r.ts)
    lags = []
    for u, tv in views.items():
        after = [t for t in purchases.get(u, []) if t > tv]
        if after:
            lags.append((min(after) - tv).total_seconds())
    row = Q["funnel_conversion_lag"](spark, SF_SMOKE).collect()[0]
    assert row.n_viewers == len(views)
    assert row.n_converted == len(lags)
    assert abs(row.conversion_rate - len(lags) / len(views)) < 1e-6
    for q, col in ((25, "lag_p25_s"), (50, "lag_p50_s"), (90, "lag_p90_s")):
        assert abs(getattr(row, col) - float(np.percentile(lags, q))) < 1e-4


def test_weighted_median_replay_and_defining_property(spark):
    """Replay the lower weighted median per flag; verify the defining
    property directly: weight at-or-below the median is >= half the
    total, and strictly-below is < half."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(
            (r.l_extendedprice, round(r.l_quantity, 2))
        )
    got = {r.returnflag: r for r in Q["agg_weighted_median"](spark, SF_SMOKE).collect()}
    assert set(got) == set(groups)
    for flag, rows in groups.items():
        rows.sort()
        tot = sum(w for _, w in rows)
        cum, wm = 0.0, None
        for p, w in rows:
            cum += w
            if cum * 2 >= tot:
                wm = p
                break
        r = got[flag]
        assert abs(r.weighted_median - round(wm, 2)) < 1e-9
        assert abs(r.total_weight - round(tot, 2)) < 1e-6
        at_or_below = sum(w for p, w in rows if p <= wm)
        below = sum(w for p, w in rows if p < wm)
        assert at_or_below * 2 >= tot - 1e-9
        assert below * 2 < tot + 1e-9


def test_mad_robust_z_replay(spark):
    """Recompute per-type median and MAD with numpy and verify every
    returned robust z; the returned set must be the global top-k by
    |rounded z| with event_id tie-break."""
    from collections import defaultdict

    import numpy as np

    from pitlapetl_spark.operators.stats import MAD_K, MAD_TOP
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "event_type", "value")
        .collect()
    )
    byt = defaultdict(list)
    for r in ev:
        byt[r.event_type].append(r)
    med = {t: round(float(np.percentile([r.value for r in rs], 50)), 8) for t, rs in byt.items()}
    mad = {
        t: round(
            float(np.percentile([abs(r.value - med[t]) for r in rs], 50)), 8
        )
        for t, rs in byt.items()
    }
    scored = sorted(
        (
            (-abs(round(MAD_K * (r.value - med[r.event_type]) / mad[r.event_type], 6)), r.event_id)
            for r in ev
            if mad[r.event_type] != 0
        ),
    )[:MAD_TOP]
    got = Q["anomaly_mad_robust_zscore"](spark, SF_SMOKE).collect()
    assert len(got) == MAD_TOP
    assert [(-abs(r.robust_z), r.event_id) for r in got] == [
        (s, i) for s, i in scored
    ]


def test_interpolation_gaps_and_replay(spark):
    """Per series: observed days keep their exact daily mean, the
    spine is contiguous, endpoints are observed, and every
    interpolated value lies between its two neighbors (convexity) and
    matches a pure-Python linear replay."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id", "event_type",
            F.date_trunc("day", "ts").alias("dy"), "value",
        )
        .collect()
    )
    series = defaultdict(lambda: defaultdict(list))
    for r in ev:
        series[(r.user_id, r.event_type)][r.dy].append(round(r.value, 8))
    rows = Q["window_interpolate_linear"](spark, SF_SMOKE).collect()
    by_series = defaultdict(list)
    for r in rows:
        by_series[(r.user_id, r.event_type)].append(r)
    assert set(by_series) == set(series)
    n_gaps = 0
    for key, rs in by_series.items():
        rs.sort(key=lambda r: r.day)
        obs = {d: round(sum(vs) / len(vs), 8) for d, vs in series[key].items()}
        days = [r.day for r in rs]
        assert days[0] == min(obs) and days[-1] == max(obs)
        assert (days[-1] - days[0]).days + 1 == len(days)  # contiguous
        assert rs[0].is_observed and rs[-1].is_observed
        known = sorted(obs)
        for r in rs:
            if r.is_observed:
                assert abs(r.value - obs[r.day]) < 1e-6
            else:
                n_gaps += 1
                prev = max(d for d in known if d < r.day)
                nxt = min(d for d in known if d > r.day)
                frac = (r.day - prev).days / (nxt - prev).days
                want = obs[prev] + (obs[nxt] - obs[prev]) * frac
                assert abs(r.value - want) < 1e-5
                lo, hi = sorted((obs[prev], obs[nxt]))
                assert lo - 1e-6 <= r.value <= hi + 1e-6
    assert n_gaps > 0  # the corpus actually exercises interpolation


def test_mann_whitney_matches_scipy_free_replay(spark):
    """Replay U and the tie-corrected z in pure Python from raw
    values (midrank method), and check U against the direct
    pair-counting definition on a subsample-free exact count."""
    from collections import Counter

    from pitlapetl_spark.operators.stats import MW_A, MW_B
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin(MW_A, MW_B))
        .select("event_type", "value")
        .collect()
    )
    xs = sorted(r.value for r in ev)
    ranks = {}
    i = 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j] == xs[i]:
            j += 1
        ranks[xs[i]] = (i + 1 + j) / 2  # midrank, 1-based
        i = j
    a = [r.value for r in ev if r.event_type == MW_A]
    b = [r.value for r in ev if r.event_type == MW_B]
    n1, n2 = len(a), len(b)
    r1 = sum(ranks[v] for v in a)
    u1 = r1 - n1 * (n1 + 1) / 2
    tie = sum(c**3 - c for c in Counter(xs).values())
    n = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2) / sigma
    row = Q["stats_mann_whitney"](spark, SF_SMOKE).collect()[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.u1 - u1) < 1e-6
    assert abs(row.z - z) < 1e-5
    # direct definition: U1 = #(a>b pairs) + 0.5*#(ties)
    gt = sum(1 for va in a for vb in b if va > vb)
    eq = sum(1 for va in a for vb in b if va == vb)
    assert abs(u1 - (gt + 0.5 * eq)) < 1e-9


def test_ks_two_sample_matches_ecdf_replay(spark):
    """Replay both ECDFs in Python; the reported statistic must be
    the exact max gap and its location the smallest maximizing x."""
    from pitlapetl_spark.operators.stats import KS_A, KS_B
    from pitlapetl_spark.sources import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("lang").isin(KS_A, KS_B))
        .select("lang", "n_chars")
        .collect()
    )
    a = sorted(r.n_chars for r in docs if r.lang == KS_A)
    b = sorted(r.n_chars for r in docs if r.lang == KS_B)
    n1, n2 = len(a), len(b)
    support = sorted(set(a) | set(b))
    best = (-1, None)
    for x in support:
        c1 = sum(1 for v in a if v <= x)
        c2 = sum(1 for v in b if v <= x)
        gap = abs(c1 * n2 - c2 * n1)
        if gap > best[0]:
            best = (gap, x)
    row = Q["stats_ks_two_sample"](spark, SF_SMOKE).collect()[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.ks_at == best[1]
    assert abs(row.ks_stat - best[0] / (n1 * n2)) < 1e-6
    assert abs(
        row.ks_scaled - math.sqrt(n1 * n2 / (n1 + n2)) * best[0] / (n1 * n2)
    ) < 1e-5


def test_xcorr_daily_replay_and_lag_zero_bounds(spark):
    """Replay every lag's Pearson correlation from the daily count
    series; n_days shrinks by exactly one per unit lag on a contiguous
    daily series; all correlations lie in [-1, 1]."""
    from collections import Counter

    from pitlapetl_spark.operators.stats import XCORR_MAX_LAG
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.date_trunc("day", "ts").alias("dy"), "event_type")
        .collect()
    )
    x = Counter(r.dy for r in ev if r.event_type == "view")
    y = Counter(r.dy for r in ev if r.event_type == "purchase")
    days = sorted(set(r.dy for r in ev))
    rows = {r.lag_days: r for r in Q["stats_xcorr_daily"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(XCORR_MAX_LAG + 1))
    import datetime

    for l, r in rows.items():
        pairs = [
            (x.get(d, 0), y.get(d + datetime.timedelta(days=l), 0))
            for d in days
            if d + datetime.timedelta(days=l) in set(days)
        ]
        n = len(pairs)
        assert r.n_days == n
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        want = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert abs(r.xcorr - want) < 1e-6
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9


def test_seasonal_decompose_identity_and_replay(spark):
    """value == trend + seasonal + residual exactly on every interior
    day (additive identity, up to output rounding); edge days carry
    NULL trend and residual; a pure-Python replay reproduces trend and
    the per-dow seasonal."""
    from collections import defaultdict

    from pitlapetl_spark.operators.stats import STL_HALF
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "value")
        .collect()
    )
    by_day = defaultdict(list)
    for r in ev:
        by_day[r.day].append(round(r.value, 8))
    days = sorted(by_day)
    v = {d: round(sum(vs) / len(vs), 8) for d, vs in by_day.items()}
    width = 2 * STL_HALF + 1
    trend = {}
    for i, d in enumerate(days):
        if STL_HALF <= i < len(days) - STL_HALF:
            win = days[i - STL_HALF : i + STL_HALF + 1]
            trend[d] = round(sum(v[x] for x in win) / width, 8)
    det = defaultdict(list)
    for d, tr in trend.items():
        det[d.isoweekday()].append(v[d] - tr)
    seasonal = {k: round(sum(xs) / len(xs), 8) for k, xs in det.items()}
    rows = Q["ts_seasonal_decompose"](spark, SF_SMOKE).collect()
    assert len(rows) == len(days)
    for r in rows:
        assert r.dow == r.day.isoweekday()
        assert abs(r.value - v[r.day]) < 1e-6
        if r.day in trend:
            assert abs(r.trend - trend[r.day]) < 1e-6
            assert abs(r.seasonal - seasonal[r.dow]) < 1e-6
            assert abs(
                r.residual - (v[r.day] - trend[r.day] - seasonal[r.dow])
            ) < 1e-5
            # additive identity on the query's own rounded outputs
            assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 5e-6
        else:
            assert r.trend is None and r.residual is None


def test_anomaly_triage_ranked_queue_replay(spark):
    """Per type: exactly TRIAGE_TOP rows, ranked by |robust_z| desc
    (day asc on ties), is_alarm consistent with the threshold, and a
    pure-Python replay of the full compose (daily means -> MA trend
    -> residual -> med/MAD -> score) reproduces the queue."""
    from collections import defaultdict

    import numpy as np

    from pitlapetl_spark.operators.stats import (
        MAD_K, STL_HALF, TRIAGE_TOP, TRIAGE_Z,
    )
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"), "value")
        .collect()
    )
    by = defaultdict(lambda: defaultdict(list))
    for r in ev:
        by[r.event_type][r.day].append(round(r.value, 8))
    width = 2 * STL_HALF + 1
    expect = {}
    for et, dd in by.items():
        days = sorted(dd)
        v = {d: round(sum(xs) / len(xs), 8) for d, xs in dd.items()}
        resid = {}
        for i, d in enumerate(days):
            if STL_HALF <= i < len(days) - STL_HALF:
                tr = round(
                    sum(v[x] for x in days[i - STL_HALF : i + STL_HALF + 1])
                    / width,
                    8,
                )
                resid[d] = v[d] - tr
        med = round(float(np.percentile(list(resid.values()), 50)), 8)
        mad = round(
            float(np.percentile([abs(x - med) for x in resid.values()], 50)), 8
        )
        if mad == 0:
            continue
        scored = sorted(
            ((-abs(round(MAD_K * (x - med) / mad, 6)), d) for d, x in resid.items()),
        )[:TRIAGE_TOP]
        expect[et] = scored
    rows = Q["pipeline_anomaly_triage"](spark, SF_SMOKE).collect()
    got = defaultdict(list)
    for r in rows:
        got[r.event_type].append(r)
        assert r.is_alarm == (abs(r.robust_z) > TRIAGE_Z)
    assert set(got) == set(expect)
    for et, rs in got.items():
        assert len(rs) == TRIAGE_TOP
        zs = [abs(r.robust_z) for r in rs]
        assert zs == sorted(zs, reverse=True)
        assert [( -abs(r.robust_z), r.day) for r in rs] == expect[et]


def test_functional_dependency_replay(spark):
    """Pandas replay of every declared FD candidate; the hard
    order-grain FDs must hold, and violation counts must match."""
    from pitlapetl_spark.operators.quality import _FD_CANDIDATES
    from pitlapetl_spark.sources import load_table

    got = {
        (r.table_name, r.determinant, r.dependent): r
        for r in Q["dq_functional_dependency"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(_FD_CANDIDATES)
    for table, det, dep in _FD_CANDIDATES:
        pdf = load_table(spark, SF_SMOKE, table).select(det, dep).toPandas()
        pdf = pdf[pdf[det].notna()]
        nv = pdf.groupby(det)[dep].nunique()
        r = got[(table, det, dep)]
        assert r.n_keys == len(nv)
        assert r.n_violating_keys == int((nv > 1).sum())
        assert r.holds == bool((nv == 1).all())
        assert abs(r.violation_rate - (nv > 1).mean()) < 1e-6
    # the order-grain contracts hold by construction
    assert got[("orders", "o_orderkey", "o_custkey")].holds
    assert got[("orders", "o_orderkey", "o_orderstatus")].holds


def test_time_decay_attribution_conserves_value_and_replay(spark):
    """Credit conservation: total credited value equals the sum of
    purchase values that HAVE at least one in-window touch (each such
    purchase distributes exactly its own value); shares sum to 1; a
    pure-Python replay reproduces per-type credit."""
    from collections import defaultdict

    from pitlapetl_spark.operators.funnel import TD_TAU_S, TD_WINDOW_S
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "event_id", "ts", "value")
        .collect()
    )
    touches = defaultdict(list)
    for r in ev:
        if r.event_type in ("view", "click"):
            touches[r.user_id].append((r.ts, r.event_type))
    per_type = defaultdict(float)
    n_type = defaultdict(int)
    attributed_total = 0.0
    for r in ev:
        if r.event_type != "purchase":
            continue
        cand = [
            (t, ty)
            for t, ty in touches[r.user_id]
            if t < r.ts and (r.ts - t).total_seconds() <= TD_WINDOW_S
        ]
        if not cand:
            continue
        v = round(r.value, 2)
        attributed_total += v
        ws = [
            (round(math.exp(-((r.ts - t).total_seconds()) / TD_TAU_S), 12), ty)
            for t, ty in cand
        ]
        sw = sum(w for w, _ in ws)
        for w, ty in ws:
            per_type[ty] += round(v * (w / sw), 8)
            n_type[ty] += 1
    rows = Q["attribution_time_decay"](spark, SF_SMOKE).collect()
    assert {r.touch_type for r in rows} == set(per_type)
    got_total = sum(r.credited_value for r in rows)
    assert abs(got_total - attributed_total) < 0.1
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_touches == n_type[r.touch_type]
        assert abs(r.credited_value - per_type[r.touch_type]) < 0.05


def test_negative_sampling_replay_and_exclusions(spark):
    """Python md5 replay of every draw; no negative equals its anchor;
    no negative shares the anchor's label; dropped slots are exactly
    the same-label candidates."""
    import hashlib

    from pitlapetl_spark.operators.training_prep import NEG_K, NEG_SEED
    from pitlapetl_spark.sources import load_table

    emb = {
        r.vec_id: r.label
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    n = len(emb)
    expect = {}
    for a, al in emb.items():
        for j in range(NEG_K):
            h = hashlib.md5(f"{NEG_SEED}:{a}:{j}".encode()).hexdigest()
            raw = int(h[:15], 16) % n
            neg = (raw + 1) % n if raw == a else raw
            if emb[neg] != al:
                expect[(a, j)] = (neg, emb[neg])
    rows = Q["training_negative_sampling"](spark, SF_SMOKE).collect()
    got = {(r.anchor_id, r.slot): (r.neg_id, r.neg_label) for r in rows}
    assert got == expect
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert r.neg_label != r.anchor_label
    assert len(expect) > 0.5 * n * NEG_K  # most draws survive the filter


def test_psi_drift_partitions_and_replay(spark):
    """Bin counts partition both halves; the reference half is split
    into near-equal deciles by its own cuts (the binning is fit on
    ref); each psi_term matches a numpy replay."""
    import numpy as np

    from pitlapetl_spark.operators.stats import PSI_BINS, PSI_EPS
    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select("ts", "value")
        .collect()
    )
    us = [int(r.ts.timestamp() * 1e6) for r in ev]
    mm = min(us) + max(us)
    ref = [r.value for r, u in zip(ev, us) if 2 * u < mm]
    cur = [r.value for r, u in zip(ev, us) if 2 * u >= mm]
    cuts = [
        round(float(np.percentile(ref, 100 * i / PSI_BINS)), 8)
        for i in range(1, PSI_BINS)
    ]

    def bin_of(v):
        return 1 + sum(1 for c in cuts if v > c)

    nr = {b: 0 for b in range(1, PSI_BINS + 1)}
    nc = {b: 0 for b in range(1, PSI_BINS + 1)}
    for v in ref:
        nr[bin_of(v)] += 1
    for v in cur:
        nc[bin_of(v)] += 1
    rows = {r.bin: r for r in Q["stats_psi_drift"](spark, SF_SMOKE).collect()}
    assert sum(r.n_ref for r in rows.values()) == len(ref)
    assert sum(r.n_cur for r in rows.values()) == len(cur)
    for b, r in rows.items():
        assert (r.n_ref, r.n_cur) == (nr[b], nc[b]), b
        p = nc[b] / len(cur) + PSI_EPS
        q = nr[b] / len(ref) + PSI_EPS
        assert abs(r.psi_term - (p - q) * math.log(p / q)) < 1e-6
        # ref deciles are near-equal by construction (ties may skew)
        assert abs(r.n_ref - len(ref) / PSI_BINS) <= max(3, len(ref) * 0.05)


def test_heaps_fit_monotone_growth_and_replay(spark):
    """Vocabulary growth replayed in Python: cumulative token and
    first-occurrence counts match, beta is in (0, 1] for any corpus
    where vocabulary still grows, and the totals equal the corpus-wide
    token/vocab counts."""
    from pitlapetl_spark.functions.text import tokens
    from pitlapetl_spark.sources import load_table

    docs = sorted(
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .collect(),
        key=lambda r: r.doc_id,
    )
    seen, pts, n = set(), [], 0
    for r in docs:
        n += len(r.toks)
        seen.update(r.toks)
        pts.append((n, len(seen)))
    row = Q["text_heaps_law_fit"](spark, SF_SMOKE).collect()[0]
    assert row.total_tokens == n
    assert row.total_vocab == len(seen)
    assert row.n_points == sum(1 for a, b in pts if a > 0 and b > 0)
    xs = [math.log(a) for a, b in pts if a > 0 and b > 0]
    ys = [math.log(b) for a, b in pts if a > 0 and b > 0]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert abs(row.beta - beta) < 1e-4
    assert 0 < row.beta <= 1.0
    assert 0.0 <= row.r2 <= 1.0


def test_spearman_matches_scipy_free_replay(spark):
    """Midrank replay in pure Python; rho in [-1, 1]; and on this
    positively-coupled pair (views drive purchases at lag 0) rho
    should agree in sign with the raw Pearson of the same series."""
    from collections import Counter, defaultdict

    from pitlapetl_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.date_trunc("day", "ts").alias("dy"), "event_type")
        .collect()
    )
    x = Counter(r.dy for r in ev if r.event_type == "view")
    y = Counter(r.dy for r in ev if r.event_type == "purchase")
    days = sorted(set(r.dy for r in ev))
    xs = [x.get(d, 0) for d in days]
    ys = [y.get(d, 0) for d in days]

    def midranks(vals):
        order = sorted(vals)
        pos = defaultdict(list)
        for i, v in enumerate(order):
            pos[v].append(i + 1)
        return [sum(pos[v]) / len(pos[v]) for v in vals]

    rx, ry = midranks(xs), midranks(ys)
    n = len(days)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = Q["stats_spearman_rank_corr"](spark, SF_SMOKE).collect()[0]
    assert row.n_days == n
    assert abs(row.spearman_rho - rho) < 1e-5
    assert -1.0 <= row.spearman_rho <= 1.0


def test_pythagorean_means_ordering_and_replay(spark):
    """AM >= GM >= HM per group (the Pythagorean means inequality —
    strict unless all values equal), each mean matching a pure-Python
    replay."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(r.l_quantity)
    got = {r.returnflag: r for r in Q["agg_pythagorean_means"](spark, SF_SMOKE).collect()}
    assert set(got) == set(groups)
    for flag, vs in groups.items():
        r = got[flag]
        am = sum(round(v, 2) for v in vs) / len(vs)
        gm = math.exp(sum(round(math.log(v), 12) for v in vs) / len(vs))
        hm = len(vs) / sum(round(1.0 / v, 12) for v in vs)
        assert r.n == len(vs)
        assert abs(r.mean_arith - am) < 1e-5
        assert abs(r.mean_geom - gm) < 1e-5
        assert abs(r.mean_harm - hm) < 1e-5
        assert r.mean_arith >= r.mean_geom >= r.mean_harm


def test_abc_classification_pareto_invariants(spark):
    """Classes partition the part set; cumulative shares respect the
    80/95 boundaries (A's share <= 80% + one part's share; A+B <=
    95% + one part's share); class revenue ordering A >= B >= C per
    part on average; total shares sum to 1."""
    from pitlapetl_spark.operators.analytics import ABC_A, ABC_B
    from pitlapetl_spark.sources import load_table

    rows = {r.abc: r for r in Q["analytics_abc_classification"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-4
    assert rows["A"].revenue_share <= ABC_A + 0.05
    assert rows["A"].revenue_share + rows["B"].revenue_share <= ABC_B + 0.05
    # per-part average revenue strictly decreases down the classes
    avg = {k: r.revenue / r.n_parts for k, r in rows.items()}
    assert avg["A"] > avg["B"] > avg["C"]


def test_growth_mom_yoy_replay_and_null_edges(spark):
    """First month's MoM and the first 12 months' YoY are NULL;
    every other delta matches a pandas replay."""
    from collections import defaultdict

    from pitlapetl_spark.sources import load_table

    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            F.date_trunc("month", "o_orderdate").alias("m"), "o_totalprice"
        )
        .collect()
    )
    rev = defaultdict(float)
    for r in o:
        rev[r.m] += round(r.o_totalprice, 2)
    months = sorted(rev)
    rows = {r.month: r for r in Q["window_growth_mom_yoy"](spark, SF_SMOKE).collect()}
    assert sorted(rows) == months
    for i, m in enumerate(months):
        r = rows[m]
        assert abs(r.revenue - rev[m]) < 0.02
        if i == 0:
            assert r.mom_pct is None
        else:
            want = (rev[m] / rev[months[i - 1]] - 1) * 100
            assert abs(r.mom_pct - want) < 1e-4
        if i < 12:
            assert r.yoy_pct is None
        else:
            want = (rev[m] / rev[months[i - 12]] - 1) * 100
            assert abs(r.yoy_pct - want) < 1e-4
