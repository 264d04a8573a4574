"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line the driver records as BENCH_r{N}.json:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute) and materialized with
the ``noop`` sink, which forces full computation of every row without
paying serialization-to-driver or disk-write cost — the honest measure
of engine throughput.

Each query is run three times and the MIN is reported (declared as
``"timing": "min_of_3"`` in the JSON): single cold runs conflate
whole-stage-codegen compilation and host load spikes with engine
throughput (observed: the same commit's heaviest query swinging
7.9s -> 13.3s across days purely from machine load; round 3's bench
recorded a phantom 2.1x on an unchanged query, and round-4 idle
re-runs showed sub-second queries bouncing +-50% under co-tenant
load — min_of_2 was not enough insulation). Min-of-N warm timing is
the standard way to measure the steady-state plan cost.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pitlapetl_spark import registry  # noqa: E402
from pitlapetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per heavy operator family —
# scan+filter+agg, wide hash agg, shuffle join, window, nested-doc
# assembly, as-of join, top-k, plus the LLM-pipeline operators
# (dedup / similarity / text). Names missing from the registry
# (not yet built in an early round) are skipped.
HEADLINE = (
    "flagship_top_value_per_user",
    "agg_pricing_summary",
    "job_practice_laps",
    "join_broadcast_lookup",
    "join_left_outer",
    "window_standings_rank",
    "window_rolling_frame",
    "json_doc_assembly",
    "asof_join_last_order",
    "topk_global",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "text_quality_score",
    "stream_session_windows",
    "rollup_hierarchy_day_from_hour",
    "apply_in_pandas_zscore",
    # round 2: training-prep surface
    "contamination_eval_overlap",
    "pack_token_budget",
    # round 2: new heavy families (binned range join, iterative ML)
    "join_range_binned",
    "kmeans_lloyd_clusters",
    # round 3: classic warehouse joins + boilerplate-line dedup +
    # market basket. (round 5: `dedup_winnowing` — the md5 oracle twin —
    # is retired from the headline per VERDICT r4 item 3: it exists so
    # DuckDB can replay the fingerprints and pays an md5-per-position
    # determinism tax that no production pipeline pays. It stays
    # registered + driver-checked; `dedup_winnowing_fast` below is the
    # benched production path, pair-set-pinned to the twin.)
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "text_boilerplate_lines",
    "market_basket_pairs",
    # round 4: xxhash64 winnowing production path,
    # incremental dedup, and two more warehouse
    # classics (Q6 = the pushdown canary, Q18 = aggregate-as-semi-join)
    "dedup_winnowing_fast",
    "dedup_incremental_minhash",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    # round 4 (this session): exact-substring dedup spans (xxhash64
    # production twin), the dual-role snowflake Q7, and the stacked
    # semi/anti Q21 — each a heavy shape not yet represented
    "dedup_repeated_spans_fast",
    "dedup_repeated_spans_apply",
    "q7_volume_shipping",
    "q21_suppliers_kept_waiting",
    "graph_pagerank_copurchase",
    # round 4 (session 3): the TPC-H-completion tranche's two heavy
    # members — Q9 (widest snowflake + fact-fact orderkey join) and
    # Q2 (derived supplier-part relation + groupwise argmin join-back)
    "q9_product_type_profit",
    "q2_min_cost_supplier",
    # round 4 (session 3): the IVF ANN search path and DSIR importance
    # weighting — the two new LLM-pipeline heavyweights
    "sim_topk_ivf_nprobe",
    "dsir_importance_weights",
    # round 5: the composed crawl->shards pipeline (gate + shard +
    # pack in ONE plan — the nightly job a real corpus runs), the
    # Bloom-prefilter incremental exact dedup, and the two new
    # text-family ops (RAG chunker, BPE pair statistics)
    "pipeline_pretrain_to_shards",
    "dedup_bloom_prefilter",
    "text_chunk_sliding_tokens",
    "text_bpe_pair_stats",
    # round 5 session 2: the composed RAG ingestion plan, PMI
    # collocation mining (vocabulary-join family), the single-exchange
    # nearest as-of, and label-propagation communities (the second
    # iterative-graph bench entry next to PageRank)
    "pipeline_rag_chunk_dedup",
    "text_pmi_cooccurrence",
    "asof_join_nearest",
    "graph_label_propagation",
    # round 6: triangle counting (the third iterative/graph bench
    # entry — wedge-join family), hamming-LSH perceptual-hash dedup
    # (multimodal mapInPandas + banding), PQ-ADC ANN (codes-scan
    # search next to IVF), batch-GD logistic regression (multi-scan
    # iterative ML next to kmeans), and the calendar-spine
    # densification (per-key sequence explode + grain join-back)
    "graph_triangle_count",
    "mm_phash_hamming_near_dup",
    "sim_topk_pq_adc",
    "ml_logreg_gradient_descent",
    "window_month_spine_densify",
    # round 6 session 2: Adamic-Adar (the heaviest new shape — the
    # degree-capped common-neighbor self-join) and sparse-scored
    # Naive Bayes (train+score in one plan, the fourth ML entry)
    "graph_adamic_adar",
    "ml_naive_bayes_langid",
    # round 6 session 3: the spatial-join family head (grid-cell
    # cover join) and the fourth iterative-graph member (k-core
    # peeling over the shared co-purchase edge frame)
    "geo_cell_radius_join",
    "graph_kcore_decomposition",
    # round 7: local clustering coefficient (fifth graph member —
    # shares the memoized basket-edge build with triangle counting,
    # so its marginal cost IS the memo story), the windowed funnel
    # (array-resolution family), Kendall tau-b (keyed day-pair
    # concordance join), the gaps-and-islands streak window, the
    # double-rolling-distinct stickiness metric, and the two-period
    # tier-migration matrix (two quantile-cut passes + full outer)
    "graph_clustering_coefficient",
    "funnel_windowed_steps",
    "stats_kendall_tau",
    "window_streak_active_days",
    "window_dau_mau_stickiness",
    "analytics_tier_migration",
    # round 7 session 4: degree assortativity (sixth graph member —
    # two part-grain joins over the SAME memoized basket-edge frame
    # triangle counting builds, so in-process marginal cost is the
    # joins alone), Dunning-LLR collocations (the PMI family's
    # robust-at-low-counts sibling, same explode+marginal-join
    # shape), the Z-order locality diagnostic (one scan + distinct
    # counts over generated Morton keys), and the U-shaped
    # attribution (user-key window + channel fold)
    "graph_degree_assortativity",
    "text_collocation_llr",
    "layout_zorder_locality",
    "attribution_position_based",
    # round 8: the production L-tables LSH (recall path next to the
    # IVF and PQ entries — union-of-bucket-matches candidate shape),
    # the volume-proportional percentile-sketch window, the gated
    # two-pass heavy hitters (sketch + broadcast gate + pruned
    # exact count), the interval->calendar proration explode, the
    # position-postings phrase join, and the three-window capped
    # sessionizer
    # (analytics_revenue_proration stays OFF the headline: the
    # synthetic spans average 28 months, so its explode mass is 28x
    # the fact — a pathological fixture artifact, measured and
    # documented in SCALE.md, that would dominate the headline wall
    # without representing a real workload)
    "sim_topk_lsh_ltables",
    "window_rolling_median_events",
    "agg_heavy_hitters_gated",
    "text_phrase_search",
    "sessionize_capped",
    # round 9: the top-2-centroid SemDeDup (the recall fix's cost is
    # the point — ~4x candidate mass vs single assignment), the
    # pre-aggregated banding LSH (one-shuffle shape next to the
    # join-shaped sibling), the KMV/theta distinct-sum sketch, the
    # sliding-window HLL merge, the partition Merkle fingerprints,
    # the watermark lateness audit, and the store compaction-parity
    # roundtrip (tempdir writes + two compactions — the wall is the
    # store lifecycle, not a scan)
    "dedup_semantic_top2",
    "dedup_minhash_lsh_preagg",
    "agg_theta_sketch_distinct_sum",
    "window_hll_sliding_distinct",
    "dq_partition_merkle_diff",
    "stream_watermark_lateness_audit",
    "stream_phash_compacted_parity",
    # round 10: the semantic ingest stream-vs-batch parity roundtrip
    # (drives the real sink body over 3 micro-batches + two store
    # compactions + the batch SemDeDup twin — the wall is the store
    # lifecycle plus two full dedup passes, the family's heaviest
    # registered query by design)
    "stream_semantic_compacted_parity",
    # round 11: the URL front-door ingest parity roundtrip (the
    # fourth crawl-ingest family member — exact-key dedup, so the
    # wall is the store lifecycle + the batch gate twin, not a
    # candidate join) and the exact-substring span-dedup ingest
    # parity (the fifth member — the streaming Lee-et-al cut; the
    # wall is the gram extraction run 1 + 2 times: per batch and in
    # the batch twin recomputed for the cleaned-corpus comparison)
    "stream_url_gate_compacted_parity",
    "stream_span_dedup_compacted_parity",
    # round 12: the composed crawl-ingest pipeline parity (URL gate
    # -> span cut -> minhash -> semantic chained per micro-batch over
    # 3 batches — the wall is four store lifecycles in sequence; the
    # family's end-to-end composition entry)
    "stream_ingest_pipeline_parity",
)


def _materialize(df) -> int:
    """Force full execution without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    registry.load_all()
    spark = get_spark(
        app_name="pitlapetl_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM / codegen warm-up so the first timed query isn't charged for it
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = registry.all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        timings[name] = _time_query(spark, fn, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "timing": "min_of_3",
        "queries": timings,
        "sf": sf_val,
    }
    # The complete per-query map always lands in BENCH_FULL.json at
    # the repo root (committed per round) — the round-over-round
    # regression triage reads THIS file, never the driver tail.
    Path(_REPO, "BENCH_FULL.json").write_text(json.dumps(result, indent=1))
    print(_driver_line(result))


# --------------------------------------------------------- --verify
# The same-session bimodality (SCALE.md round-9 note: four clean-
# start runs on one host spread 70.5-93.2 s, regressions scattered
# across UNTOUCHED queries) makes any single bench number ±30%
# ambiguous. --verify turns each round's manual triage session into
# an artifact: re-time ONLY the queries whose fresh min-of-3 deviates
# more than VERIFY_TOL from the committed clean-host reference
# (BENCH_CLEAN.json — preserved as its own file so driver runs can't
# clobber it via BENCH_FULL.json), re-run those with min-of-5 (the
# triage protocol), and print one verdict line per query plus a JSON
# summary (BENCH_VERIFY.json). Verdicts:
#   ok          — fresh min within tolerance of the clean reference
#   load        — first pass deviated but the min-of-5 re-run returns
#                 inside tolerance (co-tenant noise, the common case)
#   persistent  — min-of-5 still deviates: data-mass or plan change;
#                 triage by diffing fixture constants (SCALE.md) and
#                 .explain before touching any plan
#   new         — query absent from the clean reference

VERIFY_TOL = 0.20
_VERIFY_RERUNS = 5
_ABS_FLOOR = 0.15  # sub-150ms deltas are scheduler noise, never real

# The session shift is estimated from this PINNED CANARY set only:
# headline queries whose operator code has been untouched since the
# early rounds (scan+agg, broadcast join, window, nested assembly,
# as-of, top-k, warehouse classics). A real regression introduced by
# a recent round — even one in a shared helper — cannot move these,
# so it can no longer inflate the median and excuse itself (ADVICE
# r10: with the shift taken over the whole headline, a regression
# touching >= half the suite normalized itself away). Names must
# stay in HEADLINE and in BENCH_CLEAN.json; missing ones are skipped.
_SHIFT_CANARIES = (
    "flagship_top_value_per_user",
    "agg_pricing_summary",
    "join_broadcast_lookup",
    "window_standings_rank",
    "json_doc_assembly",
    "asof_join_last_order",
    "topk_global",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "market_basket_pairs",
)

# If even the canaries read above this, the session is either under
# pathological co-tenant load or a change broke something the canaries
# share (session config, the harness itself) — the tool cannot tell
# which, so it refuses to normalize (shift falls back to 1.0), flags
# the session unverifiable in the JSON, and every verdict from such a
# run means "re-run on a quiet host", not "regression confirmed".
_SHIFT_BOUND = 1.3


def _time_query(spark, fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _session_shift(
    first: dict[str, float], clean: dict[str, float]
) -> tuple[float, float, bool, int]:
    """Estimate the session shift from the pinned canaries: returns
    (measured_shift, judging_shift, unverifiable, n_canaries).
    measured = median first/clean over _SHIFT_CANARIES present in
    both maps, clamped >= 1 (a fast session never excuses a
    slowdown). judging = measured unless it exceeds _SHIFT_BOUND —
    then normalization is refused (judging = 1.0) and the session is
    flagged unverifiable. Pure so the triage-critical arithmetic is
    unit-testable without a SparkSession (tests/test_bench_verify)."""
    ratios = sorted(
        first[n] / clean[n]
        for n in _SHIFT_CANARIES
        if n in first and clean.get(n)
    )
    measured = max(ratios[len(ratios) // 2] if ratios else 1.0, 1.0)
    unverifiable = measured > _SHIFT_BOUND
    return measured, (1.0 if unverifiable else measured), unverifiable, len(
        ratios
    )


def verify() -> None:
    clean_path = Path(_REPO, "BENCH_CLEAN.json")
    clean = json.loads(clean_path.read_text())["queries"]
    registry.load_all()
    spark = get_spark(
        app_name="pitlapetl_bench_verify",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = registry.all_queries()

    # PASS 1: min-of-3 for every headline query. Before judging
    # anything, estimate the SESSION SHIFT — the median of t3/ref
    # across all referenced queries. The clean reference is a
    # cross-run per-query MIN, so a session in the documented slow
    # mode (SCALE.md bimodality note: regressions scattered across
    # UNTOUCHED queries, the co-tenant fingerprint loadavg cannot
    # see) reads uniformly ~1.1-1.3x over it; judging raw deviations
    # would then flag dozens of false 'persistent' verdicts. Each
    # query is instead judged against ref * shift — only deviation
    # BEYOND the session's global inflation counts.
    first: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is not None:
            first[name] = _time_query(spark, fn, 3)
    # judging shift: the measured value, unless the session is
    # unverifiable — then normalization is refused (judge raw) but
    # the MEASURED value still goes to the JSON so triage can see
    # whether the host read x1.31 or x5.0
    measured_shift, shift, unverifiable, n_canaries = _session_shift(
        first, clean
    )
    if unverifiable:
        print(
            f"UNVERIFIABLE SESSION: canary shift x{measured_shift:.3f} "
            f"exceeds the x{_SHIFT_BOUND} bound — normalization "
            "refused; verdicts below are judged raw and mean 're-run "
            "on a quiet host', not 'regression confirmed'"
        )
    print(
        f"session shift vs clean-min reference: x{measured_shift:.3f} "
        f"(median over {n_canaries} canaries; judging with x{shift:.3f})"
    )

    # PASS 2: min-of-5 re-runs for the shift-adjusted deviants
    verdicts: dict[str, dict] = {}
    for name, t3 in first.items():
        ref = clean.get(name)
        # `not ref` (not `is None`): timings round to 3 dp, so a
        # sub-0.5ms clean entry stores 0.0 — judging against it would
        # divide by zero; treat it like a missing reference, matching
        # pass 1's truthiness check (ADVICE r10)
        if not ref:
            verdicts[name] = {"verdict": "new", "min3": t3}
            print(f"{name}: new ({t3}s, no clean reference)")
            continue
        adj = ref * shift
        dev = (t3 - adj) / adj
        if abs(t3 - adj) <= _ABS_FLOOR or abs(dev) <= VERIFY_TOL:
            verdicts[name] = {"verdict": "ok", "min3": t3, "clean": ref}
            continue
        t5 = _time_query(spark, queries[name], _VERIFY_RERUNS)
        dev5 = (t5 - adj) / adj
        verdict = (
            "load"
            if (abs(t5 - adj) <= _ABS_FLOOR or abs(dev5) <= VERIFY_TOL)
            else "persistent"
        )
        verdicts[name] = {
            "verdict": verdict,
            "min3": t3,
            "min5": t5,
            "clean": ref,
            "dev": round(dev5, 3),
        }
        print(
            f"{name}: {verdict} (clean {ref}s, shift-adj {adj:.3f}s, "
            f"min3 {t3}s, min5 {t5}s, dev {dev5:+.0%})"
        )
    summary = {
        "session_shift": round(measured_shift, 3),
        "judging_shift": round(shift, 3),
        "shift_canaries": n_canaries,
        "unverifiable": unverifiable,
        "metric": "bench_verify",
        "tolerance": VERIFY_TOL,
        "reference": "BENCH_CLEAN.json",
        "n_ok": sum(1 for v in verdicts.values() if v["verdict"] == "ok"),
        "n_load": sum(1 for v in verdicts.values() if v["verdict"] == "load"),
        "n_persistent": sum(
            1 for v in verdicts.values() if v["verdict"] == "persistent"
        ),
        "n_new": sum(1 for v in verdicts.values() if v["verdict"] == "new"),
        "queries": {
            n: v for n, v in verdicts.items() if v["verdict"] != "ok"
        },
        # the full pass-1 min-of-3 map: the BENCH_CLEAN fold protocol
        # (SCALE.md) takes per-query MINs across clean-host runs, and
        # without this the ok-verdict timings were discarded
        "min3": first,
    }
    Path(_REPO, "BENCH_VERIFY.json").write_text(json.dumps(summary, indent=1))
    # the driver captures only the LAST ~2000 chars of stdout (the
    # _driver_line note below) — on a loaded host MANY queries
    # deviate and the full per-query map outgrows the window, so cap
    # the printed map at the worst offenders by |dev| (new queries
    # first: they have no reference at all); BENCH_VERIFY.json keeps
    # everything
    line = dict(summary)
    line.pop("min3", None)  # file-only; never fits the driver window
    worst = sorted(
        summary["queries"],
        key=lambda n: abs(summary["queries"][n].get("dev", float("inf"))),
        reverse=True,
    )
    for keep in range(len(worst), -1, -1):
        line["queries"] = {n: summary["queries"][n] for n in worst[:keep]}
        line["queries_omitted"] = len(worst) - keep
        if len(json.dumps(line)) <= _DRIVER_LINE_BUDGET:
            break
    print(json.dumps(line))


# The external driver records only the LAST ~2000 characters of
# stdout and json-parses the final line (BENCH_r07.json came back
# ``"parsed": null`` when the 67-query map outgrew that window, losing
# the round's machine-readable totals — VERDICT r7 "What's wrong" #1).
# The window is EXACTLY 2000 chars (the "tail" fields of
# BENCH_r10/r11/r12.json all measure 2000), and the JSON line is the
# last thing printed, so a line up to ~budget bytes survives whole.
#
# Round-13 fix (VERDICT r12 "What's wrong" #2): the old trim dropped
# the CHEAPEST entries, so a query that got FASTER round-over-round
# fell out of the printed map and the driver mislabeled it
# "dropped_from_bench" (4 such artifacts in PERF_r12.json). Literal
# loss-free name presence cannot fit: the 82 headline names alone sum
# to ~1.83 KB, so names + JSON framing exceed the 2000-char window
# with ZERO per-query values (~2.02 KB) — arithmetic in
# OPTIMIZATION_r13.md. The closest achievable contract, implemented
# here:
#   1. entries already in the PREVIOUS driver round's parsed map
#      (committed BENCH_r<N>.json, highest N) are PROTECTED — they
#      never fall out, so round-over-round presence is loss-free and
#      "dropped_from_bench" can only mean an actual drop;
#   2. remaining slots go to the costliest entries (regression
#      triage reads the heavy tail), values compacted to 2 decimals
#      to fit more of them;
#   3. the omitted remainder is declared by count, by residual
#      seconds, and by an 8-hex md5 of the comma-joined sorted
#      omitted names — verifiable against the committed
#      BENCH_FULL.json full map (same commit), so omission is
#      auditable even though the names themselves cannot fit.
_DRIVER_LINE_BUDGET = 1960  # bytes; capture window measured at 2000


def _prev_driver_names(repo: str = _REPO) -> set[str]:
    """Query names the most recent driver bench round actually parsed
    (``BENCH_r<N>.json["parsed"]["queries"]``, highest N committed).
    These are protected from the driver-line trim: a name the driver
    saw last round must never vanish from the printed map merely
    because the query got cheaper."""
    import re

    best, names = -1, set()
    for p in Path(repo).glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        try:
            parsed = json.loads(p.read_text()).get("parsed") or {}
        except (OSError, ValueError):
            continue
        qmap = parsed.get("queries") or {}
        if qmap and int(m.group(1)) > best:
            best, names = int(m.group(1)), set(qmap)
    return names


def _driver_line(result: dict, budget: int = _DRIVER_LINE_BUDGET) -> str:
    line = json.dumps(result)
    if len(line) <= budget:
        return line
    import hashlib

    timings = result["queries"]
    protected = _prev_driver_names() & set(timings)
    order = sorted(
        timings, key=lambda n: (n not in protected, -timings[n], n)
    )
    for keep in range(len(order) - 1, 0, -1):
        kept = {n: round(timings[n], 2) for n in order[:keep]}
        omitted = sorted(order[keep:])
        trimmed = dict(result)
        trimmed["queries"] = kept
        trimmed["queries_omitted"] = len(omitted)
        # the residual against the exact total, so kept + omitted_sec
        # reconciles to "value" despite the 2-decimal compaction
        trimmed["omitted_sec"] = round(
            result["value"] - sum(kept.values()), 3
        )
        trimmed["omitted_md5"] = hashlib.md5(
            ",".join(omitted).encode()
        ).hexdigest()[:8]
        trimmed["full_map"] = "BENCH_FULL.json"
        line = json.dumps(trimmed, separators=(",", ":"))
        if len(line) <= budget:
            return line
    return line  # single-entry map; nothing left to trim


if __name__ == "__main__":
    if "--verify" in sys.argv[1:]:
        verify()
    else:
        main()
