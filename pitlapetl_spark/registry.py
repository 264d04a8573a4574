"""Query registry: the single source of truth for the driver contract.

Every operator implemented from SURVEY.md §2 registers itself here with
a name, a ``(spark, sf_dir) -> DataFrame`` callable, and (when the
semantics are SQL-expressible) the equivalent ANSI SQL that the
DuckDB oracle runs on the same parquet tables. ``__spark_entry__.py``
just re-exports these dicts.

Conventions (driver contract, __spark_entry__.py docstring):
- every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver sorts columns by NAME before hashing);
- floating-point aggregates that sum many doubles are ``round(...)``-ed
  to a fixed precision on BOTH sides so accumulation order can't flip
  the hash;
- nondeterministic columns (current_timestamp) never appear in
  registered query output.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# operator modules that register queries on import
_MODULES = (
    "pitlapetl_spark.operators.relational",
    "pitlapetl_spark.operators.joins",
    "pitlapetl_spark.operators.aggregates",
    "pitlapetl_spark.operators.analytics",
    "pitlapetl_spark.operators.warehouse",
    "pitlapetl_spark.operators.warehouse2",
    "pitlapetl_spark.operators.windows",
    "pitlapetl_spark.operators.setops",
    "pitlapetl_spark.operators.nested",
    "pitlapetl_spark.operators.asof",
    "pitlapetl_spark.operators.dedup",
    "pitlapetl_spark.operators.similarity",
    "pitlapetl_spark.operators.text",
    "pitlapetl_spark.operators.text_filters",
    "pitlapetl_spark.operators.training_prep",
    "pitlapetl_spark.operators.multimodal",
    "pitlapetl_spark.operators.sinks_query",
    "pitlapetl_spark.operators.formats",
    "pitlapetl_spark.operators.rest_query",
    "pitlapetl_spark.operators.python_udfs",
    "pitlapetl_spark.operators.stats",
    "pitlapetl_spark.operators.breadth",
    "pitlapetl_spark.operators.pagerank",
    "pitlapetl_spark.operators.graph_cluster",
    "pitlapetl_spark.operators.community",
    "pitlapetl_spark.operators.scd",
    "pitlapetl_spark.operators.incremental",
    "pitlapetl_spark.operators.kmeans",
    "pitlapetl_spark.operators.pq",
    "pitlapetl_spark.operators.funnel",
    "pitlapetl_spark.operators.linkpred",
    "pitlapetl_spark.operators.nbayes",
    "pitlapetl_spark.operators.entity_resolution",
    "pitlapetl_spark.operators.reconcile",
    "pitlapetl_spark.operators.quality",
    "pitlapetl_spark.operators.spatial",
    "pitlapetl_spark.operators.breadth7",
    "pitlapetl_spark.operators.breadth7b",
    "pitlapetl_spark.operators.breadth7c",
    "pitlapetl_spark.operators.breadth7d",
    "pitlapetl_spark.operators.breadth7e",
    "pitlapetl_spark.operators.breadth7f",
    "pitlapetl_spark.operators.breadth8",
    "pitlapetl_spark.operators.bpe_train",
    "pitlapetl_spark.operators.als",
    "pitlapetl_spark.operators.kcore",
    "pitlapetl_spark.operators.hits",
    "pitlapetl_spark.plans.jobs",
    "pitlapetl_spark.streaming.batch_windows",
    "pitlapetl_spark.sources.paged_api",
)

_loaded = False

# Driver-gate priority: the external correctness driver verifies queries
# in the order ``all_queries()`` yields them and has a bounded budget
# (every round so far stopped at exactly 50 entries). Names listed here
# are yielded FIRST, in this order; everything else follows in
# registration order.
#
# Round-8 policy (VERDICT.md r7 "Next round" item 1, and the ledger
# arithmetic pinned at the end of round 7): after round 7 the evidence
# board reads — 42 queries NEVER driver-verified (cohorts (d)/(e)/(f)
# below: 3 late session-1 + 9 session-2 + 30 session-4 round-7
# additions, every one green in local value-level parity), 34 queries
# r2-era (the r7 window refreshed the first 8: job_race_results ..
# json_corrupt_quarantine, which therefore drop off this ledger), and
# everything else r3+. The 50 slots go: (d)+(e)+(f) = 42
# never-verified first (the standing never-verified-outranks-stale
# policy, in force since r4), then (g) queries NEW in round 8 (also
# never-verified; grown in place as sessions add operators), then (h)
# the r2-era refresh queue in ledger order, oldest evidence first.
# Arithmetic: with N_new round-8 queries the window = 42 + min(8,
# N_new) cohort-(g) rows + max(0, 8 - N_new) r2-era refreshes;
# everything past slot 50 spills to round 9, where never-verified
# again leads. With N_new = 0 this is exactly VERDICT r7's pinned
# window — the 42 plus the next 8 r2-era rows
# (pipeline_pretrain_filter .. pandas_udf_normalize) — and 26 r2-era
# refreshes spill to round 9. Done-state this round: zero
# never-verified queries from rounds <= 7 remain.
#
# Round-8 final arithmetic: cohort (g) grew to 16 new queries, so the
# 50-slot window = the 42 cohort-(d)/(e)/(f) rows + the first 8 of
# (g) (sim_topk_lsh_ltables .. analytics_revenue_proration). The
# remaining 8 cohort-(g) rows (window_reflected_balance ..
# ts_holt_linear_trend) spill to round 9 and LEAD its rotation per
# the standing never-verified-first policy, with the full 34-row
# r2-era refresh queue behind them (34 + 8 = 42, so round 9's window
# is exactly these 42 + the first 8 r2-era refreshes if no round-9
# sessions add queries — write the next revision of this arithmetic
# there). Every cohort-(g) query is green in local value-level parity
# (tools/drive_contract.py, 341/341 this session) — the driver row is
# the only missing evidence class.
_PRIORITY: tuple[str, ...] = (
    # (d) late session-1 round-7 additions — queued for round 8 by the
    # r7 ledger; first driver row due now
    "ops_ship_latency_trend",
    "dq_freshness_audit",
    "stats_qq_deciles",
    # (e) session-2 round-7 additions (breadth7b.py), ship order
    "stats_benford_first_digit",
    "stats_welch_ttest",
    "analytics_abc_pareto",
    "analytics_new_vs_returning",
    "privacy_t_closeness",
    "graph_jaccard_linkpred",
    "stats_fdr_bh",
    "ml_ridge_closed_form",
    "ml_isotonic_calibration",
    # (f) session-4 round-7 additions (breadth7c/7d/7e/7f.py + the
    # streaming Wilson twin), ship order
    "ab_srm_check",
    "attribution_position_based",
    "analytics_price_volume_bridge",
    "stats_jarque_bera",
    "stats_levene_variance",
    "stats_runs_test",
    "graph_degree_assortativity",
    "ml_pca_2d_closed_form",
    "ml_calibration_reliability",
    "dq_referential_integrity",
    "seq_user_path_topk",
    "text_collocation_llr",
    "survival_nelson_aalen",
    "stats_permutation_test",
    "privacy_dp_count_laplace",
    "ab_power_two_proportions",
    "window_bounce_rate_daily",
    "dq_order_total_reconciliation",
    "analytics_net_revenue_retention",
    "dq_error_rate_wilson",
    "stream_error_rate_wilson",
    "layout_zorder_locality",
    "ml_cohens_kappa_langid",
    "ab_sequential_sprt",
    "dq_volume_anomaly_weekday",
    "analytics_repeat_interval",
    "text_vocab_coverage",
    "ml_auc_roc_rank",
    "window_rolling_median",
    "ml_mcc_confusion",
    # (g) new in round 8 — grown in place as sessions add operators;
    # each displaces one r2-era refresh from the 50-slot window (see
    # the arithmetic note above)
    "sim_topk_lsh_ltables",  # VERDICT r7 item 5: the production-
    # shaped L-tables sign-LSH (12 tables x 6 planes, measured 0.66
    # recall at 0.19N candidate mass — the >=0.6 bar)
    "window_rolling_median_events",  # VERDICT r7 item 7: the
    # percentile-sketch rolling median on the volume-proportional
    # events frame — the exact twin's documented scale escape hatch
    "agg_heavy_hitters_gated",  # count-min GATED two-pass skew-key
    # detector — no full-key distinct anywhere in the plan (the
    # production shape stats.py's verifier twin defers to)
    "agg_hll_distinct",  # replayable HyperLogLog — the oracle-checked
    # twin of agg_approx_sketches' unreplayable native HLL++
    "text_bpe_encode",  # the trained tokenizer's ENCODE half (shared
    # merge loop with the r7 trainer; word-type grain)
    "ml_quantile_regression_gd",  # pinball-loss subgradient trainer —
    # third iterative-trainer member, one comparison-only gradient
    "privacy_dp_sum_bounded",  # user-level DP sum: contribution
    # clamping (sensitivity = CLAMP) + seeded Laplace at CLAMP/eps
    "analytics_revenue_proration",  # interval->calendar allocation:
    # span-bounded month explode + overlap-day proration
    "window_reflected_balance",  # floor-at-zero running balance via
    # the Skorokhod reflection closed form — a fold made windowable
    "text_phrase_search",  # position-postings phrase adjacency join —
    # the inverted-index answer to LIKE '%...%' corpus scans
    "sessionize_capped",  # idle-gap + hard-max-duration sessions: the
    # bot/always-on-device state bound the plain sessionizer lacks
    "ml_cross_validation_stump",  # leakage-safe k-fold CV in one plan
    # (train = total - heldout grain algebra, no per-fold re-scan)
    "geo_dbscan_grid",  # grid DBSCAN: dense-cell components via
    # 9-offset explode equi-joins, recursive-CTE oracle closure
    "graph_pagerank_personalized",  # seed-teleport PPR: sparse rank
    # frame + full-outer teleport join, shared memoized edge frame
    "agg_hll_set_operations",  # HLL mergeability: union by register
    # max (no input re-scan), intersection by inclusion-exclusion
    "ts_holt_linear_trend",  # two-state (level+trend) smoothing fold,
    # in-sample one-step forecast per day
    # (h) the r2-era refresh queue (oldest driver evidence on the
    # board), ledger order; the first 26 - max(0, N_new - 8) that fit
    # past the never-verified cohorts get refreshed this round, the
    # rest lead round 9's refresh tail
    "pipeline_pretrain_filter",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard_capped",
    "dedup_cluster_components",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_label_centroid_knn",
    "pandas_udf_normalize",
    "apply_in_pandas_zscore",
    "mm_binary_features",
    "mm_frame_sample",
    "mm_metadata_stats",
    "agg_collect_set_ordered",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_salted_group_max",
    "agg_stats_corr",
    "dq_constraint_checks",
    "dq_profile_lineitem",
    "join_right_outer",
    "sample_hash_systematic",
    "sample_stratified_topn",
    "scalar_array_ops",
    "subquery_exists_semi",
    "text_bigram_lm_score",
    "text_fingerprint",
    "text_gopher_rules",
    "text_lang_id",
    "text_pii_scrub",
    "text_quality_score",
    "text_repetition_ratios",
    "text_tfidf_top_term",
    "text_token_stats",
    "window_ntile_distribution",
)


def _priority_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: ``_PRIORITY`` names first, then the
    rest in registration order."""
    head = {n: d[n] for n in _PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (idempotent), populating the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            import_module(mod)
        except ModuleNotFoundError as e:
            # only skip when the OPERATOR MODULE itself doesn't exist yet
            # (incremental rounds); a missing import *inside* an existing
            # module is a real breakage and must fail loudly, or the
            # whole module's query set silently falls out of the registry
            if e.name != mod:
                raise
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _priority_ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _priority_ordered(ORACLES)
