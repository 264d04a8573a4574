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
# Round-7 policy (VERDICT.md r6 "Next round" item 1, and the pinned
# ledger written at the end of round 6): after round 6 the evidence
# board reads — 19 session-3 queries NEVER driver-verified (their only
# evidence is local value-level parity), ~42 queries r2-era, everything
# else r3+. The 50 slots therefore go: (a) the 19 never-verified
# session-3 queries (never-verified outranks stale-verified, the
# standing call since r4), then (b) queries NEW in round 7 (also
# never-verified; queued after (a) because (a) is older debt and was
# explicitly pinned by the r6 ledger to lead), then (c) the r2-era
# cohort in ledger order, oldest evidence first. Arithmetic: with
# N_new round-7 queries, the window covers (a) 19 + (b) N_new +
# (c) the first 31 - N_new r2-era rows; the remaining ~11 + N_new
# r2-era rows spill to round 8, where they lead. Done-state this
# round: zero never-verified queries from rounds <= 6, and every new
# round-7 operator has a first driver row.
#
# Session-1 final arithmetic: cohort (b) grew to 23 (1 late-r6
# straggler + 22 new operators), so the 50-slot window = 19 + 23 +
# the first 8 r2-era rows (job_race_results .. json_corrupt_
# quarantine); the remaining 34 r2-era rows spill to round 8 and
# lead its rotation per the standing oldest-evidence-first policy.
_PRIORITY: tuple[str, ...] = (
    # (a) session-3 (round 6) queries with no driver row yet — the
    # r6 ledger pinned these 19 to lead round 7 (VERDICT r6 item 1)
    "graph_kcore_decomposition",
    "sim_quantize_int8",
    "dedup_containment_capped",
    "sample_neyman_allocation",
    "analytics_herfindahl_market",
    "text_bm25_search",
    "privacy_k_anonymity",
    "analytics_theil_decomposition",
    "dedup_jaccard_prefix_filter",
    "ml_theil_sen_trend",
    "ts_forecast_baseline_mase",
    "rec_item_item_cosine",
    "ab_cuped_adjustment",
    "ml_conformal_interval",
    "stats_diff_in_diff",
    "text_oov_rate",
    "seq_markov_next_event",
    "graph_hits_authorities",
    "pipeline_release_waterfall",
    # (b) never-verified stragglers + new in round 7 — zero driver
    # evidence by construction. (grown in place as round-7 sessions
    # add operators)
    "analytics_cohort_ltv_curve",  # registered late in r6, missed the
    # last parity run; its .00005 rounding-boundary defect was caught
    # and fixed first thing in round 7 (funnel.py block comment)
    "funnel_windowed_steps",  # new r7: per-transition time-window
    # funnel (VERDICT r6 item 7)
    # new r7 breadth (breadth7.py + community.py):
    "stats_kendall_tau",
    "stats_anova_oneway",
    "ts_autocorrelation_acf",
    "window_rolling_distinct_users",
    "graph_clustering_coefficient",
    "privacy_l_diversity",
    "mix_temperature_sampling",
    "sample_balanced_class_downsample",
    "ts_exp_smoothing",
    "window_dau_mau_stickiness",
    "dedup_lsh_scurve_planner",
    "analytics_tier_migration",
    "window_streak_active_days",
    "sim_knn_graph_bucketed",
    "stats_cramers_v",
    "analytics_woe_iv",
    "text_bpe_train_merges",
    "rec_als_factorization",
    "geo_nearest_supplier",
    "analytics_audience_overlap",
    "ml_decision_stump_gini",
    # (c) the r2-era cohort, in the order the r5/r6 ledger queued it.
    # The first 31 - len(b) fit the 50-slot window; the rest spill to
    # round 8 — where they queue BEHIND the (d)-(f) never-verified
    # round-7 additions, per the standing never-verified-outranks-
    # stale policy (see the (f) arithmetic note below).
    "job_race_results",
    "job_qualifying_results",
    "job_practice_laps",
    "job_schedule",
    "job_driver_standings",
    "job_constructor_standings",
    "rest_driver_standings",
    "json_corrupt_quarantine",
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
    # (d) late session-1 additions, deliberately queued BEHIND cohort
    # (c): cohort (b) was capped at 23 so the round-7 window keeps 8
    # r2-era refreshes (the verdict ordered refreshes too); these
    # three get their first driver row in round 8, where never-
    # verified again leads.
    "ops_ship_latency_trend",
    "dq_freshness_audit",
    "stats_qq_deciles",
    # (e) session-2 additions (breadth7b.py) — same deal as (d): the
    # round-7 window is already spoken for, so these queue here for
    # their first driver row in round 8 behind (d), in ship order.
    "stats_benford_first_digit",
    "stats_welch_ttest",
    "analytics_abc_pareto",
    "analytics_new_vs_returning",
    "privacy_t_closeness",
    "graph_jaccard_linkpred",
    "stats_fdr_bh",
    "ml_ridge_closed_form",
    "ml_isotonic_calibration",
    # (f) session-4 additions (breadth7c/7d/7e/7f.py + the streaming
    # Wilson twin) — queue behind (e) for their first driver row, in
    # ship order. Ledger arithmetic after session 4: the 50-slot
    # round-7 window is unchanged — (a) 19 + (b) 23 + the first 8
    # r2-era rows; everything from (d) onward (3 + 9 + 30 = 42 new
    # never-verified queries) spills to round 8, where the standing
    # never-verified-first policy queues them AHEAD of the remaining
    # 34 r2-era refreshes.
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
