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
# Round-6 policy (VERDICT.md r5 "Next round" item 1): after round 5 no
# query is never-verified and the evidence ledger reads — 7 queries
# r1-era (the cohort that spilled from the r5 window: setop_unpivot,
# topk_global, five window_*), ~43 r2-era, everything else r3+.
# The 50 slots therefore go: (a) queries NEW in round 6 (zero driver
# evidence by construction — never-verified outranks stale-verified,
# same call as r4/r5), then (b) the 7 spilled r1-era queries, then
# (c) the r2-era cohort, oldest first. Arithmetic: with N new r6
# queries, the last N of cohort (c) spill to round 7's rotation.
# Session 2 grew cohort (a) to 42 (13 session-1 + 29 session-2 new
# queries), so a 50-slot budget covers (a) 42 + (b) 7 + the first 1
# of (c); the remaining ~42 r2-era rows roll to round 7, where they
# lead the rotation (they will then be the oldest evidence on the
# board). Done-state this round: no query carries r1-era evidence and
# every new operator has a first driver row.
_PRIORITY: tuple[str, ...] = (
    # (a) new in round 6 — zero driver evidence by construction
    "graph_adamic_adar",
    "survival_kaplan_meier",
    "analytics_gini_spend",
    "stats_chi2_independence",
    "stats_quantile_normalize",
    "ml_naive_bayes_langid",
    "text_readability_flesch",
    "funnel_conversion_lag",
    "agg_weighted_median",
    "anomaly_mad_robust_zscore",
    "window_interpolate_linear",
    "stats_mann_whitney",
    "stats_ks_two_sample",
    "stats_xcorr_daily",
    "ts_seasonal_decompose",
    "pipeline_anomaly_triage",
    "dq_functional_dependency",
    "attribution_time_decay",
    "training_negative_sampling",
    "stats_psi_drift",
    "text_heaps_law_fit",
    "stats_spearman_rank_corr",
    "agg_pythagorean_means",
    "analytics_abc_classification",
    "window_growth_mom_yoy",
    "window_twap_value",
    "anomaly_cusum_changepoint",
    "dq_benford_digits",
    "dq_entropy_profile",
    "dedup_cluster_components_fast",
    "analytics_pareto_frontier",
    "window_month_spine_densify",
    "mm_phash_hamming_near_dup",
    "ml_logreg_gradient_descent",
    "graph_triangle_count",
    "stream_ohlc_candles",
    "text_zipf_fit",
    "sim_topk_pq_adc",
    "stats_bootstrap_ci",
    "agg_bitmap_distinct_users",
    "dq_sequence_gaps",
    "anomaly_mahalanobis_2d",
    # (b) the r1-era spill from round 5 (registry ledger, r5 comment):
    # their only driver row is round 1, three data regenerations ago.
    # These come BEFORE the session-3 new queries: the r5 verdict
    # explicitly ordered this cohort cleared in round 6, and 42+7
    # still fits the 50-slot window.
    "setop_unpivot",
    "topk_global",
    "window_standings_rank",
    "window_topk_per_group",
    "window_lag_lead_gap",
    "window_running_total",
    "window_rolling_frame",
    # (a') new in round-6 session 3 — never-verified, but queued
    # after cohort (b) so the verdict-ordered r1-era clearance is not
    # displaced. Slot arithmetic: 42 + 7 = 49, so exactly ONE of
    # these gets a round-6 driver row (the most novel family member,
    # the spatial join) and the remaining NINETEEN lead round 7's
    # rotation, ahead of the ~42 r2-era rows (round-7 window: 19
    # never-verified + the first 31 r2-era rows; the rest spill to
    # round 8).
    "geo_cell_radius_join",
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
    # (c) the r2-evidence cohort, in the order the r5 ledger queued it.
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
