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
    "pitlapetl_spark.operators.rest_query",
    "pitlapetl_spark.operators.python_udfs",
    "pitlapetl_spark.operators.stats",
    "pitlapetl_spark.operators.breadth",
    "pitlapetl_spark.operators.graph_cluster",
    "pitlapetl_spark.operators.scd",
    "pitlapetl_spark.operators.incremental",
    "pitlapetl_spark.operators.kmeans",
    "pitlapetl_spark.operators.funnel",
    "pitlapetl_spark.operators.entity_resolution",
    "pitlapetl_spark.operators.reconcile",
    "pitlapetl_spark.operators.quality",
    "pitlapetl_spark.plans.jobs",
    "pitlapetl_spark.streaming.batch_windows",
)

_loaded = False

# Driver-gate priority: the external correctness driver verifies queries
# in the order ``all_queries()`` yields them and has a bounded budget
# (round 1 stopped at exactly 50 entries). Names listed here are yielded
# FIRST, in this order; everything else follows in registration order.
# Round-2 policy (VERDICT.md "Next round" item 1): exactly 50 names —
# the r1-unverified surface, every entry added or changed this round,
# and the flagship; two locally-oracle-checked scalar breadth variants
# (scalar_date_math, scalar_regex_suite) are demoted to make room, and
# r1-verified unchanged queries follow in registration order.
_PRIORITY: tuple[str, ...] = (
    # the 7 reference pipelines (plans/jobs.py)
    "job_race_results",
    "job_qualifying_results",
    "job_practice_laps",
    "job_schedule",
    "job_driver_standings",
    "job_constructor_standings",
    # streaming batch-parity windows
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    # text analysis
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_tfidf_top_term",
    "text_bigram_lm_score",
    "text_fingerprint",
    # training-data filtering gates (added round 2)
    "text_gopher_rules",
    "text_repetition_ratios",
    "text_pii_scrub",
    "pipeline_pretrain_filter",
    # similarity search
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_label_centroid_knn",
    # python UDF surface
    "pandas_udf_normalize",
    "apply_in_pandas_zscore",
    # REST source + error tolerance
    "rest_driver_standings",
    "json_corrupt_quarantine",
    # sinks
    "sink_upsert_roundtrip",
    # multimodal
    "mm_binary_features",
    "mm_frame_sample",
    "mm_metadata_stats",
    # red in r1 (array column), fixed this round
    "agg_approx_sketches",
    # implementations changed / added this round — need fresh rows
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard_capped",
    # graph clustering
    "dedup_cluster_components",
    # stats breadth
    "agg_percentiles",
    "agg_stats_corr",
    "agg_grouping_sets",
    "scalar_array_ops",
    "agg_salted_group_max",
    # operator breadth
    "join_right_outer",
    "window_ntile_distribution",
    "agg_collect_set_ordered",
    "subquery_exists_semi",
    "window_forward_fill",
    "sample_hash_systematic",
    "sample_stratified_topn",
    "rollup_hierarchy_day_from_hour",
    # data quality
    "dq_profile_lineitem",
    "dq_constraint_checks",
    # flagship stays inside the verified window
    "flagship_top_value_per_user",
    # --- positions 51+: verified only if the driver budget exceeds 50
    # (new/changed this round, locally oracle-checked regardless)
    "sim_topk_lsh_multiprobe",
    "join_range_binned",
    "incremental_mv_merge",
    "kmeans_lloyd_clusters",
    "funnel_view_click_purchase",
    "cohort_retention_matrix",
    "sample_weighted_mix",
    "agg_histogram_equi_width",
    "pandas_udaf_weighted_mean",
    "join_salted_skew",
    "text_kl_domain_drift",
    "dedup_keep_best",
    "fuzzy_match_blocking",
    "resample_daily_grid",
    "sessionize_events",
    "window_share_of_total",
    "table_diff_reconcile",
    "contamination_eval_overlap",
    "pack_token_budget",
    "split_train_holdout",
    "scd2_user_value_history",
    "asof_join_tolerance",
    "dedup_minhash_lsh",
    "asof_join_last_order",
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
