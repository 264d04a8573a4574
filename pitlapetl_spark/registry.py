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
    "pitlapetl_spark.operators.funnel",
    "pitlapetl_spark.operators.entity_resolution",
    "pitlapetl_spark.operators.reconcile",
    "pitlapetl_spark.operators.quality",
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
# Round-5 policy (VERDICT.md r4 "Next round" item 1): after round 4,
# every one of the 181 registered queries has at least one green driver
# row, so the 50 slots go to EVIDENCE CURRENCY — (a) the 17 queries
# NEW in round 5 (zero driver evidence by construction; never-verified
# is a strictly worse state than stale-verified, so they outrank the
# re-prove cohort, the same call the r4 ledger made), then (b) the 40
# queries whose only driver row is round 1 (the filter/projection/
# scalar/json/setop/window core), then (c) the oldest r2-evidence
# queries. Arithmetic: 17 + 40 = 57 > the driver's observed 50-slot
# budget, so the LAST 7 of cohort (b) — setop_unpivot, topk_global,
# and the five r1-era window_* queries, whose families have fresher
# r3-green relatives (window_forward_fill/range_frame/ntile, the
# two-stage rank, the other four setops) — spill to positions 51-57
# and lead round 6's rotation together with the r2 cohort.
# The policy ledger: after this round lands no query is never-verified,
# ≤7 queries carry r1-era evidence, and round 6 clears those plus r2.
_PRIORITY: tuple[str, ...] = (
    # (a) new in round 5 — zero driver evidence by construction
    "source_python_datasource",
    "map_in_arrow_revenue",
    "json_variant_get",
    "pipeline_pretrain_to_shards",
    "dedup_bloom_prefilter",
    "sample_reservoir_per_group",
    "agg_heavy_hitters_cms",
    "text_chunk_sliding_tokens",
    "curriculum_quality_order",
    "anomaly_iqr_outliers",
    "text_bpe_pair_stats",
    "asof_join_nearest",
    "window_debounce_events",
    "ml_linear_fit_closed_form",
    "text_pmi_cooccurrence",
    "pipeline_rag_chunk_dedup",
    "graph_label_propagation",
    # (b) the r1-evidence cohort: only driver row is round 1 (two data
    # regenerations ago). Local parity covers them on current data, but
    # driver evidence is the hard signal — re-prove all 40.
    "agg_pivot",
    "agg_rollup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "filter_equality_first_row",
    "filter_flag_and_range",
    "filter_isin_null_safe",
    "filter_notnull_derived",
    "join_broadcast_lookup",
    "join_full_outer",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_theta_band",
    "json_deep_path_standings",
    "json_doc_assembly",
    "json_doc_roundtrip",
    "json_get_path",
    "json_map_explode",
    "json_map_functions",
    "json_schema_parse",
    "project_composite_key",
    "project_literal_params",
    "project_rename_camel",
    "scalar_conditional_default",
    "scalar_format_iso8601",
    "scalar_format_laptime",
    "scalar_string_math",
    "setop_except_all",
    "setop_intersect",
    "setop_union_all_by_name",
    "setop_union_distinct",
    "setop_unpivot",
    "topk_global",
    "window_lag_lead_gap",
    "window_rolling_frame",
    "window_running_total",
    "window_standings_rank",
    "window_topk_per_group",
    # (c) oldest r2-evidence queries (positions 58+ — outside this
    # round's window; round 6 continues down this list).
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
