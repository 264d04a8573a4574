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
# (every round so far stopped at exactly 50 entries). Names listed here
# are yielded FIRST, in this order; everything else follows in
# registration order. Round-4 policy (VERDICT.md r3 "Next round" items
# 1-2): the 50 slots go to (a) the only operator whose r3 pass was
# vacuous — resample_daily_grid, 0-vs-0 rows at the old threshold — now
# non-vacuous; (b) the 3 queries never driver-verified across r1-r3;
# (c) dedup_winnowing_fast, new this round (xxhash64 production
# variant, VERDICT item 4); (d) every query whose ONLY driver evidence
# is round 1 — two data regenerations ago — starting with
# agg_pricing_summary (the unexplained r3 bench regression; a fresh
# correctness row accompanies the re-measurement); (e) two r2-evidence
# composed-pipeline representatives to fill the window. Everything
# r3-green is freshly proven and is demoted.
_PRIORITY: tuple[str, ...] = (
    # (a) the one unproven operator in the engine: r3 row was 0-vs-0
    "resample_daily_grid",
    # (b) never driver-verified in any round
    "agg_argmax_mode",
    "sequence_event_trigrams",
    "udtf_chunk_spans",
    # (c) new this round: xxhash64 winnowing production path,
    # incremental batch-vs-corpus minhash dedup, and the Q6/Q12/Q18
    # warehouse classics
    "dedup_winnowing_fast",
    "dedup_incremental_minhash",
    "dedup_repeated_spans",
    "dedup_repeated_spans_fast",
    "dedup_repeated_spans_apply",
    "cdc_latest_state",
    "winsorize_group_values",
    "mix_token_allocation",
    "agg_histogram_equi_depth",
    "attribution_last_touch",
    "featurize_hashed_ngrams",
    "graph_pagerank_copurchase",
    "window_ewma_daily",
    "ab_test_variant_zscore",
    "q6_forecast_revenue",
    "q12_late_shipment_priority",
    "q18_large_volume_customers",
    # (c') the round-4 second warehouse tranche (operators/warehouse.py)
    # — zero driver evidence by construction, so they outrank the
    # re-prove cohort below
    "q4_order_priority_check",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_suppliers_kept_waiting",
    "q22_dormant_high_balance",
    # (c'') the session-3 tranche completing all 22 TPC-H shapes via
    # the derived supplier-part relation (operators/warehouse2.py) —
    # zero driver evidence by construction
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_breadth",
    "q20_excess_suppliers",
    # (c''') session-3 LLM-pipeline ops: IVF-flat ANN end-to-end,
    # SemDeDup cluster-bounded semantic dedup, DSIR importance
    # weighting — zero driver evidence by construction
    "sim_topk_ivf_nprobe",
    "dedup_semantic_semdedup",
    "dsir_importance_weights",
    "report_corpus_datacard",
    # (c'''') session-3 source-format connectors (operators/formats.py)
    "source_csv_roundtrip",
    "source_jsonl_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "sink_delete_roundtrip",
    # (c5) session-3 customer-lifecycle analytics
    "churn_yearly_customers",
    "rfm_customer_segments",
    # (d) r1-only evidence, oldest first-priority: the bench-regression
    # suspect, then the full r1 cohort (verified on a data generation
    # that no longer exists — re-prove on current data)
    "agg_pricing_summary",
    "agg_cube",
    "agg_distinct_counts",
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
    # --- positions 51+ (verified only if the driver budget exceeds 50).
    # The head above is exactly 50 through "agg_distinct_counts":
    # the 4 (a)/(b) carryovers, 43 round-4 new operators (winnowing_fast
    # + incremental minhash + the 12 session-2 ops spans/cdc/winsorize/
    # mix/equi-depth/attribution/featurizer/pagerank/ewma/ab-test +
    # q6/q12/q18 + the 10-query warehouse tranche + the 5-query
    # TPC-H-completion tranche + IVF/SemDeDup/DSIR + the corpus
    # datacard + the CSV/JSONL/ORC connector proofs + schema-evolution
    # read + GDPR partition-scoped delete + churn/RFM lifecycle
    # analytics), and the FIRST 3 r1-cohort re-proofs.
    # The remaining r1-cohort names below fall outside this round's
    # window — they keep r1 driver evidence plus local sf0.01 parity
    # on current data; new-operator evidence outranks re-proving them.
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
    "job_race_results",
    "pipeline_pretrain_filter",
    # locally oracle-checked regardless). r2/r3-green queries in
    # rough usefulness order, then the rest in registration order.
    "flagship_top_value_per_user",
    "job_qualifying_results",
    "job_practice_laps",
    "job_schedule",
    "job_driver_standings",
    "job_constructor_standings",
    "rest_driver_standings",
    "json_corrupt_quarantine",
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
