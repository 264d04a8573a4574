"""Incremental materialized-view maintenance.

A 100-TB pipeline cannot recompute its rollups from scratch every
load; it keeps PARTIAL aggregate state (sum/count/min/max — the
algebraic aggregates) and folds each delta batch into it. The operator
here demonstrates the discipline end-to-end with a deterministic
split: the "existing MV" is the partial-aggregate state over events
before a cutoff, the "delta" is the partial state over the rest, and
the merge combines them key-wise with a full-outer union +
re-aggregation. The DuckDB oracle computes the same rollup FROM
SCRATCH over all events — so a green row proves the incremental path
is exactly equivalent to recomputation, which is the entire
correctness contract of MV maintenance.

Scale shape: each side is one map-side-partial hash aggregate on the
rollup grain; the merge is a union of two ALREADY-AGGREGATED relations
(O(grain), not O(facts)) followed by one more tiny aggregate. The
delta batch at steady state is a day of data, the MV is O(grain) —
nothing ever re-reads history. Derived measures (avg) are computed
from merged sums at the end, never merged directly (avg is not
algebraic; sum/count are).

Reference parity: the reference recomputes its standings collections
from the full season on every DAG run (driverstandings.py delete+
reload); this operator is the scale-correct restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

MV_CUTOFF = "2024-01-21 00:00:00"  # MV state = days 1-20, delta = days 21-30


def _partial_state(events: DataFrame) -> DataFrame:
    """Algebraic partial-aggregate state at the rollup grain."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_states(mv: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta's partial state into the MV's: union the two
    O(grain) relations and re-aggregate with the MERGE function of
    each algebraic aggregate (sum+sum, count+count, min of mins, max
    of maxes). This is the foldable core: applying it per batch is
    associative, so any batching of the input yields the same MV."""
    return mv.unionByName(delta).groupBy("event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


@query(
    "incremental_mv_merge",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(sum(value) / count(*), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def incremental_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained rollup == from-scratch rollup: partial
    state over events before {MV_CUTOFF} (the stored MV) merged with
    partial state over the delta, derived measures computed from the
    merged sums. The oracle aggregates all events in one pass — hash
    equality proves the incremental path loses nothing."""
    events = load_table(spark, sf_dir, "events")
    mv = _partial_state(events.filter(F.col("ts") < MV_CUTOFF))
    delta = _partial_state(events.filter(F.col("ts") >= MV_CUTOFF))
    merged = merge_states(mv, delta)
    return merged.select(
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 4).alias("avg_value"),
    )


# ------------------------------------------------- sketch-state MV

SKETCH_TOL = 0.05  # HLL estimate accepted within ±5% of exact


@query(
    "sketch_mv_union",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_within_tol,
           TRUE AS kll_p50_in_range
    FROM events
    GROUP BY event_type
    """,
)
def sketch_mv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch MV: the NON-algebraic aggregates an incremental
    MV cannot keep as sums (distinct counts, quantiles) kept as
    DataSketches state instead. Daily pages each hold an HLL sketch of
    distinct users and a KLL sketch of values; the month-level answer
    is a UNION of the daily sketches — no rescan of raw events, the
    exact discipline `incremental_mv_merge` applies to algebraic state
    extended to the sketchable aggregates. At 100 TB this is the only
    way a distinct-users-per-anything rollup stays incremental: page
    sketches are O(k) bytes, union is associative/commutative, and a
    late partition just unions one more page.

    Verification contract (same device as agg_approx_sketches): sketch
    estimates are engine-specific, so the query emits the exact answer
    plus booleans pinning each estimate inside tolerance — the DuckDB
    oracle computes the exact side and TRUE literals; a drifting sketch
    flips a boolean and fails the hash gate. The exact aggregates here
    exist only to price the tolerance check."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    # the MV: one sketch page per (event_type, day) — what a real
    # pipeline would PERSIST per load
    pages = events.groupBy("event_type", day).agg(
        F.hll_sketch_agg("user_id").alias("hll_users"),
        F.kll_sketch_agg_double("value").alias("kll_value"),
    )
    # the query: union pages up to the coarser grain; raw events never
    # re-read (per-type estimate + merged p50 from sketch state alone)
    # HLL has a union AGGREGATE; KLL's merge is a binary scalar, so the
    # bounded per-group page list (≤ days-per-rollup) folds via the
    # higher-order aggregate — still sketch-state-only, never raw rows
    merged = pages.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_users")).alias("approx_users"),
        F.collect_list("kll_value").alias("kll_pages"),
    ).select(
        "event_type",
        "approx_users",
        F.kll_sketch_get_quantile_double(
            F.expr(
                "aggregate(slice(kll_pages, 2, size(kll_pages) - 1), "
                "kll_pages[0], (acc, x) -> kll_sketch_merge_double(acc, x))"
            ),
            F.lit(0.5),
        ).alias("p50_value"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return exact.join(F.broadcast(merged), "event_type").select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("approx_users") - F.col("n_users_exact"))
            <= F.greatest(F.lit(3), SKETCH_TOL * F.col("n_users_exact"))
        ).alias("hll_within_tol"),
        (
            (F.col("p50_value") >= F.col("lo")) & (F.col("p50_value") <= F.col("hi"))
        ).alias("kll_p50_in_range"),
    )
