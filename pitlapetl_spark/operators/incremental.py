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
