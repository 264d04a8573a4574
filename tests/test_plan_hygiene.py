"""Physical-plan hygiene gates (SURVEY.md §4, pyspark_guide scaling
rules): predicate pushdown reaches the parquet scan, dimension joins
broadcast, projections prune the read schema. These are the properties
that keep the same plans viable at 100 TB — regressions here are
performance bugs even when results stay correct."""

from __future__ import annotations

from pitlapetl_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushes_to_parquet_scan(spark):
    plan = _plan(Q["filter_flag_and_range"](spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    # at least one real predicate made it into the scan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"no predicates pushed: {pushed!r}"


def test_dimension_join_broadcasts(spark):
    plan = _plan(Q["join_broadcast_lookup"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_read_schema(spark):
    plan = _plan(Q["project_rename_camel"](spark, SF_SMOKE))
    scan = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # the camel-rename projection touches a handful of columns; a full
    # table read would be a pruning regression
    assert len(scan.split(",")) <= 6, scan


def test_flagship_plan_shape(spark):
    """Flagship = filter -> partial agg -> broadcast right-outer join:
    every stage must show its scale-critical property (AQE hides the
    WholeStageCodegen markers until the final plan, so assert the
    plan shape directly)."""
    plan = _plan(Q["flagship_top_value_per_user"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "partial_max" in plan  # map-side combine before the shuffle
    assert "PushedFilters: [IsNotNull" in plan


def test_agg_has_mapside_partial(spark):
    plan = _plan(Q["agg_pricing_summary"](spark, SF_SMOKE))
    # partial_ aggregates before the exchange = map-side combine
    assert "partial_" in plan


def test_partitioned_write_prunes_on_read(spark):
    """Partition-directory layout + filter -> PartitionFilters prune
    whole directories; the data filter never reaches row groups of
    other partitions. This is the scan-side contract the K1 upsert
    layout (partitionBy key) is designed around."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="pitlap_prune_")
    try:
        from pitlapetl_spark.sources import load_table

        load_table(spark, SF_SMOKE, "events").write.partitionBy(
            "event_type"
        ).mode("overwrite").parquet(f"{tmp}/t")
        df = (
            spark.read.parquet(f"{tmp}/t")
            .filter(F.col("event_type") == "click")
            .select("event_id", "value")
        )
        plan = _plan(df)
        seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "event_type" in seg, plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
