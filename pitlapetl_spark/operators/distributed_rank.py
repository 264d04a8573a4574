"""Scale-safe global ranking.

An unpartitioned ``Window.orderBy(...)`` moves EVERY row through one
task (Exchange SinglePartition) — fine for a 25-row standings table,
an outage for a customer-grain input with millions of rows. The
two-stage form here keeps the heavy sort distributed:

1. ``repartitionByRange`` on the order columns — a range-partitioned
   sort, the same machinery as a global ``orderBy`` (sampled bounds,
   even partitions, AQE-skew-aware);
2. per-partition ``row_number`` over the range-partition id — local
   work, no cross-partition traffic;
3. add each partition's cumulative row-count offset — the offsets
   relation has one row PER PARTITION (~hundreds at any scale), so its
   single-partition window is over a few hundred rows, and it joins
   back as a broadcast.

Contract: the ordering must be a TOTAL order (include a unique
tiebreaker column), which makes ``rank() == row_number()`` — the same
contract the DuckDB oracles already pin (every ranked oracle orders by
measure + key). Spark's RangePartitioner samples with a deterministic
per-partition seed, so the partitioning — and therefore the plan — is
reproducible; the emitted positions are partition-independent anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based position of every row under ``order_cols`` (a
    total order), computed without ever collapsing the data to one
    task. Equals ``row_number() OVER (ORDER BY order_cols)`` — and
    ``rank()`` too, when the ordering is unique."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Materialize the range-partitioned relation ONCE (executor block
    # storage, lineage truncated): the offsets branch below would
    # otherwise re-execute the whole upstream pipeline — column pruning
    # specializes the two subtrees (offsets only needs _pid), so they
    # stop being canonically equal and ReuseExchange does not fire
    # (observed: the full join+aggregate ran twice). The checkpoint is
    # O(ranked grain), not O(input facts). On a cluster with executor
    # churn, swap localCheckpoint for persist(MEMORY_AND_DISK) or a
    # reliable checkpoint dir — same plan shape.
    parted = df.repartitionByRange(n, *order_cols).localCheckpoint(eager=True)
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    # one row per partition
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (F.row_number().over(w_local) + F.col("_off")).cast("int"),
        )
        .drop("_pid", "_off")
    )
