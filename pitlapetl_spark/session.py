"""SparkSession factory.

Defaults are tuned for the local[N] test harness but every setting is
chosen for cluster-scale behavior first:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong somewhere; AQE fixes
  it per-stage.
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden (``spark.sql.shuffle.partitions`` ~= 2-3x total cores) and
  AQE coalesces down.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  and are cluster-invariant.
- Arrow enabled: every Pandas-UDF path in operators/ is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "pitlapetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # push MIN/MAX/COUNT to parquet footer statistics: whole-table
        # aggregates answer from metadata without scanning row groups
        # (exact — footer stats, not estimates)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # write TIMESTAMP_MICROS, not the legacy INT96 default: INT96
        # carries no footer min/max statistics, so every time-ranged
        # scan over tables THIS engine wrote would lose row-group and
        # file pruning (caught by test_write_sized_files_caps_and_ranges)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
