"""Sink operators — SURVEY.md §2.2 (K1-K3).

The reference writes to MongoDB three ways: per-document keyed upsert
(K1, racedag.py:68-73), per-row keyed upsert loop (K2,
scheduledag.py:74-81), and non-atomic truncate-and-reload (K3,
driverstandings.py:82-85 — delete_many then insert_many, which leaves
an EMPTY collection if the insert fails mid-way).

Spark-first restatement over parquet:

- K1/K2 -> dynamic partition overwrite keyed on the upsert key
  columns: idempotent (re-running a load replaces exactly its own
  partitions) and atomic per partition via the staged commit protocol.
  At 100 TB this is the only sane upsert: touched partitions rewrite,
  untouched ones are never read.
- K3 -> ``mode("overwrite")``: same full-refresh semantics but staged
  (the old data survives a mid-write failure), deliberately improving
  on the reference's failure mode while preserving its contract
  (SURVEY.md §2.2 K3 note).
- ``merge_upsert`` -> row-level MERGE emulation (anti-join + union)
  for keys that don't align with a partition boundary; this is also
  the ``foreachBatch`` body for streaming upserts (§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(df: DataFrame, path: str, key_cols: list[str]) -> None:
    """K1/K2 keyed upsert: replace exactly the (key...) partitions
    present in ``df``, leave all others untouched."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(*key_cols).parquet(path)


def overwrite(df: DataFrame, path: str) -> None:
    """K3 truncate-and-reload as a staged atomic overwrite."""
    df.write.mode("overwrite").parquet(path)


def merge_upsert(
    existing: DataFrame | None, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level MERGE: rows of ``existing`` whose key appears in
    ``updates`` are replaced; new keys are inserted. Returns the merged
    DataFrame (caller writes it). Implemented as left-anti join +
    union — the standard MERGE emulation without a Delta/Iceberg table
    format (pyspark_guide.md "CDC / SCD2")."""
    if existing is None:
        return updates
    kept = existing.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    return kept.unionByName(updates)


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-files compaction: rewrite a parquet table into
    ``target_files`` files (staged via a temp suffix, then swapped by
    an atomic-enough overwrite). At 100 TB streaming upserts and
    per-partition writes accumulate small files that poison scan
    parallelism and NameNode/listing cost; periodic compaction with
    ``repartition`` (full shuffle, even sizes) is the standard cure —
    use ``coalesce`` instead when skew is acceptable to avoid the
    shuffle. Returns the file count after compaction."""
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(f"{path}__compact")
    compacted = spark.read.parquet(f"{path}__compact")
    compacted.write.mode("overwrite").parquet(path)
    # best-effort cleanup of the staging copy
    try:
        import shutil

        shutil.rmtree(f"{path}__compact", ignore_errors=True)
    except Exception:
        pass
    import glob

    return len(glob.glob(f"{path}/part-*"))


def read_or_none(spark: SparkSession, path: str, schema=None) -> DataFrame | None:
    try:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(path)
        df.head(1)
        return df
    except Exception:
        return None
