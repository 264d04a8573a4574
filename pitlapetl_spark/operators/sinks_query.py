"""Oracle-checked sink round-trip: proves K1 keyed-upsert semantics
end-to-end through real parquet writes (SURVEY.md §2.2), expressed as
a registered query so the driver's DuckDB gate hashes the final table
state.

Scenario (mirrors re-running a reference DAG for a later snapshot,
racedag.py:68-73): load an initial aggregate built from the early
events only, then upsert the recomputed aggregates for a subset of
keys; the final state must show updated rows for upserted keys and
untouched rows elsewhere. Run twice, the result is identical —
idempotency is the property the reference leans on (SURVEY.md §2.12:
"freshness by re-running + upsert idempotency").
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sinks import upsert_partitioned
from ..sources import load_table

UPSERT_TYPES = ("click", "error")


@query(
    "sink_upsert_roundtrip",
    oracle=f"""
    WITH base AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(value) AS DOUBLE) AS max_value
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY event_type, user_id
    ),
    upd AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(value) AS DOUBLE) AS max_value
        FROM events WHERE event_type IN {UPSERT_TYPES!r}
        GROUP BY event_type, user_id
    )
    SELECT user_id, n_events, max_value, event_type FROM upd
    UNION ALL
    SELECT user_id, n_events, max_value, event_type FROM base
    WHERE event_type NOT IN {UPSERT_TYPES!r}
    """,
)
def sink_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write base snapshot -> dynamic-partition upsert of two keys ->
    read back the final table state."""
    events = load_table(spark, sf_dir, "events")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )

    base = agg(events.filter(F.col("ts") < "2024-01-15"))
    updates = agg(events.filter(F.col("event_type").isin(*UPSERT_TYPES)))

    path = tempfile.mkdtemp(prefix="pitlap_upsert_") + "/table"
    try:
        upsert_partitioned(base, path, ["event_type"])
        upsert_partitioned(updates, path, ["event_type"])
        # run the upsert AGAIN — idempotency: final state must not change
        upsert_partitioned(updates, path, ["event_type"])
        final = spark.read.parquet(path)
        result = final.select("user_id", "n_events", "max_value", "event_type")
        # materialize executor-side before the temp dir is removed:
        # localCheckpoint truncates lineage into block storage, so the
        # returned frame never re-reads the deleted path — and no row
        # ever crosses to the driver (SCALE.md ground rule 2 holds with
        # zero exceptions in registered queries). On a shared cluster
        # you'd write to a durable staging table instead; the temp-dir
        # lifetime problem is an artifact of the self-contained query.
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)
