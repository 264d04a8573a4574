"""Source-format connectors beyond parquet — CSV, JSON-lines, ORC —
proven end-to-end as write -> read-back -> aggregate roundtrips whose
final state the DuckDB oracle hashes against the original table
(same registered-roundtrip discipline as sink_upsert_roundtrip).

The reference ingests REST JSON and library DataFrames only
(SURVEY.md §2.1); a warehouse engine replacing it must also read the
interchange formats raw data actually arrives in. Spark-first rules
applied to each:

- **Explicit schemas always** (SCALE.md ground rule: inference
  banned). CSV/JSON schema inference triggers an extra full scan of
  100 TB before the real one and silently changes types between
  crawls; every reader here gets the DDL up front.
- **CSV**: header on, explicit timestamp handling, PERMISSIVE mode —
  at scale malformed rows route to a quarantine column
  (rest_query.py owns that pattern; here the write side is trusted).
  Doubles survive the text roundtrip exactly (Spark writes
  shortest-roundtrip representations and parses them back
  bit-identically). Timestamps do NOT by default: Spark's default
  CSV timestampFormat truncates to MILLIseconds, silently shifting
  every micros-precision value (measured: .789123 -> .789000 — the
  same bug class as the round-3 events-ts casualty). ``CSV_OPTS``
  pins a micros format on both write and read;
  tests/test_formats.py locks it.
- **JSON-lines**: the crawl-dump format; one JSON object per line
  splits cleanly, so a 100-TB dump parallelizes like any text file.
  Nested props stay as the raw JSON string — parsing is deferred to
  the JSON operators (nested.py) on the pruned subset that needs it.
- **ORC**: the other production columnar format; predicate pushdown
  and column pruning work like parquet (plan-asserted in
  tests/test_formats.py), so a table handed over from a Hive/Trino
  shop scans with the same efficiency.

Each query writes a deterministic slice to a temp dir, reads it back
through the format's reader, aggregates, and localCheckpoints the
result before the temp dir is removed (the sink_upsert_roundtrip
lifetime pattern — no row ever crosses to the driver).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from .aggregates import dsum

# micros-exact timestamp roundtrip (module docstring CSV note; the
# JSON writer has the SAME millis-truncating default — measured —
# so both text formats pin the format explicitly)
_TS_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
CSV_OPTS = {"header": "true", "timestampFormat": _TS_MICROS}
JSON_OPTS = {"timestampFormat": _TS_MICROS}

EVENTS_DDL = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)
ORDERS_DDL = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)
LINEITEM_DDL = (
    "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
    "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
    "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
    "l_shipdate TIMESTAMP"
)


def _roundtrip(
    df: DataFrame, fmt: str, read_schema: str, options: dict[str, str]
) -> DataFrame:
    """Write ``df`` in ``fmt`` to a temp dir, read it back with the
    EXPLICIT schema, localCheckpoint, clean up."""
    path = tempfile.mkdtemp(prefix=f"pitlap_{fmt}_") + "/table"
    try:
        w = df.write.mode("errorifexists").format(fmt)
        for k, v in options.items():
            w = w.option(k, v)
        w.save(path)
        r = df.sparkSession.read.format(fmt).schema(read_schema)
        for k, v in options.items():
            r = r.option(k, v)
        return r.load(path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderpriority AS orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           min(o_orderdate) AS first_order
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY orderpriority
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector proof: a filtered orders slice written as
    headered CSV and read back through an explicit schema must
    aggregate identically to the parquet original — doubles,
    timestamps, and strings all survive the text roundtrip."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-01-01"
    )
    back = _roundtrip(o, "csv", ORDERS_DDL, CSV_OPTS)
    return (
        back.groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price", "decimal(18,2)"),
            F.min("o_orderdate").alias("first_order"),
        )
        .orderBy("orderpriority")
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(sum(CASE WHEN props LIKE '%"k"%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_k,
           max(ts) AS last_ts
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines connector proof: the events table written as one
    JSON object per line and read back through an explicit schema
    (nested props kept as the raw string for deferred parsing) must
    aggregate identically to the parquet original — including the
    micros-exact max(ts), which the default JSON timestampFormat
    would truncate to millis (JSON_OPTS pins the micros format)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    back = _roundtrip(e, "json", EVENTS_DDL, JSON_OPTS)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum("value", "sum_value", "decimal(18,6)"),
            F.sum(
                F.when(F.col("props").like('%"k"%'), 1).otherwise(0)
            ).alias("n_with_k"),
            # micros-precision column in the OUTPUT so the oracle
            # catches any future timestampFormat regression (9995 of
            # 10000 sf0.01 events carry sub-milli micros)
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY returnflag
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector proof: one shipped-in-1997 year of lineitem
    written as ORC and read back must produce the same per-returnflag
    revenue as the parquet original. The ORC scan prunes columns and
    pushes predicates exactly like parquet (asserted separately in
    tests/test_formats.py — this query's read-back filter happens
    before the write, so the roundtrip hashes table content, not scan
    behavior)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    back = _roundtrip(l, "orc", LINEITEM_DDL, {})
    return (
        back.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                "decimal(18,4)",
            ),
        )
        .orderBy("returnflag")
    )


@query(
    "source_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                THEN o_orderpriority ELSE '<pre-schema>' END AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY 1
    ORDER BY priority
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: a table whose early files predate a
    column (orders written without o_orderpriority, then appended
    WITH it) must read as one relation under ``mergeSchema`` with the
    missing column null-filled for old files — the lakehouse reality
    of every long-lived 100-TB table. The aggregate coalesces the
    null era into an explicit '<pre-schema>' bucket so the oracle can
    replay the era split from the date. mergeSchema costs a footer
    read per file at planning time — fine here; at production scale
    you pin the MERGED schema explicitly in the reader (same rule as
    every connector in this module) and keep mergeSchema for
    exploration only."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    v2 = o.filter(F.col("o_orderdate") >= "1997-01-01").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    path = tempfile.mkdtemp(prefix="pitlap_evolve_") + "/table"
    try:
        v1.write.parquet(path)
        v2.write.mode("append").parquet(path)
        back = spark.read.option("mergeSchema", "true").parquet(path)
        return (
            back.groupBy(
                F.coalesce(F.col("o_orderpriority"), F.lit("<pre-schema>")).alias(
                    "priority"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice", "total_price", "decimal(18,2)"),
            )
            .orderBy("priority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)
