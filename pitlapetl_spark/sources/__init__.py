"""Explicit-schema parquet sources for the test star schema.

The reference reads its inputs schema-on-faith from fastf1 / the
Ergast REST API (SURVEY.md §1.3: "implicit/dynamic" schemas, defensive
``.get(key, default)`` access — /root/reference/dags/driverstandings.py:30-36).
Here every source has a declared ``StructType`` (FIXTURES.md §B): at
100 TB, schema inference is both a correctness hazard and an extra
full-data pass, so it is banned.

Reads go through ``spark.read.schema(...).parquet(path)`` so Catalyst
gets column pruning + predicate pushdown into the parquet scan for
free (check: ``.explain`` shows ``PushedFilters`` / narrowed
``ReadSchema``).
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------- schemas

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# events.ts arrives as parquet TIMESTAMP whose physical unit has
# changed across testdata generations (nanoseconds in round 1, now
# microseconds). load_table reads the parquet FOOTER's timeUnit (one
# cheap pyarrow metadata call, no data scan) and picks the right read
# path: micros map to TimestampType natively; nanos are read as raw
# longs (legacy nanosAsLong flag) and normalized by exact integer
# division, matching DuckDB's ns->us truncation so oracle comparisons
# agree. EVENTS_RAW is the nanos-fallback schema.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLES = tuple(SCHEMAS)

# Dimension tables small enough to broadcast at ANY scale factor (the
# TPC-H-ish dims grow sub-linearly or not at all; customer/supplier/part
# grow with SF but stay << fact tables — broadcast decisions for those
# are left to AQE via autoBroadcastJoinThreshold, with explicit
# F.broadcast() hints where the survey identifies a lookup join).
STATIC_DIMS = ("region", "nation")


def parquet_ts_unit(path: str, column: str = "ts") -> str:
    """Physical time unit ('us', 'ns', ...) of a parquet timestamp
    column, from the file footer — metadata-only, no data scan. For a
    directory source (Spark-written table, file-stream dir) the first
    part file's footer is authoritative: one writer, one unit; a
    directory with only nested subdirectories (hive-partitioned
    layout) is probed one level down. Memoized per (resolved path,
    column): the footer read costs a filesystem+metadata round trip on
    every ``load_table`` call for the hottest table otherwise, and a
    generated table's unit never changes within a process lifetime
    (ADVICE r3). Use ``parquet_ts_unit.cache_clear()`` in tests that
    rewrite a directory in place."""
    import os

    return _parquet_ts_unit_cached(os.path.realpath(path), column)


def _first_part_file(path: str) -> str | None:
    """First data file under ``path``, descending one directory level
    for hive-partitioned layouts; None when none exists."""
    import os

    if not os.path.isdir(path):
        return path
    entries = sorted(
        e for e in os.listdir(path) if not e.startswith(("_", "."))
    )
    for e in entries:
        full = os.path.join(path, e)
        if e.endswith(".parquet") and os.path.isfile(full):
            return full
    for e in entries:  # nested (e.g. hive-partitioned) layout
        full = os.path.join(path, e)
        if os.path.isdir(full):
            nested = sorted(
                f for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            if nested:
                return os.path.join(full, nested[0])
    return None


@_functools.lru_cache(maxsize=256)
def _parquet_ts_unit_cached(path: str, column: str) -> str:
    import pyarrow.parquet as pq

    target = _first_part_file(path)
    if target is None:
        return "us"
    field = pq.ParquetFile(target).schema_arrow.field(column)
    return getattr(field.type, "unit", "us")


parquet_ts_unit.cache_clear = _parquet_ts_unit_cached.cache_clear  # type: ignore[attr-defined]


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from footer
    metadata — O(files) metadata reads, no Spark job, no data scan.
    The cheap cardinality estimate for broadcast-vs-shuffle decisions
    on dimension tables (a dimension's key cardinality is bounded by
    its row count)."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return pq.ParquetFile(path).metadata.num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _events_nanos_normalized(raw: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table with its declared schema.

    Nanos caveat: a ns-unit events footer flips the SESSION-wide
    ``nanosAsLong`` legacy flag, and it stays set — the returned frame
    is lazy, so un-setting after return would break its execution.
    The flag changes how OTHER ns-timestamp parquet reads in the same
    session come back (raw longs). Within one testdata generation all
    tables share the writer (one unit), so in-engine reads are
    consistent; a session mixing external ns-parquet sources should
    isolate them in their own SparkSession. Documented trade — the
    alternative (eager materialization to scope the flag) would buy
    back the isolation by paying a full table copy per load."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and parquet_ts_unit(path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _events_nanos_normalized(spark.read.schema(EVENTS_RAW).parquet(path))
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables; defaults to the full star schema."""
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so operators can be run as SQL."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
