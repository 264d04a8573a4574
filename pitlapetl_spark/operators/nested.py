"""Semi-structured / JSON operators — SURVEY.md §2.11 (N1-N5) and the
nest-into-parent aggregation A2.

The reference's JSON surface is the Ergast standings payload walked
with raw dict indexing (driverstandings.py:20-22 — N1 deep path,
N2 array->rows, N3 element pick) and nested output documents built in
per-row loops (racedag.py:48-61 — N5). Spark-first restatement:
``from_json`` with explicit schemas, ``explode``, ``element_at``,
``collect_list(struct(...))`` + ``sort_array`` + ``to_json``.

Ordering note (SURVEY.md A2): the reference relies on pandas row
order inside its nested arrays; ``collect_list`` gives no order, so
every assembled array is sorted with ``sort_array`` over a struct
whose leading field is the order key — deterministic at any
parallelism, which is the only version of "order" that survives a
1000-executor shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@query(
    "json_get_path",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def json_get_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 path navigation on a JSON string column
    (``get_json_object``), the schema-less probe form."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "json_schema_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
    """,
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 with a declared schema: ``from_json`` parses once into a
    struct; downstream expressions are typed column refs. At scale this
    beats repeated ``get_json_object`` calls (one parse vs one parse
    per path)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", PROPS_SCHEMA))
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .select(
            "event_id",
            F.col("p.k").alias("k"),
            (F.col("p.k") * 2).alias("k2"),
        )
    )


@query(
    "json_map_explode",
    oracle="""
    SELECT event_id, k.key AS prop_key,
           CAST(json_extract_string(props, '$."' || k.key || '"') AS DOUBLE) AS prop_value
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS key FROM events) k(event_id, props, key)
    """,
)
def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 array/map -> rows: parse JSON as a MAP (schema-on-read for
    open-ended key sets, the ``events.props`` extension in FIXTURES.md
    §1.2) and explode to (key, value) rows."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "m", F.from_json("props", T.MapType(T.StringType(), T.DoubleType()))
    )
    return parsed.select(
        "event_id", F.explode("m").alias("prop_key", "prop_value")
    )


@query(
    "json_map_functions",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(json_extract_string(props, '$.' || list_sort(json_keys(props))[1]) AS DOUBLE) AS first_key_value
    FROM events
    WHERE props IS NOT NULL
    """,
)
def json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function breadth over schema-on-read props
    (map_keys / sorted key list / element_at by computed key) — the
    open-ended-key counterpart of struct navigation (SURVEY §1.2 map
    note)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.filter(F.col("props").isNotNull()).withColumn(
        "m", F.from_json("props", T.MapType(T.StringType(), T.DoubleType()))
    )
    return parsed.select(
        "event_id",
        F.size(F.map_keys("m")).cast("int").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys_sorted"),
        F.element_at(
            F.col("m"), F.element_at(F.sort_array(F.map_keys("m")), 1)
        ).alias("first_key_value"),
    )


@query(
    "json_doc_assembly",
    oracle="""
    SELECT concat(CAST(o_custkey AS VARCHAR), '_doc') AS key,
           CAST(count(*) AS BIGINT) AS n_orders,
           to_json(list(struct_pack(orderkey := o_orderkey,
                                    status := o_orderstatus,
                                    price := o_totalprice)
                        ORDER BY o_orderkey))::VARCHAR AS doc
    FROM orders
    GROUP BY o_custkey
    """,
)
def json_doc_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5/A2 rows -> nested document: header + sorted array of child
    structs serialized to JSON (racedag.py:48-61 output doc shape).
    ``sort_array`` orders by the struct's leading field (orderkey) so
    the document is byte-identical at any parallelism."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_orderkey").alias("orderkey"),
                        F.col("o_orderstatus").alias("status"),
                        F.col("o_totalprice").alias("price"),
                    )
                )
            ).alias("children"),
        )
        .select(
            F.concat_ws("_", F.col("o_custkey").cast("string"), F.lit("doc")).alias("key"),
            "n_orders",
            F.to_json("children").alias("doc"),
        )
    )


@query(
    "json_doc_roundtrip",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    """,
)
def json_doc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 then N2/N4 inverse: assemble nested docs, serialize to JSON,
    re-parse with an explicit schema, explode back to flat rows — must
    reproduce the source exactly (FIXTURES.md §C round-trip fixture).
    Exercises the full document pipeline the reference runs across its
    XCom boundary (driverstandings.py:71,75) inside one plan."""
    orders = load_table(spark, sf_dir, "orders")
    docs = (
        orders.groupBy("o_custkey")
        .agg(
            F.to_json(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderkey").alias("orderkey"),
                            F.col("o_totalprice").alias("price"),
                        )
                    )
                )
            ).alias("doc")
        )
    )
    child_schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("orderkey", T.LongType()),
                T.StructField("price", T.DoubleType()),
            ]
        )
    )
    return (
        docs.withColumn("children", F.from_json("doc", child_schema))
        .select("o_custkey", F.explode("children").alias("c"))
        .select(
            "o_custkey",
            F.col("c.orderkey").alias("o_orderkey"),
            F.col("c.price").alias("o_totalprice"),
        )
    )


@query(
    "json_deep_path_standings",
    oracle="""
    WITH pts AS (
        SELECT c_nationkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS points
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    )
    SELECT c_nationkey AS entity_id, points,
           CAST(rank() OVER (ORDER BY points DESC, c_nationkey) AS INT) AS position
    FROM pts
    """,
)
def json_deep_path_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 deep path + N3 element pick on an Ergast-shaped payload
    (FIXTURES.md A5: MRData.StandingsTable.StandingsLists[0].*):
    builds the nested standings document in-plan, then navigates back
    down with dotted paths and element_at — proving the navigation
    operators against a structure whose ground truth is computable."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    pts = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("points"))
    )
    w = Window.orderBy(F.col("points").desc(), "c_nationkey")
    standings = pts.select(
        F.struct(
            F.col("c_nationkey").alias("entity_id"),
            F.col("points"),
            F.rank().over(w).cast("int").alias("position"),
        ).alias("standing")
    )
    # assemble the Ergast shape: MRData.StandingsTable.StandingsLists[0].Standings[]
    payload = standings.agg(
        F.struct(
            F.struct(
                F.array(
                    F.struct(
                        F.sort_array(F.collect_list("standing")).alias("Standings")
                    )
                ).alias("StandingsLists")
            ).alias("StandingsTable")
        ).alias("MRData")
    )
    # navigate back down: deep dotted path, element_at for the [0] pick,
    # explode for array->rows
    return (
        payload.select(
            F.element_at(F.col("MRData.StandingsTable.StandingsLists"), 1)
            .getField("Standings")
            .alias("standings")
        )
        .select(F.explode("standings").alias("s"))
        .select("s.entity_id", "s.points", "s.position")
    )


# ------------------------------------------------------------- VARIANT


@query(
    "json_variant_get",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.missing') AS INT) AS missing_field,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    WHERE event_id < 500
    """,
)
def json_variant_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT type (Spark 4, §2.11's open-schema tier):
    ``parse_json`` ingests the raw JSON string into the binary
    VARIANT encoding ONCE, then ``variant_get`` path lookups are
    O(field) against the encoded form — by contrast,
    ``get_json_object`` (json_get_path) re-parses the whole string
    per extraction. ``try_variant_get`` on an absent path yields null
    instead of erroring — the schema-drift posture an evolving event
    stream needs. At 100 TB: parse once at the bronze->silver hop,
    store the VARIANT column, and every downstream extraction skips
    string parsing entirely."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = events.select("event_id", F.parse_json(F.col("props")).alias("v"))
    return v.select(
        "event_id",
        F.variant_get(F.col("v"), "$.k", "int").alias("k"),
        F.try_variant_get(F.col("v"), "$.missing", "int").alias("missing_field"),
        (F.variant_get(F.col("v"), "$.k", "int") % 10).alias("k_mod"),
    )
