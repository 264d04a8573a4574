"""The Python-UDF surface done right — SURVEY.md §2.13.

The reference's per-row Python functions (format_laptime etc.) became
native expressions (operators/relational.py X1/X2); what remains for
Python is genuinely-vectorized work: Arrow-batched ``pandas_udf`` for
numeric array math and grouped-map ``applyInPandas`` where a whole
group must be seen at once. Row-at-a-time ``F.udf`` appears nowhere
in this engine — at 100 TB the well-documented 10-100x Arrow batch
advantage over row-at-a-time Python is the difference between a job
and an outage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..sources import load_table


@pandas_udf(T.ArrayType(T.DoubleType()))
def unit_normalize(v: pd.Series) -> pd.Series:
    """Vectorized L2 normalization of an embedding column — the
    canonical pre-ANN transform. Arrow hands the whole batch to numpy;
    no per-row Python."""
    import numpy as np

    def norm(a):
        arr = np.asarray(a, dtype="float64")
        n = np.sqrt((arr * arr).sum())
        return (arr / n).tolist() if n > 0 else arr.tolist()

    return v.map(norm)


@query(
    "pandas_udf_normalize",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, d, sqrt(list_sum(list_transform(d, x -> x * x))) AS nrm
        FROM v
    )
    SELECT vec_id,
           round(d[1] / nrm, 6) AS n0,
           round(d[2] / nrm, 6) AS n1,
           round(sqrt(list_sum(list_transform(d, x -> (x / nrm) * (x / nrm)))), 6) AS unit_len
    FROM n
    """,
)
def pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: normalize every embedding to unit length;
    emit the first two normalized components and the (= 1.0) norm as
    the checkable contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select("vec_id", unit_normalize("embedding").alias("nv"))
    return normed.select(
        "vec_id",
        F.round(F.element_at("nv", 1), 6).alias("n0"),
        F.round(F.element_at("nv", 2), 6).alias("n1"),
        F.round(
            F.sqrt(F.expr("aggregate(nv, 0D, (acc, x) -> acc + x * x)")), 6
        ).alias("unit_len"),
    )


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: per-group standardization needs the whole
    group's mean/std — the applyInPandas shape (per-group model
    scoring, anomaly detection, calibration)."""
    m = pdf["value"].mean()
    s = pdf["value"].std(ddof=0)
    z = (pdf["value"] - m) / s if s > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z.round(6),
        }
    )


@query(
    "apply_in_pandas_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_pop(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score events within each
    event_type. One shuffle on the group key, then each group streams
    through Python as a single Arrow batch. Skew note: a dominant
    group lands on one task — at 100 TB either salt the key and
    two-pass the moments, or compute moments JVM-side (as the oracle
    does) and keep Python for the model call only."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return events.groupBy("event_type").applyInPandas(
        _zscore_group, _ZSCORE_SCHEMA
    )


@pandas_udf(T.DoubleType())
def _weighted_mean(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-aggregate pandas UDF body: quantity-weighted mean.
    Receives each group's columns as whole Arrow-backed Series and
    returns one scalar — the GROUPED_AGG shape. (Type object, not DDL
    string: the string form needs an active session at decoration
    time, and this decorates at module import.)"""
    return float((price * qty).sum() / qty.sum())


@query(
    "pandas_udaf_weighted_mean",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY 1
    """,
)
def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF — the third leg of the Python
    surface (scalar pandas_udf / grouped-map applyInPandas / grouped
    agg): a custom aggregation function used in a normal
    ``groupBy().agg()``, Arrow-batched per group. The oracle states
    the same weighted mean relationally. Like
    every GROUPED_AGG, partial aggregation is NOT available (the whole
    group's columns come to Python) — at 100 TB prefer the algebraic
    sum(x*w)/sum(w) decomposition the oracle uses unless the
    aggregation is genuinely non-algebraic (model scoring, exotic
    statistics); this entry exists to prove the API shape."""
    li = load_table(spark, sf_dir, "lineitem")
    # NOTE: a GROUPED_AGG pandas UDF cannot share an agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — another reason the
    # algebraic decomposition wins in production.
    return li.groupBy("l_returnflag").agg(
        F.round(
            _weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("weighted_avg_price"),
    )


# ---------------------------------------------------------------- UDTF

CHUNK = 100  # chars per span


@query(
    "udtf_chunk_spans",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id, n_chars,
               unnest(range(0, CAST(ceil(n_chars / {CHUNK}.0) AS INT)))
                   AS chunk_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(CASE WHEN (chunk_idx + 1) * {CHUNK} <= n_chars THEN {CHUNK}
                     ELSE n_chars - chunk_idx * {CHUNK} END AS INT)
               AS chunk_len
    FROM chunks
    """,
)
def udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function — the one
    §2.13 API shape the rest of this module doesn't cover): one input
    row expands to a variable number of output rows inside the
    engine's lateral-join machinery. Demonstrated as a span chunker
    (each document yields one row per CHUNK-char span — the shape a
    fixed-window embedding pass consumes).

    Placement rule: a UDTF evaluates per-row Python, so it belongs at
    the POST-AGGREGATION/narrow grain, never in a 100-TB hot scan —
    the genuinely-vectorized alternative for this exact expansion is
    the sequence+explode JVM form (text_boilerplate_lines builds its
    lines that way). Registered to prove the API surface with an
    oracle, with the lateral SQL form exercised end-to-end."""
    from pyspark.sql.functions import udtf

    # Arrow-optimized: rows cross the Python boundary in Arrow
    # batches (ArrowEvalPythonUDTF), not pickled one at a time —
    # the whole-registry plan lint bans the row-at-a-time node
    @udtf(returnType="chunk_idx: int, chunk_len: int", useArrow=True)
    class ChunkSpans:
        def eval(self, n_chars: int):
            if n_chars is None:
                return
            full, rem = divmod(int(n_chars), CHUNK)
            for i in range(full):
                yield i, CHUNK
            if rem:
                yield full, rem

    spark.udtf.register("chunk_spans", ChunkSpans)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_documents_src"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_len
        FROM udtf_documents_src AS d,
             LATERAL chunk_spans(d.n_chars) AS c
        """
    )


# ----------------------------------------------------------- mapInArrow


@query(
    "map_in_arrow_revenue",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net_revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2)
               AS charged
    FROM lineitem
    WHERE l_quantity >= 30
    """,
)
def map_in_arrow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy tier of the Python UDF surface
    (§2.13): the batch arrives as a ``pyarrow.RecordBatch`` and the
    transform runs in Arrow compute kernels, no pandas conversion on
    either side (the pandas bridge's object-dtype and copy overheads
    are skipped entirely). Same net-revenue arithmetic as the
    warehouse queries, so the DuckDB oracle replays it exactly.

    Placement rule (same as every Python op here): the built-in
    expression form of this projection is strictly faster — register
    the op to prove the API tier, and reach for mapInArrow in real
    pipelines only when the per-batch logic needs a Python library
    that speaks Arrow (vector/tensor kernels, tokenizers) —
    multimodal.py's decode plumbing is the genuine use case."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def rev(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            net = pc.multiply(
                t.column("l_extendedprice").combine_chunks(),
                pc.subtract(pa.scalar(1.0), t.column("l_discount").combine_chunks()),
            )
            charged = pc.multiply(
                net, pc.add(pa.scalar(1.0), t.column("l_tax").combine_chunks())
            )
            out = pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    # declared output schema says int64; the parquet
                    # stores int32 — cast explicitly, Arrow won't
                    "l_linenumber": pc.cast(
                        t.column("l_linenumber").combine_chunks(), pa.int64()
                    ),
                    # Arrow's default round is half-to-even; Spark
                    # and DuckDB round half away from zero — pin it
                    "net_revenue": pc.round(
                        net, 2, round_mode="half_towards_infinity"
                    ),
                    "charged": pc.round(
                        charged, 2, round_mode="half_towards_infinity"
                    ),
                }
            )
            yield from out.to_batches()

    src = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 30)
        .select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
        )
    )
    return src.mapInArrow(
        rev,
        "l_orderkey long, l_linenumber long, net_revenue double, charged double",
    )
