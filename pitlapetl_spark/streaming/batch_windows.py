"""Time-window aggregations over ``events`` — batch form of the
streaming operators (SURVEY.md §2.12), oracle-checked.

``F.window`` / ``F.session_window`` are the same expressions a
Structured Streaming plan uses; running them over the static events
table pins down their semantics against DuckDB, and
streaming/runtime.py reuses the identical aggregation bodies
incrementally. Window starts are epoch-aligned (Spark's contract), so
the oracles compute bucket starts with integer epoch arithmetic
rather than DuckDB's Monday-anchored time_bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

DAY_S = 86400
SESSION_GAP = "4 hours"
SESSION_GAP_SQL = "INTERVAL 4 HOUR"


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / {DAY_S}) * {DAY_S} AS BIGINT)) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(CAST(floor(epoch(ts) / {DAY_S}) * {DAY_S} + {DAY_S} AS BIGINT)) AS TIMESTAMP) AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event_type: the canonical streaming
    aggregate (readStream + withWatermark + this exact groupBy). One
    shuffle on (window, event_type); map-side partial agg makes the
    shuffle payload one row per (day, type) per task regardless of
    event volume."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_avg",
    oracle=f"""
    WITH slid AS (
        SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / {DAY_S}) * {DAY_S} - k * {DAY_S} AS BIGINT)) AS TIMESTAMP) AS window_start,
               value
        FROM events, unnest([0, 1]) AS t(k)
    )
    SELECT window_start,
           window_start + INTERVAL 2 DAY AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM slid
    GROUP BY 1, 2
    """,
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-day length, 1-day slide): every event lands
    in exactly 2 windows. Spark expands the window list per row
    map-side (no self-join); the oracle mirrors that expansion with an
    explicit unnest of slide offsets."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


@query(
    "stream_session_windows",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= {SESSION_GAP_SQL}
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + {SESSION_GAP_SQL} AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (4-hour inactivity gap) per user — Spark's
    ``session_window`` merges events map-side then combines across
    partitions; the oracle restates it as gaps-and-islands. Session
    end is last-event + gap (Spark's contract)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_ohlc_candles",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / {DAY_S}) AS BIGINT) AS bucket,
               ts, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id, bucket
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY user_id, bucket
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT CAST(to_timestamp(bucket * {DAY_S}) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(bucket * {DAY_S} + {DAY_S}) AS TIMESTAMP) AS window_end,
           user_id,
           max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           max(value) AS high_v,
           min(value) AS low_v,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS volume
    FROM r
    GROUP BY 1, 2, 3
    """,
)
def stream_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling: per (user, day) the opening value
    (first by (ts, event_id)), closing value (last), high, low, event
    count and summed volume — the financial/metrics downsampling
    shape. The open/close are ARGMIN/ARGMAX via one struct min/max
    ((ts, event_id, value): the unique (ts, event_id) prefix decides,
    value rides along) — so the whole candle is ONE hash aggregate
    with full map-side combine, no sort window and no per-day sort
    anywhere; the oracle independently derives open/close with
    row_number windows. F.window('1 day') is the same expression a
    readStream plan uses, so this exact aggregation body runs
    incrementally under a watermark (the module contract;
    test_streaming runs it as a real stream and compares).

    100-TB shape: one shuffle on (window, user) with candle-sized
    payload per partial; struct argmin/argmax keeps first/last out of
    the window-function path that would force a per-key sort."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).getField("value").alias("open_v"),
            F.max(F.struct("ts", "event_id", "value")).getField("value").alias("close_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "open_v",
            "close_v",
            "high_v",
            "low_v",
            "n_events",
            "volume",
        )
    )


# ------------------------------- daily error rate w/ Wilson bounds
# The SRE monitor shape of dq_error_rate_wilson (breadth7d.py), as a
# stream-capable windowed aggregate: counts are plain windowed sums
# (incrementally maintainable), the Wilson interval is a derived
# projection AFTER the aggregate — so the identical body runs under
# a watermark (runtime.error_rate_wilson_stream; test_streaming
# asserts bit-equality stream vs batch). The day-grain twin of the
# date-keyed batch query, keyed on the streaming F.window instead of
# the calendar string so late data merges into the right pane.

# single source for the z constant: the batch audit's module
# (review catch: a copy-pasted twin constant can be retuned on one
# side only, silently breaking the documented twin relationship)
from ..operators.breadth7d import _WILSON_Z as _WILSON_Z_STREAM


def wilson_error_rate_agg(events: DataFrame) -> DataFrame:
    """Shared aggregation body: per 1-day event-time window, total
    and error counts plus the Wilson 95% interval. Pure windowed
    counts + post-agg projection — streaming-supported with no custom
    state; the watermark (added by the stream caller) bounds pane
    state."""
    z = _WILSON_Z_STREAM
    agged = events.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return agged.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
        "k",
        F.round(p, 6).alias("error_rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "stream_error_rate_wilson",
    oracle=f"""
    WITH d AS (
        SELECT CAST(floor(epoch(ts) / {DAY_S}) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                    AS BIGINT) AS k
        FROM events GROUP BY 1
    )
    SELECT CAST(to_timestamp(bucket * {DAY_S}) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(bucket * {DAY_S} + {DAY_S}) AS TIMESTAMP)
               AS window_end,
           n, k,
           round(CAST(k AS DOUBLE) / n, 6) AS error_rate,
           round((CAST(k AS DOUBLE) / n
                  + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM} / (2 * n)
                  - {_WILSON_Z_STREAM} * sqrt(CAST(k AS DOUBLE) / n
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM}
                          / (4.0 * n * n)))
                 / (1 + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM} / n), 6)
               AS wilson_lo,
           round((CAST(k AS DOUBLE) / n
                  + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM} / (2 * n)
                  + {_WILSON_Z_STREAM} * sqrt(CAST(k AS DOUBLE) / n
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM}
                          / (4.0 * n * n)))
                 / (1 + {_WILSON_Z_STREAM} * {_WILSON_Z_STREAM} / n), 6)
               AS wilson_hi
    FROM d
    """,
)
def stream_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed daily error rate with Wilson bounds — the batch twin
    of runtime.error_rate_wilson_stream (block comment above)."""
    events = load_table(spark, sf_dir, "events")
    return wilson_error_rate_agg(events)


# ----------------------- pHash ingest-store compaction parity
# VERDICT r8 item 5 extension, registered as a query: the media
# ingest sink's BAND STORE now folds committed batch partitions into
# generation partitions (_compact_partition_store — runtime.py), and
# this query PROVES the fold is content-preserving at the driver's
# value-hash level. It simulates the sink's store lifecycle with the
# real production pieces — phash_frame / phash_band_rows build the
# band rows, a deterministic doc_id split plays the role of
# micro-batches, the actual compactor folds them (twice: once for the
# steady state, once to heal a simulated crash-window leftover whose
# rows already live in the generation) — then folds the compacted
# store to a per-band grain the DuckDB oracle recomputes STRAIGHT
# from documents, never having seen a store at all. Any row the
# compaction lost or duplicated flips a count or sum; the oracle's
# literal TRUE parity column additionally pins the Spark-side
# pre-write vs post-compaction comparison.
#
# 100-TB shape: the store writes are batch-partitioned parquet (the
# sink's own layout); compaction reads only committed partitions and
# rewrites once per threshold crossing (amortized O(1) per batch —
# SCALE.md probe table); the parity fold is one 4-group aggregation.

N_SIM_INGEST_BATCHES = 5


def _phash_parity_oracle() -> str:
    from ..operators.multimodal import PHASH_BANDS, phash_hash_cte

    return f"""
    WITH {phash_hash_cte()},
    bands AS (
        SELECT h.doc_id, h.phash, CAST(t.band_id AS INT) AS band_id,
               (h.phash >> CAST(8 * t.band_id AS INT)) & 255 AS band_val
        FROM h CROSS JOIN range({PHASH_BANDS}) t(band_id)
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT band_val) AS BIGINT) AS n_band_vals,
           CAST(sum(phash) AS BIGINT) AS sum_phash,
           CAST(1 AS INT) AS store_partitions,
           TRUE AS compacted_parity
    FROM bands GROUP BY band_id
    """


@query("stream_phash_compacted_parity", oracle=_phash_parity_oracle())
def stream_phash_compacted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write the pHash band store as N simulated ingest batches, run
    the real compactor (plus a crash-leftover heal pass), and return
    the per-band fold of the compacted store alongside a parity
    check against the pre-write frame (block comment above)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.multimodal import phash_band_rows, phash_frame
    from .runtime import _compact_partition_store

    docs = load_table(spark, sf_dir, "documents")
    bands = phash_band_rows(phash_frame(docs)).localCheckpoint(eager=True)

    def fold(df: DataFrame, prefix: str = "") -> DataFrame:
        return df.groupBy("band_id").agg(
            F.count(F.lit(1)).cast("long").alias(f"{prefix}n_rows"),
            F.countDistinct("doc_id").cast("long").alias(f"{prefix}n_docs"),
            F.countDistinct("band_val")
            .cast("long")
            .alias(f"{prefix}n_band_vals"),
            F.sum("phash").cast("long").alias(f"{prefix}sum_phash"),
        )

    root = _tempfile.mkdtemp(prefix="pitlap_phash_parity_")
    store = f"{root}/store"
    try:
        batched = bands.withColumn(
            "b", F.pmod(F.col("doc_id"), F.lit(N_SIM_INGEST_BATCHES))
        )
        # all N simulated batch partitions in ONE write job (the
        # filtered per-batch loop re-scanned the checkpointed band
        # frame N times and paid N job floors for the same bytes);
        # partitionBy lays out the identical batch=<i> directories the
        # real sink's per-batch overwrite produces, except the
        # _SUCCESS commit marker lands at the ROOT — seal each batch
        # dir explicitly so the real compactor sees the same N
        # committed partitions the sequential writes produced
        batched.withColumnRenamed("b", "batch").write.partitionBy(
            "batch"
        ).mode("overwrite").parquet(store)
        for d in _os.listdir(store):
            if d.startswith("batch="):
                open(f"{store}/{d}/_SUCCESS", "w").close()
        # steady-state fold: all committed batches -> one generation
        _compact_partition_store(
            spark, store, current_batch=N_SIM_INGEST_BATCHES, threshold=2
        )
        # crash-window leftover: a sealed source whose rows already
        # live inside the generation (the write-then-delete gap);
        # the next compaction must fold it away via full-row dedup
        batched.filter(F.col("b") == 1).drop("b").write.mode(
            "overwrite"
        ).parquet(f"{store}/batch=1")
        _compact_partition_store(
            spark, store, current_batch=N_SIM_INGEST_BATCHES + 1, threshold=1
        )
        n_parts = len(
            [d for d in _os.listdir(store) if d.startswith("batch=")]
        )
        after = spark.read.parquet(store).drop("batch")
        pre = fold(bands, "pre_")
        parity = (
            (F.col("n_rows") == F.col("pre_n_rows"))
            & (F.col("n_docs") == F.col("pre_n_docs"))
            & (F.col("n_band_vals") == F.col("pre_n_band_vals"))
            & (F.col("sum_phash") == F.col("pre_sum_phash"))
        )
        result = (
            fold(after)
            .join(pre, "band_id")
            .select(
                "band_id",
                "n_rows",
                "n_docs",
                "n_band_vals",
                "sum_phash",
                F.lit(n_parts).cast("int").alias("store_partitions"),
                parity.alias("compacted_parity"),
            )
        )
        # materialize before the temp dir is removed (the standing
        # roundtrip-query device, sinks_query.py)
        return result.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(root, ignore_errors=True)


# ----------------- semantic ingest-store stream-vs-batch parity
# VERDICT r9 item 3, registered as a query: the embedding/semantic
# streaming ingest sink (runtime.run_semantic_ingest_sink — the third
# member of the crawl-ingest dedup family) must flag EXACTLY the
# vectors the batch dedup_semantic_top2 query flags on the same
# corpus, and its assignment store must read identically before and
# after generation compaction. This query drives the sink's real
# per-batch body (_semantic_ingest_batch — the same function
# foreachBatch runs) over the embeddings table split into id-ordered
# micro-batches, runs the real compactor twice (steady state + a
# simulated crash-window leftover whose rows already live in the
# generation), then folds the compacted store to a per-label grain
# the DuckDB oracle recomputes STRAIGHT from embeddings — the oracle
# never sees a store, a batch boundary, or a compaction. Any drop
# the stream makes that batch SemDeDup would not (or vice versa)
# flips n_dropped / sum_dropped_ids; any row compaction lost or
# duplicated flips n_rows; the two literal-TRUE parity columns
# additionally pin the Spark-side set comparisons.
#
# Why stream == batch holds EXACTLY (not approximately): the sink
# stores assignment rows for ALL ingested vectors (kept and dropped)
# and drops a vector iff some earlier-arrived vector shares a top-2
# cluster with cosine >= tau; with id-ordered batches
# "earlier-arrived" = "lower vec_id", which is precisely the batch
# twin's pair orientation (vec_a < vec_b), and both sides share the
# same quantizer frame, the same rank_against_centroids scorer, the
# same round-6 cosine, and the same tau — see the design block in
# streaming/runtime.py.
#
# 100-TB shape: the simulation is store-lifecycle-bound (the sink's
# own batch-partitioned parquet layout + amortized-O(1) compaction);
# the parity fold is one aggregation at the label grain.

def _drive_compacted_ingest(
    spark: SparkSession,
    src: DataFrame,
    id_col: str,
    make_ingest,
    n_batches: int,
    read_corpus: bool = False,
):
    """Shared harness for the ingest-parity queries (semantic / URL /
    span — one copy, three consumers, after the round-11 review
    flagged the drift risk of the crash-heal choreography living in
    each query): drive a sink's real per-batch body over id-ordered
    micro-batches of ``src``, then run the real compactor TWICE —
    steady state (all committed batches fold into a generation), then
    a simulated crash-window leftover (batch 1's sealed partition
    restored AFTER the fold, so its rows live in both the generation
    and the leftover source) that the second compaction must heal via
    full-row dedup. The capture/fold/restore/fold ORDER is
    load-bearing — that is exactly why it lives here once.

    ``make_ingest`` maps (store_path, corpus_path) to the per-batch
    body. Returns (pre, after, corpus, n_parts): the store read minus
    the partition column before/after compaction, the corpus read
    (None unless ``read_corpus`` — the semantic query never reads its
    corpus, and materializing it would change that benched query's
    measured work), and the post-heal partition count. Every returned
    frame is eagerly materialized (localCheckpoint) so callers keep
    using them after the temp dir is removed."""
    import math as _math
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from .runtime import _compact_partition_store

    # One eager lineage cut of the batch source before the loop: every
    # per-batch action (the sink body's isEmpty take, its lazy
    # checkpoint compiles, both writes) otherwise re-analyzes and
    # re-scans the full source lineage — for the URL query that is the
    # deep derived_raw_url expression tree, N_batches times over
    # (guide §1.2 fewer passes; profiled as the lifecycle queries'
    # inter-action driver floor). The cut happens INSIDE the timed
    # query, computed fresh from parquet per invocation.
    src = src.localCheckpoint(eager=True)
    # id-ordered ranges (arrival order must equal id order for the
    # stream-vs-batch equivalence — each query's block comment); the
    # max-id scalar is a bounded one-row collect
    max_id = src.agg(F.max(id_col)).collect()[0][0]
    if max_id is None:
        raise ValueError(
            f"ingest-parity harness: source has no rows (max({id_col}) "
            "is NULL) — every parity query needs a non-empty fixture"
        )
    if n_batches < 2:
        raise ValueError(
            "ingest-parity harness needs n_batches >= 2: the "
            "crash-window heal step restores a non-final committed "
            "partition after the fold"
        )
    width = _math.ceil((max_id + 1) / n_batches)

    root = _tempfile.mkdtemp(prefix="pitlap_ingest_parity_")
    store, corpus_path = f"{root}/store", f"{root}/corpus"
    try:
        ingest = make_ingest(store, corpus_path)
        for i in range(n_batches):
            ingest(
                src.filter(
                    (F.col(id_col) >= i * width)
                    & (F.col(id_col) < (i + 1) * width)
                ),
                i,
            )
        pre = (
            spark.read.parquet(store)
            .drop("batch")
            .localCheckpoint(eager=True)
        )
        # the crash-leftover partition must be one the ingest loop
        # actually WROTE (an empty middle batch early-returns without
        # writing its directory — hard-coding batch=1 would then
        # crash the read; ADVICE r11)
        written = sorted(
            int(d.split("=", 1)[1])
            for d in _os.listdir(store)
            if d.startswith("batch=")
        )
        assert written, (
            "ingest-parity harness: no store partitions were written "
            f"by {n_batches} batches over {max_id + 1} ids"
        )
        leftover_id = written[0]
        leftover = spark.read.parquet(
            f"{store}/batch={leftover_id}"
        ).localCheckpoint(eager=True)
        _compact_partition_store(
            spark, store, current_batch=n_batches, threshold=2
        )
        leftover.write.mode("overwrite").parquet(
            f"{store}/batch={leftover_id}"
        )
        _compact_partition_store(
            spark, store, current_batch=n_batches + 1, threshold=1
        )
        n_parts = len(
            [d for d in _os.listdir(store) if d.startswith("batch=")]
        )
        after = (
            spark.read.parquet(store)
            .drop("batch")
            .localCheckpoint(eager=True)
        )
        corpus = (
            spark.read.parquet(corpus_path)
            .drop("batch")
            .localCheckpoint(eager=True)
            if read_corpus
            else None
        )
        return pre, after, corpus, n_parts
    finally:
        _shutil.rmtree(root, ignore_errors=True)


N_SEM_INGEST_BATCHES = 3


def _run_pipelined_stages(stages, n_batches: int) -> None:
    """Run a chained multi-stage ingest simulation with one driver
    thread per stage: stage s processes its batches strictly in
    order, and batch i of stage s starts only after batch i of stage
    s-1 finished (the corpus-partition handoff). Equivalent to the
    sequential nested loop — same writes, same order within every
    store — but the per-batch driver floors of different stages
    overlap (guide §2.6). On any stage failure every downstream wait
    is released and the first error re-raised."""
    import threading

    from pyspark import InheritableThread

    done = [
        [threading.Event() for _ in range(n_batches)] for _ in stages
    ]
    errs: list[BaseException] = []

    def runner(s: int) -> None:
        try:
            for i in range(n_batches):
                if s > 0:
                    done[s - 1][i].wait()
                if errs:
                    return
                stages[s](i)
                done[s][i].set()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errs.append(e)
        finally:
            # release downstream waiters even on failure/early return
            for ev in done[s]:
                ev.set()

    threads = [
        InheritableThread(target=runner, args=(s,), daemon=True)
        for s in range(len(stages))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def _prefetch_frame(build):
    """Build and eagerly localCheckpoint a DataFrame on a background
    driver thread, returning a zero-arg handle that joins the thread
    and yields the materialized frame (re-raising any failure).

    The parity queries' batch-twin side (the batch dedup/gate rerun
    the stream is compared against) is INDEPENDENT of the ingest
    loop, and the loop's wall is mostly single-threaded driver work
    (per-batch Catalyst analysis, store listings) that leaves the
    executors idle — so computing the twin concurrently hides it
    almost entirely (guide §2.6 overlap independent jobs; VERDICT
    r12 item 5). InheritableThread keeps job-description/group
    thread-locals correct under concurrent driver threads."""
    from pyspark import InheritableThread

    box: dict = {}

    def run() -> None:
        try:
            box["df"] = build().localCheckpoint(eager=True)
        except BaseException as e:  # noqa: BLE001 — surfaced at join
            box["err"] = e

    t = InheritableThread(target=run, daemon=True)
    t.start()

    def handle() -> DataFrame:
        t.join()
        if "err" in box:
            raise box["err"]
        return box["df"]

    return handle


def _semantic_parity_oracle() -> str:
    # the pair/score chain is SHARED with dedup_semantic_top2's
    # oracle (similarity.semdedup_pair_ctes) so this oracle always
    # tests the same batch contract the stream is compared against
    # (round-10 review catch: a hand-copied twin could be retuned on
    # one side only)
    from ..operators.similarity import (
        SEMDEDUP_TAU,
        _ORACLE_CRANK,
        _ORACLE_VECS,
        semdedup_pair_ctes,
    )

    return f"""
    WITH {_ORACLE_VECS},
    {_ORACLE_CRANK},
    {semdedup_pair_ctes(2)},
    dropped AS (
        SELECT DISTINCT vec_b AS vec_id
        FROM scored WHERE cosine >= {SEMDEDUP_TAU}
    )
    SELECT a.label,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT a.vec_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT CASE WHEN d.vec_id IS NOT NULL
                                    THEN a.vec_id END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN d.vec_id IS NOT NULL
                         THEN a.vec_id ELSE 0 END) AS BIGINT)
               AS sum_dropped_ids,
           CAST(1 AS INT) AS store_partitions,
           TRUE AS stream_batch_parity,
           TRUE AS compacted_parity
    FROM assignm a LEFT JOIN dropped d USING (vec_id)
    GROUP BY 1
    """


@query("stream_semantic_compacted_parity", oracle=_semantic_parity_oracle())
def stream_semantic_compacted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the semantic ingest sink's real batch body over
    id-ordered micro-batches of the embeddings table, compact the
    assignment store (steady state + crash-leftover heal), and return
    the per-label fold of the compacted store alongside stream-vs-
    batch and pre-vs-post-compaction parity checks (block comment
    above)."""
    from ..operators.similarity import (
        _centroid_frame,
        dedup_semantic_top2,
    )
    from .runtime import _semantic_ingest_batch

    emb = load_table(spark, sf_dir, "embeddings")
    # batch-twin drop set, prefetched concurrently with the ingest
    # loop below (independent work; _prefetch_frame docstring)
    b_drop_handle = _prefetch_frame(
        lambda: dedup_semantic_top2(spark, sf_dir)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    pre, after, _, n_parts = _drive_compacted_ingest(
        spark,
        emb,
        "vec_id",
        lambda store, corpus: _semantic_ingest_batch(
            _centroid_frame(spark, sf_dir),
            store,
            corpus,
            compact_every=10 * N_SEM_INGEST_BATCHES,  # no fold mid-run
        ),
        N_SEM_INGEST_BATCHES,
    )

    def fold(df: DataFrame, prefix: str = "") -> DataFrame:
        ndrop = F.when(~F.col("kept"), F.col("vec_id"))
        return df.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias(f"{prefix}n_rows"),
            F.countDistinct("vec_id")
            .cast("long")
            .alias(f"{prefix}n_docs"),
            F.countDistinct(ndrop)
            .cast("long")
            .alias(f"{prefix}n_dropped"),
            F.sum(F.coalesce(ndrop, F.lit(0)))
            .cast("long")
            .alias(f"{prefix}sum_dropped_ids"),
        )

    # stream-vs-batch drop-set equality: symmetric difference of
    # the two vec_id sets must be empty (one-row scalar)
    s_drop = after.filter(~F.col("kept")).select("vec_id").distinct()
    b_drop = b_drop_handle()
    mism = (
        s_drop.withColumn("s", F.lit(1))
        .join(b_drop.withColumn("b", F.lit(1)), "vec_id", "full")
        .agg(
            F.count(
                F.when(F.col("s").isNull() | F.col("b").isNull(), 1)
            ).alias("n_mismatch")
        )
    )

    # FULL OUTER fold join: an inner join would silently DROP a
    # label compaction lost entirely (fold(after) has no row for
    # it) and every surviving row would still read parity=true —
    # whole-label loss must instead surface as a row with the
    # after-side counts zeroed and compacted_parity=false
    # (round-10 review catch). eqNullSafe makes a one-sided null
    # fail the equality instead of null-propagating to a null
    # flag.
    parity = (
        F.col("n_rows").eqNullSafe(F.col("pre_n_rows"))
        & F.col("n_docs").eqNullSafe(F.col("pre_n_docs"))
        & F.col("n_dropped").eqNullSafe(F.col("pre_n_dropped"))
        & F.col("sum_dropped_ids").eqNullSafe(
            F.col("pre_sum_dropped_ids")
        )
    )
    result = (
        fold(after)
        .join(fold(pre, "pre_"), "label", "full")
        .crossJoin(F.broadcast(mism))
        .select(
            "label",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.coalesce("sum_dropped_ids", F.lit(0)).alias(
                "sum_dropped_ids"
            ),
            F.lit(n_parts).cast("int").alias("store_partitions"),
            (F.col("n_mismatch") == 0).alias("stream_batch_parity"),
            parity.alias("compacted_parity"),
        )
    )
    # the inputs are all eagerly materialized by the harness (the
    # standing roundtrip-query device); checkpoint the result too so
    # the benched materialization cost stays where it always was
    return result.localCheckpoint(eager=True)


# --------------- URL ingest-store stream-vs-batch parity
# VERDICT r10 item 5a, registered as a query: the streaming URL
# front-door sink (runtime.run_url_ingest_sink — the fourth
# crawl-ingest family member, and the one a real crawl runs FIRST)
# must keep EXACTLY the documents the batch URL gate
# (text_url_canonicalize_gate) keeps on the same corpus, and its
# seen-URL store must read identically before and after generation
# compaction. Same harness shape as the semantic parity query: drive
# the sink's real per-batch body over id-ordered micro-batches, run
# the real compactor twice (steady state + a crash-window leftover
# heal), fold the compacted store and the corpus to the site grain,
# and compare against a DuckDB oracle that recomputes the kept set
# STRAIGHT from the batch gate's shared CTE chain
# (operators/webgate.py GATE_CTES — one chain, two consumers, so the
# stream is always compared against exactly the batch contract).
#
# Why stream == batch holds EXACTLY: the sink keeps the FIRST-SEEN
# canonical URL (intra-batch: lowest doc_id wins the window;
# cross-batch: earlier-arrived store rows win the anti-join), and
# with id-ordered batches "first-seen" = "lowest doc_id among
# unblocked members of the canonical group" — precisely the batch
# gate's keep rule. Both sides share canonicalize_url/extract_site
# (Spark) against the SAME oracle CTE chain the batch gate is
# value-checked with, so neither canonicalization nor gating can
# drift between the twins.
#
# 100-TB shape: the simulation is store-lifecycle-bound (the sink's
# batch-partitioned parquet layout + amortized-O(1) compaction); the
# parity fold is one aggregation at the site grain; the sink itself
# never shuffles the store (broadcast semi/anti probe — the sink's
# block comment).

N_URL_INGEST_BATCHES = 3


def _url_parity_oracle() -> str:
    from ..operators.webgate import GATE_CTES

    return f"""
    WITH {GATE_CTES},
    kept AS (
        SELECT doc_id, url_canon, site FROM flagged
        WHERE NOT is_blocked AND NOT is_dup
    )
    SELECT site,
           CAST(count(DISTINCT url_canon) AS BIGINT) AS n_urls,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids,
           CAST(1 AS INT) AS store_partitions,
           TRUE AS stream_batch_parity,
           TRUE AS compacted_parity
    FROM kept GROUP BY 1
    """


@query("stream_url_gate_compacted_parity", oracle=_url_parity_oracle())
def stream_url_gate_compacted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the URL ingest sink's real batch body over id-ordered
    micro-batches of the documents table (raw URLs derived exactly
    as the batch gate derives them), compact the seen-URL store
    (steady state + crash-leftover heal), and return the per-site
    fold of the compacted store and corpus alongside stream-vs-batch
    and pre-vs-post-compaction parity checks (block comment
    above)."""
    from ..operators.webgate import (
        derived_raw_url,
        text_url_canonicalize_gate,
    )
    from .runtime import _url_ingest_batch

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", derived_raw_url().alias("url_raw")
    )
    # batch-twin kept set, prefetched concurrently with the ingest
    # loop below (independent work; _prefetch_frame docstring)
    b_kept_handle = _prefetch_frame(
        lambda: text_url_canonicalize_gate(spark, sf_dir)
        .filter(F.col("kept"))
        .select("doc_id")
        .distinct()
    )
    pre, after, corpus, n_parts = _drive_compacted_ingest(
        spark,
        docs,
        "doc_id",
        lambda store, corp: _url_ingest_batch(
            store, corp, compact_every=10 * N_URL_INGEST_BATCHES
        ),
        N_URL_INGEST_BATCHES,
        read_corpus=True,
    )

    def fold(df: DataFrame, prefix: str = "") -> DataFrame:
        return df.groupBy("site").agg(
            F.countDistinct("url_canon")
            .cast("long")
            .alias(f"{prefix}n_urls"),
            F.count(F.lit(1)).cast("long").alias(f"{prefix}n_rows"),
            F.sum("doc_id").cast("long").alias(f"{prefix}sum_ids"),
        )

    # stream-vs-batch kept-set equality: symmetric difference of
    # the corpus doc_ids and the batch gate's kept doc_ids must
    # be empty (one-row scalar)
    s_kept = corpus.select("doc_id").distinct()
    b_kept = b_kept_handle()
    mism = (
        s_kept.withColumn("s", F.lit(1))
        .join(b_kept.withColumn("b", F.lit(1)), "doc_id", "full")
        .agg(
            F.count(
                F.when(F.col("s").isNull() | F.col("b").isNull(), 1)
            ).alias("n_mismatch")
        )
    )
    # corpus fold at the site grain (n_kept): the store fold
    # supplies n_urls/sum_kept_ids — two independent artifacts
    # cross-checking each other
    corp = corpus.groupBy("site").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )

    # FULL OUTER fold join (the semantic parity query's
    # round-10 review catch): whole-site loss in compaction must
    # surface as compacted_parity=false, not vanish
    parity = (
        F.col("n_urls").eqNullSafe(F.col("pre_n_urls"))
        & F.col("n_rows").eqNullSafe(F.col("pre_n_rows"))
        & F.col("sum_ids").eqNullSafe(F.col("pre_sum_ids"))
    )
    result = (
        fold(after)
        .join(fold(pre, "pre_"), "site", "full")
        .join(corp, "site", "full")
        .crossJoin(F.broadcast(mism))
        .select(
            "site",
            F.coalesce("n_urls", F.lit(0)).alias("n_urls"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("sum_ids", F.lit(0)).alias("sum_kept_ids"),
            F.lit(n_parts).cast("int").alias("store_partitions"),
            (F.col("n_mismatch") == 0).alias("stream_batch_parity"),
            parity.alias("compacted_parity"),
        )
    )
    # inputs eagerly materialized by the harness; checkpoint the
    # result too (the standing roundtrip-query device)
    return result.localCheckpoint(eager=True)


# --------------- span-dedup ingest stream-vs-batch parity
# The fifth crawl-ingest family member's parity query: the streaming
# exact-substring cut (runtime.run_span_dedup_ingest_sink) must
# produce EXACTLY the cleaned corpus the batch Lee-et-al apply
# (dedup_repeated_spans_apply) produces on the same documents, and
# its first-seen gram store must read identically before and after
# generation compaction. Same harness shape as the semantic and URL
# parity queries: drive the sink's real per-batch body over
# id-ordered micro-batches, run the real compactor twice (steady
# state + crash-leftover heal), and compare the per-doc cleaned
# output against a DuckDB oracle built from the SAME CTE chain as
# the batch apply's oracle (dedup.SPAN_APPLY_CTES — one chain, two
# consumers).
#
# Why stream == batch holds EXACTLY: the batch rule cuts every
# occurrence of a repeated gram except the first by (doc_id, pos);
# the first occurrence is NEVER cut, so the batch-0 output cannot
# depend on batches it hasn't seen, and with id-ordered arrival
# "earlier occurrence exists" (the stream's cut test: rn > 1 within
# the batch, or gram in the store) is precisely "row_number over
# (doc_id, pos) > 1" globally. Hash note: the sink grams with
# xxhash64 (production), the oracle replays the md5 chain — cut
# decisions are a function of gram equality only (the repeated-spans
# twin argument), and the compared artifact is the cleaned TOKEN
# TEXT, which is hash-independent.
#
# 100-TB shape: store rows ~ corpus distinct grams (the known
# suffix-array-class cost of exact-substring dedup); the sink never
# shuffles the store (broadcast gram-key probe); the parity compare
# is one full-outer join at the doc grain.

N_SPAN_INGEST_BATCHES = 3


def _span_parity_oracle() -> str:
    from ..operators.dedup import SPAN_APPLY_CTES

    return f"""
    WITH {SPAN_APPLY_CTES}
    SELECT tk.doc_id,
           CAST(len(tk.t) AS BIGINT) AS n_tokens_before,
           coalesce(c.n_tokens_after, 0) AS n_tokens_after,
           coalesce(n.n_spans_cut, 0) AS n_spans_cut,
           md5(coalesce(c.cleaned_text, '')) AS cleaned_fp,
           CAST(1 AS INT) AS store_partitions,
           TRUE AS stream_batch_parity,
           TRUE AS compacted_parity
    FROM toks tk
    LEFT JOIN cleaned c ON c.doc_id = tk.doc_id
    LEFT JOIN nspans n ON n.doc_id = tk.doc_id
    """


@query("stream_span_dedup_compacted_parity", oracle=_span_parity_oracle())
def stream_span_dedup_compacted_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the span-dedup ingest sink's real batch body over
    id-ordered micro-batches of the documents table, compact the
    first-seen gram store (steady state + crash-leftover heal), and
    return the per-doc cleaned fold alongside stream-vs-batch and
    pre-vs-post-compaction parity checks (block comment above)."""
    from ..operators.dedup import dedup_repeated_spans_apply
    from .runtime import _span_ingest_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # batch-twin cleaned corpus, prefetched concurrently with the
    # ingest loop below (independent work; _prefetch_frame docstring)
    batch_out_handle = _prefetch_frame(
        lambda: dedup_repeated_spans_apply(spark, sf_dir)
    )
    pre, after, corpus, n_parts = _drive_compacted_ingest(
        spark,
        docs,
        "doc_id",
        lambda store, corp: _span_ingest_batch(
            store, corp, compact_every=10 * N_SPAN_INGEST_BATCHES
        ),
        N_SPAN_INGEST_BATCHES,
        read_corpus=True,
    )

    def fold(df: DataFrame, prefix: str = "") -> DataFrame:
        # one-row scalar fold of the gram store (no small natural
        # grain exists on a gram store; sums are DECIMAL so long
        # hash values cannot overflow)
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"{prefix}n_rows"),
            F.countDistinct("g").cast("long").alias(f"{prefix}n_g"),
            F.sum(F.col("g").cast("decimal(38,0)")).alias(
                f"{prefix}sum_g"
            ),
            F.sum("doc_id").cast("long").alias(f"{prefix}sum_doc"),
            F.sum("pos").cast("long").alias(f"{prefix}sum_pos"),
        )

    comp = (
        fold(after)
        .crossJoin(F.broadcast(fold(pre, "pre_")))
        .select(
            (
                F.col("n_rows").eqNullSafe(F.col("pre_n_rows"))
                & F.col("n_g").eqNullSafe(F.col("pre_n_g"))
                & F.col("sum_g").eqNullSafe(F.col("pre_sum_g"))
                & F.col("sum_doc").eqNullSafe(F.col("pre_sum_doc"))
                & F.col("sum_pos").eqNullSafe(F.col("pre_sum_pos"))
            ).alias("compacted_ok")
        )
    )

    # stream-vs-batch cleaned-corpus equality: full outer on
    # doc_id over every output column (one-row scalar)
    stream_out = corpus
    batch_out = batch_out_handle()
    s = stream_out.select(
        "doc_id",
        F.col("n_tokens_before").alias("s_b"),
        F.col("n_tokens_after").alias("s_a"),
        F.col("n_spans_cut").alias("s_c"),
        F.col("cleaned_text").alias("s_t"),
    )
    b = batch_out.select(
        "doc_id",
        F.col("n_tokens_before").alias("b_b"),
        F.col("n_tokens_after").alias("b_a"),
        F.col("n_spans_cut").alias("b_c"),
        F.col("cleaned_text").alias("b_t"),
    )
    mism = (
        s.join(b, "doc_id", "full")
        .agg(
            F.count(
                F.when(
                    ~(
                        F.col("s_b").eqNullSafe(F.col("b_b"))
                        & F.col("s_a").eqNullSafe(F.col("b_a"))
                        & F.col("s_c").eqNullSafe(F.col("b_c"))
                        & F.col("s_t").eqNullSafe(F.col("b_t"))
                    ),
                    1,
                )
            ).alias("n_mismatch")
        )
    )
    result = (
        stream_out.crossJoin(F.broadcast(mism))
        .crossJoin(F.broadcast(comp))
        .select(
            "doc_id",
            "n_tokens_before",
            "n_tokens_after",
            "n_spans_cut",
            F.md5("cleaned_text").alias("cleaned_fp"),
            F.lit(n_parts).cast("int").alias("store_partitions"),
            (F.col("n_mismatch") == 0).alias("stream_batch_parity"),
            F.col("compacted_ok").alias("compacted_parity"),
        )
    )
    # inputs eagerly materialized by the harness; checkpoint the
    # result too (the standing roundtrip-query device)
    return result.localCheckpoint(eager=True)


# --------------- composed crawl-ingest pipeline stream-vs-batch parity
# The five crawl-ingest sinks are each proven in isolation; a real
# 100-TB pipeline CHAINS them, and ordering effects are exactly what
# the per-sink parity queries cannot see: the URL gate changes which
# documents every downstream store ever ingests, and the span cut
# changes the text the minhash stage shingles (VERDICT r11 item 4).
# This query drives FOUR sinks' REAL per-batch bodies
# (_url_ingest_batch -> _span_ingest_batch -> _dedup_ingest_batch ->
# _semantic_ingest_batch) as one chained body over id-ordered
# micro-batches — each stage consuming the previous stage's
# batch-scoped corpus partition (the semantic stage consuming the
# minhash survivors' embeddings, vec_id == doc_id), the production
# composition shape — and pins the per-document outcome of every
# stage against a DuckDB oracle that composes the SAME CTE chains the
# stages' own oracles use (webgate.GATE_CTES + dedup.span_apply_ctes
# rebased on the gated set + similarity.semdedup_pair_ctes restricted
# to the minhash survivors) plus an UNROLLED N-batch replay of the
# minhash sink's decision procedure (intra-batch: lower-id
# band-colliding estimate>=0.7 wins; cross-batch: estimate>=0.7
# against any earlier batch's SURVIVOR store rows — survivors-only is
# the minhash store's contract, so its kept set is chain-sequential
# across batches and the oracle must replay it batch by batch rather
# than state it as one closed form; the SEMANTIC store by contrast
# persists kept AND dropped rows, which makes its drop set
# order-independent under id-ordered arrival — one declarative pair
# pass, no unrolling).
#
# Why stream == this oracle EXACTLY, stage by stage: (1) URL gate —
# with id-ordered arrival, intra-batch keep-lowest + cross-batch
# first-seen equals the batch gate's global min-doc_id-per-URL rule
# (the r11 hypothesis property); (2) span cut — the first occurrence
# by (doc_id, pos) is never cut, so per-batch rn>1-or-seen equals the
# corpus-global row_number rule over the GATED corpus (the span
# parity argument, unchanged by the gate because the gate only
# shrinks the corpus the rule ranges over); (3) minhash — no
# equivalence argument needed: the oracle replays the sink's exact
# per-batch procedure, unrolled for the fixed batch count;
# (4) semantic — with the store persisting every ingested row, "b
# drops iff some earlier-arrived a shares a top-2 cluster at
# cosine >= tau" equals the batch pair rule over the survivor
# corpus (the stream_semantic_compacted_parity argument, restricted
# to the corpus this stage actually sees).
#
# 100-TB shape: the chain adds NO new shuffle beyond the member
# sinks' own (gate: one window; span: token-linear gram explode +
# broadcast store probe; minhash: banded candidate space + broadcast
# batch side); the final per-doc assembly is three doc_id equi-joins
# at the document grain. Docs whose cleaned text yields no shingles
# (< SHINGLE_K tokens after cutting) have no minhash signature and
# are dropped by the minhash stage on both sides by construction.

N_PIPE_BATCHES = 3


def _pipeline_parity_oracle() -> str:
    from ..functions.text import (
        SHINGLE_K,
        oracle_minhash_base_sql,
        oracle_minhash_sig_cols,
        oracle_shingles_cte,
    )
    from ..operators.dedup import (
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        span_apply_ctes,
    )
    from ..operators.similarity import (
        SEMDEDUP_TAU,
        _ORACLE_CRANK,
        _ORACLE_VECS,
        semdedup_pair_ctes,
    )
    from ..operators.webgate import GATE_CTES
    from .runtime import DEDUP_INGEST_EST_THRESHOLD

    def est(x: str, y: str) -> str:
        agree = " + ".join(
            f"(CASE WHEN {x}.h{j} = {y}.h{j} THEN 1 ELSE 0 END)"
            for j in range(N_HASHES)
        )
        return f"(({agree}) / {N_HASHES}.0)"

    band_rows = " UNION ALL ".join(
        "SELECT doc_id, b, {k} AS band_idx, md5({e}) AS band_val FROM sigb".format(
            k=k,
            e=" || '|' || ".join(
                f"h{k * ROWS_PER_BAND + r}::VARCHAR"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for k in range(N_BANDS)
    )
    # unrolled sequential minhash replay: batch i's intra-survivors
    # (k0) drop against the ACCUMULATED survivors of batches < i
    replay = ["s0 AS (SELECT doc_id FROM k0 WHERE b = 0)"]
    prev = "s0"
    for i in range(1, N_PIPE_BATCHES):
        replay.append(
            f"""x{i} AS (
        SELECT DISTINCT nb.doc_id
        FROM bands cb
        JOIN bands nb ON cb.band_idx = nb.band_idx
             AND cb.band_val = nb.band_val
        JOIN k0 kn ON kn.doc_id = nb.doc_id AND kn.b = {i}
        JOIN {prev} sv ON sv.doc_id = cb.doc_id
        JOIN sig sx ON sx.doc_id = cb.doc_id
        JOIN sig sy ON sy.doc_id = nb.doc_id
        WHERE {est("sx", "sy")} >= {DEDUP_INGEST_EST_THRESHOLD}
    )"""
        )
        replay.append(
            f"s{i} AS (SELECT doc_id FROM k0 WHERE b = {i} "
            f"AND doc_id NOT IN (SELECT doc_id FROM x{i}))"
        )
        replay.append(
            f"sacc{i} AS (SELECT doc_id FROM {prev} "
            f"UNION ALL SELECT doc_id FROM s{i})"
        )
        prev = f"sacc{i}"

    return f"""
    WITH {GATE_CTES},
    g_kept AS (
        SELECT doc_id FROM flagged WHERE NOT is_blocked AND NOT is_dup
    ),
    gdocs AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN g_kept USING (doc_id)
    ),
    {span_apply_ctes("gdocs")},
    cdocs AS (
        SELECT tk.doc_id,
               coalesce(c.cleaned_text, '') AS text,
               CAST(coalesce(c.n_tokens_after, 0) AS BIGINT)
                   AS n_tokens_after
        FROM toks tk LEFT JOIN cleaned c ON c.doc_id = tk.doc_id
    ),
    sh0 AS ({oracle_shingles_cte(SHINGLE_K, "cdocs")}),
    shb AS (SELECT doc_id, {oracle_minhash_base_sql()} FROM sh0),
    sig AS (
        SELECT doc_id, {oracle_minhash_sig_cols(N_HASHES)}
        FROM shb GROUP BY doc_id
    ),
    wd AS (
        SELECT (max(doc_id) + {N_PIPE_BATCHES}) // {N_PIPE_BATCHES}
               AS width
        FROM documents
    ),
    sigb AS (
        SELECT sig.*, CAST(sig.doc_id // wd.width AS INT) AS b
        FROM sig, wd
    ),
    bands AS ({band_rows}),
    intra AS (
        SELECT DISTINCT bb.doc_id
        FROM bands a
        JOIN bands bb ON a.b = bb.b AND a.band_idx = bb.band_idx
             AND a.band_val = bb.band_val AND a.doc_id < bb.doc_id
        JOIN sig sx ON sx.doc_id = a.doc_id
        JOIN sig sy ON sy.doc_id = bb.doc_id
        WHERE {est("sx", "sy")} >= {DEDUP_INGEST_EST_THRESHOLD}
    ),
    k0 AS (
        SELECT sigb.doc_id, sigb.b FROM sigb
        WHERE sigb.doc_id NOT IN (SELECT doc_id FROM intra)
    ),
    {",".join(replay)},
    {_ORACLE_VECS.strip().rstrip()},
    {_ORACLE_CRANK.strip().rstrip()},
    crank_surv AS (
        SELECT c.* FROM crank c
        JOIN {prev} mh ON mh.doc_id = c.vec_id
    ),
    {semdedup_pair_ctes(2, "crank_surv")},
    sem_dropped AS (
        SELECT DISTINCT vec_b AS vec_id
        FROM scored WHERE cosine >= {SEMDEDUP_TAU}
    )
    SELECT d.doc_id,
           g.doc_id IS NOT NULL AS gate_kept,
           cd.n_tokens_after AS n_tokens_after,
           mk.doc_id IS NOT NULL AS minhash_kept,
           (mk.doc_id IS NOT NULL AND sd.vec_id IS NULL) AS final_kept
    FROM documents d
    LEFT JOIN g_kept g ON g.doc_id = d.doc_id
    LEFT JOIN cdocs cd ON cd.doc_id = d.doc_id
    LEFT JOIN {prev} mk ON mk.doc_id = d.doc_id
    LEFT JOIN sem_dropped sd ON sd.vec_id = d.doc_id
    """


@query("stream_ingest_pipeline_parity", oracle=_pipeline_parity_oracle())
def stream_ingest_pipeline_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the URL-gate -> span-cut -> minhash -> semantic
    crawl-ingest chain end-to-end over id-ordered micro-batches —
    each stage the REAL production per-batch body, each consuming
    the previous stage's batch-scoped corpus partition — and return
    the per-document outcome of every stage (block comment
    above)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.similarity import _centroid_frame
    from ..operators.webgate import derived_raw_url
    from .runtime import (
        _dedup_ingest_batch,
        _semantic_ingest_batch,
        _span_ingest_batch,
        _url_ingest_batch,
    )

    # one eager lineage cut before the loop (the harness device —
    # _drive_compacted_ingest's block comment): per-batch actions
    # otherwise re-analyze the derived_raw_url tree and re-scan the
    # documents parquet once per stage action
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", derived_raw_url().alias("url_raw"))
        .localCheckpoint(eager=True)
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    # integer ceil — exact on both engines (the oracle's wd CTE)
    width = (max_id + N_PIPE_BATCHES) // N_PIPE_BATCHES

    root = _tempfile.mkdtemp(prefix="pitlap_pipeline_parity_")
    never = 10 * N_PIPE_BATCHES  # compaction off: the per-sink
    # parity queries own the compaction choreography; this query
    # pins the CHAIN
    try:
        u_corp = f"{root}/url_corpus"
        s_corp = f"{root}/span_corpus"
        m_corp = f"{root}/mh_corpus"
        e_corp = f"{root}/sem_corpus"
        url_ing = _url_ingest_batch(f"{root}/url_store", u_corp, never)
        span_ing = _span_ingest_batch(f"{root}/span_store", s_corp, never)
        mh_ing = _dedup_ingest_batch(f"{root}/mh_store", m_corp, never)
        sem_ing = _semantic_ingest_batch(
            _centroid_frame(spark, sf_dir),
            f"{root}/sem_store",
            e_corp,
            never,
        )
        # lazy cut: emb feeds one semi-join per surviving batch —
        # materializes inside its first consumer's job, later batches
        # read the cached blocks instead of re-scanning parquet
        emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(
            eager=False
        )

        # each stage early-returns (writing nothing) on an empty
        # batch, so downstream stages gate on partition existence
        def _url_stage(i: int) -> None:
            url_ing(
                docs.filter(
                    (F.col("doc_id") >= i * width)
                    & (F.col("doc_id") < (i + 1) * width)
                ),
                i,
            )

        def _span_stage(i: int) -> None:
            p = f"{u_corp}/batch={i}"
            if _os.path.exists(p):
                span_ing(
                    spark.read.parquet(p).select("doc_id", "text"), i
                )

        def _mh_stage(i: int) -> None:
            p = f"{s_corp}/batch={i}"
            if _os.path.exists(p):
                mh_ing(
                    spark.read.parquet(p).select(
                        "doc_id", F.col("cleaned_text").alias("text")
                    ),
                    i,
                )

        def _sem_stage(i: int) -> None:
            p = f"{m_corp}/batch={i}"
            if _os.path.exists(p):
                # stage 4: semantic dedup over the minhash survivors'
                # embeddings (vec_id == doc_id, the fixture contract)
                sem_ing(
                    emb.join(
                        spark.read.parquet(p)
                        .select(F.col("doc_id").alias("vec_id"))
                        .distinct(),
                        "vec_id",
                        "left_semi",
                    ),
                    i,
                )

        # Software-pipelined chain (guide §2.6 overlap independent
        # jobs): stage s of batch i depends ONLY on stage s-1 of
        # batch i (its corpus partition) and stage s of batch i-1
        # (its own store order), never on a LATER batch of an earlier
        # stage — so url(i+1) can run while span(i) runs, etc. One
        # driver thread per stage, each consuming its batches in
        # order and signalling the stage below per batch; store
        # contents, batch order within each stage, and therefore
        # every result row are identical to the sequential loop. The
        # sequential chain paid 4 stages x N batches of back-to-back
        # per-batch driver floors (Catalyst per-frame analysis) on an
        # idle cluster; the pipeline overlaps them to ~(4 + N - 1)
        # slots.
        _run_pipelined_stages(
            [_url_stage, _span_stage, _mh_stage, _sem_stage],
            N_PIPE_BATCHES,
        )
        # eager reads — the temp stores are removed in finally
        g = (
            spark.read.parquet(u_corp)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        sp = (
            spark.read.parquet(s_corp)
            .select("doc_id", "n_tokens_after")
            .localCheckpoint(eager=True)
        )
        mh = (
            spark.read.parquet(m_corp)
            .select("doc_id")
            .localCheckpoint(eager=True)
            if _os.path.exists(m_corp)
            else spark.createDataFrame([], "doc_id long")
        )
        sem = (
            spark.read.parquet(e_corp)
            .select(F.col("vec_id").alias("doc_id"))
            .localCheckpoint(eager=True)
            if _os.path.exists(e_corp)
            else spark.createDataFrame([], "doc_id long")
        )
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    result = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(g.withColumn("_g", F.lit(True)), "doc_id", "left")
        .join(sp, "doc_id", "left")
        .join(mh.withColumn("_m", F.lit(True)), "doc_id", "left")
        .join(sem.withColumn("_s", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_g", F.lit(False)).alias("gate_kept"),
            F.col("n_tokens_after").cast("long").alias("n_tokens_after"),
            F.coalesce("_m", F.lit(False)).alias("minhash_kept"),
            F.coalesce("_s", F.lit(False)).alias("final_kept"),
        )
    )
    return result.localCheckpoint(eager=True)
