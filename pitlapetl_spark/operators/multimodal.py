"""Multimodal-column operators — BASELINE.json north star: treat
image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError; the
queries use byte-level features instead) — but everything Spark-side
is real and tested: the binary column, the metadata struct schema, the
mapInPandas signature, the Arrow batch shape, and the frame-sampling
fan-out.

Scale design: binary payloads ride the same columnar batches as
everything else; mapInPandas streams Arrow record batches through
Python one partition at a time (no collect, no per-row pickling).
At 100 TB you partition by content-size buckets so one giant video
doesn't skew a task, and push the metadata filter (media_type,
byte-length bounds) BEFORE the Python stage so the slow path sees
only qualifying rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

FRAME_BYTES = 64  # bytes per pseudo-frame of a 'video' payload
FRAME_STRIDE = 4  # sample every 4th frame

META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_media(blob: bytes, media_type: str):
    """STUB — real pixel/sample decode needs codec libraries not
    present in this container (PIL/ffmpeg). The Spark-side contract
    (binary in, array/tensor out via mapInPandas) is exercised by the
    byte-level feature queries below."""
    raise NotImplementedError(
        f"decode_media({media_type}): codec libraries are not available; "
        "byte-level features are implemented in mm_binary_features"
    )


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach the multimodal layout to the documents table: payload
    bytes (here: the utf-8 text standing in for media bytes) + typed
    metadata struct derived deterministically from doc_id."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            (32 + (F.col("doc_id") % 8) * 16).cast("int").alias("width"),
            (32 + (F.col("doc_id") % 4) * 16).cast("int").alias("height"),
        ).alias("meta"),
    )


_MEDIA_TYPE_SQL = """
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END
"""

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


@query(
    "mm_binary_features",
    oracle=f"""
    SELECT doc_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over the binary column via
    Arrow-batched mapInPandas (the decode-adjacent slow path, run only
    after metadata filters). Features are computed from the actual
    payload bytes Python-side; the oracle recomputes them from the
    source text (payload == utf-8(text), all-ASCII corpus)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mm = with_media_columns(docs).select(
        "doc_id", F.col("meta.media_type").alias("media_type"), "blob"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "first_byte": blobs.map(lambda b: b[0]).astype("int32"),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return mm.mapInPandas(feats, _FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
        SELECT doc_id, text,
               CAST(ceil(octet_length(encode(text)) * 1.0 / {FRAME_BYTES}) AS INT) AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2
    )
    SELECT doc_id, n_frames,
           CAST(f AS INT) AS frame_idx,
           md5(substr(text, f * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM v, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(f)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling of 'video' payloads: metadata filter FIRST
    (media_type = 'video' never reaches Python), then mapInPandas
    slices every {FRAME_STRIDE}th {FRAME_BYTES}-byte pseudo-frame and
    fingerprints it — one input row fans out to ~n_frames/stride
    output rows, the decode-then-sample shape of a real video
    pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mm = (
        with_media_columns(docs)
        .filter(F.col("meta.media_type") == "video")
        .select("doc_id", "blob")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "n_frames": [],
                "frame_idx": [],
                "frame_md5": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = -(-len(blob) // FRAME_BYTES)
                for f in range(0, n_frames, FRAME_STRIDE):
                    chunk = blob[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["n_frames"].append(n_frames)
                    rows["frame_idx"].append(f)
                    rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows).astype(
                {"n_frames": "int32", "frame_idx": "int32"}
            )

    return mm.mapInPandas(sample, _FRAMES_SCHEMA)


@query(
    "mm_metadata_stats",
    oracle=f"""
    SELECT {_MEDIA_TYPE_SQL.replace("doc_id", "doc_id")} AS media_type,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(32 + (doc_id % 8) * 16) AS INT) AS max_width
    FROM documents
    GROUP BY 1
    """,
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-metadata aggregation over the multimodal layout — the
    cheap JVM-side pass that sizes/filters a corpus BEFORE any decode:
    per-media-type doc count, payload bytes, max declared width."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mm = with_media_columns(docs)
    return (
        mm.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("blob")).alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
        )
    )
