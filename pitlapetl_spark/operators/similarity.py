"""Similarity search over the ``embeddings`` table (array<float>
column) — BASELINE.json north star: brute-force cosine top-k as the
exact baseline, a deterministic sign-LSH bucketed variant as the
scale path.

Scale design:

- **brute force** is a broadcast join of the (tiny) query set against
  the full corpus — linear scans are embarrassingly parallel and the
  per-row cosine is a JVM array expression (zip_with + aggregate)
  inside whole-stage codegen. Correct at any corpus size, O(Q x N).
- **sign-LSH** hashes every vector to a b-bit bucket with
  deterministic pseudo-random +-1 hyperplanes derived from md5 (so
  the DuckDB oracle replays the exact same planes); search touches
  only the query's bucket — O(Q x N / 2^b) expected. Recall is
  traded via b and multi-probe; at production scale the same plan
  works with learned IVF centroids in place of the hash.

Determinism contract: cosines are computed in double and round(6)-ed
before ranking; ranking ties break on vec_id — total order, identical
in Spark and DuckDB.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

N_QUERIES = 10  # vectors with vec_id < N_QUERIES are the query set
TOP_K = 5
LSH_PLANES = 8
_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")
_HEX_IN = ", ".join(repr(h) for h in _HEX_HIGH)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings cast to double with precomputed L2 norm (narrow)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("nrm", F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))


_COS = (
    "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
)

_ORACLE_VECS = """
    u AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM u GROUP BY 1)
"""


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH {_ORACLE_VECS},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               sum(q.x * c.x) AS dot
        FROM u q JOIN u c ON q.i = c.i
        WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the full
    corpus, JVM-side dot products, per-query row_number window."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES)
    scored = (
        F.broadcast(queries)
        .alias("q")
        .join(vecs.alias("c"), F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(
                F.expr(_COS) / (F.col("q.nrm") * F.col("c.nrm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


def _bucket_expr_spark() -> str:
    """b-bit sign-LSH bucket from md5-derived +-1 hyperplanes.
    Plane p, dim d sign = +1 iff the first hex char of md5('p_d') has
    its high bit set. Pure array expression, 0-based dims."""
    bits = []
    for p in range(LSH_PLANES):
        proj = (
            f"aggregate(sequence(0, size(v) - 1), 0D, (acc, d) -> acc + "
            f"(CASE WHEN substring(md5(concat('{p}_', d)), 1, 1) IN ({_HEX_IN}) "
            f"THEN v[d] ELSE -v[d] END))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _bucket_expr_duck() -> str:
    bits = []
    for p in range(LSH_PLANES):
        proj = (
            f"list_sum(list_transform(range(1, len(v) + 1), d -> "
            f"(CASE WHEN substr(md5('{p}_' || (d - 1)), 1, 1) IN ({_HEX_IN}) "
            f"THEN v[d] ELSE -v[d] END)))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


@query(
    "sim_topk_lsh",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               CAST({_bucket_expr_duck()} AS INT) AS bucket
        FROM vecs
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.bucket AS bucket,
               round(list_sum(list_transform(range(1, len(q.v) + 1),
                     i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, bucket, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH bucketing: vectors hash to an
    8-bit bucket (narrow map), search runs only inside the query's
    bucket (equi-join on bucket -> hash join, never a cross join).
    The bucket column is exactly what you'd persist + partition by
    for repeated ANN serving at 100 TB."""
    vecs = _vectors(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_expr_spark()).cast("int")
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES)
    scored = (
        F.broadcast(queries)
        .alias("q")
        .join(
            vecs.alias("c"),
            (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("q.bucket").alias("bucket"),
            F.round(F.expr(_COS) / (F.col("q.nrm") * F.col("c.nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


@query(
    "sim_topk_lsh_multiprobe",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
               CAST({_bucket_expr_duck()} AS INT) AS bucket
        FROM vecs
    ),
    probes AS (
        SELECT vec_id, v, nrm,
               unnest([{", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(LSH_PLANES)])}]) AS probe
        FROM bucketed WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, len(q.v) + 1),
                     i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine
        FROM probes q JOIN bucketed c
          ON q.probe = c.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH: each query additionally probes the
    ``LSH_PLANES`` buckets at Hamming distance 1 (flip one plane bit),
    trading a (b+1)x fan-out of the *tiny* query side for recall —
    measured 2x the single-probe recall at sf0.01 on this corpus
    (near-orthogonal random vectors are LSH's worst case; real
    embedding clusters concentrate much faster). The corpus side is
    still touched once per probed bucket via the same equi-join —
    never a cross join — so the 100-TB cost model is unchanged:
    O(Q x (b+1) x N / 2^b) expected. A query-side explode before a
    broadcast join is the canonical Spark shape for multi-probe."""
    vecs = _vectors(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_expr_spark()).cast("int")
    )
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)
    ]
    queries = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("probe", F.explode(F.array(*probes)))
    )
    scored = (
        F.broadcast(queries)
        .alias("q")
        .join(
            vecs.alias("c"),
            (F.col("q.probe") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(F.expr(_COS) / (F.col("q.nrm") * F.col("c.nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------- L-tables LSH

# Pinned from the round-8 recall dial (SCALE.md "ANN recall ladder"):
# L independent b-plane tables; recall ≈ 1 - (1 - p^b)^L where the
# single 8-plane table measured 0.04 on this weak-contrast corpus.
# Fewer planes per table raises the per-table collision probability
# (p^6 vs p^8), so the same recall costs far fewer tables; the values
# below are the measured knee that clears the >=0.6 recall bar:
# at sf0.1 the dial read (b=6, L=8) 0.48 / (b=6, L=12) 0.66 /
# (b=6, L=16) 0.70 / (b=5, L=12) 0.80 / (b=6, L=24) 0.84 recall —
# L=12 x 6 planes is the cheapest config past the bar (expected
# candidate mass L/2^b = 0.19N vs 0.25N+ for the others).
LSH_TABLES = 12
LSH_TABLE_PLANES = 6
EMB_DIM = 64  # embeddings.parquet vector length (all SFs)


def _plane_signs(table: int, plane: int) -> list[int]:
    """The deterministic +-1 hyperplane for (table, plane): sign of
    dim d = high bit of the first hex char of md5('{t}_{p}_{d}') —
    the same device as the single-table variant, but evaluated ONCE
    at plan-build time (Python hashlib) and embedded as literals, so
    neither engine computes rows x planes x dims md5 calls at
    runtime."""
    import hashlib

    return [
        1
        if hashlib.md5(f"{table}_{plane}_{d}".encode()).hexdigest()[0]
        in _HEX_HIGH
        else -1
        for d in range(EMB_DIM)
    ]


def _table_bucket_expr_spark(table: int, planes: int) -> str:
    bits = []
    for p in range(planes):
        s = ", ".join(str(x) for x in _plane_signs(table, p))
        proj = (
            f"aggregate(zip_with(v, array({s}), (x, s) -> x * s), 0D, "
            f"(acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _table_bucket_expr_duck(table: int, planes: int) -> str:
    bits = []
    for p in range(planes):
        s = ", ".join(str(x) for x in _plane_signs(table, p))
        proj = (
            f"list_sum(list_transform(range(1, len(v) + 1), "
            f"i -> v[i] * ([{s}])[i]))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _lsh_ltables_plan(
    spark: SparkSession, sf_dir: str, n_tables: int, planes: int
) -> DataFrame:
    """L-tables sign-LSH top-k, parameterized so the recall probe can
    sweep L. Index shape is the production one: a NARROW (vec_id,
    tbl, bucket) posting frame — L rows per vector, no vector payload
    duplication — candidates are the distinct union of per-table
    bucket matches, and vectors are fetched once per shortlist pair
    for the exact cosine re-rank."""
    vecs = _vectors(spark, sf_dir)
    buckets = F.array(
        *[
            F.expr(_table_bucket_expr_spark(t, planes)).cast("int")
            for t in range(n_tables)
        ]
    )
    idx = vecs.select(
        "vec_id", F.posexplode(buckets).alias("tbl", "bucket")
    )
    # the n_tables x planes interpreted dot-product projections are
    # the dominant extraction cost, and the posting frame feeds BOTH
    # sides of the candidate join — one lazy lineage cut makes the
    # extraction run once instead of once per side (the mm_phash /
    # basket repeated-subtree fix, guide §1.2); the cut frame is the
    # NARROW (vec_id, tbl, bucket) index, L rows per vector, no
    # vector payloads
    idx = idx.localCheckpoint(eager=False)
    qidx = idx.filter(F.col("vec_id") < N_QUERIES)
    cand = (
        F.broadcast(qidx.alias("q"))
        .join(
            idx.alias("c"),
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    scored = (
        cand.join(
            F.broadcast(
                vecs.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"),
                )
            ),
            "query_id",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D,"
                    " (acc, x) -> acc + x)"
                )
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


def _ltables_oracle(n_tables: int, planes: int) -> str:
    per_table = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"CAST({_table_bucket_expr_duck(t, planes)} AS INT) AS bucket FROM vecs"
        for t in range(n_tables)
    )
    return f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(
                   list_transform(embedding, x -> CAST(x AS DOUBLE)),
                   x -> x * x))) AS nrm
        FROM embeddings
    ),
    idx AS (
      {per_table}
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM idx q JOIN idx c
          ON q.tbl = c.tbl AND q.bucket = c.bucket
         AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_sum(list_transform(range(1, len(qv.v) + 1),
                     i -> qv.v[i] * cv.v[i])) / (qv.nrm * cv.nrm), 6) AS cosine
        FROM cand
        JOIN vecs qv ON qv.vec_id = query_id
        JOIN vecs cv ON cv.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_K}
    """


@query(
    "sim_topk_lsh_ltables",
    oracle=_ltables_oracle(LSH_TABLES, LSH_TABLE_PLANES),
)
def sim_topk_lsh_ltables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shaped sign-LSH: L=LSH_TABLES independent
    LSH_TABLE_PLANES-plane tables (12 x 6, the measured knee), a
    query probes its bucket in EVERY table and the candidate set is
    the distinct union — recall 1-(1-p^b)^L instead of the measured
    0.04 of one table (SCALE.md recall ladder; the single-table
    variant stays registered as the bucketing demonstrator, VERDICT
    r7 item 5). Candidate mass stays bounded at ~L/2^b of brute
    force; the posting-list index is narrow (no vector payloads), so
    the L-times factor costs index rows, not vector copies — the
    standard E2LSH memory/recall trade."""
    return _lsh_ltables_plan(spark, sf_dir, LSH_TABLES, LSH_TABLE_PLANES)


@query(
    "sim_label_centroid_knn",
    oracle=f"""
    WITH {_ORACLE_VECS},
    cent AS (
        SELECT e.label, u.i, avg(u.x) AS cx
        FROM u JOIN embeddings e USING (vec_id)
        GROUP BY 1, 2
    ),
    cnorm AS (SELECT label, sqrt(sum(cx * cx)) AS cnrm FROM cent GROUP BY 1),
    dots AS (
        SELECT u.vec_id, cent.label, sum(u.x * cent.cx) AS dot
        FROM u JOIN cent ON u.i = cent.i
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT vec_id, label AS centroid_label,
               round(dot / (n.nrm * c.cnrm), 6) AS cosine
        FROM dots JOIN norms n USING (vec_id) JOIN cnorm c USING (label)
    )
    SELECT vec_id, centroid_label, cosine
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, centroid_label) AS rnk
        FROM scored
    )
    WHERE rnk = 1
    """,
)
def sim_label_centroid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label centroids (the 'coarse quantizer'
    — avg of member vectors, position-wise), then assign every vector
    to its nearest centroid by cosine. Centroid table is tiny ->
    broadcast; assignment is one narrow pass over the corpus. This is
    the assignment step of IVF-flat ANN restated as DataFrame ops."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("nrm", F.sqrt(F.expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
    dim = F.posexplode(F.col("v"))
    comp = vecs.select("vec_id", "label", dim.alias("i", "x"))
    cent = comp.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    cent_vec = (
        cent.groupBy("label")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(i, cx))), s -> s.cx)").alias("cv")
        )
        .withColumn(
            "cnrm", F.sqrt(F.expr("aggregate(cv, 0D, (acc, x) -> acc + x * x)"))
        )
    )
    scored = (
        vecs.alias("q")
        .join(F.broadcast(cent_vec).alias("c"))
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.label").alias("centroid_label"),
            F.round(
                F.expr(
                    "aggregate(zip_with(q.v, c.cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
                )
                / (F.col("q.nrm") * F.col("c.cnrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_label")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


# ------------------------------------------------- IVF search + SemDeDup

# Centroid lists probed per query (IVF-flat search). Re-chosen in
# round 7 from the measured recall dial at sf0.1 (SCALE.md "ANN recall
# ladder"): nprobe 1/2/3/5/8 of K=10 lists measures recall@5
# 0.36/0.46/0.58/0.78/0.96 at indistinguishable wall on this corpus —
# 5 is the knee before "probe nearly everything".
NPROBE = 5
# Semantic-dup threshold. Production SemDeDup (Abbas et al. 2023,
# arXiv:2303.09540) uses ~0.95+ on real text embeddings; the synthetic
# vectors are near-random (within-cluster max cosine ~0.49 at sf0.01),
# so the threshold is calibrated to exercise the operator with a
# non-vacuous, scale-stable pair set (69 pairs at both sf0.001/sf0.01).
SEMDEDUP_TAU = 0.35

# Giant-cluster skew cap for the grouped BLAS pair scorer (VERDICT
# r12 item 3, guide §2.5): a cluster label with more rows than this
# is hash-split into ceil(n/cap) blocks and every block PAIR becomes
# its own task-sized group, so no single task ever holds more than
# 2·cap assignment rows or a Gram larger than cap² — a pathological
# giant cluster degrades into ~(n/cap)² bounded tasks instead of one
# straggler/OOM. 4096 rows = a 128 MB float64 Gram per task at the
# cap, and every fixture cluster (max ~300 rows at sf0.1) stays far
# below it, so the default keeps the fixtures' single-group plan and
# numerics byte-identical. Env-tunable for clusters with more memory
# per task (and for the skew-fixture tests, which shrink it).
SEMDEDUP_GROUP_CAP = int(
    _os.environ.get("PITLAP_SEMDEDUP_GROUP_CAP", "4096")
)

# DuckDB CTE suite replaying the centroid scoring + per-vector rank —
# shared by the IVF search and SemDeDup oracles. Appends to
# _ORACLE_VECS (u, norms).
_ORACLE_CRANK = """
    cent AS (
        SELECT e.label, u.i, avg(u.x) AS cx
        FROM u JOIN embeddings e USING (vec_id)
        GROUP BY 1, 2
    ),
    cnorm AS (SELECT label, sqrt(sum(cx * cx)) AS cnrm FROM cent GROUP BY 1),
    cdots AS (
        SELECT u.vec_id, cent.label, sum(u.x * cent.cx) AS dot
        FROM u JOIN cent ON u.i = cent.i
        GROUP BY 1, 2
    ),
    cscore AS (
        SELECT vec_id, label, round(dot / (n.nrm * c.cnrm), 6) AS ccos
        FROM cdots JOIN norms n USING (vec_id) JOIN cnorm c USING (label)
    ),
    crank AS (
        SELECT vec_id, label, row_number() OVER (
            PARTITION BY vec_id ORDER BY ccos DESC, label) AS crk
        FROM cscore
    )
"""


def _centroid_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label centroids as dense vectors: (label, cv, cnrm). K rows —
    always broadcastable (the IVF coarse quantizer is small by
    construction; a learned one would be loaded the same way)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("i", "x"),
    )
    cent = comp.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    return (
        cent.groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, cx))), s -> s.cx)"
            ).alias("cv")
        )
        .withColumn(
            "cnrm", F.sqrt(F.expr("aggregate(cv, 0D, (acc, x) -> acc + x * x)"))
        )
    )


def rank_against_centroids(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Score a (vec_id, v, nrm) frame against a (label, cv, cnrm)
    quantizer frame with a per-vector cosine rank: (vec_id, label,
    ccos, crk). One narrow pass over ``vecs`` against the broadcast
    K-row centroid table; the rank window partitions on vec_id (K
    rows per partition — bounded). Shared by the batch SemDeDup
    queries and the streaming semantic ingest sink
    (streaming/runtime.py) so the two sides of the stream-vs-batch
    parity cannot drift — the cosine rounding and the (ccos desc,
    label) tie-break are THE assignment contract."""
    scored = (
        vecs.alias("q")
        .join(F.broadcast(cent).alias("c"))
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.label").alias("label"),
            F.round(
                F.expr(
                    "aggregate(zip_with(q.v, c.cv, (x, y) -> x * y), 0D,"
                    " (acc, x) -> acc + x)"
                )
                / (F.col("q.nrm") * F.col("c.cnrm")),
                6,
            ).alias("ccos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), "label")
    return scored.withColumn("crk", F.row_number().over(w))


def _centroid_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide ``rank_against_centroids`` with the label-centroid
    quantizer fit on the same corpus (the batch twins' contract)."""
    return rank_against_centroids(
        _vectors(spark, sf_dir), _centroid_frame(spark, sf_dir)
    )


@query(
    "sim_topk_ivf_nprobe",
    oracle=f"""
    WITH {_ORACLE_VECS},
    {_ORACLE_CRANK},
    assign AS (
        SELECT vec_id AS cand_id, label FROM crank
        WHERE crk = 1 AND vec_id >= {N_QUERIES}
    ),
    probes AS (
        SELECT vec_id AS query_id, label FROM crank
        WHERE crk <= {NPROBE} AND vec_id < {N_QUERIES}
    ),
    cand AS (SELECT query_id, cand_id FROM probes JOIN assign USING (label)),
    rdots AS (
        SELECT cand.query_id, cand.cand_id, sum(q.x * c.x) AS dot
        FROM cand
        JOIN u q ON q.vec_id = cand.query_id
        JOIN u c ON c.vec_id = cand.cand_id AND c.i = q.i
        GROUP BY 1, 2
    ),
    rscored AS (
        SELECT query_id, cand_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cosine
        FROM rdots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = cand_id
    )
    SELECT query_id, cand_id AS neighbor_id, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
        FROM rscored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN end-to-end (the scale path past sign-LSH): every
    base vector is listed under its nearest centroid (crk=1); each
    query probes its NPROBE nearest centroid lists; exact cosine
    reranks the shortlist to top-k. Search cost is O(Q x N x nprobe/K)
    instead of O(Q x N) — the recall/cost dial is (K, nprobe). One
    scored frame feeds assignment and probing (localCheckpoint); the
    probe->list lookup is a broadcast equi-join on the centroid label;
    the rerank joins the tiny query set broadcast against the
    label-pruned shortlist. At 100 TB the assignment table is the
    persisted 'index' — amortized across query batches, exactly like
    a FAISS IVF list file."""
    ranked = _centroid_ranked(spark, sf_dir).localCheckpoint(eager=False)
    assign = ranked.filter(
        (F.col("crk") == 1) & (F.col("vec_id") >= N_QUERIES)
    ).select(F.col("vec_id").alias("cand_id"), "label")
    probes = ranked.filter(
        (F.col("crk") <= NPROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "label")
    cand = F.broadcast(probes).join(assign, "label").select("query_id", "cand_id")
    vecs = _vectors(spark, sf_dir)
    q = vecs.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = vecs.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    rescored = (
        cand.join(F.broadcast(q), cand.query_id == F.col("q_id"))
        .join(c, cand.cand_id == F.col("c_id"))
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D,"
                    " (acc, x) -> acc + x)"
                )
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rescored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= TOP_K
    )


@query(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH {_ORACLE_VECS},
    {_ORACLE_CRANK},
    assign AS (SELECT vec_id, label FROM crank WHERE crk = 1),
    pdots AS (
        SELECT a1.vec_id AS vec_a, a2.vec_id AS vec_b,
               a1.label AS cluster_label, sum(u1.x * u2.x) AS dot
        FROM assign a1
        JOIN assign a2 ON a1.label = a2.label AND a1.vec_id < a2.vec_id
        JOIN u u1 ON u1.vec_id = a1.vec_id
        JOIN u u2 ON u2.vec_id = a2.vec_id AND u2.i = u1.i
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT cluster_label, vec_a, vec_b,
               round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM pdots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
    )
    SELECT cluster_label, vec_a, vec_b, cosine
    FROM scored WHERE cosine >= {SEMDEDUP_TAU}
    """,
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    found by clustering embeddings (nearest label-centroid) and
    comparing cosines ONLY within a cluster — the pair space drops
    from C(N,2) to sum-over-clusters C(n_k,2), the same
    bounded-not-all-pairs contract as every dedup here (the
    plan-hygiene suite gates it). The keep policy downstream is
    keep-min-id per pair (vec_a survives, vec_b is the drop
    candidate), composable with dedup_cluster_components for
    transitive groups. At 100 TB: K scales with corpus size
    (SemDeDup uses ~sqrt(N) clusters), the pair stage is grouped on
    the cluster key, and skewed giant clusters are the known
    failure mode — cap cluster size or sub-cluster recursively.

    r12 shape (guide §2.3/§4.2): the within-cluster pair scoring is
    one BLAS matmul per cluster group (`cluster_pair_scores`) — only
    the N assignment rows with their vectors cross the cluster-key
    exchange (never the C(n_k,2) pairs), and the per-pair dot loop
    runs vectorized in numpy instead of per-element HOF lambdas.
    Measured at sf0.1: 3.27 s -> ~1.4 s; pair-join + distinct +
    zip_with stages (≈2.4 s) collapse into one 0.3 s grouped pass."""
    ranked = _centroid_ranked(spark, sf_dir)
    assign = ranked.filter(F.col("crk") == 1).select("vec_id", "label")
    a = assign.join(_vectors(spark, sf_dir), "vec_id")
    return cluster_pair_scores(
        a,
        SEMDEDUP_TAU,
        schema="cluster_label int, vec_a long, vec_b long, cosine double",
        with_label=True,
    )


# ------------------------------- SemDeDup with top-2 assignment
# The semantic recall ladder (SCALE.md, r8) measured single-
# assignment SemDeDup at 0.46-0.79 recall in the >10%-edit band with
# the misses identified as CENTROID-BOUNDARY SPLITS: original and
# copy both clear tau by a wide margin but land in different nearest-
# centroid clusters, so the within-cluster pair join never sees the
# pair. The fix SCALE.md prescribes (VERDICT r8 item 4) is
# OVERLAPPING clusters: assign every vector to its top-2 centroids,
# so a pair straddling one boundary still co-occurs in at least one
# cluster whenever either member's 2nd-nearest centroid is the
# other's 1st. Cost model vs single assignment: candidate mass grows
# from sum_k C(n_k, 2) to at most 4x that (each vector appears in 2
# lists), with pairs co-occurring in both shared lists deduped BEFORE
# the expensive exact-cosine scoring — the same candidates-then-
# verify discipline as every dedup here; still an equi-join on the
# cluster key, never all-pairs.


def _cluster_pair_score_fn(tau: float, with_label: bool = False):
    """Factory for the per-cluster pair-scoring pandas function: one
    exact Gram matmul per cluster group over a (label, vec_id, v,
    nrm) frame, emitting only the (vec_a < vec_b) pairs whose
    round-6 cosine clears ``tau``.

    Numeric contract (must stay hash-identical to the DuckDB oracles
    and the JVM `cosine_col` twin): cosine = round(dot/(nrm_a *
    nrm_b), 6). The dot is a 64-term double sum — BLAS and the JVM
    fold-left differ only in summation order (≤1e-14 absolute on
    unit-scale values), the same slack the Spark-vs-DuckDB hash
    equality has tolerated since round 6, and verified exactly equal
    on all three fixtures (OPTIMIZATION_r12.md). Rounding uses
    floor(x·1e6 + 0.5)/1e6 == Java HALF_UP for the positive
    half-plane, and every emitted row is positive (tau > 0); numpy's
    own ``round`` half-to-even is deliberately NOT used.

    Guide §4.2: the N·m assignment rows (not the C(n_k,2) pairs)
    cross the JVM→Python boundary once, the quadratic work runs in
    native BLAS, and only the tau survivors come back.

    Skew-cap groups (r13, VERDICT r12 item 3): when the caller
    (`cluster_pair_scores`) splits an oversized label into hash
    blocks, the group carries ``_blk`` per row and constant
    ``_gx <= _gy`` block coordinates. A diagonal group (gx == gy)
    scores its own upper triangle exactly as before; an off-diagonal
    group holds two disjoint blocks and scores the full cross
    rectangle — together the block pairs tile the label's pair
    space exactly once. Unblocked labels arrive as the single
    (0, 0) diagonal group, bit-identical to the pre-cap path."""
    import numpy as np
    import pandas as pd

    def _empty() -> pd.DataFrame:
        out = {
            "vec_a": np.array([], dtype="int64"),
            "vec_b": np.array([], dtype="int64"),
            "cosine": np.array([], dtype="float64"),
        }
        if with_label:
            out = {
                "cluster_label": np.array([], dtype="int32"),
                **out,
            }
        return pd.DataFrame(out)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        blocked = "_gx" in pdf.columns
        if blocked and pdf["_gx"].iloc[0] != pdf["_gy"].iloc[0]:
            # off-diagonal block pair: all cross pairs X × Y
            gx = pdf["_gx"].iloc[0]
            xm = (pdf["_blk"] == gx).to_numpy()
            xs, ys = pdf[xm], pdf[~xm]
            if len(xs) == 0 or len(ys) == 0:
                return _empty()
            xv = np.stack(xs["v"].to_numpy())
            yv = np.stack(ys["v"].to_numpy())
            cos = (xv @ yv.T) / np.outer(
                xs["nrm"].to_numpy(), ys["nrm"].to_numpy()
            )
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            ii, jj = np.indices(cos.shape)
            a = xs["vec_id"].to_numpy()[ii.ravel()]
            b = ys["vec_id"].to_numpy()[jj.ravel()]
            c = cos.ravel()
        else:
            # diagonal group (or unblocked label): upper triangle
            x = np.stack(pdf["v"].to_numpy())
            ids = pdf["vec_id"].to_numpy()
            nrm = pdf["nrm"].to_numpy()
            cos = (x @ x.T) / np.outer(nrm, nrm)
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            iu, ju = np.triu_indices(len(ids), k=1)
            a, b = ids[iu], ids[ju]
            c = cos[iu, ju]
        swap = a > b
        vec_a = np.where(swap, b, a)
        vec_b = np.where(swap, a, b)
        keep = c >= tau
        out = {
            "vec_a": vec_a[keep].astype("int64"),
            "vec_b": vec_b[keep].astype("int64"),
            "cosine": c[keep],
        }
        if with_label:
            out = {
                "cluster_label": np.full(
                    int(keep.sum()), pdf["label"].iloc[0], dtype="int32"
                ),
                **out,
            }
        return pd.DataFrame(out)

    return score


def cluster_pair_scores(
    a: DataFrame,
    tau: float,
    schema: str,
    with_label: bool = False,
    cap: int | None = None,
) -> DataFrame:
    """Grouped exact pair scoring over a (label, vec_id, v, nrm)
    assignment frame with the giant-cluster skew cap (VERDICT r12
    item 3, guide §2.5): labels with more than ``cap`` rows are
    hash-split into nb = ceil(n/cap) deterministic blocks
    (pmod(xxhash64(vec_id), nb)), each row is fanned out to its nb
    block PAIRS, and the grouping key becomes (label, gx, gy) — so a
    group never holds more than ~2·cap rows and the per-task Gram is
    bounded by cap², while the block pairs tile the label's pair
    space exactly once. Labels at or under the cap keep today's
    one-group-per-label shape (nb = 1, key (label, 0, 0)) with
    byte-identical numerics.

    The gate: one scalar max-label-size probe over the lineage-cut
    input decides the path. Normal corpora (every label <= cap) keep
    the EXACT pre-cap single-group plan — no fan-out join, no
    explode, no extra shuffle columns — so the cap costs them only
    the probe job (~driver-floor at sf0.1, amortized at scale). Only
    when a genuinely oversized label exists does the blocked fan-out
    plan engage. The lineage cut is load-bearing either way: without
    it the probe branch re-ran the whole quantizer-fit + rank
    pipeline a second time (measured +18% on the semantic family at
    sf0.1; plan showed 6 -> 12 parquet scans). The same bounded
    scalar-probe device as the Adamic-Adar broadcast gate
    (linkpred.py)."""
    if cap is None:
        cap = SEMDEDUP_GROUP_CAP
    a = a.localCheckpoint(eager=False)
    max_label = (
        a.groupBy("label")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .first()[0]
    )
    if max_label is None or max_label <= cap:
        return a.groupBy("label").applyInPandas(
            _cluster_pair_score_fn(tau, with_label=with_label),
            schema=schema,
        )
    counts = a.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    fanned = (
        a.join(F.broadcast(counts), "label")
        .withColumn(
            "_nb",
            F.ceil(F.col("_n") / F.lit(cap)).cast("int"),
        )
        .withColumn(
            "_blk",
            F.pmod(F.xxhash64("vec_id"), F.col("_nb")).cast("int"),
        )
        .withColumn("_t", F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)))
        .withColumn("_gx", F.least("_blk", "_t"))
        .withColumn("_gy", F.greatest("_blk", "_t"))
        .select("label", "vec_id", "v", "nrm", "_blk", "_gx", "_gy")
    )
    return fanned.groupBy("label", "_gx", "_gy").applyInPandas(
        _cluster_pair_score_fn(tau, with_label=with_label), schema=schema
    )


def cosine_col(av: str, an: str, bv: str, bn: str):
    """Round-6 exact cosine between two (vector, norm) column pairs —
    THE verify-stage expression, shared by the batch SemDeDup rungs
    (`_semantic_topm`), the streaming semantic ingest sink
    (streaming/runtime.py), and the top-m probe
    (tools/semantic_topm_probe.py) so the tau gate's arithmetic can
    never drift between the stream and its batch twin (round-10
    review catch: three hand-copied twins of this expression)."""
    return F.round(
        F.expr(
            f"aggregate(zip_with({av}, {bv}, (p, q) -> p * q), 0D,"
            " (acc, t) -> acc + t)"
        )
        / (F.col(an) * F.col(bn)),
        6,
    )


def semdedup_pair_ctes(m: int, assign_src: str = "crank") -> str:
    """The top-m SemDeDup candidate/score CTE chain (assignm →
    cpairs → pdots → scored), shared by `_semantic_topm_oracle` and
    the streaming parity queries' oracles (batch_windows.py) so the
    oracles always test the SAME batch contract. Expects the
    `{_ORACLE_VECS}` and `{_ORACLE_CRANK}` CTEs upstream;
    ``assign_src`` (a CTE with crank's columns) lets the composed
    pipeline oracle restrict the assignment universe to the corpus
    the semantic stage actually SEES (the minhash survivors) without
    forking the chain."""
    return f"""assignm AS (SELECT vec_id, label FROM {assign_src} WHERE crk <= {m}),
    cpairs AS (
        SELECT DISTINCT a1.vec_id AS vec_a, a2.vec_id AS vec_b
        FROM assignm a1
        JOIN assignm a2 ON a1.label = a2.label AND a1.vec_id < a2.vec_id
    ),
    pdots AS (
        SELECT p.vec_a, p.vec_b, sum(u1.x * u2.x) AS dot
        FROM cpairs p
        JOIN u u1 ON u1.vec_id = p.vec_a
        JOIN u u2 ON u2.vec_id = p.vec_b AND u2.i = u1.i
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM pdots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
    )"""


def _semantic_topm_oracle(m: int) -> str:
    return f"""
    WITH {_ORACLE_VECS},
    {_ORACLE_CRANK},
    {semdedup_pair_ctes(m)}
    SELECT vec_a, vec_b, cosine
    FROM scored WHERE cosine >= {SEMDEDUP_TAU}
    """


def _semantic_topm(spark: SparkSession, sf_dir: str, m: int) -> DataFrame:
    """SemDeDup over OVERLAPPING top-m centroid clusters: per-cluster
    BLAS pair scoring (`_cluster_pair_score_fn`), then a DISTINCT on
    the tau SURVIVORS so a pair sharing several clusters appears
    once; output drops the cluster label (a pair no longer belongs
    to one cluster).

    r12 shape change (guide §2.3/§8): the old plan DISTINCT-ed ~750k
    candidate pairs at sf0.1, then attached both 64-double vector
    payloads via two shuffle joins (~380 MB through exchanges) and
    scored each pair with interpreted zip_with lambdas. Now only the
    N·m assignment rows cross the cluster-key exchange with their
    vectors (each vector moves m times, never per pair); the
    quadratic scoring runs as one matmul per cluster; a pair
    co-occurring in ≤m shared clusters is scored ≤m times (matmul
    makes re-scoring cheaper than a 750k-row pre-score distinct) and
    deduped on the tiny survivor set. Measured at sf0.1: top-2
    3.35 s -> ~1.4 s, the two localCheckpoint fan-out
    materializations (0.9 s + 0.1 s) removed outright — single-
    consumer lineage needs no memo."""
    ranked = _centroid_ranked(spark, sf_dir)
    assignm = ranked.filter(F.col("crk") <= m).select("vec_id", "label")
    a = assignm.join(_vectors(spark, sf_dir), "vec_id")
    scored = cluster_pair_scores(
        a, SEMDEDUP_TAU, schema="vec_a long, vec_b long, cosine double"
    )
    return scored.distinct()


@query("dedup_semantic_top2", oracle=_semantic_topm_oracle(2))
def dedup_semantic_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over OVERLAPPING top-2 centroid clusters — closes the
    measured centroid-boundary-split recall gap of the single-
    assignment variant (block comment above; recall >=0.90 on every
    ladder band at x3.66 candidate mass).

    100-TB shape: identical to dedup_semantic_semdedup — broadcast
    K-row quantizer scoring, equi-join on the cluster key with
    <=2x-per-side membership (<=4x pair mass), exact cosine on
    deduped candidates only. Skewed giant clusters remain the known
    failure mode; the cap/sub-cluster mitigation applies unchanged."""
    return _semantic_topm(spark, sf_dir, 2)


@query("dedup_semantic_top3", oracle=_semantic_topm_oracle(3))
def dedup_semantic_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over OVERLAPPING top-3 centroid clusters — the next
    rung above top-2, shipped on the measured diminishing-returns
    probe (tools/semantic_topm_probe.py, SCALE.md round-10 ladder):
    top-3 closes 80-100% of the top-2 residual (pairs split across
    BOTH members' top-2 assignments) on every perturbation band at
    1.83-1.85x the top-2 verify-stage candidate mass — inside the
    <=2x ship bar the decision rule pre-registered. Recall 1.00 on
    five of six bands, 0.98 at swap@33% (mean planted cosine 0.77).

    Cost model: <=3x-per-side membership bounds pair mass at <=9x
    the top-1 baseline (measured ~1.85x the top-2 actual); the same
    cluster-key equi-join plan — the rung dial is a pure
    recall/verify-mass trade with no new shuffle shape."""
    return _semantic_topm(spark, sf_dir, 3)


# ----------------------------------------- bucketed kNN-graph build
# The batch sibling of the IVF SEARCH path: construct the k-nearest-
# neighbor GRAPH over the whole corpus (every vector, not a query
# set) by restricting candidate pairs to each vector's coarse-
# quantizer list — the standard first step of graph-based dedup /
# clustering / label-propagation over embeddings at scale. Pair space
# is Σ |list|² (bucket-bounded, never corpus²); within-list scoring
# is the exact cosine; per-node top-k is a bounded window. Recall
# caveat inherited from IVF (SCALE.md recall ladder): edges crossing
# list boundaries are missed — the accepted trade that bounds the
# join.

KNNG_K = 3


@query(
    "sim_knn_graph_bucketed",
    oracle=f"""
    WITH {_ORACLE_VECS},
    {_ORACLE_CRANK},
    assign AS (SELECT vec_id, label FROM crank WHERE crk = 1),
    cand AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM assign a JOIN assign b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    scored AS (
        SELECT cand.src, cand.dst,
               round(sum(x.x * y.x)
                     / (ns.nrm * nd.nrm), 6) AS cosine
        FROM cand
        JOIN u x ON x.vec_id = cand.src
        JOIN u y ON y.vec_id = cand.dst AND y.i = x.i
        JOIN norms ns ON ns.vec_id = cand.src
        JOIN norms nd ON nd.vec_id = cand.dst
        GROUP BY 1, 2, ns.nrm, nd.nrm
    )
    SELECT src, dst, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY src ORDER BY cosine DESC, dst) AS rnk
        FROM scored
    )
    WHERE rnk <= {KNNG_K}
    ORDER BY src, rank
    """,
)
def sim_knn_graph_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-bounded kNN graph: every vector's top-{KNNG_K} cosine
    neighbors WITHIN its nearest-centroid list (block comment above).

    100-TB shape: the centroid assignment is one broadcast-scored
    pass (K-row quantizer); the within-list self-join co-partitions
    on the list label, so shuffle volume is list-sized; scoring is
    JVM array arithmetic; per-node top-k is a label-local window. For
    production K lists, grow K ∝ √N so Σ|list|² stays ~N^1.5."""
    ranked = _centroid_ranked(spark, sf_dir).localCheckpoint(eager=False)
    assign = ranked.filter(F.col("crk") == 1).select("vec_id", "label")
    vecs = _vectors(spark, sf_dir)
    a = assign.select(F.col("vec_id").alias("src"), "label")
    b = assign.select(F.col("vec_id").alias("dst"), F.col("label").alias("lb"))
    cand = a.join(b, (F.col("label") == F.col("lb")) & (F.col("src") != F.col("dst")))
    q = vecs.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = vecs.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = (
        cand.join(q, cand.src == F.col("q_id"))
        .join(c, cand.dst == F.col("c_id"))
        .select(
            "src",
            "dst",
            F.round(
                F.expr(
                    "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D,"
                    " (acc, x) -> acc + x)"
                )
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= KNNG_K)
        .orderBy("src", "rank")
    )
