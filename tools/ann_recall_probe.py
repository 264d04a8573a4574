"""L-tables sign-LSH recall dial at LARGER corpus scale (VERDICT r8
item 6): the shipped (L=12, b=6) config's 100-TB claim rests on the
candidate-mass invariant (expected mass ~= L/2^b * N per query) plus
the observation that recall DEGRADES at smaller SFs because buckets
are too thin (0.66 at sf0.1 -> 0.52 at sf0.01 -> 0.32 at sf0.001,
SCALE.md dial table). This probe runs the same measurement in the
OTHER direction — 2x and 4x the bench corpus — so the claim "recall
holds or improves as buckets thicken" carries numbers.

    python tools/ann_recall_probe.py [--scales 1 2 4]

Corpus construction: the sf0.1 embeddings (2 000 x 64-dim, 10-label
cluster structure) are extended with synthetic vectors drawn from
each label's OWN empirical per-dimension mean/std (seeded numpy —
deterministic across runs), so the scaled corpora keep the bench
corpus's contrast statistics instead of planting near-duplicate
copies that any LSH would trivially bucket together. The query set
(vec_id < N_QUERIES) stays the original vectors at every scale, so
recall numbers are comparable across rows.

Reported per scale: exact-truth recall@TOP_K of the shipped config,
measured candidate mass (distinct (query, neighbor) shortlist pairs)
vs the L/2^b * N expectation, and single warm-invocation wall (note
host loadavg — wall is secondary to the recall/mass columns).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pitlapetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/pitlap_ann_scale"


def build_corpus(scale: int) -> str:
    """Write a scale-x embeddings dir under /tmp; scale=1 is a straight
    copy so every row of the table reads the same pipeline."""
    out = f"{WORK}/x{scale}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    base = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    frames = [base]
    if scale > 1:
        rng = np.random.default_rng(0)
        mat = np.stack(base["embedding"].to_numpy())
        labels = base["label"].to_numpy()
        next_id = int(base["vec_id"].max()) + 1
        per_label = {
            lab: (mat[labels == lab].mean(axis=0), mat[labels == lab].std(axis=0))
            for lab in np.unique(labels)
        }
        n_extra = (scale - 1) * len(base)
        extra_labels = rng.choice(np.unique(labels), size=n_extra)
        rows = []
        for k, lab in enumerate(extra_labels):
            mu, sd = per_label[int(lab)]
            rows.append(
                (mu + sd * rng.standard_normal(len(mu))).astype(np.float32)
            )
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": np.arange(next_id, next_id + n_extra),
                    "embedding": [list(map(float, r)) for r in rows],
                    "label": extra_labels.astype(np.int32),
                }
            )
        )
    import pyarrow as pa
    import pyarrow.parquet as pq

    # pin the arrow schema to the base table's physical types — a bare
    # pandas write stores the synthesized lists as double and Spark
    # then refuses the float/double column-chunk mix
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    merged = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(merged, schema=schema, preserve_index=False),
        f"{out}/embeddings.parquet",
    )
    return out


def measure(spark, sf_dir: str) -> dict:
    from pitlapetl_spark.operators.similarity import (
        LSH_TABLE_PLANES,
        LSH_TABLES,
        N_QUERIES,
        _lsh_ltables_plan,
        _table_bucket_expr_spark,
        _vectors,
        sim_topk_bruteforce,
    )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }
    t0 = time.perf_counter()
    got = {
        (r.query_id, r.neighbor_id)
        for r in _lsh_ltables_plan(
            spark, sf_dir, LSH_TABLES, LSH_TABLE_PLANES
        ).collect()
    }
    wall = time.perf_counter() - t0
    # candidate mass: rebuild the posting index exactly as the plan does
    vecs = _vectors(spark, sf_dir)
    buckets = F.array(
        *[
            F.expr(_table_bucket_expr_spark(t, LSH_TABLE_PLANES)).cast("int")
            for t in range(LSH_TABLES)
        ]
    )
    idx = vecs.select("vec_id", F.posexplode(buckets).alias("tbl", "bucket"))
    qidx = idx.filter(F.col("vec_id") < N_QUERIES)
    mass = (
        F.broadcast(qidx.alias("q"))
        .join(
            idx.alias("c"),
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select("q.vec_id", "c.vec_id")
        .distinct()
        .count()
    )
    expected = LSH_TABLES / 2**LSH_TABLE_PLANES * n * N_QUERIES
    return {
        "n_vectors": n,
        "recall": round(len(got & truth) / len(truth), 2),
        "truth_pairs": len(truth),
        "candidate_pairs": mass,
        "mass_per_query_over_N": round(mass / N_QUERIES / n, 3),
        "expected_mass_frac": round(LSH_TABLES / 2**LSH_TABLE_PLANES, 3),
        "expected_pairs": int(expected),
        "lsh_wall_s": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()
    spark = get_spark(
        app_name="pitlapetl_ann_recall_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    print("loadavg:", os.getloadavg())
    for scale in args.scales:
        d = build_corpus(scale)
        print(f"x{scale}:", measure(spark, d))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
