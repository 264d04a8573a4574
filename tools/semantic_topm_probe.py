"""Top-m SemDeDup diminishing-returns probe (VERDICT r9 item 4).

The top-2 ladder (SCALE.md) leaves a 1-10% residual: pairs split
across BOTH members' top-2 assignments. This probe measures the next
rung — top-3 assignment — on the same 6 perturbation bands as the
ladder, reporting recall, extra pairs, and CANDIDATE MASS (the
distinct pair count entering exact-cosine verify, the quantity the
100-TB cost rides on). Decision rule (recorded in SCALE.md): ship
top-3 iff it closes >= half the top-2 residual at <= 2x the top-2
candidate mass; otherwise declare top-2 the knee.

Usage: python tools/semantic_topm_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "dedup_recall_probe", Path(__file__).parent / "dedup_recall_probe.py"
)
_probe = _ilu.module_from_spec(_spec)
sys.modules["dedup_recall_probe"] = _probe
_spec.loader.exec_module(_probe)


def topm_pairs(spark, sf_dir: str, m: int):
    """Pair set + verify-stage candidate mass for top-m assignment —
    the dedup_semantic_top2 plan with crk <= m."""
    from pitlapetl_spark.operators.similarity import (
        SEMDEDUP_TAU,
        _centroid_ranked,
        _vectors,
        cosine_col,
    )

    assign = (
        _centroid_ranked(spark, sf_dir)
        .filter(F.col("crk") <= m)
        .select("vec_id", "label")
        .localCheckpoint(eager=True)
    )
    cand = (
        assign.alias("x")
        .join(
            assign.alias("y"),
            (F.col("x.label") == F.col("y.label"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()
    vecs = _vectors(spark, sf_dir).localCheckpoint(eager=True)
    va = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    vb = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    pairs = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_col("av", "an", "bv", "bn").alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .collect()
    )
    found = {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
        for r in pairs
        if r.vec_a < 1_000_000 and r.vec_b < 1_000_000
    }
    return found, n_cand


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("semantic_topm_probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    planted_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{_probe.SRC}' ORDER BY doc_id "
            f"LIMIT {_probe.N_PLANT}"
        ).fetchall()
    ]
    truth = {(i, i + _probe.SEM_COPY_OFFSET) for i in planted_ids}

    print(
        "| edit | top-2 recall (extra, cand) | top-3 recall (extra, cand) "
        "| residual closed | mass ratio |"
    )
    print("|---|---|---|---|---|")
    for mode in ("delete", "swap"):
        for k in _probe.RATES:
            sf_dir, _ = _probe.build_semantic_corpus(k, mode)
            f2, c2 = topm_pairs(spark, sf_dir, 2)
            f3, c3 = topm_pairs(spark, sf_dir, 3)
            r2, r3 = len(f2 & truth), len(f3 & truth)
            miss2 = len(truth) - r2
            closed = (r3 - r2) / miss2 if miss2 else float("nan")
            print(
                f"| {mode} @{_probe.RATES[k]} "
                f"| {r2 / len(truth):.2f} ({len(f2 - truth)}, {c2}) "
                f"| {r3 / len(truth):.2f} ({len(f3 - truth)}, {c3}) "
                f"| {closed:.2f} | {c3 / c2:.2f}x |"
            )


if __name__ == "__main__":
    main()
