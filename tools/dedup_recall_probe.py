"""Planted-duplicate recall probe for the near-dup dedup family —
the dedup analogue of the ANN recall ladder (SCALE.md): build a
corpus of sf0.01 documents plus DETERMINISTICALLY perturbed copies
(every k-th word deleted — no RNG, replayable), run each registered
pair-producing dedup method on it, and measure recall against the
planted (original, copy) truth pairs plus the count of extra
(non-planted) pairs surfaced. Writes nothing to the repo; prints a
markdown table for SCALE.md.

Usage: python tools/dedup_recall_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

SRC = "/root/testdata/sf0.01/documents.parquet"
WORK = Path("/tmp/dedup_recall")
COPY_OFFSET = 1_000_000
N_BASE = 400  # corpus originals
N_PLANT = 150  # perturbed copies
# deletion cadence k -> rate 1/k (drop every k-th word)
RATES = {20: "5%", 7: "14%", 3: "33%"}

METHODS = (
    "dedup_minhash_lsh",
    "dedup_jaccard_prefix_filter",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "dedup_containment_capped",
)


def build_corpus(k: int) -> str:
    """Originals + every-k-th-word-deleted copies, via DuckDB (fast,
    deterministic)."""
    out = WORK / f"k{k}"
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            WITH base AS (
                SELECT doc_id, text, lang, source, n_chars
                FROM '{SRC}' ORDER BY doc_id LIMIT {N_BASE}
            ),
            copies AS (
                SELECT doc_id + {COPY_OFFSET} AS doc_id,
                       array_to_string(
                           list_filter(string_split(text, ' '),
                                       (w, i) -> i % {k} != 0),
                           ' ') AS text,
                       lang, source, n_chars
                FROM base ORDER BY doc_id LIMIT {N_PLANT}
            )
            SELECT * FROM base UNION ALL SELECT * FROM copies
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    return str(out)


def pairs_of(spark, name: str, sf_dir: str) -> set[tuple[int, int]]:
    from pitlapetl_spark.registry import all_queries

    df = all_queries()[name](spark, sf_dir)
    cols = df.columns
    if "doc_a" in cols:
        rows = df.select("doc_a", "doc_b").collect()
        return {(min(r[0], r[1]), max(r[0], r[1])) for r in rows}
    if "doc_contained" in cols:
        rows = df.select("doc_contained", "doc_container").collect()
        return {(min(r[0], r[1]), max(r[0], r[1])) for r in rows}
    # simhash: pairs = same cluster
    rows = df.select("doc_id", "cluster_id").collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r[1], []).append(r[0])
    out = set()
    for members in by_cluster.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                out.add((a, b))
    return out


def eligible_truth(k: int, sf_dir: str) -> set[tuple[int, int]]:
    """Planted pairs whose true word-3-gram Jaccard clears the
    registered threshold (0.8) — the definitionally-reachable truth
    for exact-threshold methods."""
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH a AS (SELECT doc_id, string_split(lower(text),' ') toks
                   FROM '{sf_dir}/documents.parquet'
                   WHERE doc_id < {COPY_OFFSET}
                   ORDER BY doc_id LIMIT {N_PLANT}),
        b AS (SELECT doc_id - {COPY_OFFSET} AS doc_id,
                     string_split(lower(text),' ') toks
              FROM '{sf_dir}/documents.parquet'
              WHERE doc_id >= {COPY_OFFSET}),
        sh AS (
          SELECT a.doc_id,
            list_distinct([a.toks[i] || ' ' || a.toks[i+1] || ' '
                           || a.toks[i+2]
                           FOR i IN range(1, len(a.toks)-1)]) sa,
            list_distinct([b.toks[i] || ' ' || b.toks[i+1] || ' '
                           || b.toks[i+2]
                           FOR i IN range(1, len(b.toks)-1)]) sb
          FROM a JOIN b USING (doc_id)
        )
        SELECT doc_id FROM sh
        WHERE len(list_intersect(sa, sb)) * 1.0
              / len(list_distinct(list_concat(sa, sb))) >= 0.8
    """).fetchall()
    return {(r[0], r[0] + COPY_OFFSET) for r in rows}


# ------------------------------------------------- semantic regime
#
# The exact-threshold methods correctly return nothing once edits push
# 3-gram Jaccard under 0.8 (~>=10% of words changed). The semantic
# operators (SemDeDup, embedding-cosine) are supposed to own that
# band, but they read the `embeddings` table — and this sandbox has no
# text encoder. Bridge: a deterministic hashed bag-of-words embedding
# (the standard feature-hashing trick: md5(word) -> dim in [0,64),
# next md5 nibble -> +-1 sign, L2-normalized), computed from the SAME
# perturbed documents, so a text edit maps to a measurable cosine
# drop and both regimes are scored on one corpus.

SEM_COPY_OFFSET = 500_000  # below dedup_embedding_cosine's own 1e6


def _hash_bow(text: str, dim: int = 64):
    import hashlib

    import numpy as np

    v = np.zeros(dim)
    for w in text.lower().split():
        h = hashlib.md5(w.encode()).hexdigest()
        d = int(h[:8], 16) % dim
        v[d] += 1.0 if int(h[8], 16) >= 8 else -1.0
    n = float(np.linalg.norm(v))
    return (v / n if n else v).astype("float32")


def _perturb(words: list[str], k: int, mode: str) -> list[str]:
    import hashlib

    if mode == "delete":
        return [w for i, w in enumerate(words) if i % k != 0]
    # "swap": every k-th word replaced by a deterministic pseudo-
    # synonym token (different token, same position — the word-swap
    # edit class VERDICT r7 item 6 asks for)
    return [
        f"syn{hashlib.md5(w.encode()).hexdigest()[:6]}" if i % k == 0 else w
        for i, w in enumerate(words)
    ]


def build_semantic_corpus(k: int, mode: str) -> tuple[str, float]:
    """Probe dir with documents + perturbed copies AND the matching
    hashed-BoW embeddings table; returns (dir, mean planted cosine) —
    the bridge number tying the edit rate to embedding space."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = WORK / f"sem_{mode}_k{k}"
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}' "
        f"ORDER BY doc_id LIMIT {N_BASE}"
    ).fetchall()
    rows = list(base)
    vecs: dict[int, object] = {r[0]: _hash_bow(r[1]) for r in base}
    cosines = []
    for doc_id, text, lang, source, n_chars in base[:N_PLANT]:
        copy_text = " ".join(_perturb(text.split(), k, mode))
        cid = doc_id + SEM_COPY_OFFSET
        rows.append((cid, copy_text, lang, source, len(copy_text)))
        vecs[cid] = _hash_bow(copy_text)
        cosines.append(float(np.dot(vecs[doc_id], vecs[cid])))
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": [r[4] for r in rows],
            }
        ),
        out / "documents.parquet",
    )
    ids = sorted(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [vecs[i].tolist() for i in ids],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    [int(i % SEM_COPY_OFFSET) % 10 for i in ids],
                    type=pa.int32(),
                ),
            }
        ),
        out / "embeddings.parquet",
    )
    return str(out), sum(cosines) / len(cosines)


def sem_pairs_of(spark, name: str, sf_dir: str) -> set[tuple[int, int]]:
    from pitlapetl_spark.registry import all_queries

    df = all_queries()[name](spark, sf_dir)
    rows = df.select("vec_a", "vec_b").collect()
    # dedup_embedding_cosine unions its OWN +1e6 re-ingest copy; only
    # pairs inside the probe id space count
    return {
        (min(r[0], r[1]), max(r[0], r[1]))
        for r in rows
        if r[0] < 1_000_000 and r[1] < 1_000_000
    }


SEM_METHODS = (
    "dedup_semantic_semdedup",
    "dedup_semantic_top2",
    "dedup_embedding_cosine",
)


def semantic_table(spark, con) -> None:
    planted_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{SRC}' ORDER BY doc_id LIMIT {N_PLANT}"
        ).fetchall()
    ]
    truth = {(i, i + SEM_COPY_OFFSET) for i in planted_ids}
    print()
    print("Semantic regime (hashed-BoW embeddings from the same "
          "perturbed docs):")
    print("| edit | mean planted cosine | "
          + " | ".join(f"{m} recall (extra)" for m in SEM_METHODS) + " |")
    print("|---|---|" + "---|" * len(SEM_METHODS))
    for mode in ("delete", "swap"):
        for k in RATES:
            sf_dir, mean_cos = build_semantic_corpus(k, mode)
            cells = []
            for m in SEM_METHODS:
                found = sem_pairs_of(spark, m, sf_dir)
                hit = len(found & truth)
                extra = len(found - truth)
                cells.append(f"{hit / len(truth):.2f} ({extra})")
            print(f"| {mode} @{RATES[k]} | {mean_cos:.3f} | "
                  + " | ".join(cells) + " |")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dedup_recall_probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    planted_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{SRC}' ORDER BY doc_id "
            f"LIMIT {N_PLANT}"
        ).fetchall()
    ]
    truth = {(i, i + COPY_OFFSET) for i in planted_ids}

    print("| method | " + " | ".join(
        f"planted/eligible recall @{v} del (extra)"
        for v in RATES.values()) + " |")
    print("|---|" + "---|" * len(RATES))
    results = {m: [] for m in METHODS}
    for k in RATES:
        sf_dir = build_corpus(k)
        elig = eligible_truth(k, sf_dir)
        print(f"(k={k}: {len(elig)}/{len(truth)} planted pairs have "
              f"true 3-gram Jaccard >= 0.8)")
        for m in METHODS:
            found = pairs_of(spark, m, sf_dir)
            hit = len(found & truth)
            ehit = len(found & elig)
            extra = len(found - truth)
            erec = f"{ehit / len(elig):.2f}" if elig else "n/a"
            results[m].append(
                f"{hit / len(truth):.2f} / {erec} ({extra})"
            )
    for m in METHODS:
        print(f"| {m} | " + " | ".join(results[m]) + " |")

    semantic_table(spark, con)


if __name__ == "__main__":
    main()
