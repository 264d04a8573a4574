"""Entity resolution / record linkage: blocking-key fuzzy matching.

Approximate string matching between records ("small ring" vs "smal
ring") is quadratic if done naively. The standard industrial shape —
implemented here with oracle parity — is BLOCKING: records join only
within a cheap equality block (here the head noun of the name), the
expensive edit-distance predicate runs on the bounded within-block
pairs, and the result aggregates to a per-record match profile. At
100 TB the block key is the whole game: pair space = sum of squared
block sizes, so blocks must be bounded (cap or sub-split hot blocks —
the same DF-cap discipline as dedup_ngram_jaccard_capped; a skewed
block is salted like any hot join key).

Spark's ``levenshtein`` and DuckDB's ``levenshtein`` implement the
same classic edit distance, so the oracle replays the semantics
exactly. Spark-side the threshold form ``levenshtein(a, b, k)`` lets
codegen bail out of the DP early — the cheap trick that matters when
names are long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

FUZZY_MAX_DIST = 2  # near-miss band: 1..2 edits (0 = exact, dedup's job)


@query(
    "fuzzy_match_blocking",
    oracle=f"""
    WITH p AS (
        SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk
        FROM part
    )
    SELECT a.p_partkey, a.p_name,
           CAST(count(*) FILTER (
               WHERE levenshtein(a.p_name, b.p_name)
                     BETWEEN 1 AND {FUZZY_MAX_DIST}) AS BIGINT)
               AS n_near_names,
           CAST(count(*) FILTER (
               WHERE levenshtein(a.p_name, b.p_name) = 0) AS BIGINT)
               AS n_exact_names
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
    GROUP BY 1, 2
    """,
)
def fuzzy_match_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record linkage profile: within each blocking group (head
    noun of the part name), how many OTHER records sit within
    FUZZY_MAX_DIST edits (near-miss candidates) and how many are exact
    name copies. The join is a plain equi-join on the block key —
    never a cross join — and the edit distance runs only on
    within-block pairs; records whose block contains no other record
    drop out (no neighbors to profile)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("blk"),
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_partkey") != F.col("b.p_partkey")),
    )
    return pairs.groupBy(
        F.col("a.p_partkey").alias("p_partkey"),
        F.col("a.p_name").alias("p_name"),
    ).agg(
        F.count(F.when(dist.between(1, FUZZY_MAX_DIST), 1)).alias("n_near_names"),
        F.count(F.when(dist == 0, 1)).alias("n_exact_names"),
    )
