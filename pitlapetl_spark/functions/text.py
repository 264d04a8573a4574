"""Shared text primitives for the LLM-data-pipeline operators
(dedup / text analysis — SURVEY.md §7.2 M5, BASELINE.json north star).

Everything here is a *narrow* transformation built from JVM-side array
expressions — tokenization and shingling never shuffle, never leave
whole-stage codegen, and never call Python per row. At 100 TB the
shingle set is materialized per-partition and flows straight into the
downstream hash (minhash agg) or inverted-index join.

Cross-engine determinism: hash-family values are md5 hex strings
(Spark ``md5`` == DuckDB ``md5``), compared/min-ed lexicographically,
so every approximate operator (minhash, simhash, LSH) can be replayed
exactly by the DuckDB oracle. At production scale you would swap md5
for ``xxhash64`` (cheaper); the operator shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3  # word n-gram width for fingerprinting / minhash

# tiny deterministic stopword profiles (language-ID heuristic)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "por"),
    "fr": ("le", "la", "de", "et", "est", "les", "un", "pour"),
}


def norm_text(c: Column) -> Column:
    """Normalize: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(norm_text(c), " ")


def shingles_sql(tok_col: str, k: int = SHINGLE_K) -> str:
    """Spark-SQL expression string for the distinct word k-gram
    shingle array of a token-array column — composable inside larger
    expressions (e.g. the no-shuffle minhash signature)."""
    parts = ", ".join(f"{tok_col}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size({tok_col}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({tok_col}) - {k}), "
        f"i -> concat_ws(' ', {parts}))) ELSE array() END"
    )


def shingles(tok_col: str, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles from a token-array column.

    Pure array expression (``transform`` over ``sequence``) — no
    explode/shuffle; guarded so short documents yield an empty array
    (``sequence`` would count *down* for negative spans otherwise).
    """
    return F.expr(shingles_sql(tok_col, k))


def shingle_rows(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) rows — the inverted-index layout used by the
    jaccard join and the minhash aggregation."""
    return (
        df.select(id_col, tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, F.explode(shingles("_toks")).alias("s"))
    )


def oracle_shingles_cte(k: int = SHINGLE_K) -> str:
    """DuckDB CTE body producing the same (doc_id, s) shingle rows from
    ``documents`` — 1-based list indexing, same guard semantics."""
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"""
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(toks) >= {k}
             THEN list_transform(range(1, len(toks) - {k - 2}), i -> {parts})
             ELSE [] END)) AS s
    FROM (SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
          FROM documents)
    """


def stopword_count(tok_col: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens in ``words`` — higher-order ``filter``, JVM-side."""
    return F.size(F.filter(tok_col, lambda x: x.isin(*words)))


def minhash_cols(n_hashes: int = 16) -> list[Column]:
    """Minhash signature as ``n_hashes`` min-aggregations over the
    md5 hash family h_j(s) = md5(j || '|' || s), compared as hex
    strings. One shuffle (the groupBy), map-side partial min."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"h{j}")
        for j in range(n_hashes)
    ]
