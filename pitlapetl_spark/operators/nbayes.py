"""Multinomial Naive Bayes language classifier, trained AND scored in
one Catalyst plan — the third from-scratch ML operator next to
k-means (kmeans.py) and batch-GD logistic regression (stats.py), and
the supervised counterpart of text_lang_id's fixed stopword heuristic:
here the per-language word likelihoods are LEARNED from a labeled
train split (multinomial NB with Laplace smoothing — Manning et al.,
IR book ch.13, public), then a held-out split is argmax-scored and
the confusion matrix reported.

Split contract: test = doc_id % 5 == 0 (deterministic, no RNG), the
same modulo device as split_train_holdout.

Determinism: all counts are exact integers; every log term
(smoothed likelihood ln((c+1)/(N_lang+V)), prior ln(n_docs/total)) is
round(...,12) cast DECIMAL(28,12); per-(doc,lang) scores are exact
sums of count x decimal terms, so the argmax compares exact decimals
on both engines; argmax ties break on lang ascending.

Expected quality on THIS corpus: the synthetic generator draws every
language from one shared English-ish word pool, so the learned
likelihoods are nearly identical across classes and NB collapses to
the prior (majority class 'en') — the corpus-health alarm fires, the
same honest-negative framing as text_zipf_fit. The machinery (and the
oracle parity) is the operator; a real multilingual corpus separates.

100-TB shape: training is one token-explode + (lang, word) hash
aggregate (map-side combinable, uniform after the word key's natural
skew — a DF cap like the Jaccard dedup's is the documented guard for
stopword-heavy corpora). Scoring uses the SPARSE identity
score = ln_prior + sum_present cnt*lw(c>0) + (tot - covered)*lw(c=0):
only OBSERVED (word, lang) count rows join the test features (an
equi-join on the word key), and every unobserved word's smoothed
default folds into one per-(doc, lang) closed form — the dense
vocab x |langs| likelihood grid is never materialized. Decimal
addition is exact, so the regrouping is bit-identical to the dense
sum the DuckDB oracle computes. At a 10M-type vocabulary, swap the
exact word key for feature hashing (featurize_hashed_ngrams) — same
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

NB_TEST_MOD = 5  # doc_id % 5 == 0 -> held-out test split
_DEC = "decimal(28,12)"

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _oracle() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id, lang,
               string_split({_NORM}, ' ') AS toks,
               (doc_id % {NB_TEST_MOD} = 0) AS is_test
        FROM documents
    ),
    train_words AS (
        SELECT lang, unnest(toks) AS w FROM base WHERE NOT is_test
    ),
    counts AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS c
        FROM train_words GROUP BY 1, 2
    ),
    nlang AS (
        SELECT lang, CAST(sum(c) AS BIGINT) AS n_tok FROM counts GROUP BY 1
    ),
    vocab AS (SELECT DISTINCT w FROM counts),
    vsize AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    priors AS (
        SELECT lang,
               CAST(round(ln(count(*) * 1.0 /
                   (SELECT count(*) FROM base WHERE NOT is_test)), 12)
                   AS {_DEC}) AS lp
        FROM base WHERE NOT is_test GROUP BY lang
    ),
    likes AS (
        SELECT nl.lang, vo.w,
               CAST(round(ln((coalesce(ct.c, 0) + 1.0) / (nl.n_tok + vs.v)),
                          12) AS {_DEC}) AS lw
        FROM vocab vo
        CROSS JOIN nlang nl
        CROSS JOIN vsize vs
        LEFT JOIN counts ct ON ct.lang = nl.lang AND ct.w = vo.w
    ),
    test_feats AS (
        SELECT b.doc_id, t.w, CAST(count(*) AS BIGINT) AS cnt
        FROM base b, unnest(b.toks) AS t(w)
        WHERE b.is_test AND t.w IN (SELECT w FROM vocab)
        GROUP BY 1, 2
    ),
    feat_scores AS (
        SELECT f.doc_id, lk.lang, sum(f.cnt * lk.lw) AS s
        FROM test_feats f JOIN likes lk ON f.w = lk.w
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT b.doc_id, b.lang AS true_lang, p.lang AS cand,
               p.lp + coalesce(fs.s, 0) AS score
        FROM base b
        CROSS JOIN priors p
        LEFT JOIN feat_scores fs
          ON fs.doc_id = b.doc_id AND fs.lang = p.lang
        WHERE b.is_test
    ),
    pred AS (
        SELECT doc_id, true_lang, cand AS pred_lang
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
            FROM grid
        ) WHERE rn = 1
    )
    SELECT true_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY true_lang), 6) AS frac
    FROM pred
    GROUP BY true_lang, pred_lang
    """


@query("ml_naive_bayes_langid", oracle=_oracle())
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train multinomial NB on the train split, argmax-score the test
    split, return the confusion matrix (true_lang, pred_lang, n, frac
    of the true class). See module docstring for the smoothing,
    determinism, and scale contract."""
    from ..functions.text import tokens

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("toks"),
        (F.col("doc_id") % NB_TEST_MOD == 0).alias("is_test"),
    )
    base = base.localCheckpoint(eager=False)  # one scan, train + test consumers
    train = base.filter(~F.col("is_test"))
    counts = (
        train.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = counts.localCheckpoint(eager=False)  # feeds nlang, vocab, present
    nlang = counts.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    vocab = counts.select("w").distinct()
    vocab = vocab.localCheckpoint(eager=False)  # feeds vsize + test_feats
    # vocab size: a bounded driver-side scalar (the PageRank node-count
    # precedent) — folding it in as a literal keeps the model frame
    # free of scalar cross-joins
    v_scalar = vocab.count()
    # per-lang model scalars: n_tok, vocab size, smoothed zero-count
    # default ln(1/(n_tok+v)), and the ln prior (window over 5 rows)
    wall = Window.partitionBy()
    aux = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .join(nlang, "lang")
        .select(
            "lang",
            "n_tok",
            F.lit(v_scalar).alias("v"),
            F.round(F.log(F.col("nd") * 1.0 / F.sum("nd").over(wall)), 12)
            .cast(_DEC)
            .alias("lp"),
            F.round(F.log(F.lit(1.0) / (F.col("n_tok") + F.col("v"))), 12)
            .cast(_DEC)
            .alias("dflt"),
        )
    )
    test_feats = (
        base.filter("is_test")
        .select("doc_id", F.explode("toks").alias("w"))
        .join(vocab, "w")  # drop OOV words, the standard NB convention
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    test_feats = test_feats.localCheckpoint(eager=False)  # present + totals
    # sparse scoring: only OBSERVED (w, lang) counts join the features
    present = (
        test_feats.join(counts, "w")
        .join(F.broadcast(aux.select("lang", "n_tok", "v")), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            # cnt is cast to DECIMAL(9,0) so the product stays within
            # precision 38 WITHOUT Spark's allowPrecisionLoss scale
            # truncation (long x decimal(28,12) -> decimal(38,6),
            # which would diverge from DuckDB's exact scale-12 product
            # and break the exact-argmax contract; found by review)
            F.sum(
                F.col("cnt").cast("decimal(9,0)")
                * F.round(
                    F.log((F.col("c") + 1.0) / (F.col("n_tok") + F.col("v"))), 12
                ).cast(_DEC)
            ).alias("s_present"),
            F.sum("cnt").alias("covered"),
        )
    )
    totals = test_feats.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    grid = (
        base.filter("is_test")
        .select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(
            F.broadcast(aux.select(F.col("lang").alias("cand"), "lp", "dflt"))
        )  # doc x 5-row model broadcast (bounded BNLJ)
        .join(totals, "doc_id", "left")
        .join(
            present.select(
                "doc_id", F.col("lang").alias("cand"), "s_present", "covered"
            ),
            ["doc_id", "cand"],
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (
                F.col("lp")
                + F.coalesce(F.col("s_present"), F.lit(0).cast(_DEC))
                + (
                    F.coalesce(F.col("tot"), F.lit(0))
                    - F.coalesce(F.col("covered"), F.lit(0))
                ).cast("decimal(9,0)")  # same precision-loss guard
                * F.col("dflt")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    pred = (
        grid.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    wt = Window.partitionBy("true_lang")
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.round(F.col("n") * 1.0 / F.sum("n").over(wt), 6).alias("frac"),
        )
    )
