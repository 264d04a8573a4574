"""Data-quality operators: table profiling and constraint checks —
the validation surface an ETL engine runs before/after every load
(extends SURVEY §2.14 from per-row tolerance to table-level
contracts).

Scale notes: the profile is ONE pass over the table (all per-column
aggregates in a single hash-aggregate); constraint checks are
anti-joins and keyed counts — each a single shuffle, all executable
in one job over a 100-TB table. `n_distinct` is exact here for oracle
parity; at scale switch to approx_count_distinct (documented trade).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "dq_profile_lineitem",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               round(min({c}), 6) AS min_value,
               round(max({c}), 6) AS max_value,
               round(CAST(sum(CAST({c} AS DECIMAL(20,8))) AS DOUBLE) / count({c}), 6) AS avg_value
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
)
def dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (count / nulls / distinct / min / max / avg) for
    the numeric measure columns — one aggregate pass produces every
    statistic; the per-column rows are assembled by a narrow unpivot
    of that single row."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            # avg via exact decimal sum: order-independent across
            # partitionings/engines (double accumulation is not)
            F.round(
                F.sum(F.col(c).cast("decimal(20,8)")).cast("double") / F.count(c), 6
            ).alias(f"{c}__avg"),
        ]
    # lazy cut of the ONE-ROW aggregate: each per-column union branch
    # re-ran the full table aggregate without it (observed: 4
    # lineitem scans; guide §1.2)
    one = li.agg(*aggs).localCheckpoint(eager=False)
    per_col = [
        one.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.col(f"{c}__avg").alias("avg_value"),
        )
        for c in _PROFILE_COLS
    ]
    return reduce(DataFrame.unionByName, per_col)


@query(
    "dq_constraint_checks",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_pk_unique',
           CAST((SELECT count(*) FROM (
                SELECT l_orderkey, l_linenumber FROM lineitem
                GROUP BY 1, 2 HAVING count(*) > 1)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_quantity IS NULL OR l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'events_value_not_null',
           CAST((SELECT count(*) FROM events WHERE value IS NULL) AS BIGINT)
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite: referential integrity (anti-join), key
    uniqueness (grouped count > 1), range and not-null checks — each
    check one line of output (check_name, n_violations), all runnable
    as a single job gate before a load commits."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    fk = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_anti"
    ).count()
    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    rng = li.filter(
        F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)
    ).count()
    nn = events.filter(F.col("value").isNull()).count()
    return spark.createDataFrame(
        [
            ("orders_custkey_fk", fk),
            ("lineitem_pk_unique", pk),
            ("lineitem_quantity_positive", rng),
            ("events_value_not_null", nn),
        ],
        "check_name STRING, n_violations BIGINT",
    )


# ------------------------------------------------- skew profiling

SKEW_TOP_K = 5


@query(
    "dq_skew_profile",
    oracle=f"""
    WITH freq AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_n
        FROM freq
    ),
    top AS (
        SELECT key, n,
               CAST(row_number() OVER (ORDER BY n DESC, key ASC) AS BIGINT)
                   AS rnk
        FROM freq
        ORDER BY n DESC, key ASC LIMIT {SKEW_TOP_K}
    )
    SELECT t.rnk, t.key, t.n,
           round(t.n * 1.0 * s.n_keys / s.n_rows, 6) AS skew_factor
    FROM top t CROSS JOIN stats s
    """,
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis: the top-K heaviest keys of a
    prospective shuffle key with each key's skew factor (its row count
    over the uniform share n_rows/n_keys). skew_factor >> 1 on a
    planned join key is the signal to reach for the salted join
    (operators/joins.py join_salted_skew) or rely on AQE skew-join
    splitting — this operator is the measurement that justifies either.

    Shape: one map-side-combinable frequency aggregate; the global
    stats reduce to ONE row that broadcasts back over the
    TakeOrderedAndProject top-K — at 100 TB the only full-data pass is
    the frequency count itself."""
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    top = (
        freq.orderBy(F.desc("n"), F.asc("key"))
        .limit(SKEW_TOP_K)
        .withColumn(
            "rnk",
            F.row_number().over(
                # K rows only — the unpartitioned window is bounded by
                # SKEW_TOP_K, never by data volume
                Window.orderBy(F.desc("n"), F.asc("key"))
            ).cast("long"),
        )
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rnk",
        "key",
        "n",
        F.round(F.col("n") * F.col("n_keys") / F.col("n_rows"), 6).alias(
            "skew_factor"
        ),
    )


@query(
    "report_corpus_datacard",
    oracle="""
    WITH base AS (
        SELECT lang, source, doc_id, n_chars,
               len(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) AS n_tokens,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
        FROM documents
    ),
    hc AS (SELECT h, count(*) AS hcnt FROM base GROUP BY 1)
    SELECT b.lang, b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(CASE WHEN hc.hcnt > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS dup_frac,
           round(quantile_cont(b.n_chars, 0.5), 6) AS median_chars
    FROM base b JOIN hc USING (h)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def report_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: the per-(lang, source) summary every released
    pretraining dataset publishes (docs, token volume, exact-dup
    fraction against the WHOLE corpus, median doc length) — the
    reporting step that closes the pipeline after filter/dedup/mix.

    One scan feeds both consumers (localCheckpoint): the global
    text-hash counts (dup_frac counts a doc as dup if its normalized
    text appears anywhere else in the corpus, across slice
    boundaries) and the per-slice aggregate. Two shuffles total (hash
    grain, slice grain) plus one equi-join back on the hash — each
    keyed on uniform keys; the slice grain is small by construction.
    Median is exact percentile for oracle parity; at 100 TB swap in
    approx_percentile, plan unchanged (same documented trade as
    dq_profile_lineitem's n_distinct)."""
    from ..functions.text import norm_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        "source",
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5(norm_text(F.col("text"))).alias("h"),
    )
    base = base.localCheckpoint(eager=False)  # one scan, two consumers
    hc = base.groupBy("h").agg(F.count(F.lit(1)).alias("hcnt"))
    return (
        base.join(hc, "h")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(
                F.sum(F.when(F.col("hcnt") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_frac"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("median_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id,
               event_id - row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id) AS island
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT island) AS BIGINT) AS n_islands,
           CAST(max(event_id) - min(event_id) + 1 - count(*) AS BIGINT)
               AS n_missing
    FROM r
    GROUP BY 1
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit per user: islands of CONSECUTIVE
    event_ids found with the classic id-minus-row_number device (the
    difference is constant exactly within a consecutive run, so
    islands fall out of one window + one distinct-count — no
    self-join, no lag cascade), plus the total count of ids missing
    from the user's [min, max] span. The data-loss detector every
    at-least-once ingest pipeline runs: n_islands > 1 or n_missing >
    0 localizes WHERE a sequence-numbered feed dropped records.
    (Events interleave across users here, so gaps are expected and
    nonzero — the arithmetic, not the verdict, is the operator.)

    100-TB shape: one shuffle on the user key; the window and both
    aggregates ride the same partitioning; output is user-grain."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    r = events.withColumn(
        "island", F.col("event_id") - F.row_number().over(w)
    )
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("island").alias("n_islands"),
        (F.max("event_id") - F.min("event_id") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_missing"),
    )


@query(
    "dq_benford_digits",
    oracle="""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
        WHERE round(o_totalprice * 100, 0) > 0
    ),
    d AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
    t AS (SELECT digit, n, sum(n) OVER () AS total FROM d)
    SELECT digit, n,
           round(n * 1.0 / total, 6) AS observed_frac,
           round(log10(1 + 1.0 / digit), 6) AS expected_frac,
           round(pow(n - total * log10(1 + 1.0 / digit), 2)
                 / (total * log10(1 + 1.0 / digit)), 6) AS chi2_term
    FROM t
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals (Benford 1938;
    Nigrini's fraud-audit standard — public): observed leading-digit
    distribution vs the log10(1+1/d) law, with per-digit chi-square
    terms so the auditor sees WHICH digit deviates, not just a global
    stat. Synthetic TPC-H-ish prices are NOT Benford-distributed — the
    deviation itself is the demo (a price generator is exactly the
    kind of process Benford audits flag).

    Digit extraction is integer-exact on both engines: cents =
    round(price*100) as BIGINT, leading digit = first character of the
    integer's decimal rendering — no float log10/pow floor that could
    flip at a power-of-ten boundary.

    100-TB shape: ONE map-side-combinable hash aggregate to digit
    grain (9 rows); the total and chi-square terms run on those 9
    rows. Nothing else shuffles."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    c = o.filter(cents > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    d = c.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = d.withColumn("total", F.sum("n").over(Window.partitionBy()))
    e = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    return t.select(
        "digit",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed_frac"),
        F.round(e, 6).alias("expected_frac"),
        F.round(
            F.pow(F.col("n") - F.col("total") * e, F.lit(2))
            / (F.col("total") * e),
            6,
        ).alias("chi2_term"),
    )


# (table, column) pairs profiled by dq_entropy_profile — the
# categorical columns of the warehouse, across FOUR tables.
_ENTROPY_COLS = (
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
)


def _entropy_oracle_one(table: str, col: str) -> str:
    return f"""
    SELECT '{table}' AS table_name, '{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(CAST(-sum(CAST(round(p * log2(p), 12) AS DECIMAL(28,12)))
                      AS DOUBLE), 6) AS entropy_bits,
           round(CAST(-sum(CAST(round(p * log2(p), 12) AS DECIMAL(28,12)))
                      AS DOUBLE)
                 / NULLIF(log2(count(*)), 0), 6) AS norm_entropy
    FROM (
        SELECT count(*) * 1.0 / sum(count(*)) OVER () AS p
        FROM {table} WHERE {col} IS NOT NULL GROUP BY {col}
    )
    """


@query(
    "dq_entropy_profile",
    oracle=" UNION ALL ".join(
        _entropy_oracle_one(t, c) for t, c in _ENTROPY_COLS
    ),
)
def dq_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy profile of every categorical column in the
    warehouse: bits per column plus entropy normalized by
    log2(cardinality), so 1.0 = uniform and ~0 = near-constant. The
    information-theoretic complement to dq_profile_lineitem's
    null/distinct counts — a column whose entropy collapses between
    loads signals an upstream default-value bug even when null rate
    and cardinality look unchanged (the drift case KL-divergence
    catches for distributions, applied table-wide as one scalar per
    column).

    Determinism: per-value terms p*log2(p) are rounded to 12 and
    summed as exact DECIMAL; single-valued columns yield norm_entropy
    NULL (log2(1)=0, NULLIF on both engines).

    100-TB shape: one map-side-combinable value-grain aggregate per
    column (categorical cardinality is small by definition), then a
    one-row reduce each; the union is 7 rows. Columns of one table
    could share a scan via grouping-sets if scan cost dominated;
    kept one-agg-per-column so each column's aggregate stays
    map-combinable at its own grain."""
    parts = []
    for table, col in _ENTROPY_COLS:
        base = (
            load_table(spark, sf_dir, table)
            .filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("nv"))
        )
        p = (F.col("nv") * 1.0 / F.sum("nv").over(Window.partitionBy())).alias("p")
        term = F.round(F.col("p") * F.log2(F.col("p")), 12).cast("decimal(28,12)")
        parts.append(
            base.select(p)
            .agg(
                F.count(F.lit(1)).alias("n_distinct"),
                (-F.sum(term)).cast("double").alias("h"),
            )
            .select(
                F.lit(table).alias("table_name"),
                F.lit(col).alias("column_name"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                F.round("h", 6).alias("entropy_bits"),
                F.round(
                    F.col("h") / F.nullif(F.log2(F.col("n_distinct")), F.lit(0.0)), 6
                ).alias("norm_entropy"),
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


# Candidate functional dependencies checked by dq_functional_dependency:
# (table, determinant, dependent). The first two HOLD by construction
# (order grain), the rest measure how far the data is from determinism —
# the profiling signal (Papenbrock/Metanome-style FD validation, public).
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
)


def _fd_oracle_one(table: str, det: str, dep: str) -> str:
    return f"""
    SELECT '{table}' AS table_name, '{det}' AS determinant,
           '{dep}' AS dependent,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_keys,
           round(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS violation_rate,
           (max(nv) = 1) AS holds
    FROM (
        SELECT {det}, count(DISTINCT {dep}) AS nv
        FROM {table} WHERE {det} IS NOT NULL
        GROUP BY {det}
    )
    """


@query(
    "dq_functional_dependency",
    oracle=" UNION ALL ".join(
        _fd_oracle_one(t, a, b) for t, a, b in _FD_CANDIDATES
    ),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency validation (the Metanome/Papenbrock FD
    discovery problem restricted to declared candidates — public):
    for each candidate determinant -> dependent pair, does one
    determinant value ever map to more than one dependent value, and
    for what fraction of keys? `holds` is the hard contract (a
    violated o_orderkey -> o_custkey would mean the order grain is
    broken upstream); nonzero violation_rate on the soft candidates
    (a part supplied by several suppliers, a user emitting several
    event types) is the measured shape of the data, not an error.
    The schema-level complement of dq_constraint_checks' row-level
    rules: constraints police values, FDs police GRAIN.

    100-TB shape: one map-combinable (determinant ->
    count-distinct-dependent) aggregate per candidate, then a one-row
    reduce each; the union is 5 rows. Exact count-distinct at key
    grain is bounded by the dependent's per-key cardinality (tiny by
    definition for a near-FD); a full FD *search* over all column
    pairs would instead sample + sketch — documented trade, declared
    candidates here."""
    parts = []
    for table, det, dep in _FD_CANDIDATES:
        per_key = (
            load_table(spark, sf_dir, table)
            .filter(F.col(det).isNotNull())
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("nv"))
        )
        viol = F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
        parts.append(
            per_key.agg(
                F.count(F.lit(1)).alias("n_keys"),
                viol.alias("n_violating_keys"),
                F.round(viol * 1.0 / F.count(F.lit(1)), 6).alias(
                    "violation_rate"
                ),
                (F.max("nv") == 1).alias("holds"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_keys",
                "n_violating_keys",
                "violation_rate",
                "holds",
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


# ------------------------------------------------------- privacy audits
# Training-data releases carry re-identification duties; the standard
# table-level audit is k-anonymity (Sweeney 2002): every combination
# of quasi-identifier values must be shared by >= k rows, else the
# rare combination singles someone out. l-diversity (Machanavajjhala
# et al. 2007) adds that the SENSITIVE attribute must take >= l distinct
# values inside each group (a k-anonymous group that is 100% one
# sensitive value still leaks it).
#
# Spark shape: ONE hash aggregate on the QI key computing group size
# and sensitive-value diversity together — map-side combinable, scales
# as a pure groupBy; auditing a 100 TB table is exactly this plan.
# The sensitive attribute here is the account-balance band (coarse
# bucketing is itself the standard generalization move).

K_ANON = 5
L_DIVERSE = 3


def kanonymity_band_counts(cust: DataFrame) -> DataFrame:
    """(nationkey, mktsegment, band, cnt) — the algebraic partial the
    audit is computed FROM: counts merge by addition and distinct
    bands are rows at this grain, so a streaming monitor can maintain
    these per batch and fold them (streaming/runtime.run_kanonymity_
    sink), bit-equal to the batch audit by construction."""
    band = F.floor(F.col("c_acctbal") / 2000)
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        band.alias("band"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def kanonymity_from_band_counts(bc: DataFrame) -> DataFrame:
    """Shared audit tail over the band-count grain: group_size is the
    count sum, l_sensitive the number of band rows (== distinct
    bands). Kept in lockstep with the oracle's COUNT(*) /
    COUNT(DISTINCT ...) formulation."""
    return (
        bc.groupBy("nationkey", "mktsegment")
        .agg(
            F.sum("cnt").cast("long").alias("group_size"),
            F.count(F.lit(1)).cast("long").alias("l_sensitive"),
        )
        .select(
            "nationkey",
            "mktsegment",
            "group_size",
            "l_sensitive",
            (F.col("group_size") >= K_ANON).alias("k_anonymous"),
            (F.col("l_sensitive") >= L_DIVERSE).alias("l_diverse"),
        )
        .orderBy("nationkey", "mktsegment")
    )


@query(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT floor(c_acctbal / 2000)) AS BIGINT) AS l_sensitive,
           count(*) >= {K_ANON} AS k_anonymous,
           count(DISTINCT floor(c_acctbal / 2000)) >= {L_DIVERSE} AS l_diverse
    FROM customer
    GROUP BY 1, 2
    ORDER BY nationkey, mktsegment
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the
    (nationkey, mktsegment) quasi-identifier with banded acctbal as
    the sensitive attribute (block comment above)."""
    cust = load_table(spark, sf_dir, "customer")
    return kanonymity_from_band_counts(kanonymity_band_counts(cust))
