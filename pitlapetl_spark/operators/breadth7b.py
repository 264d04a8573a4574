"""Round-7 session-2 breadth: Benford first-digit audit, Welch
two-sample t-test, ABC/Pareto inventory classes, new-vs-returning
revenue decomposition, and a t-closeness privacy audit — the
remaining members of the DQ / classical-stats / retail-analytics /
privacy families a production analytics engine ships.

House determinism rules apply throughout (registry module docstring):
identical aliases both sides; money sums in DECIMAL; proportion
comparisons in integer cross-multiplied arithmetic where a round()
boundary could split engines (the analytics_cohort_ltv_curve lesson);
the t-closeness EMD folds INTEGER numerators over a common
denominator so accumulation order cannot move a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


# ------------------------------------------- Benford first-digit DQ
# The fraud/DQ screen: organically-generated money amounts follow
# Benford's law (P(d) = log10(1 + 1/d)); fabricated or truncated
# feeds don't. Per leading digit of o_totalprice: observed share vs
# Benford expectation and the chi-square contribution. One hash agg
# to 9 rows + a window total — nothing scales with data volume but
# the scan. Digit extraction goes through floor-then-string on BOTH
# engines (Spark double->long CAST truncates, DuckDB ROUNDS — the
# documented cast trap, so neither side uses the bare cast).


@query(
    "stats_benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                      1, 1) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM d)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
           round(
               pow(n - total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
               / (total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6
           ) AS chi2_term
    FROM t ORDER BY digit
    """,
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts (block
    comment above)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = o.groupBy(
        F.substring(
            F.floor("o_totalprice").cast("string"), 1, 1
        ).alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = d.withColumn("total", F.sum("n").over(Window.partitionBy()))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return t.select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "obs_share"
        ),
        F.round(exp, 6).alias("exp_share"),
        F.round(
            F.pow(F.col("n") - F.col("total") * exp, 2)
            / (F.col("total") * exp),
            6,
        ).alias("chi2_term"),
    ).orderBy("digit")


# --------------------------------------------- Welch two-sample t
# The unequal-variance two-sample test — the correct default when
# comparing a metric across two segments whose spreads differ
# (Student's pooled test silently assumes equal variance). Urgent
# (priority 1-2) vs other order value: one conditional moment
# aggregate (n, sum, sum-of-squares per arm in exact DECIMAL), then
# the t statistic and Welch-Satterthwaite df as identical double
# expression trees over the exact sums — the Mahalanobis determinism
# ladder. One scan, one 1-row aggregate; volume only changes the
# scan.


@query(
    "stats_welch_ttest",
    oracle="""
    WITH m AS (
        SELECT
          CAST(count(*) FILTER (WHERE urgent = 1) AS BIGINT) AS n1,
          CAST(count(*) FILTER (WHERE urgent = 0) AS BIGINT) AS n2,
          sum(v) FILTER (WHERE urgent = 1) AS s1,
          sum(v) FILTER (WHERE urgent = 0) AS s2,
          sum(v * v) FILTER (WHERE urgent = 1) AS q1,
          sum(v * v) FILTER (WHERE urgent = 0) AS q2
        FROM (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                     CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END AS urgent
              FROM orders)
    ),
    e AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
               CAST(n1 * q1 - s1 * s1 AS DOUBLE) / n1 / (n1 - 1) AS v1,
               CAST(n2 * q2 - s2 * s2 AS DOUBLE) / n2 / (n2 - 1) AS v2
        FROM m
    )
    SELECT n1, n2,
           round(m1, 6) AS mean_urgent, round(m2, 6) AS mean_other,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                 6) AS welch_df
    FROM e
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, urgent vs other order value
    (block comment above)."""
    o = load_table(spark, sf_dir, "orders")
    v = F.col("o_totalprice").cast("decimal(18,2)")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    m = o.select(v.alias("v"), urgent.alias("urgent")).agg(
        F.count(F.when(F.col("urgent") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("urgent") == 0, 1)).alias("n2"),
        F.sum(F.when(F.col("urgent") == 1, F.col("v"))).alias("s1"),
        F.sum(F.when(F.col("urgent") == 0, F.col("v"))).alias("s2"),
        F.sum(F.when(F.col("urgent") == 1, F.col("v") * F.col("v"))).alias(
            "q1"
        ),
        F.sum(F.when(F.col("urgent") == 0, F.col("v") * F.col("v"))).alias(
            "q2"
        ),
    )
    e = m.select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n2")).alias("m2"),
        (
            (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / F.col("n1")
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")).cast(
                "double"
            )
            / F.col("n2")
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return e.select(
        "n1",
        "n2",
        F.round("m1", 6).alias("mean_urgent"),
        F.round("m2", 6).alias("mean_other"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# ------------------------------------------------ ABC / Pareto class
# The inventory-planning classic: rank parts by revenue, cut the
# cumulative share at 80% (A) and 95% (B). Revenue per part is one
# DECIMAL-exact hash agg; the cumulative share is a window over the
# part-grain frame ORDERED BY (revenue DESC, partkey) — total order,
# so the cumsum is deterministic; class cuts compare a ratio of two
# exact decimals cast to double, identical on both engines. Output is
# the 3-row class summary (share of parts vs share of revenue — the
# Pareto table itself). Part-grain window at 100 TB: parts are the
# ~1e8-row dimension, single-key window, fine; the fact scan is the
# only volume term.


@query(
    "analytics_abc_pareto",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT revenue,
               CAST(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(sum(revenue) OVER () AS DOUBLE) AS cum_share
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
               revenue
        FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(revenue) AS DOUBLE) AS revenue,
           round(CAST(sum(revenue) AS DOUBLE) /
                 (SELECT CAST(sum(revenue) AS DOUBLE) FROM rev), 6)
               AS revenue_share
    FROM classed GROUP BY 1 ORDER BY abc_class
    """,
)
def analytics_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by revenue (block comment
    above)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("e")
    )
    rev = li.groupBy("l_partkey").agg(F.sum("e").alias("revenue"))
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "revenue",
        (
            F.sum("revenue").over(w_cum).cast("double")
            / F.sum("revenue").over(w_all).cast("double")
        ).alias("cum_share"),
        F.sum("revenue").over(w_all).cast("double").alias("grand"),
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "revenue",
        "grand",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("revenue").cast("double").alias("revenue"),
            F.round(
                F.sum("revenue").cast("double") / F.first("grand"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# ------------------------------------- new vs returning decomposition
# The growth-accounting split every revenue dashboard carries: how
# much of each month's revenue came from customers in their FIRST
# month vs repeat business. First month = min(order month) per
# customer — one customer-grain aggregate joined back on the
# customer key (co-partitioned, no broadcast needed at 100 TB since
# both sides shuffle on o_custkey); flags and sums are exact
# INT/DECIMAL.


@query(
    "analytics_new_vs_returning",
    oracle="""
    WITH fm AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS first_month
        FROM orders GROUP BY 1
    )
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           CASE WHEN date_trunc('month', o.o_orderdate) = fm.first_month
                THEN 'new' ELSE 'returning' END AS cohort,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN fm ON o.o_custkey = fm.o_custkey
    GROUP BY 1, 2
    ORDER BY month, cohort
    """,
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into first-month vs returning customers
    (block comment above)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("om"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    fm = o.groupBy("o_custkey").agg(F.min("om").alias("first_month"))
    return (
        o.join(fm, "o_custkey")
        .groupBy(
            F.date_format("om", "yyyy-MM").alias("month"),
            F.when(F.col("om") == F.col("first_month"), "new")
            .otherwise("returning")
            .alias("cohort"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("p").cast("double").alias("revenue"),
        )
        .orderBy("month", "cohort")
    )


# ---------------------------------------------- t-closeness audit
# The third rung of the anonymization ladder (k-anonymity: group
# size, quality.py:623; l-diversity: distinct sensitive values,
# breadth7.py): t-closeness asks whether each QI group's SENSITIVE
# DISTRIBUTION stays within EMD t of the global one — a group can be
# large (k ok) and diverse (l ok) yet still leak because 95% of it
# shares one value. For the ordered sensitive attribute
# o_orderpriority, EMD = sum of |cumulative-share gaps| / (K-1)
# (Li, Li, Venkatasubramanian, ICDE 2007, ordered-distance form).
# Determinism device: each gap is the INTEGER cross-multiplication
# |cum_g * T_global - cum_G * t_group| summed exactly per group, then
# ONE division by (t_group * T_global * (K-1)) — no double is ever
# accumulated. The 5x5 segment-x-priority densification is a
# broadcast cross of two tiny distinct frames (bounded BNLJ,
# documented); everything volume-bound is hash aggs on the fact.


@query(
    "privacy_t_closeness",
    oracle="""
    WITH f AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    dense AS (
        SELECT s.seg, p.pri, coalesce(f.n, 0) AS n
        FROM (SELECT DISTINCT seg FROM f) s
        CROSS JOIN (SELECT DISTINCT pri FROM f) p
        LEFT JOIN f ON f.seg = s.seg AND f.pri = p.pri
    ),
    cums AS (
        SELECT seg, pri,
               CAST(sum(n) OVER (PARTITION BY seg ORDER BY pri
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_grp,
               CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS t_grp,
               CAST(sum(n) OVER (ORDER BY pri RANGE UNBOUNDED PRECEDING)
                   AS BIGINT) AS c_all,
               CAST(sum(n) OVER () AS BIGINT) AS t_all,
               CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS k
        FROM dense
    )
    SELECT seg,
           round(CAST(sum(abs(c_grp * t_all - c_all * t_grp)) AS DOUBLE)
                 / (max(t_grp) * max(t_all) * (max(k) - 1)), 6) AS emd,
           CAST(sum(abs(c_grp * t_all - c_all * t_grp)) AS DOUBLE)
               / (max(t_grp) * max(t_all) * (max(k) - 1)) <= 0.05 AS within_t
    FROM cums GROUP BY seg ORDER BY seg
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness EMD of order priority per market segment (block
    comment above)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("pri")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    f = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("seg", "pri")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = f.localCheckpoint(eager=False)  # 25 rows; 3 consumers below
    segs = f.select("seg").distinct()
    pris = f.select("pri").distinct()
    # bounded BNLJ: |segments| x |priorities| = 5 x 5 densification
    dense = segs.crossJoin(F.broadcast(pris)).join(
        f, ["seg", "pri"], "left"
    ).select("seg", "pri", F.coalesce("n", F.lit(0)).alias("n"))
    w_cg = (
        Window.partitionBy("seg")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tg = Window.partitionBy("seg")
    # global cumulative shares must aggregate ACROSS segments at each
    # priority: rank-ordered RANGE frame over the whole 25-row frame
    w_cG = (
        Window.partitionBy()
        .orderBy("pri")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tG = Window.partitionBy()
    cg = F.sum("n").over(w_cg)
    tg = F.sum("n").over(w_tg)
    cglob = F.sum("n").over(w_cG)
    tglob = F.sum("n").over(w_tG)
    cums = dense.select(
        "seg",
        F.abs(cg * tglob - cglob * tg).alias("gap_num"),
        tg.alias("t_grp"),
        tglob.alias("t_all"),
        F.count(F.lit(1)).over(w_tg).alias("k"),
    )
    num = F.sum("gap_num").cast("double")
    den = (F.max("t_grp") * F.max("t_all") * (F.max("k") - 1)).cast("double")
    return (
        cums.groupBy("seg")
        .agg(
            F.round(num / den, 6).alias("emd"),
            ((num / den) <= 0.05).alias("within_t"),
        )
        .orderBy("seg")
    )


# ------------------------------------- Jaccard link prediction
# The unweighted sibling of Adamic-Adar (linkpred.py): score part
# pairs by neighbor-set overlap |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over
# shared customers. Same bounded-pair-space discipline — the memoized
# bipartite frame, the customer-degree cap (deg² join rows with
# ~zero signal above it), the co-partitioned self-join — but the
# score is a pure INTEGER ratio (common / (sz_a + sz_b - common)), so
# there is no accumulation-order surface at all. Part sizes are
# counted over the SAME capped frame the pairs come from, so the
# ratio is internally consistent (and the oracle states that
# definition, not the uncapped one).


@query(
    "graph_jaccard_linkpred",
    oracle="""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
        SELECT c FROM cp GROUP BY c
        HAVING count(*) BETWEEN 2 AND 256
    ),
    capped AS (SELECT cp.c, cp.p FROM cp JOIN deg ON cp.c = deg.c),
    sz AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM capped GROUP BY p),
    pairs AS (
        SELECT a.p AS part_a, b.p AS part_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_common,
           round(CAST(n_common AS DOUBLE)
                 / (sa.s + sb.s - n_common), 6) AS jaccard
    FROM pairs
    JOIN sz sa ON sa.p = part_a
    JOIN sz sb ON sb.p = part_b
    ORDER BY jaccard DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k part pairs by neighbor-set Jaccard (block comment
    above). Cap constants match linkpred.AA_DEG_MIN/AA_DEG_CAP."""
    from .linkpred import AA_DEG_CAP, AA_DEG_MIN
    from .pagerank import bipartite_copurchase_cached

    cp = bipartite_copurchase_cached(spark, sf_dir)
    deg = (
        cp.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d").between(AA_DEG_MIN, AA_DEG_CAP))
        .select("c")
    )
    capped = cp.join(deg, "c").select("c", "p")
    # one fact-scale build shared by the two self-join sides and the
    # size frame (the linkpred lineage-cut device)
    capped = capped.localCheckpoint(eager=False)
    sz = capped.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("p").alias("part_a"), F.col("s").alias("sa"))
    sb = sz.select(F.col("p").alias("part_b"), F.col("s").alias("sb"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


# ------------------------------------- Benjamini-Hochberg FDR sweep
# The missing piece between "we ran a test" (stats.py has z/chi2/KS)
# and "we ran 25 tests and believed the wrong ones": per-nation
# two-proportion z-tests (urgent-order share, nation vs rest) and the
# Benjamini-Hochberg step-up that controls the false-discovery rate
# across the family. The normal tail is the Abramowitz-Stegun
# 26.2.17 polynomial written as the IDENTICAL expression tree on both
# engines (the literal 1/sqrt(2*pi) constant, not engine pi()), and
# every BH comparison uses round(p, 9) as both the sort key and the
# threshold operand so a last-ulp exp() difference cannot reorder the
# step-up. All volume work is one fact-grain hash agg; the 25-row
# test family is window arithmetic.

BH_ALPHA = 0.10


def _as_normal_tail_sql(z: str) -> str:
    """A&S 26.2.17 upper-tail Q(z) for z >= 0, as SQL text."""
    return (
        f"0.3989422804014327 * exp(-({z}) * ({z}) / 2.0) * "
        f"(0.319381530 * tt - 0.356563782 * pow(tt, 2) "
        f"+ 1.781477937 * pow(tt, 3) - 1.821255978 * pow(tt, 4) "
        f"+ 1.330274429 * pow(tt, 5))"
    )


@query(
    "stats_fdr_bh",
    oracle=f"""
    WITH f AS (
        SELECT n.n_name AS nation,
               CAST(count(*) AS BIGINT) AS n1,
               CAST(count(*) FILTER (WHERE o.o_orderpriority IN
                   ('1-URGENT', '2-HIGH')) AS BIGINT) AS k1
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    ),
    g AS (
        SELECT nation, n1, k1,
               CAST(sum(n1) OVER () AS BIGINT) AS nt,
               CAST(sum(k1) OVER () AS BIGINT) AS kt,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM f
    ),
    z AS (
        SELECT nation, n1, k1, m,
               (CAST(k1 AS DOUBLE) / n1
                - CAST(kt - k1 AS DOUBLE) / (nt - n1))
               / sqrt((CAST(kt AS DOUBLE) / nt)
                      * (1.0 - CAST(kt AS DOUBLE) / nt)
                      * (1.0 / n1 + 1.0 / (nt - n1))) AS zv
        FROM g
    ),
    p AS (
        SELECT nation, n1, k1, m, zv,
               round(2.0 * {_as_normal_tail_sql('abs(zv)')}, 9) AS p9
        FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(zv)) AS tt FROM z)
    ),
    r AS (
        SELECT nation, n1, k1, m, zv, p9,
               CAST(row_number() OVER (ORDER BY p9, nation) AS BIGINT)
                   AS bh_rank
        FROM p
    ),
    s AS (
        SELECT *, coalesce(max(CASE WHEN p9 <= bh_rank * {BH_ALPHA} / m
                                    THEN bh_rank END) OVER (), 0) AS cutoff
        FROM r
    )
    SELECT nation, n1,
           round(CAST(k1 AS DOUBLE) / n1, 6) AS urgent_share,
           round(zv, 6) AS z_stat,
           round(p9, 6) AS p_value,
           bh_rank,
           bh_rank <= cutoff AS rejected
    FROM s ORDER BY bh_rank
    """,
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation urgent-share z-tests + Benjamini-Hochberg step-up
    (block comment above)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("u"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    f = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum(F.col("u").cast("long")).alias("k1"),
        )
    )
    w = Window.partitionBy()
    g = f.select(
        "nation",
        "n1",
        "k1",
        F.sum("n1").over(w).alias("nt"),
        F.sum("k1").over(w).alias("kt"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    pp = F.col("kt").cast("double") / F.col("nt")
    zv = (
        F.col("k1").cast("double") / F.col("n1")
        - (F.col("kt") - F.col("k1")).cast("double")
        / (F.col("nt") - F.col("n1"))
    ) / F.sqrt(
        pp * (1.0 - pp)
        * (1.0 / F.col("n1") + 1.0 / (F.col("nt") - F.col("n1")))
    )
    z = g.select("nation", "n1", "k1", "m", zv.alias("zv"))
    tt = 1.0 / (1.0 + 0.2316419 * F.abs(F.col("zv")))
    tail = (
        0.3989422804014327
        * F.exp(-F.col("zv") * F.col("zv") / 2.0)
        * (
            0.319381530 * tt
            - 0.356563782 * F.pow(tt, 2)
            + 1.781477937 * F.pow(tt, 3)
            - 1.821255978 * F.pow(tt, 4)
            + 1.330274429 * F.pow(tt, 5)
        )
    )
    p = z.select(
        "nation", "n1", "k1", "m", "zv",
        F.round(2.0 * tail, 9).alias("p9"),
    )
    r = p.withColumn(
        "bh_rank",
        F.row_number().over(Window.partitionBy().orderBy("p9", "nation"))
        .cast("long"),
    )
    s = r.withColumn(
        "cutoff",
        F.coalesce(
            F.max(
                F.when(
                    F.col("p9")
                    <= F.col("bh_rank") * BH_ALPHA / F.col("m"),
                    F.col("bh_rank"),
                )
            ).over(w),
            F.lit(0).cast("long"),
        ),
    )
    return s.select(
        "nation",
        "n1",
        F.round(F.col("k1").cast("double") / F.col("n1"), 6).alias(
            "urgent_share"
        ),
        F.round("zv", 6).alias("z_stat"),
        F.round("p9", 6).alias("p_value"),
        "bh_rank",
        (F.col("bh_rank") <= F.col("cutoff")).alias("rejected"),
    ).orderBy("bh_rank")


# ----------------------------------- ridge regression, closed form
# L2-regularized linear regression as ONE moment aggregate: with two
# features the normal equations (X'X + λI)w = X'y are a 3x3 system,
# solved in closed form by Cramer's rule — the rank-3 rung of the
# ladder that already holds ml_linear_fit_closed_form (1 feature) and
# rec_als_factorization (rank-2 Cramer half-steps). λ rides the
# non-intercept diagonal only (the textbook form) and scales with n
# so the fit is invariant to data volume. Every sum is exact DECIMAL;
# determinants and coefficients are identical double trees over those
# sums; R² comes from the same moments (SSE via the expanded
# quadratic form), so the whole fit is one scan → one 1-row
# aggregate, at any scale.

RIDGE_LAM_PER_ROW = 10.0


@query(
    "ml_ridge_closed_form",
    oracle=f"""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
               sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
               sum(x2 * x2) AS s22, sum(x1 * y) AS s1y,
               sum(x2 * y) AS s2y, sum(y * y) AS syy
        FROM (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
                     CAST(l_discount AS DECIMAL(18,2)) AS x2,
                     CAST(l_extendedprice AS DECIMAL(18,2)) AS y
              FROM lineitem)
    ),
    d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
               CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
               CAST(s11 AS DOUBLE) + {RIDGE_LAM_PER_ROW} * n AS a11,
               CAST(s12 AS DOUBLE) AS a12,
               CAST(s22 AS DOUBLE) + {RIDGE_LAM_PER_ROW} * n AS a22,
               CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
               CAST(s22 AS DOUBLE) AS s22,
               CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
               CAST(syy AS DOUBLE) AS syy
        FROM s
    ),
    c AS (
        SELECT *,
            n * (a11 * a22 - a12 * a12) - s1 * (s1 * a22 - a12 * s2)
              + s2 * (s1 * a12 - a11 * s2) AS det,
            sy * (a11 * a22 - a12 * a12) - s1 * (s1y * a22 - a12 * s2y)
              + s2 * (s1y * a12 - a11 * s2y) AS det0,
            n * (s1y * a22 - a12 * s2y) - sy * (s1 * a22 - a12 * s2)
              + s2 * (s1 * s2y - s1y * s2) AS det1,
            n * (a11 * s2y - s1y * a12) - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * a12 - a11 * s2) AS det2
        FROM d
    ),
    w AS (
        SELECT *, det0 / det AS w0, det1 / det AS w1, det2 / det AS w2
        FROM c
    )
    SELECT n AS n_rows,
           round(w0, 6) AS intercept,
           round(w1, 6) AS w_qty,
           round(w2, 6) AS w_disc,
           round(1.0 - (syy - 2.0 * (w0 * sy + w1 * s1y + w2 * s2y)
                        + (w0 * w0 * n + w1 * w1 * s11 + w2 * w2 * s22
                           + 2.0 * w0 * w1 * s1 + 2.0 * w0 * w2 * s2
                           + 2.0 * w1 * w2 * s12))
                       / (syy - sy * sy / n), 6) AS r2
    FROM w
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge fit of extendedprice ~ quantity + discount (block
    comment above)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(18,2)"
    x1 = F.col("l_quantity").cast(dec)
    x2 = F.col("l_discount").cast(dec)
    y = F.col("l_extendedprice").cast(dec)
    s = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    lam = RIDGE_LAM_PER_ROW
    d = s.select(
        F.col("n").cast("double").alias("n"),
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
        F.col("sy").cast("double").alias("sy"),
        (F.col("s11").cast("double") + lam * F.col("n").cast("double")).alias("a11"),
        F.col("s12").cast("double").alias("a12"),
        (F.col("s22").cast("double") + lam * F.col("n").cast("double")).alias("a22"),
        F.col("s11").cast("double").alias("s11"),
        F.col("s12").cast("double").alias("s12"),
        F.col("s22").cast("double").alias("s22"),
        F.col("s1y").cast("double").alias("s1y"),
        F.col("s2y").cast("double").alias("s2y"),
        F.col("syy").cast("double").alias("syy"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    a11, a12, a22 = F.col("a11"), F.col("a12"), F.col("a22")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    c = d.select(
        "*",
        (n * (a11 * a22 - a12 * a12) - s1 * (s1 * a22 - a12 * s2)
         + s2 * (s1 * a12 - a11 * s2)).alias("det"),
        (sy * (a11 * a22 - a12 * a12) - s1 * (s1y * a22 - a12 * s2y)
         + s2 * (s1y * a12 - a11 * s2y)).alias("det0"),
        (n * (s1y * a22 - a12 * s2y) - sy * (s1 * a22 - a12 * s2)
         + s2 * (s1 * s2y - s1y * s2)).alias("det1"),
        (n * (a11 * s2y - s1y * a12) - s1 * (s1 * s2y - s1y * s2)
         + sy * (s1 * a12 - a11 * s2)).alias("det2"),
    )
    w = c.select(
        "*",
        (F.col("det0") / F.col("det")).alias("w0"),
        (F.col("det1") / F.col("det")).alias("w1"),
        (F.col("det2") / F.col("det")).alias("w2"),
    )
    w0, w1, w2 = F.col("w0"), F.col("w1"), F.col("w2")
    sse = (
        F.col("syy")
        - 2.0 * (w0 * sy + w1 * s1y + w2 * s2y)
        + (w0 * w0 * n + w1 * w1 * F.col("s11") + w2 * w2 * F.col("s22")
           + 2.0 * w0 * w1 * s1 + 2.0 * w0 * w2 * s2
           + 2.0 * w1 * w2 * F.col("s12"))
    )
    return w.select(
        n.alias("n_rows"),
        F.round(w0, 6).alias("intercept"),
        F.round(w1, 6).alias("w_qty"),
        F.round(w2, 6).alias("w_disc"),
        F.round(1.0 - sse / (F.col("syy") - sy * sy / n), 6).alias("r2"),
    )


# -------------------------------------- isotonic calibration (PAVA)
# Isotonic regression of the urgent-order rate on order-value rank —
# the calibration step every scored model needs (Zadrozny & Elkan
# 2002, public): fit the best monotone non-decreasing rate curve. On
# K value buckets the exact solution has the closed minimax form
# iso_i = max_{j<=i} min_{k>=i} mean(y_j..y_k) (Barlow et al. 1972),
# which is PURE relational algebra over the K-row bucket frame:
# interval means from cumulative sums, an inner min per (j,i), an
# outer max per i. The volume-bound work is one ntile bucketing + one
# hash agg; the O(K³) minimax runs on K=20 rows. Every interval mean
# is a ratio of exact integers, so both engines produce identical
# doubles and the min/max lattice cannot diverge. The inner/outer
# joins are 20-row bounded BNLJs (documented, the one-row-scalar
# family). At 100 TB the ntile global sort is the one scale caveat —
# the documented swap is approx_percentile cuts, same downstream.

ISO_K = 20


@query(
    "ml_isotonic_calibration",
    oracle=f"""
    WITH b AS (
        SELECT ntile({ISO_K}) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS bucket,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    g AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS w,
               CAST(sum(y) AS BIGINT) AS sy
        FROM b GROUP BY 1
    ),
    c AS (
        SELECT bucket, w, sy,
               CAST(sum(w) OVER (ORDER BY bucket) AS BIGINT) AS cw,
               CAST(sum(sy) OVER (ORDER BY bucket) AS BIGINT) AS cy
        FROM g
    ),
    iv AS (
        SELECT j.bucket AS j, k.bucket AS k,
               CAST(k.cy - (j.cy - j.sy) AS DOUBLE)
               / (k.cw - (j.cw - j.w)) AS m
        FROM c j JOIN c k ON k.bucket >= j.bucket
    ),
    inner_min AS (
        SELECT iv.j, i.bucket AS i, min(iv.m) AS mn
        FROM iv JOIN c i ON i.bucket BETWEEN iv.j AND iv.k
        GROUP BY 1, 2
    ),
    iso AS (SELECT i, max(mn) AS iso_rate FROM inner_min GROUP BY 1)
    SELECT g.bucket, g.w AS n,
           round(CAST(g.sy AS DOUBLE) / g.w, 6) AS raw_rate,
           round(iso.iso_rate, 6) AS iso_rate
    FROM g JOIN iso ON iso.i = g.bucket
    ORDER BY g.bucket
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of urgent rate over value buckets
    (block comment above)."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.ntile(ISO_K)
        .over(Window.partitionBy().orderBy("o_totalprice", "o_orderkey"))
        .alias("bucket"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("w"), F.sum("y").alias("sy")
    )
    wc = Window.partitionBy().orderBy("bucket")
    c = g.select(
        "bucket", "w", "sy",
        F.sum("w").over(wc).alias("cw"),
        F.sum("sy").over(wc).alias("cy"),
    )
    c = c.localCheckpoint(eager=False)  # 20 rows; 3 consumers
    j = c.alias("j")
    k = c.alias("k")
    # 20x20 bounded BNLJ (theta join on bucket order) — documented
    iv = j.join(k, F.col("k.bucket") >= F.col("j.bucket")).select(
        F.col("j.bucket").alias("j"),
        F.col("k.bucket").alias("k"),
        (
            (F.col("k.cy") - (F.col("j.cy") - F.col("j.sy"))).cast("double")
            / (F.col("k.cw") - (F.col("j.cw") - F.col("j.w")))
        ).alias("m"),
    )
    i = c.select(F.col("bucket").alias("i"))
    inner_min = (
        iv.join(i, (F.col("i") >= F.col("j")) & (F.col("i") <= F.col("k")))
        .groupBy("j", "i")
        .agg(F.min("m").alias("mn"))
    )
    iso = inner_min.groupBy("i").agg(F.max("mn").alias("iso_rate"))
    return (
        g.join(iso, g.bucket == iso.i)
        .select(
            "bucket",
            F.col("w").alias("n"),
            F.round(F.col("sy").cast("double") / F.col("w"), 6).alias(
                "raw_rate"
            ),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
        .orderBy("bucket")
    )
