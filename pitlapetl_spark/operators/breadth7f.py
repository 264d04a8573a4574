"""Round-7 session-4 breadth, part 4: Wald's sequential probability
ratio test (SPRT) replayed over the daily conversion series — the
always-valid sequential-testing shape that lets an experiment stop
early, as a batch audit query.

Scale note: a sequential test is BY DEFINITION an ordered scan, so
the batch replay works at the decision grain (days), never the event
grain — the cumulative log-likelihood is a day-grain window over a
frame the size of the experiment's calendar, while the per-day
success/trial counts come from one map-side-combinable fact
aggregate. The streaming twin of this shape is a windowed aggregate
feeding the same closed-form increments.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# H0/H1 conversion rates and error targets. The LLR increment of a
# Bernoulli observation is a ln(p1/p0) for a success and
# ln((1-p1)/(1-p0)) for a failure, so the day-grain cumulative LLR is
# a LINEAR function of cumulative (successes, trials) — the whole
# test folds to two cumsums and two fixed boundaries.
SPRT_P0 = 0.18
SPRT_P1 = 0.22
SPRT_ALPHA = 0.05
SPRT_BETA = 0.20

_LLR_S = math.log(SPRT_P1 / SPRT_P0)
_LLR_F = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
_BOUND_HI = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
_BOUND_LO = math.log(SPRT_BETA / (1 - SPRT_ALPHA))


def sprt_from_day_counts(d: DataFrame) -> DataFrame:
    """Shared SPRT tail over a (day, trials, successes) frame — the
    batch query feeds it the one-pass fact aggregate; the streaming
    monitor's reader feeds it the fold of its per-batch partials
    (additive sufficient statistics), so stream and batch are
    bit-equal by construction."""
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "day",
        "trials",
        "successes",
        F.sum("successes").over(w).alias("cum_s"),
        F.sum("trials").over(w).alias("cum_n"),
    )
    llr = F.col("cum_s") * _LLR_S + (F.col("cum_n") - F.col("cum_s")) * _LLR_F
    return c.select(
        "day",
        "trials",
        "successes",
        "cum_s",
        "cum_n",
        F.round(llr, 6).alias("cum_llr"),
        F.when(llr >= _BOUND_HI, "accept_h1")
        .when(llr <= _BOUND_LO, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


def sprt_day_counts(events: DataFrame) -> DataFrame:
    """The additive per-day sufficient statistics (trials,
    successes) — one map-side-combinable aggregate, shared by the
    batch query and the streaming monitor's per-batch partials."""
    return events.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("trials"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "successes"
        ),
    )


@query(
    "ab_sequential_sprt",
    oracle=f"""
    WITH d AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS trials,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS successes
        FROM events GROUP BY 1
    ),
    c AS (
        SELECT day, trials, successes,
               CAST(sum(successes) OVER w AS BIGINT) AS cum_s,
               CAST(sum(trials) OVER w AS BIGINT) AS cum_n
        FROM d
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, trials, successes, cum_s, cum_n,
           round(cum_s * CAST({_LLR_S!r} AS DOUBLE)
                 + (cum_n - cum_s) * CAST({_LLR_F!r} AS DOUBLE), 6)
               AS cum_llr,
           CASE WHEN cum_s * CAST({_LLR_S!r} AS DOUBLE)
                     + (cum_n - cum_s) * CAST({_LLR_F!r} AS DOUBLE)
                     >= CAST({_BOUND_HI!r} AS DOUBLE) THEN 'accept_h1'
                WHEN cum_s * CAST({_LLR_S!r} AS DOUBLE)
                     + (cum_n - cum_s) * CAST({_LLR_F!r} AS DOUBLE)
                     <= CAST({_BOUND_LO!r} AS DOUBLE) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c ORDER BY day
    """,
)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SPRT audit trail: cumulative log-likelihood ratio of the
    purchase rate against H0 p={SPRT_P0} vs H1 p={SPRT_P1}, with
    Wald's boundaries at alpha={SPRT_ALPHA}, beta={SPRT_BETA}
    (block comment above). The !r-formatted float literals are wrapped
    in CAST(... AS DOUBLE) on the oracle side: !r preserves the exact
    decimal rendering, and the CAST stops DuckDB from typing the bare
    literal DECIMAL(37,17) and computing the whole LLR in exact
    decimal while Spark computes doubles (the breadth7d lifts-CTE
    trap, caught again by review)."""
    events = load_table(spark, sf_dir, "events")
    return sprt_from_day_counts(sprt_day_counts(events))


# ----------------------------- weekday-adjusted volume anomaly (DQ)
# The ingestion-volume monitor freshness audits don't cover: is
# TODAY'S row count anomalous relative to the SAME WEEKDAY's recent
# history? Raw day-over-day comparisons false-alarm every weekend;
# conditioning on weekday is the standard fix. Per day: order count
# vs the trailing mean/std of the previous N same-weekday counts
# (rows-between window partitioned by weekday), flag |z| > 3. Counts
# are exact; mean/std come from exact integer window sums via the
# cross-multiplied variance form; day grain is tiny.


VOL_TRAIL = 8  # trailing same-weekday observations


@query(
    "dq_volume_anomaly_weekday",
    oracle=f"""
    WITH d AS (
        SELECT o_orderdate AS day,
               dayofweek(o_orderdate) AS dow,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    w AS (
        SELECT day, dow, n,
               CAST(count(*) OVER tw AS BIGINT) AS k,
               CAST(sum(n) OVER tw AS BIGINT) AS s1,
               CAST(sum(n * n) OVER tw AS BIGINT) AS s2
        FROM d
        WINDOW tw AS (PARTITION BY dow ORDER BY day
                      ROWS BETWEEN {VOL_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           round(CAST(s1 AS DOUBLE) / k, 6) AS trail_mean,
           round((n - CAST(s1 AS DOUBLE) / k)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                        / (k - 1)), 6) AS z,
           CASE WHEN abs((n - CAST(s1 AS DOUBLE) / k)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                        / (k - 1))) > 3 THEN 1 ELSE 0 END AS is_anomaly
    FROM w
    WHERE k >= {VOL_TRAIL}
      AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) > 0
    ORDER BY day
    """,
)
def dq_volume_anomaly_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-conditioned volume anomaly flags (block comment
    above)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").alias("day"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tw = (
        Window.partitionBy("dow")
        .orderBy("day")
        .rowsBetween(-VOL_TRAIL, -1)
    )
    w = d.select(
        "day",
        "n",
        F.count(F.lit(1)).over(tw).alias("k"),
        F.sum("n").over(tw).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("s2"),
    )
    k, s1, s2 = F.col("k"), F.col("s1").cast("double"), F.col("s2").cast("double")
    mean = s1 / k
    var = (s2 - s1 * F.col("s1") / k) / (k - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        w.filter((k >= VOL_TRAIL) & ((s2 - s1 * F.col("s1") / k) > 0))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(mean, 6).alias("trail_mean"),
            F.round(z, 6).alias("z"),
            F.when(F.abs(z) > 3, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


# ------------------------------- repeat-purchase interval profile
# Lifecycle-marketing's core input: how long between a customer's
# consecutive orders? Per customer the lag window yields exact
# day gaps; the corpus-level profile is exact percentiles over those
# integer gaps plus the repeat share. Percentiles interpolate over
# exact integers (Spark percentile == DuckDB quantile_cont — the
# funnel_conversion_lag precedent); one user-key window + one reduce.


@query(
    "analytics_repeat_interval",
    oracle="""
    WITH gaps AS (
        SELECT date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate,
                                                         o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    ),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_repeat_orders,
           round(quantile_cont(gap_days, 0.25), 6) AS gap_p25,
           round(quantile_cont(gap_days, 0.5), 6) AS gap_p50,
           round(quantile_cont(gap_days, 0.75), 6) AS gap_p75,
           round(quantile_cont(gap_days, 0.9), 6) AS gap_p90,
           round(avg(CAST(gap_days AS DOUBLE)), 6) AS gap_mean
    FROM g
    """,
)
def analytics_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-between-consecutive-orders distribution (block comment
    above)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).alias("n_repeat_orders"),
        F.round(F.expr("percentile(gap_days, 0.25)"), 6).alias("gap_p25"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("gap_p50"),
        F.round(F.expr("percentile(gap_days, 0.75)"), 6).alias("gap_p75"),
        F.round(F.expr("percentile(gap_days, 0.9)"), 6).alias("gap_p90"),
        F.round(F.avg(F.col("gap_days").cast("double")), 6).alias(
            "gap_mean"
        ),
    )


# ------------------------------------ vocabulary coverage curve
# The tokenizer-design question: what share of corpus TOKEN MASS do
# the top-k vocabulary types cover? (Zipf/Heaps fits estimate the
# exponent; this measures the operative quantity directly — the
# curve that decides vocab size.) One token hash agg, a frequency-
# ordered cumulative window with the (count, word) total-order
# tiebreak, and the cut-point filter. Integer token counts; shares
# divide two exact BIGINTs.


# cut points sized to the synthetic corpus' 31-type lexicon; a real
# corpus swaps in (1e3, 1e4, 1e5, 1e6) without touching the plan
VOCAB_CUTS = (5, 10, 20, 30)


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH t AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
                      '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ),
    v AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
    r AS (
        SELECT c,
               row_number() OVER (ORDER BY c DESC, w) AS rnk,
               CAST(sum(c) OVER (ORDER BY c DESC, w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS total,
               CAST(count(*) OVER () AS BIGINT) AS vocab
        FROM v
    )
    SELECT CAST(rnk AS BIGINT) AS vocab_size, vocab AS total_vocab,
           cum AS tokens_covered, total AS total_tokens,
           round(CAST(cum AS DOUBLE) / total, 6) AS coverage
    FROM r
    WHERE rnk IN ({', '.join(str(c) for c in VOCAB_CUTS)})
    ORDER BY vocab_size
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary at fixed cut
    points (block comment above)."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("c"), F.asc("w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    r = v.select(
        "c",
        F.row_number().over(
            Window.partitionBy().orderBy(F.desc("c"), F.asc("w"))
        ).alias("rnk"),
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("vocab"),
    )
    return (
        r.filter(F.col("rnk").isin(*VOCAB_CUTS))
        .select(
            F.col("rnk").cast("bigint").alias("vocab_size"),
            F.col("vocab").alias("total_vocab"),
            F.col("cum").alias("tokens_covered"),
            F.col("total").alias("total_tokens"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("vocab_size")
    )


# ----------------------------------- AUC-ROC via exact rank sums
# The model-eval twin of ml_calibration_reliability: treating the
# quoted score as a ranking, what is the probability a returned item
# outranks a kept one? AUC computed through the Mann-Whitney rank-sum
# identity with midrank tie correction, in PURE INTEGERS: per score
# level, doubled-midrank m2 = 2*(rows before) + (rows here) + 1 is an
# exact odd integer, the positives' doubled rank sum folds in BIGINT,
# and AUC = (sum2R_pos - n1*(n1+1)) / (2*n1*n0) divides two exact
# integers once. Gini = 2*AUC - 1 rides along. One score-level hash
# agg (11 rows here; any real score discretizes the same way) + a
# cumulative window + a 1-row reduce.


@query(
    "ml_auc_roc_rank",
    oracle="""
    WITH g AS (
        SELECT l_discount AS s,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1
    ),
    r AS (
        SELECT pos, cnt,
               CAST(2 * coalesce(sum(cnt) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + cnt + 1 AS BIGINT) AS m2
        FROM g
    ),
    m AS (
        SELECT CAST(sum(pos * m2) AS BIGINT) AS sum2r_pos,
               CAST(sum(pos) AS BIGINT) AS n1,
               CAST(sum(cnt - pos) AS BIGINT) AS n0
        FROM r
    )
    SELECT n1 AS n_positive, n0 AS n_negative,
           round(CAST(sum2r_pos - n1 * (n1 + 1) AS DOUBLE)
                 / (2.0 * n1 * n0), 6) AS auc,
           round(CAST(sum2r_pos - n1 * (n1 + 1) AS DOUBLE)
                 / (1.0 * n1 * n0) - 1, 6) AS gini
    FROM m
    """,
)
def ml_auc_roc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected AUC-ROC from exact integer rank sums (block
    comment above)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_discount").alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("pos"),
    )
    w_before = (
        Window.partitionBy()
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "pos",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(w_before), F.lit(0))
            + F.col("cnt")
            + 1
        )
        .cast("bigint")
        .alias("m2"),
    )
    m = r.agg(
        F.sum(F.col("pos") * F.col("m2")).alias("sum2r_pos"),
        F.sum("pos").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    num = (F.col("sum2r_pos") - n1 * (n1 + 1)).cast("double")
    return m.select(
        n1.alias("n_positive"),
        n0.alias("n_negative"),
        F.round(num / (2.0 * n1 * n0), 6).alias("auc"),
        F.round(num / (1.0 * n1 * n0) - 1, 6).alias("gini"),
    )


# ------------------------------------- exact rolling median window
# Spark has no median window function — the canonical workaround is
# collect_list over the frame, sort_array, and index the middle,
# which is EXACT and deterministic (the array is sorted, so
# collect_list's arrival order cannot leak). Rolling 7-day median of
# daily revenue in integer cents: odd/even middles average two exact
# integers (a .5-exact double), the day grain is tiny, and the
# window is rows-based so the frame never grows with volume — at
# 100 TB the fact scan feeding the day aggregate is the only volume
# term (the approx_percentile window is the drop-in once the frame
# itself is fact-sized).


ROLL_MED_N = 7


@query(
    "window_rolling_median",
    oracle=f"""
    WITH d AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT day, cents,
               CAST(count(*) OVER tw AS BIGINT) AS k,
               median(cents) OVER tw AS med_cents
        FROM d
        WINDOW tw AS (ORDER BY day
                      ROWS BETWEEN {ROLL_MED_N - 1} PRECEDING
                      AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(cents / 100.0, 2) AS revenue,
           round(med_cents / 100.0, 2) AS rolling_median
    FROM w WHERE k = {ROLL_MED_N} ORDER BY day
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {ROLL_MED_N}-day rolling median of daily revenue (block
    comment above)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    tw = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(-(ROLL_MED_N - 1), Window.currentRow)
    )
    vals = F.sort_array(F.collect_list("cents").over(tw))
    n = F.size(vals)
    # exact median of the sorted frame: average of the two middle
    # elements (identical when the frame length is odd)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, ((n + 2) / 2).cast("int"))
    med = (lo + hi) / 2.0
    w = d.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(tw).alias("k"),
        med.alias("med_cents"),
    )
    return (
        w.filter(F.col("k") == ROLL_MED_N)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("med_cents") / 100.0, 2).alias("rolling_median"),
        )
        .orderBy("day")
    )


# -------------------------- approx rolling median (events grain)
# The scale escape hatch the exact rolling median's block comment
# documents, shipped as a tested query (VERDICT r7 item 7): the frame
# here is VOLUME-PROPORTIONAL (per-user rolling window over raw
# events), where collect_list would materialize one array per row of
# the fact table. percentile_approx keeps a bounded Greenwald-Khanna
# sketch instead — the memory term is the accuracy dial, not the
# frame size. Determinism/oracle bridge: at accuracy=10000 the GK
# rank error for any frame under 10k values is < 1, i.e. the sketch
# returns the EXACT discrete 0.5-quantile element, and Spark's
# convention (lower middle at even n) was probed to match DuckDB's
# quantile_disc exactly ([1,2,3,4] -> 2 on both engines). Values are
# floored to integer cents on both sides first (the double->int cast
# gotcha), so the compared numbers are exact integers.


ROLL_MED_EVENTS_N = 15


@query(
    "window_rolling_median_events",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT user_id, event_id, cents,
               CAST(count(*) OVER tw AS BIGINT) AS k,
               quantile_disc(cents, 0.5) OVER tw AS med_cents
        FROM e
        WINDOW tw AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN {ROLL_MED_EVENTS_N - 1} PRECEDING
                      AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           round(med_cents / 100.0, 2) AS rolling_median
    FROM w WHERE k = {ROLL_MED_EVENTS_N}
    """,
)
def window_rolling_median_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling {ROLL_MED_EVENTS_N}-event median of event value
    via a percentile sketch window (block comment above). The window
    orders by event_id — a total order within user, so frame
    membership is identical on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(ROLL_MED_EVENTS_N - 1), Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(tw).alias("k"),
            F.expr("percentile_approx(cents, 0.5, 10000)")
            .over(tw)
            .alias("med_cents"),
        )
        .filter(F.col("k") == ROLL_MED_EVENTS_N)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("med_cents") / 100.0, 2).alias("rolling_median"),
        )
    )


# ------------------------------- Matthews correlation (confusion)
# The third member of the eval family (calibration table, AUC): the
# single-threshold confusion summary scored by MCC — the balanced
# metric that stays honest under class imbalance where accuracy and
# F1 mislead. Same deterministic score/outcome columns as its
# siblings (discount >= 0.05 predicts a return); the four confusion
# cells are exact integers and MCC's products run in DECIMAL before
# ONE double sqrt (int64 would overflow at n ~ 3e9 rows: n_pos*n_neg
# products — the Levene d1 lesson applied ahead of time).


@query(
    "ml_mcc_confusion",
    oracle="""
    WITH c AS (
        SELECT CAST(count(CASE WHEN pred = 1 AND y = 1 THEN 1 END) AS BIGINT) AS tp,
               CAST(count(CASE WHEN pred = 1 AND y = 0 THEN 1 END) AS BIGINT) AS fp,
               CAST(count(CASE WHEN pred = 0 AND y = 1 THEN 1 END) AS BIGINT) AS fn,
               CAST(count(CASE WHEN pred = 0 AND y = 0 THEN 1 END) AS BIGINT) AS tn
        FROM (
            SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS pred,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem
        )
    )
    SELECT tp, fp, fn, tn,
           round(CAST(CAST(tp AS DECIMAL(38,0)) * tn
                      - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
                 / sqrt(CAST(CAST(tp + fp AS DECIMAL(38,0))
                             * (tp + fn) * (tn + fp) * (tn + fn)
                             AS DOUBLE)), 6) AS mcc,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
               AS accuracy
    FROM c
    """,
)
def ml_mcc_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation over the threshold confusion matrix
    (block comment above)."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    c = li.select(pred.alias("pred"), y.alias("y")).agg(
        F.count(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1)).alias("tp"),
        F.count(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1)).alias("fp"),
        F.count(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1)).alias("fn"),
        F.count(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1)).alias("tn"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    num = (
        tp.cast("decimal(38,0)") * tn - fp.cast("decimal(38,0)") * fn
    ).cast("double")
    den = F.sqrt(
        (
            (tp + fp).cast("decimal(38,0)")
            * (tp + fn)
            * (tn + fp)
            * (tn + fn)
        ).cast("double")
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(num / den, 6).alias("mcc"),
        F.round(
            (tp + tn).cast("double") / (tp + fp + fn + tn), 6
        ).alias("accuracy"),
    )
