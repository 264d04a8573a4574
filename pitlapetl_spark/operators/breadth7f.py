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
           round(cum_s * {_LLR_S!r} + (cum_n - cum_s) * {_LLR_F!r}, 6)
               AS cum_llr,
           CASE WHEN cum_s * {_LLR_S!r} + (cum_n - cum_s) * {_LLR_F!r}
                     >= {_BOUND_HI!r} THEN 'accept_h1'
                WHEN cum_s * {_LLR_S!r} + (cum_n - cum_s) * {_LLR_F!r}
                     <= {_BOUND_LO!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c ORDER BY day
    """,
)
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SPRT audit trail: cumulative log-likelihood ratio of the
    purchase rate against H0 p={SPRT_P0} vs H1 p={SPRT_P1}, with
    Wald's boundaries at alpha={SPRT_ALPHA}, beta={SPRT_BETA}
    (block comment above). The !r-formatted float literals guarantee
    the oracle carries the EXACT same doubles Python computed — a
    shortened decimal rendering would be a different constant on the
    DuckDB side."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("trials"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "successes"
        ),
    )
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
