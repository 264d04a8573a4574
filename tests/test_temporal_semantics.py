"""Edge-case semantics for the temporal operators added in round 4 —
tiny hand-built frames where the correct answer is checkable by eye:
the oracle-parity harness proves engine agreement, these prove the
SEMANTICS are the intended ones (both engines agreeing on the wrong
answer would still pass parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pitlapetl_spark.operators.funnel import ATTRIB_WINDOW_DAYS
from pitlapetl_spark.operators.scd import CDC_TOMBSTONE

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _run_cdc(spark, rows, tmp_path):
    df = spark.createDataFrame(rows, SCHEMA)
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    from pitlapetl_spark.registry import QUERIES

    return {r.user_id: r for r in QUERIES["cdc_latest_state"](spark, str(tmp_path)).collect()}


def test_cdc_trailing_tombstone_deletes_but_middle_does_not(spark, tmp_path):
    rows = [
        # user 1: upsert, then tombstone LAST -> absent from snapshot
        (1, _t("2024-01-01T00:00:00"), 1, "view", 10.0, "{}"),
        (2, _t("2024-01-02T00:00:00"), 1, CDC_TOMBSTONE, 0.0, "{}"),
        # user 2: tombstone in the MIDDLE, later re-insert -> present
        (3, _t("2024-01-01T00:00:00"), 2, CDC_TOMBSTONE, 0.0, "{}"),
        (4, _t("2024-01-02T00:00:00"), 2, "click", 7.5, "{}"),
    ]
    state = _run_cdc(spark, rows, tmp_path)
    assert 1 not in state
    assert state[2].last_type == "click" and state[2].last_value == 7.5
    assert state[2].n_changes == 2  # counts ALL changes, not survivors


def test_cdc_equal_timestamp_resolved_by_event_id(spark, tmp_path):
    ts = _t("2024-01-01T00:00:00")
    rows = [
        (10, ts, 1, "view", 1.0, "{}"),
        (11, ts, 1, "purchase", 2.0, "{}"),  # higher event_id wins
    ]
    state = _run_cdc(spark, rows, tmp_path)
    assert state[1].last_type == "purchase" and state[1].last_value == 2.0


def _run_attr(spark, rows, tmp_path):
    df = spark.createDataFrame(rows, SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from pitlapetl_spark.registry import QUERIES

    return {
        r.purchase_id: r
        for r in QUERIES["attribution_last_touch"](spark, str(tmp_path)).collect()
    }


def test_attribution_window_edge_and_cold_trail(spark, tmp_path):
    base = _t("2024-01-01T00:00:00")
    inside = base + dt.timedelta(days=ATTRIB_WINDOW_DAYS)  # exactly at cap: counts
    outside = base + dt.timedelta(days=ATTRIB_WINDOW_DAYS, seconds=1)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (2, inside, 1, "purchase", 5.0, "{}"),
        (3, base, 2, "view", 0.0, "{}"),
        (4, outside, 2, "purchase", 6.0, "{}"),  # 1s past the window: cold
        (5, base, 3, "purchase", 7.0, "{}"),  # no touch at all: cold
    ]
    got = _run_attr(spark, rows, tmp_path)
    assert got[2].attributed_to == "click" and got[2].touch_ts == base
    assert got[4].attributed_to is None and got[4].touch_ts is None
    assert got[5].attributed_to is None


def test_attribution_tie_at_same_ts_uses_event_id_order(spark, tmp_path):
    ts = _t("2024-01-01T00:00:00")
    rows = [
        # touch and purchase share ts; touch has LOWER event_id -> it
        # precedes the purchase in the frame and gets credit
        (1, ts, 1, "click", 0.0, "{}"),
        (2, ts, 1, "purchase", 5.0, "{}"),
        # reversed ids: purchase sorts first, sees no preceding touch
        (4, ts, 2, "view", 0.0, "{}"),
        (3, ts, 2, "purchase", 6.0, "{}"),
    ]
    got = _run_attr(spark, rows, tmp_path)
    assert got[2].attributed_to == "click"
    assert got[3].attributed_to is None
