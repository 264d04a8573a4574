"""The bench driver line must survive the external driver's ~2000-char
stdout tail capture: BENCH_r07.json came back ``"parsed": null`` when
the single headline JSON line outgrew the window (VERDICT r7 "What's
wrong" #1). These tests pin the fix: the printed line always fits the
budget, totals stay exact under trimming, and the full per-query map
is preserved verbatim in BENCH_FULL.json."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _DRIVER_LINE_BUDGET, _driver_line  # noqa: E402


def _result(n_queries: int) -> dict:
    timings = {
        f"family_operator_variant_{i:03d}": round(0.04 + i * 0.037, 3)
        for i in range(n_queries)
    }
    return {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "timing": "min_of_3",
        "queries": timings,
        "sf": 0.1,
    }


def test_small_map_passes_through_untrimmed():
    res = _result(10)
    line = _driver_line(res)
    assert len(line) <= _DRIVER_LINE_BUDGET
    assert json.loads(line) == res  # verbatim — no trim fields added


def test_oversize_map_trims_cheapest_and_reconciles_totals():
    res = _result(120)  # way past the budget
    line = _driver_line(res)
    assert len(line) <= _DRIVER_LINE_BUDGET
    d = json.loads(line)
    # totals exact: kept + declared-omitted == headline total
    assert d["value"] == res["value"]
    recon = sum(d["queries"].values()) + d["omitted_sec"]
    assert abs(d["value"] - recon) < 1e-6
    assert d["queries_omitted"] == 120 - len(d["queries"])
    assert d["full_map"] == "BENCH_FULL.json"
    # the EXPENSIVE entries survive (regression triage reads these);
    # everything trimmed is cheaper than everything kept
    kept_min = min(d["queries"].values())
    omitted = set(res["queries"]) - set(d["queries"])
    assert all(res["queries"][n] <= kept_min for n in omitted)


def test_budget_is_inside_the_driver_capture_window():
    # the driver stores the last 2000 chars; the budget must leave
    # headroom for a trailing newline and any preceding partial line
    assert _DRIVER_LINE_BUDGET <= 1900
