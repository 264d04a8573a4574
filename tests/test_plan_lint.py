"""Whole-registry plan invariants (tools/plan_lint.py): no registered
query — present or future — may plan a cartesian product or a
row-at-a-time Python UDF, and broadcast nested loops stay bounded to
the documented tiny-frame pattern. The per-operator SHAPE gates live
in test_plan_hygiene.py; this is the registry-wide backstop."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_lint import lint  # noqa: E402


def test_registry_wide_plan_invariants(spark):
    report = lint(spark)
    assert len(report) >= 180  # the whole registry, not a subset
    cartesians = {n for n, r in report.items() if r["cartesian"]}
    assert not cartesians, cartesians
    row_udfs = {n for n, r in report.items() if r["batch_eval_python"]}
    assert not row_udfs, row_udfs
    # BNLJ is legitimate ONLY as a broadcast of a tiny bounds/centroid/
    # totals frame; every registered use today needs at most 2 — a new
    # query exceeding the cap must justify itself here
    over = {n: r["bnlj"] for n, r in report.items() if r["bnlj"] > 2}
    assert not over, over
