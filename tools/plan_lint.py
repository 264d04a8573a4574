"""Whole-registry physical-plan lint: build EVERY registered query at
sf0.001 and scan its executed plan for the anti-patterns that break at
100 TB. The hand-picked gates in tests/test_plan_hygiene.py assert
per-operator plan SHAPES; this tool asserts the GLOBAL invariants over
the full registry, so a new query can never quietly reintroduce a
cartesian or a row-at-a-time Python UDF (VERDICT r3's manual
"anti-pattern scan: clean" made mechanical).

Hard invariants (test_plan_lint.py fails on any violation):
- no ``CartesianProduct`` anywhere;
- no ``BatchEvalPython`` (row-at-a-time Python UDF) anywhere —
  Arrow-batched ``ArrowEvalPython`` / pandas stages are fine.

Reported (bounded, not banned): ``BroadcastNestedLoopJoin`` count per
query — legitimate ONLY as a broadcast of a tiny bounds/centroid/
totals frame (each registered use is documented at its operator);
the test caps the per-query count so a new unbounded nested loop
still trips.

Writes PLAN_LINT.json: {query: {cartesian, batch_eval_python, bnlj,
window, exchanges}}. Queries whose result is an eagerly materialized
roundtrip (localCheckpoint) show a scan-of-RDD plan — their interior
shape is asserted by their own tests; they still count for the hard
invariants (trivially).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def lint(spark) -> dict[str, dict[str, int]]:
    from pitlapetl_spark import registry

    registry.load_all()
    report: dict[str, dict[str, int]] = {}
    for name, fn in sorted(registry.QUERIES.items()):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()

        def node(name: str) -> int:
            # anchored: "Window" must not count WindowGroupLimit,
            # "Exchange" must not count ReusedExchange (which performs
            # no shuffle) — the informational metrics stay exact
            return len(re.findall(rf"(?<![A-Za-z]){name}(?![a-zA-Z])", plan))

        report[name] = {
            "cartesian": node("CartesianProduct"),
            # substring on purpose: BatchEvalPythonUDTF and any future
            # row-at-a-time variant must all count
            "batch_eval_python": plan.count("BatchEvalPython"),
            "bnlj": node("BroadcastNestedLoopJoin"),
            "window": node("Window"),
            "exchanges": node("Exchange"),
        }
    return report


def main() -> None:
    from pitlapetl_spark.session import get_spark

    spark = get_spark(app_name="plan_lint")
    spark.sparkContext.setLogLevel("ERROR")
    report = lint(spark)
    out = REPO / "PLAN_LINT.json"
    out.write_text(json.dumps(report, indent=1, sort_keys=True) + "\n")
    # the SAME gate test_plan_lint.py enforces — the CLI must never
    # pass a registry state CI would fail
    bad = {
        n: r
        for n, r in report.items()
        if r["cartesian"] or r["batch_eval_python"] or r["bnlj"] > 2
    }
    print(
        f"{len(report)} queries linted -> {out.name}; "
        f"hard violations: {len(bad)}{' ' + str(sorted(bad)) if bad else ''}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
