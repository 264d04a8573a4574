"""Bench regression gate: diff two bench JSON files and flag
per-query regressions beyond a threshold.

The round-over-round discipline (SCALE.md, VERDICT r3 item 7): the
shared-query total must not grow, and no single query may regress
>20% without a written SCALE.md note. This tool mechanizes the check
so the comparison is one command instead of ad-hoc arithmetic —
and survives the driver's BENCH_r{N}.json wrapper format (the bench
line is embedded in a "tail" field there).

Usage:
    python tools/bench_compare.py BASE.json NEW.json [--tol 1.20]

Exit code 1 if any shared query regresses beyond tolerance or the
shared-subset total grows; the offending lines are printed either
way. A known, documented regression is acknowledged by listing its
query name in ACCEPTED_REGRESSIONS below, next to the SCALE.md
anchor that explains it.
"""

from __future__ import annotations

import json
import re
import sys

# query -> SCALE.md section explaining the accepted regression
# (empty right now: the round-4 market-basket un-hint was superseded
# by the size-gated broadcast, which restored the r3 plan at bench SF)
ACCEPTED_REGRESSIONS: dict[str, str] = {}


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    # driver wrapper: the bench JSON line is inside the captured tail
    m = re.search(r'\{"metric".*\}', d.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench queries found")
    return json.loads(m.group(0))["queries"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tol = 1.20
    for a in sys.argv[1:]:
        if a.startswith("--tol"):
            tol = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    base, new = load_queries(args[0]), load_queries(args[1])
    shared = sorted(set(base) & set(new))
    bad = []
    for q in shared:
        ratio = new[q] / base[q] if base[q] else float("inf")
        marker = ""
        if ratio > tol:
            if q in ACCEPTED_REGRESSIONS:
                marker = f"  ACCEPTED ({ACCEPTED_REGRESSIONS[q]})"
            else:
                marker = "  REGRESSION"
                bad.append(q)
        print(f"{q:40s} {base[q]:7.3f} -> {new[q]:7.3f}  {ratio:5.2f}x{marker}")
    tb, tn = sum(base[q] for q in shared), sum(new[q] for q in shared)
    grew = tn > tb
    print(f"\nshared subset ({len(shared)} queries): {tb:.3f} -> {tn:.3f}"
          f"  {'GREW' if grew else 'ok'}")
    only_new = sorted(set(new) - set(base))
    if only_new:
        print(f"new queries (not compared): {only_new}")
    return 1 if (bad or grew) else 0


if __name__ == "__main__":
    sys.exit(main())
