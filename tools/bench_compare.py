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

import argparse
import json
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
    # driver wrapper: the bench JSON line is embedded in the captured
    # tail, possibly with text after it on the same line (the old
    # greedy regex over-captured to the line's last '}'). Try each
    # '}'-terminated prefix from longest to shortest until one parses.
    for line in d.get("tail", "").splitlines():
        i = line.find('{"metric"')
        if i == -1:
            continue
        frag = line[i:]
        end = len(frag)
        while (j := frag.rfind("}", 0, end)) != -1:
            try:
                return json.loads(frag[: j + 1])["queries"]
            except (json.JSONDecodeError, KeyError):
                end = j
    raise SystemExit(f"{path}: no bench queries found")


def main() -> int:
    ap = argparse.ArgumentParser(
        description="diff two bench JSONs; exit 1 on regression"
    )
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=1.20)
    ns = ap.parse_args()
    tol = ns.tol
    base, new = load_queries(ns.base), load_queries(ns.new)
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
