"""Regenerate the plan dumps in PLANS.md from the live registry.

PLANS.md holds hand-written commentary per headline operator plus a
fenced physical-plan dump. The dumps went stale in round 2 (they still
showed the removed nanos `ts div 1000` projection), so — same
discipline as tools/gen_coverage.py — the dumps are now MECHANICAL:
this script keeps each section's prose untouched and re-captures the
fenced block from the current code at sf0.001, emitting the formatted
explain's plan tree (node details like PushedFilters are asserted by
tests/test_plan_hygiene.py, not prose).

Section headers must be `## <query_name>` or contain the query name in
parentheses; sections naming no registered query keep their fence
as-is (with a warning).

Run: python tools/gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def plan_tree(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # formatted = tree, blank line, per-node details; keep the tree
    tree = text.split("\n\n", 1)[0].strip()
    return tree


def main() -> None:
    from pitlapetl_spark import registry
    from pitlapetl_spark.session import get_spark

    registry.load_all()
    qs = registry.QUERIES
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")

    src = (REPO / "PLANS.md").read_text()
    sections = re.split(r"(?m)^## ", src)
    out = [sections[0].rstrip() + "\n"]
    for sec in sections[1:]:
        header = sec.splitlines()[0]
        m = re.search(r"\(([a-z0-9_]+)\)", header)
        name = header.split()[0] if header.split()[0] in qs else (
            m.group(1) if m and m.group(1) in qs else None
        )
        if name is None:
            print(f"  (no registered query for section {header!r}; kept as-is)")
            out.append("## " + sec.rstrip() + "\n")
            continue
        tree = plan_tree(qs[name](spark, SF))
        new_sec = re.sub(
            r"```.*?```", "```\n" + tree + "\n```", sec, count=1, flags=re.S
        )
        if new_sec == sec and "```" not in sec:
            new_sec = sec.rstrip() + "\n\n```\n" + tree + "\n```\n"
        out.append("## " + new_sec.rstrip() + "\n")
        print(f"  {name}: refreshed")
    (REPO / "PLANS.md").write_text("\n".join(out))
    print("PLANS.md regenerated")
    spark.stop()


if __name__ == "__main__":
    main()
