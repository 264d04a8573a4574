"""Round-12 measure+evidence helper: time named queries and dump plans.

For each named registered query: run it with the bench's exact
methodology (noop sink, min-of-3, warm session, sf from
$SPARK_GRAFT_SF_DIR) and write its ``explain("formatted")`` output to
``plans/r12/<query>_<tag>.txt`` — the before/after evidence files the
round's deliverables require.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/opt_snap.py <tag> <query> [query...]

``tag`` is normally ``before`` or ``after``. Timing lines go to
stdout; plans go to the files only.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pitlapetl_spark import registry  # noqa: E402
from pitlapetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("OPT_SNAP_RUNS", "3"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = REPO / "plans" / os.environ.get("OPT_SNAP_DIR", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)

    registry.load_all()
    spark = get_spark(
        app_name=f"opt_snap_{tag}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = registry.all_queries()

    for name in names:
        fn = queries[name]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"{tag}: {name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min_of_{RUNS} {best:.3f}s  [{tag}]", flush=True)


if __name__ == "__main__":
    main()
