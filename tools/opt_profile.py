"""Action-level profiler for the round-12 optimization pass.

Runs a named registered query once (warm session) and logs every
Spark ACTION the query body triggers — localCheckpoint, parquet
write, collect, toPandas, isEmpty, plus the final noop
materialization — with wall time and the repo source line that
invoked it. This is the measurement instrument guide §1 asks for
when the Spark UI is disabled: the per-action trace shows where a
multi-job lifecycle query (the stream_*_parity family) actually
spends its wall, so optimization targets the measured phase rather
than the guessed one.

Usage: SPARK_GRAFT_CPUS=32 python tools/opt_profile.py <query> [query...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

try:  # Spark 4: the concrete class overrides the abstract base's methods
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame
except ImportError:  # Spark 3
    ClassicDataFrame = DataFrame
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from pitlapetl_spark import registry  # noqa: E402
from pitlapetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EVENTS: list[tuple[float, str, str]] = []


def _caller() -> str:
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if "/pitlapetl_spark/" in fn or fn.endswith("batch_windows.py"):
            return f"{fn.rsplit('/', 1)[-1]}:{frame.lineno} {frame.line}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        EVENTS.append((time.perf_counter() - t0, name, _caller()))
        return out

    setattr(cls, name, timed)


for action in ("localCheckpoint", "collect", "toPandas", "isEmpty", "count"):
    _wrap(ClassicDataFrame, action)
for action in ("parquet", "save", "csv", "orc", "json"):
    _wrap(DataFrameWriter, action)


def main() -> None:
    registry.load_all()
    spark = get_spark(
        app_name="opt_profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = registry.all_queries()
    for qname in sys.argv[1:]:
        fn = queries[qname]
        # one warm pass (uncounted) so codegen/scan caches are hot,
        # matching the bench's min-of-3 steady state
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        EVENTS.clear()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        # the final noop save is the last recorded event; label it
        print(f"\n=== {qname}: total {t_total:.3f}s (build {t_build:.3f}s)")
        acc = 0.0
        for dt, op, where in EVENTS:
            acc += dt
            print(f"  {dt:7.3f}s  {op:16s} {where}")
        print(f"  [sum of {len(EVENTS)} actions: {acc:.3f}s]")


if __name__ == "__main__":
    main()
