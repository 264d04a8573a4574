"""Measured scaling probe: wall-clock of selected operators at
sf0.01 vs sf0.1 (10x facts) on the local harness, min-of-2 warm.
Results are recorded in SCALE.md — the evidence behind the scaling
claims, refreshed per round. Usage:

    python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pitlapetl_spark import registry  # noqa: E402
from pitlapetl_spark.session import get_spark  # noqa: E402

DEFAULT = (
    "q5_local_supplier_volume",
    "market_basket_pairs",
    "text_boilerplate_lines",
    "interval_merge_activity",
    "shuffle_epoch_shards",
    "sketch_mv_union",
    "dedup_winnowing",
    "dedup_winnowing_fast",
    "dedup_incremental_minhash",
    "dedup_repeated_spans_fast",
    "dedup_repeated_spans_apply",
    "cdc_latest_state",
    "q21_suppliers_kept_waiting",
    "graph_pagerank_copurchase",
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    registry.load_all()
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        fn = registry.QUERIES[name]
        row = [name]
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row.append(f"{best:.2f}s")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
