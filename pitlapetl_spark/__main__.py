"""CLI: every registered query is an individually runnable job
(SURVEY.md §7.1 — "each former DAG becomes a job function,
composable and individually runnable").

    python -m pitlapetl_spark list
    python -m pitlapetl_spark run <query> [--sf-dir DIR] [--limit N]
                                  [--out PATH] [--explain]

``--out`` writes parquet (the sink path); otherwise rows print to
stdout (limited — this is the inspection path, not a data path).
"""

from __future__ import annotations

import argparse
import sys

from . import registry
from .session import DEFAULT_SF_DIR, get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pitlapetl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--out", default=None, help="write result parquet here")
    run.add_argument("--explain", action="store_true", help="print the physical plan")

    pipe = sub.add_parser(
        "pipeline",
        help="run the reference's seven pipelines as idempotent jobs "
        "(the entry point an external scheduler invokes per tick)",
    )
    pipe.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pipe.add_argument("--out", required=True, help="warehouse directory")
    pipe.add_argument("--max-attempts", type=int, default=2)

    args = parser.parse_args(argv)
    registry.load_all()

    if args.cmd == "list":
        oracles = registry.all_oracles()
        for name in sorted(registry.all_queries()):
            marker = "oracle" if name in oracles else "rows-only"
            print(f"{name}  [{marker}]")
        return 0

    if args.cmd == "pipeline":
        from .plans.runner import PipelineFailure, run_pipeline

        spark = get_spark(app_name="pitlapetl_pipeline")
        try:
            records = run_pipeline(
                spark, args.sf_dir, args.out, max_attempts=args.max_attempts
            )
        except PipelineFailure as e:
            # print the attempt summary for every job that DID run
            # before reporting the failure (ADVICE r4: the old path
            # printed only the exception, losing the sweep's outcome)
            for r in e.records:
                print(f"{r.job}: attempt {r.attempt} {r.status} "
                      f"rows={r.rows} {r.seconds:.2f}s")
            print(f"PIPELINE FAILED: {e}", file=sys.stderr)
            return 1
        for r in records:
            print(f"{r.job}: attempt {r.attempt} {r.status} "
                  f"rows={r.rows} {r.seconds:.2f}s")
        return 0

    queries = registry.all_queries()
    if args.query not in queries:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"pitlapetl_{args.query}")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
