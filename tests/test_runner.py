"""The Airflow-replacement runner (plans/runner.py): idempotent
convergence across ticks, task isolation with bounded retry, and the
run ledger as the metadata record."""

from __future__ import annotations

import pytest

from pitlapetl_spark.plans.runner import JOB_MANIFEST, run_pipeline
from pitlapetl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def _tables(spark, out_dir):
    return {
        spec.name: sorted(
            tuple(r) for r in spark.read.parquet(f"{out_dir}/{spec.name}").collect()
        )
        for spec in JOB_MANIFEST
    }


def test_two_ticks_converge_and_ledger_records_all(spark, tmp_path):
    """Running the whole pipeline twice (the overlapping-tick /
    replayed-tick case Airflow guards with its scheduler lock) must
    converge to identical table states, and the ledger must carry one
    ok row per job per tick."""
    out = str(tmp_path / "warehouse")
    r1 = run_pipeline(spark, SF_SMOKE, out)
    state1 = _tables(spark, out)
    r2 = run_pipeline(spark, SF_SMOKE, out)
    assert _tables(spark, out) == state1
    assert [r.status for r in r1 + r2] == ["ok"] * (2 * len(JOB_MANIFEST))
    ledger = spark.read.parquet(f"{out}/_run_ledger")
    assert ledger.filter("status = 'ok'").count() == 2 * len(JOB_MANIFEST)
    assert {r.job for r in ledger.collect()} == {s.name for s in JOB_MANIFEST}


def test_flaky_job_retries_and_other_jobs_unaffected(spark, tmp_path):
    """A job that fails once must retry and succeed within the same
    tick; a job that always fails must not block the others — its
    error surfaces AFTER the sweep, with every healthy sink fresh."""
    out = str(tmp_path / "warehouse")
    calls = {"n": 0}

    def flaky(spark_, sf_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return QUERIES["job_schedule"](spark_, sf_dir)

    def dead(spark_, sf_dir):
        raise RuntimeError("permanent")

    fns = dict(QUERIES)
    fns["job_schedule"] = flaky
    fns["job_driver_standings"] = dead

    with pytest.raises(RuntimeError, match="driver_standings"):
        run_pipeline(spark, SF_SMOKE, out, query_fns=fns)

    ledger = {
        (r.job, r.attempt): r.status
        for r in spark.read.parquet(f"{out}/_run_ledger").collect()
    }
    assert ledger[("schedule", 1)] == "failed"
    assert ledger[("schedule", 2)] == "ok"
    assert ledger[("driver_standings", 1)] == "failed"
    assert ledger[("driver_standings", 2)] == "failed"
    # healthy sinks written despite the dead job
    assert spark.read.parquet(f"{out}/race_results").count() > 0
    assert spark.read.parquet(f"{out}/schedule").count() > 0
    # the dead job's sink was never created
    import os

    assert not os.path.exists(f"{out}/driver_standings")


def test_zero_max_attempts_fails_loudly(spark, tmp_path):
    """max_attempts < 1 would run zero jobs yet exit clean — the
    runner must reject it instead of recording a successful no-op."""
    with pytest.raises(ValueError, match="max_attempts"):
        run_pipeline(spark, SF_SMOKE, str(tmp_path / "wh"), max_attempts=0)


def test_backfill_catchup_skips_existing_days(spark, tmp_path):
    """First backfill materializes every day; a second run over the
    same window is all 'skipped' no-ops (Airflow catchup semantics)
    with identical partition contents; force=True re-runs."""
    from pitlapetl_spark.plans.runner import daily_order_rollup, run_backfill

    out = str(tmp_path / "wh")
    days = ["1995-01-01", "1995-01-02", "1995-01-03"]
    first = run_backfill(
        spark, SF_SMOKE, out, "daily_rollup", days, daily_order_rollup
    )
    assert [r.status for r in first] == ["ok"] * 3
    before = {
        d: sorted(
            map(tuple, spark.read.parquet(f"{out}/daily_rollup/day={d}").collect())
        )
        for d in days
    }
    second = run_backfill(
        spark, SF_SMOKE, out, "daily_rollup", days, daily_order_rollup
    )
    assert [r.status for r in second] == ["skipped"] * 3
    for d in days:
        after = sorted(
            map(tuple, spark.read.parquet(f"{out}/daily_rollup/day={d}").collect())
        )
        assert after == before[d]
    forced = run_backfill(
        spark, SF_SMOKE, out, "daily_rollup", days[:1], daily_order_rollup,
        force=True,
    )
    assert [r.status for r in forced] == ["ok"]
    # ledger carries all three sweeps
    ledger = spark.read.parquet(f"{out}/_backfill_ledger")
    assert ledger.count() == 7


def test_backfill_failure_isolated_per_day(spark, tmp_path):
    """A day-unit that raises must not poison the other days: healthy
    days are fresh on disk, the sweep raises AFTER completing, and a
    rerun heals only the hole."""
    import pytest as _pytest

    from pitlapetl_spark.plans.runner import (
        PipelineFailure,
        daily_order_rollup,
        run_backfill,
    )

    out = str(tmp_path / "wh")
    days = ["1995-01-01", "1995-01-02", "1995-01-03"]

    def flaky(spark_, sf_dir_, day):
        if day == "1995-01-02":
            raise RuntimeError("boom")
        return daily_order_rollup(spark_, sf_dir_, day)

    with _pytest.raises(PipelineFailure, match="1995-01-02"):
        run_backfill(spark, SF_SMOKE, out, "daily_rollup", days, flaky)
    import os

    assert os.path.isdir(f"{out}/daily_rollup/day=1995-01-01")
    assert os.path.isdir(f"{out}/daily_rollup/day=1995-01-03")
    assert not os.path.isdir(f"{out}/daily_rollup/day=1995-01-02")
    # the healing rerun: only the hole runs, the rest skip
    healed = run_backfill(
        spark, SF_SMOKE, out, "daily_rollup", days, daily_order_rollup
    )
    assert {r.day: r.status for r in healed} == {
        "1995-01-01": "skipped",
        "1995-01-02": "ok",
        "1995-01-03": "skipped",
    }
