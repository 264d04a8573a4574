"""CLI surface (python -m pitlapetl_spark): every registered query is
individually runnable, the listing marks oracle coverage, and the
pipeline subcommand drives the runner. In-process invocation reuses
the test SparkSession (get_spark -> getOrCreate)."""

from __future__ import annotations

from pitlapetl_spark.__main__ import main


def test_list_names_every_query_with_oracle_marker(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    from pitlapetl_spark import registry

    assert len(lines) == len(registry.all_queries())
    assert all("[oracle]" in ln or "[rows-only]" in ln for ln in lines)
    assert any(ln.startswith("flagship_top_value_per_user") for ln in lines)


def test_run_query_prints_rows_and_writes_parquet(spark, tmp_path, capsys):
    from tests.conftest import SF_SMOKE

    assert (
        main(["run", "job_schedule", "--sf-dir", SF_SMOKE, "--limit", "3"]) == 0
    )
    assert "key" in capsys.readouterr().out  # show() header reached stdout

    out = str(tmp_path / "res")
    assert (
        main(["run", "job_schedule", "--sf-dir", SF_SMOKE, "--out", out]) == 0
    )
    assert spark.read.parquet(out).count() > 0


def test_run_unknown_query_exits_nonzero(spark, capsys):
    assert main(["run", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_pipeline_subcommand_runs_manifest(spark, tmp_path):
    from pitlapetl_spark.plans.runner import JOB_MANIFEST
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "wh")
    assert main(["pipeline", "--sf-dir", SF_SMOKE, "--out", out]) == 0
    for spec in JOB_MANIFEST:
        assert spark.read.parquet(f"{out}/{spec.name}").count() > 0


def test_pipeline_failure_still_prints_healthy_job_records(
    spark, tmp_path, capsys, monkeypatch
):
    """ADVICE r4: when a job exhausts retries, the CLI must still print
    the attempt summary for the jobs that DID run (previously only the
    exception text surfaced) and exit nonzero."""
    from pitlapetl_spark.plans import runner as runner_mod
    from pitlapetl_spark.plans.runner import PipelineFailure, RunRecord

    records = [
        RunRecord("schedule", 1, "ok", 10, 0.5, None),
        RunRecord("race_results", 1, "failed", 0, 0.1, "boom"),
        RunRecord("race_results", 2, "failed", 0, 0.1, "boom"),
    ]

    def fail_pipeline(*a, **kw):
        raise PipelineFailure("jobs failed after 2 attempt(s): ['race_results']", records)

    monkeypatch.setattr(runner_mod, "run_pipeline", fail_pipeline)
    rc = main(["pipeline", "--out", str(tmp_path / "wh")])
    captured = capsys.readouterr()
    assert rc == 1
    assert "schedule: attempt 1 ok rows=10" in captured.out
    assert "race_results: attempt 2 failed" in captured.out
    assert "PIPELINE FAILED" in captured.err
