"""V1-V3 validation semantics and the REST source plumbing."""

from __future__ import annotations

import pytest

from pitlapetl_spark.sources.rest import fake_transport, fetch_json, parse_driver_standings
from pitlapetl_spark.validation import ParamError, get_param, job_stage, validate_params


def test_zero_is_a_legitimate_param():
    """The reference's falsy check rejects round=0 (SURVEY.md V1 note);
    ours must accept it."""
    assert get_param({"round": 0}, "round", int) == 0
    assert get_param({"name": ""}, "name", str) == ""


def test_missing_param_raises():
    with pytest.raises(ParamError, match="missing"):
        get_param({}, "year", int)


def test_bad_type_raises_with_context():
    with pytest.raises(ParamError, match="'year'"):
        get_param({"year": "twenty"}, "year", int)


def test_validate_params_spec():
    out = validate_params({"year": "2024", "round": 4}, {"year": int, "round": int})
    assert out == {"year": 2024, "round": 4}


def test_job_stage_wraps_with_context():
    with pytest.raises(RuntimeError, match="racejob/extract failed"):
        with job_stage("racejob", "extract"):
            raise ValueError("boom")


def test_fetch_json_tolerates_transport_failure(spark):
    def flaky(url: str) -> str:
        if url.endswith("bad"):
            raise OSError("connection refused")
        return fake_transport(url)

    urls = [
        "https://api.example.test/ergast/f1/2024/driverStandings.json",
        "https://api.example.test/bad",
    ]
    rows = {r.url: r.status for r in fetch_json(spark, urls, transport=flaky).collect()}
    assert rows[urls[0]] == 200
    assert rows[urls[1]] == 599  # quarantined, not a task abort


def test_parse_drops_failed_fetches(spark):
    def always_fail(url: str) -> str:
        raise OSError("down")

    fetched = fetch_json(spark, ["https://x/1/a", "https://x/2/a"], transport=always_fail)
    assert parse_driver_standings(fetched).count() == 0
