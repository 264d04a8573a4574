"""Validation / error operators — SURVEY.md §2.14 (V1-V3).

V1: required-param checks run BEFORE plan construction. The reference
validates with truthiness (racedag.py:14-18), which wrongly rejects
legitimate ``0``/empty-string values (the falsy-param bug, SURVEY.md
§7.3f); here presence is ``is None`` and type coercion is explicit.

V2: exception wrapping with context (racedag.py:63-64) becomes a
job-level context manager that rethrows with the job name and stage.

V3: per-row error tolerance (topspeed.py:68-70 print-and-skip) becomes
*typed* row-level tolerance: permissive JSON parsing keeps corrupt
rows in a quarantine column instead of killing the task — at 100 TB a
0.001% corrupt-row rate is a certainty, and a task abort on row 3
billion is not an acceptable failure mode.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any


class ParamError(ValueError):
    """Missing/invalid job parameter (V1)."""


def get_param(conf: dict[str, Any], name: str, kind: type = str) -> Any:
    """V1 required-param fetch: present-ness is ``is None`` (0 and ''
    are legitimate values — fixes the reference's falsy check), type
    coercion errors carry the param name."""
    value = conf.get(name)
    if value is None:
        raise ParamError(f"required parameter {name!r} is missing")
    try:
        return kind(value)
    except (TypeError, ValueError) as exc:
        raise ParamError(f"parameter {name!r}={value!r} is not a valid {kind.__name__}") from exc


def validate_params(conf: dict[str, Any], spec: dict[str, type]) -> dict[str, Any]:
    """Validate a whole param dict against {name: type} before any
    Spark plan is built."""
    return {name: get_param(conf, name, kind) for name, kind in spec.items()}


@contextmanager
def job_stage(job: str, stage: str):
    """V2 exception wrapping: rethrow with job/stage context, chaining
    the original (the reference's ``RuntimeError(f"Extraction failed:
    {e}")`` racedag.py:63-64, with the cause preserved)."""
    try:
        yield
    except Exception as exc:
        raise RuntimeError(f"{job}/{stage} failed: {exc}") from exc
