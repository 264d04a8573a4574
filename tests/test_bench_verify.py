"""Unit tests for bench --verify's triage-critical arithmetic — the
session-shift estimator (canary median, clamp, unverifiability bound)
and the zero-reference guard semantics. Pure-python: no SparkSession
(the --verify flow itself is exercised manually per round and its
artifacts land in BENCH_VERIFY.json)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _flat(names, t_first, t_clean):
    return {n: t_first for n in names}, {n: t_clean for n in names}


def test_shift_is_canary_median_and_clamped():
    first, clean = _flat(bench._SHIFT_CANARIES, 1.2, 1.0)
    measured, judging, unv, n = bench._session_shift(first, clean)
    assert (measured, judging, unv, n) == (
        1.2, 1.2, False, len(bench._SHIFT_CANARIES)
    )
    # a FAST session never excuses a slowdown: clamp at 1.0
    first, clean = _flat(bench._SHIFT_CANARIES, 0.5, 1.0)
    measured, judging, unv, _ = bench._session_shift(first, clean)
    assert (measured, judging, unv) == (1.0, 1.0, False)


def test_shift_ignores_non_canary_regressions():
    """The ADVICE-r10 failure mode: a broad regression across the
    headline suite must not inflate the shift — only the pinned
    canaries count, and a regression in recent-round code cannot
    touch them."""
    first, clean = _flat(bench._SHIFT_CANARIES, 1.05, 1.0)
    # fifty regressed non-canary queries try to drag the median up
    for i in range(50):
        first[f"regressed_{i}"] = 3.0
        clean[f"regressed_{i}"] = 1.0
    measured, judging, unv, n = bench._session_shift(first, clean)
    assert measured == 1.05 and not unv
    assert n == len(bench._SHIFT_CANARIES)


def test_shift_beyond_bound_is_unverifiable_and_not_applied():
    first, clean = _flat(bench._SHIFT_CANARIES, 2.0, 1.0)
    measured, judging, unv, _ = bench._session_shift(first, clean)
    assert measured == 2.0 and judging == 1.0 and unv
    assert bench._SHIFT_BOUND < 2.0


def test_shift_skips_zero_and_missing_references():
    """Sub-0.5ms clean entries round to 0.0 (the ADVICE-r10
    ZeroDivision class) and absent canaries must both fall out of
    the median instead of raising."""
    names = list(bench._SHIFT_CANARIES)
    first = {n: 1.0 for n in names}
    clean = {n: 1.0 for n in names}
    clean[names[0]] = 0.0  # rounds-to-zero reference
    del clean[names[1]]  # missing reference
    del first[names[2]]  # canary not timed this run
    measured, judging, unv, n = bench._session_shift(first, clean)
    assert n == len(names) - 3
    assert (measured, judging, unv) == (1.0, 1.0, False)


def test_canaries_have_live_clean_references():
    """Every pinned canary must exist in the committed clean
    reference with a nonzero min — a canary that falls out of
    BENCH_CLEAN.json silently shrinks the shift sample."""
    import json

    clean = json.loads(
        (Path(__file__).resolve().parent.parent / "BENCH_CLEAN.json")
        .read_text()
    )["queries"]
    for name in bench._SHIFT_CANARIES:
        assert clean.get(name), name
    # and every canary is actually benched (in the headline set)
    for name in bench._SHIFT_CANARIES:
        assert name in bench.HEADLINE, name
