"""Standing CI gate for the rounding-headroom discipline (VERDICT r9
item 5): the r8 red row (privacy_dp_sum_bounded) was a
rounding-headroom defect — a 6-dp round at 1e7 magnitude left less
slack than a cross-libm last-ulp difference, flipping the driver's
value hash on an unlucky row. tools/round_headroom_audit.py found
that class mechanically after the fact; this test runs the same
audit on every registered oracle so the NEXT instance fails here
instead of in a driver window.

Gate contract (the tool's exit-code contract, asserted here):
- zero rounded double columns with < 1e3x ulp headroom at the
  column's observed sf0.01 magnitude, outside the named ALLOW list
  (bit-deterministic exact-arithmetic paths, audited by hand);
- zero integer casts over float division (Spark truncates, DuckDB
  rounds) outside the named INT_CAST_DIV_ALLOW list (quotients
  exact by construction).

The allowlists are pinned BY NAME below: an entry added to the tool
without updating this test fails, so the allowlist cannot silently
grow past review.
"""

import importlib.util
import sys
from pathlib import Path

_TOOL = Path(__file__).resolve().parent.parent / "tools" / "round_headroom_audit.py"
_spec = importlib.util.spec_from_file_location("round_headroom_audit", _TOOL)
_audit = importlib.util.module_from_spec(_spec)
sys.modules["round_headroom_audit"] = _audit
_spec.loader.exec_module(_audit)


def test_allowlists_are_exactly_the_reviewed_entries():
    assert set(_audit.ALLOW) == {("ml_conformal_interval", "icept")}
    assert set(_audit.INT_CAST_DIV_ALLOW) == {
        ("graph_pagerank_personalized", "(node - 1) / 2"),
        ("text_chunk_sliding_tokens", "start_tok / 48"),
        ("pipeline_rag_chunk_dedup", "start_tok / 48"),
        ("stats_kendall_tau", "t * (t - 1) / 2"),
    }


def test_every_oracle_has_rounding_headroom(capsys):
    """Run the full audit at sf0.01; any FAIL row or unjustified
    int-cast-over-division fails the gate. WARN rows (1e3-1e6x) are
    tolerated — they have >=1000x the slack a last-ulp divergence
    needs — but printed for the record."""
    rc = _audit.main("/root/testdata/sf0.01")
    out = capsys.readouterr().out
    assert rc == 0, f"headroom audit failed:\n{out}"
