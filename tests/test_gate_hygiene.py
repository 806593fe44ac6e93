"""Gate-hygiene invariant, mechanically checked (r7 verdict item 8).

Two commitments:
1. ``GATE_MANIFEST.json`` on disk always matches the registry (a query
   or oracle edit without a manifest regen fails here).
2. Any query whose body/oracle changed since the last driver snapshot
   must be inside the current ``GATE_ORDER`` (or UNGATED_BY_DESIGN), so
   the driver hashes every changed path this round.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

import gate_hygiene  # noqa: E402


def test_manifest_on_disk_is_current():
    current = gate_hygiene.build_manifest()
    on_disk = json.loads(gate_hygiene.MANIFEST.read_text())
    assert on_disk == current, (
        "GATE_MANIFEST.json is stale — run `python tools/gate_hygiene.py "
        "--write` and commit it with the query change"
    )


def test_no_ungated_changes_since_last_snapshot():
    violations = gate_hygiene.check(gate_hygiene.build_manifest())
    assert violations == []


def test_check_flags_changed_ungated_query(monkeypatch):
    """The detector actually detects: mutate one ungated query's hash
    in a synthetic 'previous' manifest and expect a violation."""
    current = gate_hygiene.build_manifest()
    ungated = next(
        n for n, row in current["queries"].items()
        if not row["gated"] and n not in gate_hygiene.UNGATED_BY_DESIGN
    )
    prev = json.loads(json.dumps(current))
    prev["queries"][ungated]["query_sha"] = "0" * 40
    monkeypatch.setattr(gate_hygiene, "last_snapshot_manifest", lambda: prev)
    violations = gate_hygiene.check(current)
    assert any(ungated in v for v in violations)

    # A gated change is fine.
    gated = next(n for n, r in current["queries"].items() if r["gated"])
    prev2 = json.loads(json.dumps(current))
    prev2["queries"][gated]["oracle_sha"] = "0" * 40
    monkeypatch.setattr(gate_hygiene, "last_snapshot_manifest", lambda: prev2)
    assert gate_hygiene.check(current) == []

    # A brand-new ungated query is flagged.
    prev3 = json.loads(json.dumps(current))
    del prev3["queries"][ungated]
    monkeypatch.setattr(gate_hygiene, "last_snapshot_manifest", lambda: prev3)
    assert any("NEW" in v and ungated in v
               for v in gate_hygiene.check(current))


def test_ungated_by_design_is_documented():
    from experts_etl_spark.plans import registry

    for name in gate_hygiene.UNGATED_BY_DESIGN:
        assert name in registry.QUERIES
        assert name not in registry.GATE_ORDER
