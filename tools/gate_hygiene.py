#!/usr/bin/env python3
"""Mechanical gate-hygiene check (r7 verdict item 8).

The invariant that slipped in rounds 6 and 7: *no end-of-round commit
may change a query body or its oracle without either a same-round
driver row (= the query is inside ``GATE_ORDER``) or an explicit
ungated-by-design note.*  Twice a rewritten query shipped whose only
driver proof predated the rewrite.

This tool makes the invariant checkable by machine:

``--write``
    Regenerate ``GATE_MANIFEST.json`` at the repo root: for every
    registered query, a SHA-1 of its *function source* (via
    ``inspect.getsource``) and of its oracle SQL, plus whether it is
    currently gated.  Commit the manifest alongside any query change.

``--check``
    Compare the regenerated manifest against the manifest at the most
    recent driver snapshot commit — the newest commit whose SUBJECT
    line matches ``round N: verdict/advice/correctness/bench`` (the
    driver's per-round snapshot title) or ``end-of-round snapshot``
    (this tool's introduction commit) — i.e. against what the judge
    last saw.  Every query whose source
    or oracle hash changed since then, and every newly registered
    query, must either sit inside the CURRENT ``GATE_ORDER`` (so this
    round's driver run hashes it against its current oracle) or be
    listed in ``UNGATED_BY_DESIGN`` below.  Exit 1 otherwise.

Scope note: the hash covers the query function body and oracle string,
not transitively-called helpers.  A helper rewrite that changes
results is still caught — ``tests/test_oracle_parity.py`` hash-checks
all registered queries against their oracles on every pytest run — but
a helper rewrite that *also* rewrites the oracle to match would evade
this tool unless the query body changed too.  The per-round full
sweeps (``tools/sweep.py``) plus the judge's diff review cover that
residual.

``tests/test_gate_hygiene.py`` runs both modes in CI: the committed
manifest must match the registry exactly (no stale manifest), and the
snapshot diff must be clean.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
MANIFEST = REPO / "GATE_MANIFEST.json"

# Queries allowed to change without a driver row, with the reason the
# registry/COVERAGE document.  Keep this list SHORT and justified.
UNGATED_BY_DESIGN = {
    # Driver harness cannot canonicalize array columns (observed r5);
    # the scalar ids_str twin is gated and pins the same pipeline.
    "encode_token_ids_arrays",
    # Template twin of the gated training_dedup_leakage_sampled with
    # only the sampling constant changed (p=1/8); exists so scale_fit
    # can measure the production cost point.
    "training_dedup_leakage_sampled_p8",
    # Same pattern for the recall audit (r9): template twin of the
    # gated dedup_lsh_recall_sampled with only the sampling modulus
    # changed (p=1/8), so scale_fit can measure the p² cost curve.
    "dedup_lsh_recall_sampled_p8",
    # Same pattern for the substring audit (r9): template twin of the
    # gated dedup_exact_substrings with only the window-width constant
    # changed (w=10), so scale_fit can measure the hot-set saturation
    # term's dependence on window width.
    "dedup_exact_substrings_w10",
    # Composition-only variant: train and encode paths are both
    # driver-gated via ann_pq_codes; this pins their composition over
    # disjoint corpus halves (incremental ingest).  Local sf0.001
    # parity + full sweeps like every registered query.
    "ann_pq_codes_incremental",
    # (ann_pq_recon_error was on this list in r8; GATED as of r9 —
    # the r8 ADVICE option taken — so its per-row error arithmetic
    # now earns a driver row like every other audit expression.)
}


def _sha(text: str) -> str:
    return hashlib.sha1(text.encode("utf-8")).hexdigest()


def build_manifest() -> dict:
    sys.path.insert(0, str(REPO))
    from experts_etl_spark.plans import registry

    rows = {}
    for name, fn in registry.QUERIES.items():
        rows[name] = {
            "query_sha": _sha(inspect.getsource(fn)),
            "oracle_sha": _sha(registry.ORACLES[name]),
            "gated": name in registry.GATE_ORDER,
        }
    return {"queries": rows}


def last_snapshot_manifest() -> dict | None:
    """GATE_MANIFEST.json as of the latest driver snapshot commit.

    The driver titles its per-round snapshots "round N: verdict/
    advice/correctness/bench"; the tool's own introduction commit
    said "end-of-round snapshot".  Both patterns anchor the baseline,
    newest match wins — the r8 version only knew the second, so the
    baseline never advanced past the tool's birth and a query that
    ARRIVED gated in round N could never rotate out in round N+1
    despite its green driver row.  The r9 fix used ``git log --grep``,
    which matches the FULL message: a commit whose *body* merely
    quotes a snapshot title (38639ae did) then becomes the baseline —
    byte-identical to HEAD, so --check passes vacuously and the
    invariant is silently disabled.  Hence: match SUBJECT lines only,
    in Python.  The invariant is "changed or new since the last
    DRIVER-VERIFIED state must be gated", so the baseline must track
    the driver's snapshots and nothing newer."""
    import re

    subject_pat = re.compile(
        r"^(round \d+: verdict/advice/correctness|"
        r"round \d+: end-of-round snapshot|end-of-round snapshot)"
    )
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H%x09%s"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
        commit = ""
        for line in log.splitlines():
            sha, _, subject = line.partition("\t")
            if subject_pat.match(subject):
                commit = sha
                break
        if not commit:
            return None
        blob = subprocess.run(
            ["git", "show", f"{commit}:GATE_MANIFEST.json"],
            cwd=REPO, capture_output=True, text=True,
        )
        if blob.returncode != 0:  # manifest predates this tool
            return None
        return json.loads(blob.stdout)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def check(current: dict) -> list[str]:
    """Return violation messages; empty list == invariant holds."""
    prev = last_snapshot_manifest()
    if prev is None:
        return []  # first round with the tool: nothing to diff against
    violations = []
    prev_q = prev["queries"]
    for name, row in current["queries"].items():
        old = prev_q.get(name)
        changed = old is None or (
            old["query_sha"] != row["query_sha"]
            or old["oracle_sha"] != row["oracle_sha"]
        )
        if changed and not row["gated"] and name not in UNGATED_BY_DESIGN:
            kind = "NEW" if old is None else "CHANGED"
            violations.append(
                f"{kind} query '{name}' is not in GATE_ORDER and not "
                "UNGATED_BY_DESIGN — it will ship without a driver row "
                "against its current oracle"
            )
    return violations


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--write", action="store_true",
                    help="regenerate GATE_MANIFEST.json")
    ap.add_argument("--check", action="store_true",
                    help="diff vs last snapshot commit; exit 1 on violation")
    args = ap.parse_args()

    current = build_manifest()
    if args.write:
        MANIFEST.write_text(json.dumps(current, indent=1, sort_keys=True)
                            + "\n")
        print(f"wrote {MANIFEST} ({len(current['queries'])} queries)")
    if args.check:
        on_disk = json.loads(MANIFEST.read_text()) if MANIFEST.exists() else None
        if on_disk != current:
            print("GATE_MANIFEST.json is stale — run --write and commit",
                  file=sys.stderr)
            return 1
        violations = check(current)
        for v in violations:
            print(f"VIOLATION: {v}", file=sys.stderr)
        if violations:
            return 1
        print("gate hygiene OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
