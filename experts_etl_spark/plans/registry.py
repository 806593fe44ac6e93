"""Merged query/oracle registry across all packs.

THE ORDER HERE IS PROOF COVERAGE: the driver's CORRECTNESS gate
verifies only the FIRST 50 registered queries (observed in round 1 —
CORRECTNESS_r01.json had exactly 50 entries while 77 were registered,
leaving the whole LLM pack unproven).  ``GATE_ORDER`` is therefore a
curated priority list: 50 queries chosen so that every SURVEY.md §2
operator AND every LLM-pipeline component has at least one
oracle-backed row inside the gate window (COVERAGE.md maps operators
to their gated proof query).  Everything registered after the window
keeps its local pytest/oracle parity but no driver row — variants,
baselines, and queries whose operators are already proven by a denser
gated query.
"""

from __future__ import annotations

from experts_etl_spark.llm import queries as llm_queries
from experts_etl_spark.plans import reference_queries

_ALL_QUERIES: dict = {}
_ALL_ORACLES: dict[str, str] = {}
for mod in (reference_queries, llm_queries):
    _ALL_QUERIES.update(mod.QUERIES)
    _ALL_ORACLES.update(mod.ORACLES)

# The 50 gated slots — ROTATED in round 5 (VERDICT r4 item 1).  The
# r2/r3 window and the r4 window are each fully green (50/50 in
# CORRECTNESS_r02/r03/r04), so this round retires slots already proven
# there and swaps in (a) the 17 round-4 additions that registered after
# the r4 window (local sf0.001/0.01/0.1 parity only until now), (b) the
# two NEW round-5 queries (funnel duplicate-leakage audit, streaming-
# curation batch twin), (c) every path CHANGED in round 5 — the
# self-scaled SRP/IVF knobs touch all six ANN queries, the CC
# convergence-probe rewrite touches dedup_cluster_resolution /
# training_corpus_pipeline, the signature-store param touches
# dedup_incremental_ingest, the checkpoint swap touches
# benchmark_contamination — and (d) ten r2/r3-window queries with no
# driver row since round 3 (the stalest proofs).  Union of r02-r05
# green rows then covers all 104 registered queries.
GATE_ORDER = [
    # --- round-4 additions, first driver rows (VERDICT r4 item 1) ------
    "train_val_split",
    "benchmark_contamination",   # + round-5 shared-subtree checkpoint
    "tfidf_topk_terms",
    "sequence_packing",
    "stratified_sample",
    "dedup_cluster_resolution",  # + round-5 overflow-free CC probe
    "pii_redaction",
    "repetition_metrics",
    "domain_mixture_sample",
    "training_corpus_pipeline",  # funnel e2e (CC probe path)
    "epoch_shuffle",             # global_positions path
    "corpus_token_stats",
    "dedup_incremental_ingest",  # + round-5 signature-store param
    "dedup_lsh_recall",
    "multimodal_dedup",
    "vocab_topk",                # global_positions path
    "encode_token_ids",
    # --- NEW round-5 queries -------------------------------------------
    "training_dedup_leakage",    # funnel-level dup-leakage audit (item 6)
    "curation_stream_routing",   # streaming-curation batch twin (item 8)
    "span_dedup",                # C4-style duplicated-span removal
    "ann_topk_ivf2",             # two-level IVF, n^1.25 assignment
    # --- ANN pack: all touched by the self-scaled knobs (item 2) -------
    "ann_topk_bucketed",
    "ann_topk_ivf",
    "ann_topk_ivf_refined",
    "ann_ivf_kmeans",
    "embedding_near_dup_bucketed",
    "ann_recall",
    # --- retained heavyweight composites (green r2-r4) -----------------
    "cdc_end_to_end",           # §3.3 composite: C1-C5 A1 A3
    "merge_upsert_freshness",   # M2 M4 C5
    "existence_gates",          # J6 J9 C6 (merged)
    "person_cycle_xml",         # F14 S7 + §3.2+§3.4 composite
    "tree_nested_set",          # G1 G2 G3 J10 (composes tree_closure)
    "employee_jobs_transform",  # §3.4: W2 W3 W4 W6
    "person_assembly_cycle",    # §3.2 assembly
    "person_360",               # §3.2 end-to-end + A10
    "pub_cycle",                # pub transformer: P7 J6 J7 J8 M5 F11 F12
    "skew_tolerant_counts",     # salting / two-stage agg
    "dedup_minhash_lsh",
    "user_sessions",            # sessionize over events (bench headline)
    "person_sync_xml",          # F14 person template (bench headline)
    # corpus_curation & multimodal_metadata retired (green r4; their
    # components are covered by the gated curation/multimodal queries)
    # --- stalest proofs: r2/r3 window, no row since round 3 ------------
    "dedup_exact",
    "dedup_simhash",
    "dedup_winnow",
    "text_quality_metrics",
    "cdc_compaction",           # C3 C4 W7
    "override_coalesce",        # J2 J3
    "primary_event_election",   # A9 W8
    "multi_format_dates",       # F1 F2 P6
    "set_reconciliation",       # X3 A5
    "error_counters",           # A7 F9
]
assert len(GATE_ORDER) == 50, len(GATE_ORDER)
_missing = [n for n in GATE_ORDER if n not in _ALL_QUERIES]
assert not _missing, f"GATE_ORDER names unknown queries: {_missing}"
_ungated_no_oracle = [n for n in GATE_ORDER if n not in _ALL_ORACLES]
assert not _ungated_no_oracle, (
    f"every gated query needs an oracle, missing: {_ungated_no_oracle}"
)

QUERIES: dict = {n: _ALL_QUERIES[n] for n in GATE_ORDER}
QUERIES.update({n: f for n, f in _ALL_QUERIES.items() if n not in QUERIES})
ORACLES: dict[str, str] = {n: _ALL_ORACLES[n] for n in GATE_ORDER}
ORACLES.update({n: s for n, s in _ALL_ORACLES.items() if n not in ORACLES})
