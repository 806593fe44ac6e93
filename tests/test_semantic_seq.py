"""Exact SemDeDup sequential greedy (semantic_dedup_sequential).

The paper's rule (Abbas et al. 2023) processed as a distributed
status fixpoint — these tests pin the fixpoint core against a plain
Python sequential scan, the ε-chain behavior that separates it from
the one-pass approximation, and the paper's coverage guarantee on
real data.  Oracle parity for the registered query is covered by
test_oracle_parity like every other registry entry.
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from experts_etl_spark.llm.similarity import (
    _sequential_keep,
    semantic_dedup,
    semantic_dedup_sequential,
)
from experts_etl_spark.sources import read_table
from tests.conftest import SF_SMOKE


def _python_sequential(n: int, edges: list[tuple[int, int]]) -> set[int]:
    """Reference: the literal sequential scan from the paper."""
    lower = {}
    for lo, hi in edges:
        lower.setdefault(hi, []).append(lo)
    kept: set[int] = set()
    for v in range(n):
        if not any(u in kept for u in lower.get(v, [])):
            kept.add(v)
    return kept


def test_fixpoint_matches_sequential_scan_random_graph(spark):
    """The distributed fixpoint computes the lexicographically-first
    MIS — byte-for-byte the Python sequential scan — on a seeded
    random graph dense enough to have multi-hop chains."""
    rng = random.Random(1234)
    n = 120
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                rng.sample(range(n), 2) for _ in range(300)
            )
        }
    )
    expect = _python_sequential(n, edges)
    verts = spark.range(n).select(F.col("id").alias("_vid"))
    el = spark.createDataFrame(edges, "lo long, hi long")
    got = {
        r["_vid"]
        for r in _sequential_keep(verts, el).collect()
        if r["kept"]
    }
    assert got == expect


def test_chain_keeps_odd_links(spark):
    """The defining ε-chain case: edges (0,1), (1,2), (2,3).  The
    sequential rule keeps 0, drops 1 (0 kept), keeps 2 (its only
    lower neighbour 1 was dropped), drops 3 — the one-pass rule would
    drop 1, 2 AND 3."""
    verts = spark.range(4).select(F.col("id").alias("_vid"))
    el = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "lo long, hi long"
    )
    rows = dict(
        (r["_vid"], r["kept"]) for r in _sequential_keep(verts, el).collect()
    )
    assert rows == {0: True, 1: False, 2: True, 3: False}


def test_sequential_keeps_superset_and_covers(spark):
    """On the real embeddings table: (1) sequential's kept set is a
    superset of one-pass's (one-pass is the strictly-more-aggressive
    approximation); (2) the paper's coverage guarantee holds — every
    dropped vector has a KEPT lower-id blocked neighbour within ε."""
    from experts_etl_spark.llm.similarity import bucketed_near_dup

    e = read_table(spark, SF_SMOKE, "embeddings")
    seq = semantic_dedup_sequential(e, "vec_id", "embedding", 0.35)
    one = semantic_dedup(e, "vec_id", "embedding", 0.35)
    seq_kept = {r["vec_id"] for r in seq.collect() if r["kept"]}
    one_kept = {r["vec_id"] for r in one.collect() if r["kept"]}
    assert one_kept <= seq_kept
    dropped = {r["vec_id"] for r in seq.collect() if not r["kept"]}
    if dropped:
        pairs = bucketed_near_dup(e, "vec_id", "embedding", 0.35)
        witnesses = {
            r["id2"]: r["id1"]
            for r in pairs.collect()
            if r["id1"] in seq_kept
        }
        uncovered = {v for v in dropped if v not in witnesses}
        assert not uncovered, uncovered
