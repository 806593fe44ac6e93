"""The shared brute-force truth table (r9 verdict missing #1).

``ann_exact_truth`` amortizes the O(n·probes) exact baseline across
every recall audit in a process: one truth table per (corpus, probe
set, k), collected once (bounded — k rows per audit probe) and served
back as a literal DataFrame.  These tests pin the three properties the
amortization rests on:

1. the cached result is row-identical to a fresh brute-force run;
2. a prefix-probe audit (``ann_recall``'s 16 of 32) filtering the
   shared table gets exactly what probing the prefix directly gives —
   per-probe independence of brute-force top-k;
3. the second consumer is a cache HIT (no recompute), keyed by
   corpus, and distinct corpora never collide.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from experts_etl_spark.llm import similarity as sim
from experts_etl_spark.llm.similarity import ann_exact_truth, brute_force_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.select("probe_id", "cand_id").collect()))


def test_cached_truth_equals_fresh_brute_force(emb):
    fresh = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 32), "vec_id", "embedding", 3
    ).select("probe_id", "cand_id")
    cached = ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=32, k=3, cache_key=SF
    )
    assert _rows(cached) == _rows(fresh)
    # and the table is the bounded size the collect() contract claims
    assert cached.count() == 32 * 3


def test_prefix_probe_filter_is_exact(emb):
    shared = ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=32, k=3, cache_key=SF
    ).filter(F.col("probe_id") < 16)
    direct = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 16), "vec_id", "embedding", 3
    ).select("probe_id", "cand_id")
    assert _rows(shared) == _rows(direct)


def test_second_consumer_hits_cache(emb, spark):
    key = (
        spark.sparkContext.applicationId,
        "cache-hit-probe",
        sim._dir_fingerprint("cache-hit-probe"),
        "vec_id",
        "embedding",
        8,
        2,
    )
    sim._TRUTH_CACHE.pop(key, None)
    ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=8, k=2, cache_key="cache-hit-probe"
    )
    assert key in sim._TRUTH_CACHE
    # poison the cached rows; a second call must serve the poisoned
    # copy (proof it did NOT recompute), then clean up
    rows, schema = sim._TRUTH_CACHE[key]
    sim._TRUTH_CACHE[key] = (rows[:1], schema)
    again = ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=8, k=2, cache_key="cache-hit-probe"
    )
    assert again.count() == 1
    del sim._TRUTH_CACHE[key]
    # distinct corpus keys never collide
    other = ann_exact_truth(
        emb, "vec_id", "embedding", probe_max=8, k=2, cache_key="other-corpus"
    )
    assert other.count() == 8 * 2
    sim._TRUTH_CACHE.pop(
        (
            spark.sparkContext.applicationId,
            "other-corpus",
            sim._dir_fingerprint("other-corpus"),
            "vec_id",
            "embedding",
            8,
            2,
        ),
        None,
    )


def test_vec_col_distinguishes_cache_entries(emb, spark):
    """Two audits over the same corpus dir but different embedding
    columns must not share a truth table (r10 ADVICE: the old key
    omitted vec_col)."""
    alt = emb.withColumn("head4", F.slice(F.col("embedding"), 1, 4))
    a = ann_exact_truth(
        alt, "vec_id", "embedding", probe_max=4, k=2, cache_key="veccol-probe"
    )
    b = ann_exact_truth(
        alt, "vec_id", "head4", probe_max=4, k=2, cache_key="veccol-probe"
    )
    # a 4-dim prefix gives a different neighbor order for at least one
    # probe — if the cache keyed only on the dir these would be
    # row-identical by construction
    assert _rows(a) != _rows(b)
    for vc in ("embedding", "head4"):
        sim._TRUTH_CACHE.pop(
            (
                spark.sparkContext.applicationId,
                "veccol-probe",
                sim._dir_fingerprint("veccol-probe"),
                "vec_id",
                vc,
                4,
                2,
            ),
            None,
        )


def test_in_place_regeneration_invalidates(emb, tmp_path, spark):
    """A corpus dir regenerated in-place must MISS the cache — the
    filesystem fingerprint (names/sizes/mtimes) changes, so the stale
    truth table is never served (r10 ADVICE)."""
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"v1")
    k1 = sim._dir_fingerprint(str(d))
    import os

    (d / "part-0.parquet").write_bytes(b"v2-longer")
    os.utime(d / "part-0.parquet", ns=(1, 1))
    k2 = sim._dir_fingerprint(str(d))
    assert k1 != k2
    # non-local / missing paths degrade to the path string (no crash)
    assert sim._dir_fingerprint("s3://bucket/corpus") == ("s3://bucket/corpus",)


def test_no_cache_key_bypasses_cache(emb, spark):
    before = dict(sim._TRUTH_CACHE)
    out = ann_exact_truth(emb, "vec_id", "embedding", probe_max=4, k=2)
    assert out.count() == 4 * 2
    assert sim._TRUTH_CACHE == before
