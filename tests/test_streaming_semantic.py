"""Streaming semantic dedup (streaming/semantic.py) — the
kept-embedding store (r9 verdict next-round #7).

Pins the three contract properties: (1) two micro-batches through the
runner equal the FULL sequential greedy over the concatenation (the
store composition is exact, not approximate); (2) a cross-batch
semantic near-copy — a batch-2 vector inside ε of a KEPT batch-1
vector — is rejected; (3) a checkpointed replay is a no-op and the
store never self-rejects a replayed batch against its own first
attempt."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from experts_etl_spark.llm.similarity import (
    auto_srp_bits,
    semantic_dedup_incremental,
    semantic_dedup_sequential,
)
from experts_etl_spark.sources import read_table
from experts_etl_spark.streaming.semantic import run_streaming_semantic_dedup
from tests.conftest import SF_SMOKE

THRESHOLD = 0.35


def _land(tmp_path, src_dir, df, name):
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "*.parquet"))
    shutil.copy(part, src_dir / f"{name}.parquet")


def test_streaming_semantic_dedup_matches_full_sequential(spark, tmp_path):
    e = read_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    cut = 4 * n // 5
    bits = auto_srp_bits(n)  # the store's pinned index width
    batch1 = e.filter(F.col("vec_id") < cut)
    batch2 = e.filter(F.col("vec_id") >= cut)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _land(tmp_path, src_dir, batch1, "b1")

    out_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    args = (spark, str(src_dir), out_dir, ckpt, THRESHOLD, bits)
    run_streaming_semantic_dedup(*args)

    got1 = spark.read.parquet(out_dir)
    assert got1.count() == batch1.count()

    # replay with the same checkpoint: no new files, decisions stable
    # (and the store-probe replay guard means nothing self-rejects)
    run_streaming_semantic_dedup(*args)
    replayed = spark.read.parquet(out_dir)
    assert sorted(
        map(tuple, replayed.select("vec_id", "kept").collect())
    ) == sorted(map(tuple, got1.select("vec_id", "kept").collect()))

    # second batch arrives: decisions over BOTH batches == the full
    # sequential greedy over the whole corpus at the same pinned width
    _land(tmp_path, src_dir, batch2, "b2")
    run_streaming_semantic_dedup(*args)
    got = spark.read.parquet(out_dir).select("vec_id", "kept")
    want = semantic_dedup_sequential(
        e, "vec_id", "embedding", THRESHOLD, bits=bits
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the store holds exactly the keepers' embeddings
    store = spark.read.parquet(str(tmp_path / "decisions" / "_kept_embeddings"))
    kept_ids = {r["vec_id"] for r in want.filter("kept").collect()}
    assert {r["vec_id"] for r in store.collect()} == kept_ids


def test_cross_batch_semantic_near_copy_rejected(spark, tmp_path):
    """A batch-2 vector that is a semantic near-copy of a KEPT batch-1
    vector is rejected by the store probe alone (no in-batch edge),
    while a genuinely novel batch-2 vector is kept."""
    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.999] + [0.01] * (dim - 1)        # cosine ≈ 1 with base
    novel = [0.0] * (dim - 1) + [1.0]          # orthogonal to base
    b1 = spark.createDataFrame(
        [(0, base)], "vec_id long, embedding array<float>"
    )
    b2 = spark.createDataFrame(
        [(10, near), (11, novel)], "vec_id long, embedding array<float>"
    )
    store = b1  # batch-1's keeper (a single vector is trivially kept)
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup_incremental(
            b2, store, "vec_id", "embedding", 0.9, bits=4
        ).collect()
    }
    assert got == {10: False, 11: True}
    # and without the store both batch-2 vectors survive (they are
    # far apart) — the rejection above is genuinely cross-batch
    alone = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup_incremental(
            b2, None, "vec_id", "embedding", 0.9, bits=4
        ).collect()
    }
    assert alone == {10: True, 11: True}


def test_incremental_chain_drop_semantics(spark):
    """The ε-chain case that separates the sequential rule from the
    one-pass rule, across the batch boundary: store keeper a, batch
    b ≈ a (dropped via store) and c ≈ b but NOT ≈ a — since b is
    dropped it cannot drop c, so c is KEPT (the paper's coverage
    guarantee; one-pass would drop both)."""
    import math

    dim = 8

    def unit(theta):
        # chain a —25°— b —25°— c in a 2-D subspace: adjacent pairs
        # above cos 0.85, the ends below it
        return [math.cos(theta), math.sin(theta)] + [0.0] * (dim - 2)

    a = unit(0.0)
    b = unit(math.radians(25))
    c = unit(math.radians(50))
    store = spark.createDataFrame(
        [(0, a)], "vec_id long, embedding array<float>"
    )
    batch = spark.createDataFrame(
        [(10, b), (11, c)], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup_incremental(
            batch, store, "vec_id", "embedding", 0.85, bits=2
        ).collect()
    }
    assert got == {10: False, 11: True}


def test_occupancy_trigger_rebuilds_srp_index(spark, tmp_path):
    """r11 verdict missing #1: a store created narrow re-widens itself
    when mean bucket occupancy crosses the limit — width re-derived
    from the CURRENT store count (auto_srp_bits, dim-capped), every
    partition re-bucketed through write-audit-publish, the _srp_meta
    sidecar swapped after publish.  Later probes at the new width must
    equal the direct incremental call, whether the store's buckets are
    read precomputed or recomputed from the vectors — the two
    bucketed_cross_hits arms are one candidate set."""
    e = read_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    cut = 4 * n // 5
    b1 = e.filter(F.col("vec_id") < cut)
    b2 = e.filter(F.col("vec_id") >= cut)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    store_dir = out_dir + "/_kept_embeddings"
    # creation width 2 (4 buckets) with a tiny limit → batch 1 outgrows
    # it immediately and the trigger re-derives from the kept count
    args = dict(threshold=THRESHOLD, bits=2, occupancy_limit=4)

    _land(tmp_path, src_dir, b1, "b1")
    run_streaming_semantic_dedup(spark, str(src_dir), out_dir, ckpt, **args)

    meta = spark.read.parquet(store_dir + "/_srp_meta").first()
    store = spark.read.parquet(store_dir)
    n_kept = store.count()
    want_bits = min(auto_srp_bits(n_kept), 64)
    assert n_kept > 4 * (1 << 2)            # the trigger really crossed
    assert meta["bits"] == want_bits > 2    # re-derived, not creation
    assert meta["n_kept"] == n_kept
    # every persisted bucket consistent with the meta width
    from experts_etl_spark.llm.similarity import srp_bucket

    bad = store.filter(
        F.col("bucket") != srp_bucket(F.col("embedding"), want_bits)
    ).count()
    assert bad == 0
    import glob as _glob

    assert not _glob.glob(store_dir + "/_srp_meta_next/*")  # marker swapped

    # batch 2 probes at the REBUILT width; the streaming decisions must
    # equal the direct incremental call — via the precomputed-bucket
    # arm AND via the compute-from-vectors arm (one candidate set)
    _land(tmp_path, src_dir, b2, "b2")
    run_streaming_semantic_dedup(spark, str(src_dir), out_dir, ckpt, **args)
    got = {
        (r["vec_id"], r["kept"])
        for r in spark.read.parquet(out_dir)
        .filter(F.col("batch_id") == 1)
        .collect()
    }
    store_b1 = spark.read.parquet(store_dir).filter(
        F.col("batch_id") == 0
    ).drop("batch_id")
    for probe_store in (store_b1, store_b1.drop("bucket")):
        want = {
            (r["vec_id"], r["kept"])
            for r in semantic_dedup_incremental(
                b2, probe_store, "vec_id", "embedding", THRESHOLD, want_bits
            ).collect()
        }
        assert got == want

    # replay after the rebuild is a fixpoint: drain again, all stable
    before = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    run_streaming_semantic_dedup(spark, str(src_dir), out_dir, ckpt, **args)
    assert sorted(map(tuple, spark.read.parquet(out_dir).collect())) == before
    meta2 = spark.read.parquet(store_dir + "/_srp_meta").first()
    assert meta2["bits"] == want_bits


def test_interrupted_rebucket_resumes_from_meta_next(spark, tmp_path):
    """A crash between the _srp_meta_next stage and the meta swap must
    not leave a mixed-width index: the next tick sees the marker,
    completes the re-bucket at the staged width idempotently, swaps
    the meta, and only then probes."""
    e = read_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    cut = 4 * n // 5
    b1 = e.filter(F.col("vec_id") < cut)
    b2 = e.filter(F.col("vec_id") >= cut)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    store_dir = out_dir + "/_kept_embeddings"
    bits0 = auto_srp_bits(n)
    args = dict(threshold=THRESHOLD, bits=bits0)  # default limit: no trigger

    _land(tmp_path, src_dir, b1, "b1")
    run_streaming_semantic_dedup(spark, str(src_dir), out_dir, ckpt, **args)
    n_kept = spark.read.parquet(store_dir).count()

    # simulate the crash window: a staged meta_next at a wider width,
    # store partitions still bucketed at bits0
    bits_next = bits0 + 3
    spark.createDataFrame(
        [(bits_next, n_kept)], "bits int, n_kept bigint"
    ).write.mode("overwrite").parquet(store_dir + "/_srp_meta_next")

    _land(tmp_path, src_dir, b2, "b2")
    run_streaming_semantic_dedup(spark, str(src_dir), out_dir, ckpt, **args)

    from experts_etl_spark.llm.similarity import srp_bucket

    meta = spark.read.parquet(store_dir + "/_srp_meta").first()
    assert meta["bits"] == bits_next
    store = spark.read.parquet(store_dir)
    bad = store.filter(
        F.col("bucket") != srp_bucket(F.col("embedding"), bits_next)
    ).count()
    assert bad == 0
    import glob as _glob

    assert not _glob.glob(store_dir + "/_srp_meta_next/*")
    # batch 2's decisions were made at the COMPLETED width
    got = {
        (r["vec_id"], r["kept"])
        for r in spark.read.parquet(out_dir)
        .filter(F.col("batch_id") == 1)
        .collect()
    }
    store_b1 = store.filter(F.col("batch_id") == 0).drop("batch_id")
    want = {
        (r["vec_id"], r["kept"])
        for r in semantic_dedup_incremental(
            b2, store_b1, "vec_id", "embedding", THRESHOLD, bits_next
        ).collect()
    }
    assert got == want


def test_mixed_store_null_buckets_degrade_to_compute(spark):
    """A store whose older partitions predate the bucket index surfaces
    null buckets after schema merge; the precomputed-bucket arm must
    compute those rows' buckets on the fly — identical decisions to a
    fully-indexed or fully-unindexed store, never a silent match miss."""
    from experts_etl_spark.llm.similarity import srp_bucket

    e = read_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    bits = auto_srp_bits(n)
    cut = 4 * n // 5
    store_plain = e.filter(F.col("vec_id") < cut)
    batch = e.filter(F.col("vec_id") >= cut)
    # half the store rows carry a precomputed bucket, half a NULL
    store_mixed = store_plain.withColumn(
        "bucket",
        F.when(
            F.col("vec_id") % 2 == 0,
            srp_bucket(F.col("embedding"), bits),
        ),
    )
    want = sorted(
        map(
            tuple,
            semantic_dedup_incremental(
                batch, store_plain, "vec_id", "embedding", THRESHOLD, bits
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            semantic_dedup_incremental(
                batch, store_mixed, "vec_id", "embedding", THRESHOLD, bits
            ).collect(),
        )
    )
    assert got == want
