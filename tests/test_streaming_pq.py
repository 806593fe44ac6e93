"""Streaming PQ index maintenance (streaming/ann_index.py): batches
encode against persisted codebooks with no retrain; the result equals
the batch-side incremental encoder; checkpointed re-runs are no-ops;
new arrivals extend the index without touching old partitions."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from experts_etl_spark.llm.pq import pq_encode_incremental, pq_train
from experts_etl_spark.sources import read_table
from experts_etl_spark.streaming.ann_index import run_streaming_pq_encode
from tests.conftest import SF_SMOKE


def test_streaming_pq_encode_matches_batch_and_is_idempotent(spark, tmp_path):
    e = read_table(spark, SF_SMOKE, "embeddings")
    existing = e.filter(F.col("vec_id") % 2 == 0)
    arriving = e.filter(F.col("vec_id") % 2 == 1)

    books_path = str(tmp_path / "books")
    _, books = pq_train(existing, "vec_id", "embedding", m=4, iters=2)
    books.write.parquet(books_path)

    src = tmp_path / "src"
    src.mkdir()

    def land(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    batch1 = arriving.filter(F.col("vec_id") % 4 == 1)
    batch2 = arriving.filter(F.col("vec_id") % 4 == 3)
    land(batch1, "b1")
    src = str(src)

    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pq_encode(spark, src, books_path, index_dir, ckpt)

    got1 = spark.read.parquet(index_dir)
    want1 = pq_encode_incremental(
        batch1, spark.read.parquet(books_path), "vec_id", "embedding", 4
    )
    assert sorted(
        map(tuple, got1.select("vec_id", "sub_id", "code_id", "n2").collect())
    ) == sorted(map(tuple, want1.collect()))

    # replay with the same checkpoint: nothing new arrives, index stable
    run_streaming_pq_encode(spark, src, books_path, index_dir, ckpt)
    assert spark.read.parquet(index_dir).count() == got1.count()

    # a new file extends the index; old partitions untouched
    stage2 = os.path.join(str(tmp_path), "stage_b2")
    batch2.coalesce(1).write.parquet(stage2)
    (part2,) = glob.glob(os.path.join(stage2, "*.parquet"))
    shutil.copy(part2, os.path.join(src, "b2.parquet"))
    run_streaming_pq_encode(spark, src, books_path, index_dir, ckpt)
    got2 = spark.read.parquet(index_dir)
    assert got2.count() == got1.count() + batch2.count() * 4
    # every arriving vector encoded exactly m rows, same codes as batch
    want_all = pq_encode_incremental(
        arriving, spark.read.parquet(books_path), "vec_id", "embedding", 4
    )
    assert sorted(
        map(tuple, got2.select("vec_id", "sub_id", "code_id", "n2").collect())
    ) == sorted(map(tuple, want_all.collect()))


def test_streaming_ivfpq_search_matches_batch_and_is_idempotent(spark, tmp_path):
    """Probe-side streaming twin (run_streaming_ivfpq_search): each
    micro-batch of probes searched against the materialized
    cells/books/index equals ivfpq_search on that batch; a checkpointed
    replay is a no-op; a second probe batch lands in its own partition
    without touching the first."""
    from experts_etl_spark.llm.pq import ivfpq_index, ivfpq_search
    from experts_etl_spark.streaming.ann_index import run_streaming_ivfpq_search

    e = read_table(spark, SF_SMOKE, "embeddings")
    emb_path = str(tmp_path / "emb")
    e.write.parquet(emb_path)

    cells, books, index = ivfpq_index(e, "vec_id", "embedding", m=4)
    paths = {}
    for name, df in [("cells", cells), ("books", books), ("index", index)]:
        paths[name] = str(tmp_path / name)
        df.write.parquet(paths[name])

    src_dir = tmp_path / "probes_src"
    src_dir.mkdir()

    def land(df, name):
        stage = tmp_path / f"pstage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(part, src_dir / f"{name}.parquet")

    batch1 = e.filter(F.col("vec_id") < 8)
    batch2 = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    land(batch1, "p1")

    out_dir = str(tmp_path / "results")
    ckpt = str(tmp_path / "search_ckpt")
    args = (spark, str(src_dir), paths["cells"], paths["books"],
            paths["index"], emb_path, out_dir, ckpt)
    run_streaming_ivfpq_search(*args)

    rcells = spark.read.parquet(paths["cells"])
    rbooks = spark.read.parquet(paths["books"])
    rindex = spark.read.parquet(paths["index"])
    remb = spark.read.parquet(emb_path)
    want1 = ivfpq_search(
        rcells, rbooks, rindex, remb, batch1, "vec_id", "embedding", 3, 4
    )
    got1 = spark.read.parquet(out_dir)
    cols = ["probe_id", "cand_id", "rank", "cos"]
    assert sorted(map(tuple, got1.select(*cols).collect())) == sorted(
        map(tuple, want1.select(*cols).collect())
    )

    # replay with the same checkpoint: no new probes, results stable
    run_streaming_ivfpq_search(*args)
    assert spark.read.parquet(out_dir).count() == got1.count()

    # a second probe batch appends its own partition; batch-1 rows stay
    land(batch2, "p2")
    run_streaming_ivfpq_search(*args)
    got2 = spark.read.parquet(out_dir)
    want2 = ivfpq_search(
        rcells, rbooks, rindex, remb, batch2, "vec_id", "embedding", 3, 4
    )
    assert got2.count() == want1.count() + want2.count()
    assert sorted(
        map(tuple, got2.select(*cols).collect())
    ) == sorted(
        map(tuple, want1.select(*cols).unionByName(want2.select(*cols)).collect())
    )


def test_pq_ingest_fold_and_rebuild_compose(spark, tmp_path):
    """r13 verdict next #7: store compaction and the transactional
    rebuild COMPOSE on the PQ code store.  Two benign ticks at
    compact_after=2 fold both the raw-embedding archive and the code
    table into their _compacted segments; a third, drifted tick then
    fires the rebuild, whose re-encode must (a) read the archive ACROSS
    the fold boundary, (b) drop the code store's folded segment before
    republishing (a surviving _folded watermark would mask the
    republished live partitions and keep serving stale old-book rows),
    and (c) publish exactly one code set per archived id, byte-equal to
    a from-scratch encode of the compacted archive under the published
    books.  A re-drain on the committed checkpoint changes nothing."""
    from experts_etl_spark.streaming.ann_index import (
        run_streaming_pq_ingest_with_rebuild,
    )
    from experts_etl_spark.streaming.stores import read_store

    dim = 8
    schema = "vec_id long, embedding array<float>"
    b1 = spark.createDataFrame(
        [(i, [float((i % 3) + 1)] * dim) for i in range(24)], schema
    )
    b2 = spark.createDataFrame(
        [(24 + i, [float((i % 3) + 1)] * dim) for i in range(24)], schema
    )
    b3 = spark.createDataFrame(
        [(100 + i, [1000.0 + float(i % 3)] * dim) for i in range(24)], schema
    )
    src = tmp_path / "src"
    src.mkdir()

    def land(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    args = dict(recon_ppm_threshold=200000, compact_after=2)

    land(b1, "b1")
    run_streaming_pq_ingest_with_rebuild(spark, str(src), idx, ckpt, **args)
    land(b2, "b2")
    run_streaming_pq_ingest_with_rebuild(spark, str(src), idx, ckpt, **args)
    # both stores folded: live batch dirs gone, segments committed
    assert os.path.isdir(idx + "/codes/_compacted")
    assert os.path.isdir(idx + "/_embeddings/_compacted")
    assert not glob.glob(idx + "/codes/batch_id=*")
    assert not glob.glob(idx + "/_rebuilds/*")

    land(b3, "b3")
    run_streaming_pq_ingest_with_rebuild(spark, str(src), idx, ckpt, **args)
    audit = spark.read.parquet(idx + "/_rebuilds").collect()
    assert len(audit) == 1 and audit[0]["post_ppm"] <= 200000

    codes = read_store(spark, idx + "/codes")
    got = sorted(
        map(tuple, codes.select("vec_id", "sub_id", "code_id").collect())
    )
    # exactly one code set per archived id — no stale fold rows survive
    per_id = (
        codes.groupBy("vec_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_id] == [2]  # m=2 at dim 8
    assert codes.select("vec_id").distinct().count() == 72

    # byte-equal to a from-scratch encode of the (fold-crossing) archive
    # under the PUBLISHED books
    arch = read_store(spark, idx + "/_embeddings", drop_batch_id=True)
    books = spark.read.parquet(idx + "/_books")
    want = sorted(
        map(
            tuple,
            pq_encode_incremental(arch, books, "vec_id", "embedding")
            .select("vec_id", "sub_id", "code_id")
            .collect(),
        )
    )
    assert got == want

    # re-drain on the committed checkpoint: nothing re-fires, codes and
    # books byte-stable
    run_streaming_pq_ingest_with_rebuild(spark, str(src), idx, ckpt, **args)
    assert len(spark.read.parquet(idx + "/_rebuilds").collect()) == 1
    codes2 = read_store(spark, idx + "/codes")
    got2 = sorted(
        map(tuple, codes2.select("vec_id", "sub_id", "code_id").collect())
    )
    assert got2 == got
