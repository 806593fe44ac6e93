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
