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
