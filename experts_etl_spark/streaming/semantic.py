"""Streaming semantic deduplication (SemDeDup over a stream of
embedding batches) — the embedding analogue of
``streaming/curation.py``'s near-dup signature store (r9 verdict
next-round #7).

Each arriving batch runs the EXACT sequential greedy
(``llm/similarity.py:semantic_dedup_incremental``) against the
persisted KEPT-EMBEDDING STORE: the scan order is everything already
kept, then the batch's ids ascending, so a semantic near-copy of any
previously kept vector is rejected without ever rescanning the
archive — per-tick cost is one asymmetric bucket join against the
store plus the in-batch fixpoint.  The batch twin is
``semantic_dedup_incremental`` verbatim (one code path), and the
composition over an id-ordered split is pinned equal to the full
``semantic_dedup_sequential`` by the gated
``embedding_semantic_dedup_incremental`` oracle.

The SRP index width (``bits``) is PINNED at store creation and passed
to every tick — a per-batch auto width would re-block history
differently every tick; choose it for the target corpus size
(``auto_srp_bits``) like any index parameter, and rebuild the store to
re-widen (the FAISS operational model, same as the PQ codebooks in
``streaming/ann_index.py``).

Idempotency: both sinks are hive-partitioned on ``batch_id`` with
dynamic partition overwrite, and the store probe EXCLUDES the current
batch's own partition, so an at-least-once ``foreachBatch`` replay
rewrites its own partitions instead of appending duplicates or
self-rejecting the whole batch against its first attempt — the
``streaming/curation.py`` fingerprint-store guarantees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_semantic_dedup(
    spark: SparkSession,
    src: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float,
    bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
    store_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``src`` (``availableNow``) of embedding parquet batches;
    for each, decide (id, kept) with
    :func:`~experts_etl_spark.llm.similarity.semantic_dedup_incremental`
    against the kept-embedding store, write the decisions to
    ``out_dir/batch_id=N`` and append the batch's KEPT embeddings to
    ``store_dir/batch_id=N`` (default ``<out_dir>/_kept_embeddings``,
    underscore-prefixed so corpus reads of ``out_dir`` never see it).

    The store carries only kept vectors — the sequential rule's
    representatives — so the cross-batch probe joins the deduplicated
    survivor set, not the raw history."""
    from experts_etl_spark.llm.similarity import semantic_dedup_incremental

    if store_dir is None:
        store_dir = os.path.join(out_dir, "_kept_embeddings")

    schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src)

    def dedup(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        # Hadoop-FS existence probe (object-store-safe, fail-closed:
        # only "not there yet" skips; real read errors propagate) —
        # the streaming/curation.py discipline.
        jvm = spark_b._jvm
        hconf = spark_b._jsc.hadoopConfiguration()
        store_path = jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = store_path.getFileSystem(hconf)
        store = None
        if fs.exists(store_path):
            store = spark_b.read.parquet(store_dir)
            if "batch_id" in store.columns:
                # at-least-once replay guard: batch N must not probe
                # its first attempt's kept rows and self-reject
                store = store.filter(
                    F.col("batch_id") != F.lit(batch_id)
                ).drop("batch_id")
        decisions = semantic_dedup_incremental(
            batch, store, id_col, vec_col, threshold, bits, probe_hamming
        ).localCheckpoint(eager=True)  # one pass feeds both sinks
        (
            decisions.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            batch.join(
                decisions.filter(F.col("kept")).select(id_col), id_col
            )
            .select(id_col, vec_col)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
        )

    (
        stream.writeStream.foreachBatch(dedup)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
