"""Streaming ANN-index maintenance: encode arriving embedding batches
against persisted PQ codebooks and append the skinny code rows.

The Structured Streaming twin of ``llm/pq.py:pq_encode_incremental``
(exactly like ``streaming/curation.py`` twins the batch curation
funnel): a deployment trains codebooks once (``pq_train`` /
``ivfpq_index``), persists them, and every arriving embedding batch
maps through the BROADCAST books — m·k subspace dots per new vector,
no retrain, no touch of the standing index.  Codebook drift under a
shifting ingest distribution is a rebuild trigger (retrain + re-encode
behind a new index path), never an encode-time concern — the FAISS
operational model.

Idempotency: the sink is hive-partitioned on ``batch_id`` with dynamic
partition overwrite, so an at-least-once ``foreachBatch`` replay
rewrites its own partition instead of appending duplicates (the same
guarantee ``streaming/incremental.py`` pins for the merge sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_pq_encode(
    spark: SparkSession,
    src: str,
    books_path: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``src`` (``availableNow``) of embedding parquet batches,
    encoding each against the persisted codebooks at ``books_path`` and
    appending (vec_id, sub_id, code_id, n2, batch_id) partitions to
    ``index_dir``.

    Per-tick cost is batch-proportional: the books are a fixed m·k-row
    broadcast, the batch never joins the standing index, and the write
    touches only the batch's own partition."""
    from experts_etl_spark.llm.pq import pq_encode_incremental

    books = spark.read.parquet(books_path)
    schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src)

    def encode(batch: DataFrame, batch_id: int) -> None:
        out = pq_encode_incremental(batch, books, id_col, vec_col, m)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(index_dir)
        )

    (
        stream.writeStream.foreachBatch(encode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_ivfpq_search(
    spark: SparkSession,
    probes_src: str,
    cells_path: str,
    books_path: str,
    index_path: str,
    emb_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 4,
    refine_mult: int | None = None,
    nprobe: int | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Probe side of the streaming IVFADC deployment: drain
    ``probes_src`` (``availableNow``) of probe-vector parquet batches,
    searching each against the MATERIALIZED index triple from
    ``llm/pq.py:ivfpq_index`` (cells + books + skinny code index; the
    full corpus at ``emb_path`` is point-read only for the exact
    re-rank shortlist) and writing (probe_id, cand_id, rank, cos,
    batch_id) partitions to ``out_dir``.

    The batch twin is ``ivfpq_search`` verbatim — same candidate
    volume (nprobe·n/nlist per probe), same broadcast LUT, same exact
    re-rank — so per-tick cost tracks the probe batch, never the
    corpus, and the standing index is shared by every tick until the
    next (re)index.  Idempotency: the sink is hive-partitioned on
    ``batch_id`` with dynamic partition overwrite, so an at-least-once
    ``foreachBatch`` replay rewrites its own partition instead of
    appending duplicates — the same guarantee as
    :func:`run_streaming_pq_encode`.

    Read knobs default to the batch twin's self-scaling rules
    (``auto_nprobe`` / ``auto_refine_mult``), resolved ONCE against
    the standing index here — not per tick — since the index is fixed
    between rebuilds."""
    from experts_etl_spark.llm.pq import (
        auto_nprobe,
        auto_refine_mult,
        ivfpq_search,
    )

    cells = spark.read.parquet(cells_path)
    books = spark.read.parquet(books_path)
    index = spark.read.parquet(index_path)
    emb = spark.read.parquet(emb_path)
    if nprobe is None:
        nprobe = auto_nprobe(cells.count())
    if refine_mult is None:
        refine_mult = auto_refine_mult(emb.count(), k)
    schema = spark.read.parquet(probes_src).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(probes_src)

    def search(batch: DataFrame, batch_id: int) -> None:
        out = ivfpq_search(
            cells, books, index, emb, batch, id_col, vec_col,
            k, m, refine_mult, nprobe,
        )
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    (
        stream.writeStream.foreachBatch(search)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
