"""Persisted watermark bookmarks (SURVEY.md §2.10 C1).

The reference derives its ingest start-date from ``max(downloaded)``
across the buffer and history tables every cycle, with a cold-start
fallback of now−1day (extractor_loaders/pure_api_changes.py:28-41).
For incremental *batch* runs (no streaming checkpoint), the engine
persists the same scalar in a one-row parquet per (pipeline, key) —
written last in a cycle, read first in the next.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType()),
        T.StructField("watermark", T.TimestampType()),
    ]
)


def read_bookmark(spark: SparkSession, path: str, pipeline: str):
    """Returns the stored watermark (python datetime) or None on cold
    start.  One tiny file — driver-side read is the right tool."""
    if not os.path.exists(path):
        return None
    rows = (
        spark.read.schema(_SCHEMA)
        .parquet(path)
        .filter(F.col("pipeline") == pipeline)
        .collect()
    )
    return rows[0].watermark if rows else None


def write_bookmark(
    df: DataFrame, ts_col: str, path: str, pipeline: str
) -> None:
    """Persist max(ts_col) of the just-consumed batch as the next cycle's
    start point.  Written via a single-row aggregate — no collect of
    data rows, and idempotent on replay (max is monotone).

    The stored watermark never moves backwards: an empty batch has
    max(ts)=NULL and a replayed batch has a stale max, so the written
    value is greatest(batch_max, previous) — otherwise an idle cycle
    would reset the pipeline to cold start and duplicate rows through
    append-mode sinks."""
    spark = df.sparkSession
    prev = read_bookmark(spark, path, pipeline)
    new = df.agg(F.max(ts_col).alias("_batch_max")).select(
        F.lit(pipeline).alias("pipeline"),
        F.greatest(
            F.col("_batch_max"), F.lit(prev).cast("timestamp")
        ).alias("watermark"),
    )
    if os.path.exists(path):
        others = (
            spark.read.schema(_SCHEMA)
            .parquet(path)
            .filter(F.col("pipeline") != pipeline)
        )
        new = others.unionByName(new)
    new.coalesce(1).write.mode("overwrite").parquet(path + "_next")
    spark.read.schema(_SCHEMA).parquet(path + "_next").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
