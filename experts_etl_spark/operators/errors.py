"""Error / quarantine operators (SURVEY.md §1.1 last row, A7, F9).

The reference dedups data errors by a sha1 of the JSON-dumped sorted
identifying fields and keeps first_seen/last_seen/count counters
(exceptions.py:38-43, umn_data_error.py:209-233).  Here the error id is
``sha2(to_json(struct(sorted cols)))`` — JVM-side, deterministic — and
the counter upsert is a groupBy + merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_error_id(
    df: DataFrame, id_cols: Sequence[str], out_col: str = "error_id"
) -> DataFrame:
    """F9: deterministic error id from sorted identifying fields."""
    ordered = sorted(id_cols)
    return df.withColumn(
        out_col, F.sha2(F.to_json(F.struct(*[F.col(c) for c in ordered])), 256)
    )


def upsert_error_counts(
    existing: DataFrame | None,
    new_errors: DataFrame,
    id_col: str = "error_id",
    ts_col: str = "seen_at",
) -> DataFrame:
    """A7: same error id → count += n, last_seen = max; else insert.

    ``existing`` has columns (id_col, first_seen, last_seen, count);
    ``new_errors`` has (id_col, ts_col) plus any payload (ignored here).
    """
    batch = new_errors.groupBy(id_col).agg(
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.count(F.lit(1)).alias("count"),
    )
    if existing is None:
        return batch
    merged = (
        existing.select(id_col, "first_seen", "last_seen", "count")
        .unionByName(batch)
        .groupBy(id_col)
        .agg(
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.sum("count").alias("count"),
        )
    )
    return merged
