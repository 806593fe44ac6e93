"""Incremental / CDC operators (SURVEY.md §2.10, C1-C5, W7, M9).

The reference's changes pipeline is batch-implemented CDC against the
Pure REST feed (extractor_loaders/pure_api_changes.py).  Here the
synthetic ``events`` table stands in for the feed; the same operators
back the Structured Streaming variant in ``streaming/``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def watermark(
    buffer: DataFrame,
    history: DataFrame | None,
    ts_col: str,
    default: Column | None = None,
) -> Column:
    """C1: watermark = max(downloaded) across buffer ∪ history; cold
    start falls back to a default (now − 1 day in the reference,
    extractor_loaders/pure_api_changes.py:28-41).

    Returns a scalar Column usable in a filter after crossJoin of the
    1-row aggregate (no driver-side collect)."""
    src = buffer.select(F.col(ts_col).alias("_ts"))
    if history is not None:
        src = src.unionByName(history.select(F.col(ts_col).alias("_ts")))
    agg = src.agg(F.max("_ts").alias("wm"))
    if default is not None:
        agg = agg.select(F.coalesce(F.col("wm"), default).alias("wm"))
    return agg


def filter_new_versions(
    incoming: DataFrame,
    stored: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """C2: idempotent ingest — drop an event if a same-or-newer
    ``(key, version)`` is already stored
    (extractor_loaders/pure_api_changes.py:49-64).  Compare against the
    stored per-key max version with a left join (broadcast-able when the
    stored key set is small; otherwise a shuffle on ``key``, the natural
    partitioning of the buffer anyway)."""
    maxv = stored.groupBy(key).agg(F.max(version_col).alias("_stored_v"))
    return (
        incoming.join(maxv, [key], "left")
        .filter(F.col("_stored_v").isNull() | (F.col(version_col) > F.col("_stored_v")))
        .drop("_stored_v")
    )


def compact_changes(
    changes: DataFrame,
    key: str,
    version_col: str,
    order_extra: Sequence[Column] = (),
) -> DataFrame:
    """C3/C4/W7: event-log compaction — per key, latest version wins and
    drives the action; all versions remain archived by the caller
    (changes_buffer_managers.py:4-21 orders versions desc per uuid and
    acts on the head).

    The reference's separate in-batch (uuid, version) dedup
    (pure_to_edw/changes.py:92-100) is SUBSUMED by the head-of-key pick:
    row_number()==1 emits one row per key no matter how many duplicate
    versions arrive, so an explicit ``dropDuplicates([key, version])``
    stage would add a shuffle on a DIFFERENT key (key, version) for zero
    semantic effect."""
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), *list(order_extra)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def split_actions(
    compacted: DataFrame, change_type_col: str, delete_type: str = "DELETE"
) -> tuple[DataFrame, DataFrame]:
    """C4: DELETE events → cascade-delete branch; everything else →
    fetch/upsert branch (extractor_loaders/pure_api_persons.py:124-189)."""
    deletes = compacted.filter(F.col(change_type_col) == delete_type)
    upserts = compacted.filter(F.col(change_type_col) != delete_type)
    return upserts, deletes


def archive_processed(
    buffer: DataFrame,
    processed_keys: DataFrame,
    on: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """M9: buffer → history archival.  Returns ``(to_history,
    remaining_buffer)``: processed rows append to the ``_hst`` table,
    the rest stay buffered (changes_buffer_managers.py:23-44).

    One marker left-join instead of a semi/anti pair: both outputs
    filter the SAME joined frame, so the buffer subtree is identical in
    both branches and Spark's exchange reuse evaluates it once — the
    semi+anti formulation shuffled and scanned the buffer twice.
    Exactly-once is the caller's output-commit concern."""
    on = list(on)
    keys = processed_keys.select(*on).distinct().withColumn("_p", F.lit(1))
    marked = buffer.join(keys, on, "left")
    to_history = marked.filter(F.col("_p").isNotNull()).drop("_p")
    remaining = marked.filter(F.col("_p").isNull()).drop("_p")
    return to_history, remaining
