"""End-to-end CDC consume cycle (SURVEY.md §3.3) as ONE declarative plan.

The reference's changes pipeline is three row-at-a-time stages — ingest
(extractor_loaders/pure_api_changes.py:78-110), per-family fetch/act
(extractor_loaders/pure_api_persons.py:103-189), parse/load
(transformer_loaders/*) — stitched by buffer tables and a daemon loop.

Here one cycle is a single composition of the §2 operators:

    watermark split → P5/P3 gates → C2 version guard → C3/C4 compaction
    → action split (DELETE ⇒ cascade, else upsert) → M4 freshness merge

The synthetic cast: ``user_id`` plays the entity uuid, ``event_id`` the
monotone version, ``event_type`` the changeType ('error' plays DELETE,
'view' plays the non-whitelisted family), the pre-cutoff slice of
``events`` plays the already-consumed history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from experts_etl_spark.operators import (
    compact_changes,
    delete_cascade,
    merge_upsert,
    split_actions,
)
from experts_etl_spark.sources import read_table

CUTOFF = "2024-01-14"
FAMILY_BLOCKLIST = ("view",)
COLS = ["user_id", "event_id", "ts", "event_type", "value"]


def consume_cycle(
    spark: SparkSession, sf_dir: str, cutoff: str = CUTOFF
) -> DataFrame:
    """One CDC cycle: returns the post-cycle entity-state table."""
    ev = read_table(spark, sf_dir, "events").select(*COLS)
    cut = F.lit(cutoff).cast("timestamp")

    history = ev.filter(F.col("ts") <= cut)
    # current entity state = latest version per entity in the history
    target = compact_changes(history, key="user_id", version_col="event_id")

    incoming = ev.filter(F.col("ts") > cut)
    # P5 required fields are non-null by schema here; P3 family whitelist:
    gated = incoming.filter(~F.col("event_type").isin(*FAMILY_BLOCKLIST))
    # C2 idempotent ingest: the compacted target already IS the per-key
    # max version of the history, so the version guard joins against it
    # directly — filter_new_versions(gated, history) would re-aggregate
    # and re-scan the history subtree (one extra shuffle + one extra
    # scan for a value the plan has already computed).
    stored_v = target.select("user_id", F.col("event_id").alias("_stored_v"))
    fresh = (
        gated.join(stored_v, ["user_id"], "left")
        .filter(F.col("_stored_v").isNull() | (F.col("event_id") > F.col("_stored_v")))
        .drop("_stored_v")
    )
    # C3/C4 latest-version-wins compaction drives the action
    compacted = compact_changes(fresh, key="user_id", version_col="event_id")
    upserts, deletes = split_actions(
        compacted, change_type_col="event_type", delete_type="error"
    )
    # M6 delete branch, then M4 freshness-guarded merge of the rest
    kept = delete_cascade(target, deletes.select("user_id"), ["user_id"])
    return merge_upsert(kept, upserts.select(*COLS), ["user_id"], "event_id")
