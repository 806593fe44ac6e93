"""Merge / upsert / delete-cascade operators (SURVEY.md §2.8).

The reference's "load" layer is per-row ORM upserts with freshness
guards (transformer_loaders/pure_api_internal_person.py:131-152) and
multi-table delete cascades (extractor_loaders/pure_api_persons.py:53-82).
Without Delta in this image, MERGE is emulated set-at-a-time:
anti-join + union (pure-parquet fallback noted in SURVEY.md §4.2).
On Delta/Iceberg these become real MERGE INTO statements — the
operator signatures are the stable surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from experts_etl_spark.operators.windows import latest_per_key


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    freshness_col: str | None = None,
) -> DataFrame:
    """M4/C5: upsert-by-key with an optional freshness guard.

    Semantics (transformer_loaders/pure_api_internal_person.py:131-152):
    for each source row, if a target row with the same key exists and
    ``target.freshness >= source.freshness`` the source row is SKIPPED
    (out-of-order protection); otherwise the source row replaces /
    inserts.  Equivalent to Delta's
    ``WHEN MATCHED AND s.modified > t.modified THEN UPDATE``.

    Set-at-a-time, single-pass: tag both sides, union, and pick one row
    per key with a window ordered (freshness DESC NULLS LAST, target
    first on ties).  Ties go to the target — that IS the strict-``>``
    guard — and a NULL source freshness always loses to a non-null
    target.  Each input is referenced exactly ONCE in the plan; the
    anti-join formulation read the target twice and the source twice,
    which at fact scale means re-scanning (or re-shuffling) both
    tables twice.  Precondition: the target is keyed (≤1 row per key),
    which M4's per-PK ORM upsert guarantees.  The source need not be
    keyed — duplicate source keys are collapsed to one deterministic
    winner so the output keeps the keyed-target invariant the next
    cycle's merge relies on.

    Both sides must share a schema.
    """
    from pyspark.sql import Window

    cols = target.columns
    key_list = list(keys)
    if freshness_col is None:
        w = Window.partitionBy(*key_list).orderBy(F.xxhash64(F.struct(*cols)))
        winners = (
            source.select(*cols)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        kept = target.join(winners.select(*key_list).distinct(), key_list, "left_anti")
        return kept.unionByName(winners)

    tagged = target.select(*cols, F.lit(1).alias("_is_target")).unionByName(
        source.select(*cols, F.lit(0).alias("_is_target"))
    )
    w = Window.partitionBy(*key_list).orderBy(
        F.col(freshness_col).desc_nulls_last(),
        F.col("_is_target").desc(),
        # deterministic pick among exactly-tied source duplicates
        F.xxhash64(F.struct(*cols)),
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )


def delete_cascade(
    child: DataFrame, deleted_keys: DataFrame, on: Sequence[str]
) -> DataFrame:
    """M6: multi-table delete cascade — drop child rows whose parent key
    was deleted (extractor_loaders/pure_api_persons.py:53-76).  One
    anti-join per child table."""
    return child.join(deleted_keys.select(*on).distinct(), list(on), "left_anti")


def delete_merged_uuids(
    table: DataFrame, docs: DataFrame, previous_uuids_col: str, key: str
) -> DataFrame:
    """M7: merged-record cleanup — delete any local record whose key
    appears in an incoming document's ``previousUuids`` array
    (extractor_loaders/pure_api_persons.py:78-82).  Explode the array →
    anti-join."""
    merged = (
        docs.select(F.explode(F.col(previous_uuids_col)).alias(key))
        .distinct()
    )
    return table.join(merged, [key], "left_anti")


def reconcile_sets(
    current: DataFrame, desired: DataFrame, on: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """X3: id-set reconciliation → (to_add, to_delete).

    Reference computes ``api_org_uuids - db_org_uuids`` and the inverse
    with Python sets per person
    (transformer_loaders/pure_api_internal_person.py:163-173,306-311).

    ONE full-outer join instead of two anti-joins: both directions fall
    out of the same joined frame (current-side-null → add,
    desired-side-null → delete), so each input is scanned and shuffled
    once instead of twice — at association-table scale that halves the
    I/O of the reconciliation.  Precondition (same as the reference's
    set semantics): each side is keyed — at most one row per ``on``
    tuple.
    """
    on = list(on)
    c_extra = [c for c in current.columns if c not in on]
    d_extra = [c for c in desired.columns if c not in on]
    c = current.select(
        *on, *[F.col(x).alias(f"_cur_{x}") for x in c_extra]
    ).withColumn("_in_cur", F.lit(1))
    d = desired.select(
        *on, *[F.col(x).alias(f"_des_{x}") for x in d_extra]
    ).withColumn("_in_des", F.lit(1))
    j = c.join(d, on, "full_outer")
    to_add = j.filter(F.col("_in_cur").isNull()).select(
        *on, *[F.col(f"_des_{x}").alias(x) for x in d_extra]
    )
    to_delete = j.filter(F.col("_in_des").isNull()).select(
        *on, *[F.col(f"_cur_{x}").alias(x) for x in c_extra]
    )
    return to_add, to_delete


def overwrite_children(
    child: DataFrame,
    new_children: DataFrame,
    parent_keys: Sequence[str],
    touched: DataFrame | None = None,
) -> DataFrame:
    """M5: delete-and-recreate child sets for touched parents
    ("so complex, easiest to delete and re-create",
    transformer_loaders/pure_api_internal_person.py:282-302).
    Anti-join out every child of a touched parent, union the new rows.
    On a partitioned lake this is an overwrite of the touched parent
    partitions only.

    ``touched`` (parent keys only) lets the caller supply a cheaper
    derivation of the touched-parent set: the default re-references the
    whole ``new_children`` subtree in the anti-join branch, and when
    that subtree is an expensive composite (joins + windows over a fact
    table) Catalyst plans it TWICE — a caller usually has a pre-window
    aggregate that yields the same key set for a fraction of the plan."""
    if touched is None:
        touched = new_children
    kept = child.join(
        touched.select(*parent_keys).distinct(), list(parent_keys), "left_anti"
    )
    return kept.unionByName(new_children.select(*child.columns))
