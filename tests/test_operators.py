"""Unit tests for snapshot/merge/CDC/error operators (SURVEY.md §2.6,
§2.8, §2.10) — semantics pinned with tiny in-memory frames, including
the reference's freshness/idempotency edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from experts_etl_spark.operators import (
    archive_processed,
    compact_changes,
    delete_cascade,
    delete_merged_uuids,
    dim_lookup,
    existence_gate,
    filter_new_versions,
    merge_upsert,
    overwrite_children,
    reconcile_sets,
    snapshot_diff_keys,
    snapshot_diff_rows,
    upsert_error_counts,
    with_error_id,
)
from experts_etl_spark.operators.merge import (
    merge_upsert as _mu,  # noqa: F401  (import path stability)
)


def d(s):
    return datetime.fromisoformat(s)


def test_merge_upsert_freshness_guard_skips_stale_and_equal(spark):
    # Reference skips when stored modified >= incoming (M4/C5,
    # transformer_loaders/pure_api_internal_person.py:131-152).
    target = spark.createDataFrame(
        [("u1", "old", d("2024-01-02")), ("u2", "old", d("2024-01-02"))],
        ["k", "v", "modified"],
    )
    source = spark.createDataFrame(
        [
            ("u1", "new", d("2024-01-03")),  # newer → replaces
            ("u2", "new", d("2024-01-02")),  # equal → SKIPPED
            ("u3", "new", d("2024-01-01")),  # absent in target → inserts
        ],
        ["k", "v", "modified"],
    )
    out = merge_upsert(target, source, ["k"], freshness_col="modified")
    got = {r.k: r.v for r in out.collect()}
    assert got == {"u1": "new", "u2": "old", "u3": "new"}


def test_merge_upsert_unconditional(spark):
    target = spark.createDataFrame([("a", 1)], ["k", "v"])
    source = spark.createDataFrame([("a", 2), ("b", 3)], ["k", "v"])
    got = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {"a": 2, "b": 3}


def test_merge_upsert_fast_path_keeps_target_keyed(spark):
    """Duplicate source keys must collapse to ONE row so the output
    preserves the keyed-target invariant the next cycle relies on."""
    target = spark.createDataFrame([("a", 1)], ["k", "v"])
    source = spark.createDataFrame([("a", 2), ("a", 7), ("b", 3), ("b", 3)], ["k", "v"])
    out = merge_upsert(target, source, ["k"])
    rows = out.collect()
    assert len(rows) == len({r.k for r in rows}) == 2
    by_k = {r.k: r.v for r in rows}
    assert by_k["a"] in (2, 7) and by_k["b"] == 3
    # deterministic across invocations
    again = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert again == by_k


def test_filter_new_versions_same_or_older_dropped(spark):
    stored = spark.createDataFrame([("u", 5)], ["k", "ver"])
    incoming = spark.createDataFrame(
        [("u", 5), ("u", 4), ("u", 6), ("w", 1)], ["k", "ver"]
    )
    out = filter_new_versions(incoming, stored, "k", "ver")
    assert sorted((r.k, r.ver) for r in out.collect()) == [("u", 6), ("w", 1)]


def test_compact_changes_latest_version_wins_and_dedups(spark):
    changes = spark.createDataFrame(
        [("u", 1, "UPDATE"), ("u", 2, "DELETE"), ("u", 2, "DELETE"), ("v", 7, "ADD")],
        ["k", "ver", "typ"],
    )
    out = compact_changes(changes, "k", "ver")
    got = {r.k: (r.ver, r.typ) for r in out.collect()}
    assert got == {"u": (2, "DELETE"), "v": (7, "ADD")}


def test_snapshot_diff_keys(spark):
    cur = spark.createDataFrame([("a",), ("b",)], ["k"])
    hist = spark.createDataFrame([("a",)], ["k"])
    assert [r.k for r in snapshot_diff_keys(cur, hist, ["k"]).collect()] == ["b"]


def test_snapshot_diff_rows_vs_latest_history(spark):
    cur = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")], ["k", "v"]
    )
    hist = spark.createDataFrame(
        [
            ("a", "old", d("2024-01-01"), 1),
            ("a", "x", d("2024-01-02"), 2),   # latest matches current → unchanged
            ("b", "y", d("2024-01-01"), 3),
            ("b", "old", d("2024-01-02"), 4),  # latest DIFFERS → changed
            # c has no history → new
        ],
        ["k", "v", "ts", "i"],
    )
    out = snapshot_diff_rows(
        cur, hist, ["k"], [F.col("ts").desc(), F.col("i").desc()], ["v"]
    )
    assert sorted(r.k for r in out.collect()) == ["b", "c"]


def test_delete_cascade_and_merged_uuids(spark):
    child = spark.createDataFrame([("p1", 1), ("p2", 2)], ["parent", "x"])
    deleted = spark.createDataFrame([("p1",)], ["parent"])
    assert [r.parent for r in delete_cascade(child, deleted, ["parent"]).collect()] == ["p2"]

    table = spark.createDataFrame([("m1",), ("m2",)], ["uuid"])
    docs = spark.createDataFrame([(["m1", "m9"],)], ["previousUuids"])
    out = delete_merged_uuids(table, docs, "previousUuids", "uuid")
    assert [r.uuid for r in out.collect()] == ["m2"]


def test_reconcile_sets(spark):
    current = spark.createDataFrame([("p", "o1"), ("p", "o2")], ["person", "org"])
    desired = spark.createDataFrame([("p", "o2"), ("p", "o3")], ["person", "org"])
    add, delete = reconcile_sets(current, desired, ["person", "org"])
    assert [(r.person, r.org) for r in add.collect()] == [("p", "o3")]
    assert [(r.person, r.org) for r in delete.collect()] == [("p", "o1")]


def test_overwrite_children(spark):
    child = spark.createDataFrame([("p1", 1), ("p1", 2), ("p2", 3)], ["parent", "x"])
    new = spark.createDataFrame([("p1", 9)], ["parent", "x"])
    out = overwrite_children(child, new, ["parent"])
    assert sorted((r.parent, r.x) for r in out.collect()) == [("p1", 9), ("p2", 3)]


def test_archive_processed(spark):
    buffer = spark.createDataFrame([("u", 1), ("u", 2), ("v", 1)], ["k", "ver"])
    done = spark.createDataFrame([("u", 1), ("u", 2)], ["k", "ver"])
    hist, remaining = archive_processed(buffer, done, ["k", "ver"])
    assert hist.count() == 2
    assert [(r.k, r.ver) for r in remaining.collect()] == [("v", 1)]


def test_dim_lookup_split(spark):
    facts = spark.createDataFrame([("d1", 1), ("dX", 2)], ["deptid", "x"])
    dim = spark.createDataFrame([("d1", "org1")], ["deptid", "pure_org"])
    matched, missing = dim_lookup(facts, dim, ["deptid"], "pure_org")
    assert [r.x for r in matched.collect()] == [1]
    assert [r.x for r in missing.collect()] == [2]
    assert missing.columns == facts.columns  # quarantine keeps fact shape


def test_existence_gate(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "x"])
    present = spark.createDataFrame([("a",)], ["k"])
    passed, deferred = existence_gate(df, present, ["k"])
    assert [r.k for r in passed.collect()] == ["a"]
    assert [r.k for r in deferred.collect()] == ["b"]


def test_error_id_deterministic_and_counts_merge(spark):
    errs = spark.createDataFrame(
        [("e1", "d1", d("2024-01-01")), ("e1", "d1", d("2024-01-05"))],
        ["emplid", "deptid", "seen_at"],
    )
    tagged = with_error_id(errs, ["deptid", "emplid"])
    ids = [r.error_id for r in tagged.collect()]
    assert len(set(ids)) == 1 and len(ids[0]) == 64

    first = upsert_error_counts(None, tagged)
    row = first.collect()[0]
    assert row["count"] == 2
    assert row.first_seen == d("2024-01-01") and row.last_seen == d("2024-01-05")

    # Merge a later batch: counters accumulate (A7, umn_data_error.py:209-233).
    later = with_error_id(
        spark.createDataFrame([("e1", "d1", d("2024-02-01"))], ["emplid", "deptid", "seen_at"]),
        ["deptid", "emplid"],
    )
    merged = upsert_error_counts(first, later).collect()[0]
    assert merged["count"] == 3 and merged.last_seen == d("2024-02-01")
