"""Lake-layout sinks: partitioned writes, dynamic partition overwrite,
bucketed tables (SURVEY.md §2.8 M1/M5 at scale; §7.1 step 9).

The reference's "load" side is Oracle DML (truncate/merge,
oit_to_edw/person.py:67-78,120-123).  On a parquet/Delta lake the same
semantics come from layout:

- **Partitioning** by a coarse key (date, family, parent id) turns M1
  truncate-and-rebuild and M5 delete-and-recreate-children into
  *partition overwrites* — no read-modify-write of the whole table, and
  downstream scans prune partitions for free.
- **Dynamic partition overwrite** rewrites only the partitions present
  in the incoming frame — exactly M5's "touched parents only".
- **Bucketing** pre-shuffles a table by join key at write time; two
  tables co-bucketed on the same key join with ZERO exchanges at read
  time.  At 100 TB this converts every recurring fact-fact join on the
  entity key (person/org/pub) from a shuffle into a local merge.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import re
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_RENAME_EXCHANGE = 2  # linux/fs.h RENAME_EXCHANGE
_AT_FDCWD = -100


def _atomic_exchange(a: str, b: str) -> bool:
    """Atomically swap two paths via renameat2(RENAME_EXCHANGE) —
    Linux-only; returns False when unsupported (caller falls back to a
    two-step rename with a strictly larger crash window)."""
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        r = libc.renameat2(
            _AT_FDCWD, a.encode(), _AT_FDCWD, b.encode(), _RENAME_EXCHANGE
        )
        return r == 0
    except (AttributeError, OSError):
        return False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write (hive layout: one dir per value)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def _staged_partition_dirs(stage: str, depth: int) -> list[str]:
    """Relative ``col=value[/col=value...]`` paths present in a staged
    write, depth = number of partition columns."""
    out: list[str] = []

    def walk(cur: str, rel: str, d: int) -> None:
        for entry in sorted(os.listdir(cur)):
            if "=" not in entry or entry.startswith((".", "_")):
                continue
            nxt = os.path.join(cur, entry)
            r = os.path.join(rel, entry) if rel else entry
            if d == 1:
                out.append(r)
            else:
                walk(nxt, r, d - 1)

    walk(stage, "", depth)
    return out


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    audit: Callable[[DataFrame], None] | None = None,
) -> None:
    """M5: dynamic partition overwrite — replace ONLY the partitions
    present in ``df``, leave every other partition untouched
    (delete-and-recreate children of touched parents,
    transformer_loaders/pure_api_internal_person.py:282-302).

    Write-audit-publish (the reference's per-batch transactional commit,
    oit_to_edw/person.py:57-59,67-78, re-expressed for a lake):

    1. **Write** to a dot-prefixed staging dir INSIDE the target (same
       filesystem → rename is atomic; Spark's HiddenFileFilter makes it
       invisible to concurrent readers of ``path``).
    2. **Audit**: the staged parquet is read back (readability/schema
       gate); a caller-supplied ``audit`` callable can veto (raise) with
       the target completely untouched.
    3. **Publish**: each staged partition directory swaps into place via
       renameat2(RENAME_EXCHANGE) — atomic even against a kill between
       any two syscalls; a reader never observes a missing or
       half-written partition, only whole old or whole new.  (Non-Linux
       fallback: rename-away + rename-in with rename-back rollback on
       failure, which narrows the at-risk window to one partition
       rather than eliminating it.)  A crash mid-publish leaves a
       prefix of partitions new and a suffix old — each individually
       complete and the table readable throughout; re-running the same
       batch (idempotent upstream, C2-C4) converges, and the next call
       sweeps any hidden ``._stage_``/``._trash_`` orphans a kill left
       behind.  On a real lake, Delta/Iceberg's commit protocol
       replaces step 3 with an all-or-nothing metadata swap
       (SURVEY.md §4.2).

    The rename-based publish requires a POSIX path; for remote
    filesystems (``hdfs://``, ``s3a://``, …) the function falls back to
    Spark's native dynamic partition overwrite (the pre-WAP behavior —
    object stores get atomicity from a lakehouse table format, not
    renames).
    """
    if not partition_cols:
        raise ValueError(
            "overwrite_partitions requires partition_cols; use "
            "write_partitioned(..., mode='overwrite') for a full rebuild"
        )
    spark = df.sparkSession
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return
    os.makedirs(path, exist_ok=True)
    # sweep orphans from previously killed runs (single-writer contract,
    # same as the reference's one-daemon cycle)
    for entry in os.listdir(path):
        if entry.startswith(("._stage_", "._trash_")):
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
    stage = os.path.join(path, f"._stage_{uuid.uuid4().hex[:12]}")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(stage)
        rels = _staged_partition_dirs(stage, len(partition_cols))
        if not rels:
            return  # empty batch: dynamic overwrite of nothing is a no-op
        staged = spark.read.parquet(stage)  # audit gate: must be readable
        if audit is not None:
            audit(staged)
        trash = os.path.join(path, f"._trash_{uuid.uuid4().hex[:12]}")
        for rel in rels:
            sdir = os.path.join(stage, rel)
            tdir = os.path.join(path, rel)
            if os.path.exists(tdir):
                if _atomic_exchange(sdir, tdir):
                    continue  # old data now in sdir; swept with stage
                os.makedirs(os.path.join(trash, os.path.dirname(rel)), exist_ok=True)
                tr = os.path.join(trash, rel)
                os.rename(tdir, tr)
                try:
                    os.rename(sdir, tdir)
                except BaseException:
                    # roll the old partition back so the target never
                    # loses a partition to a failed publish
                    if not os.path.exists(tdir):
                        os.rename(tr, tdir)
                    raise
            else:
                os.makedirs(os.path.dirname(tdir), exist_ok=True)
                os.rename(sdir, tdir)
        shutil.rmtree(trash, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffled on the join key at write
    time.  Joins between tables co-bucketed on the same key (same
    ``n_buckets``) require no exchange; sorting inside buckets
    additionally removes the join's sort step."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def export_csv(df: "DataFrame", path: str, order_by: Sequence[str]) -> int:
    """S9 (report side): small ordered CSV export for the error-report
    mail attachment (umn_data_error.py:47-99).  Streams through
    ``toLocalIterator`` like the XML sink — reports are small, but the
    driver still never holds more than a partition.  SMTP stays a
    side-channel outside the engine."""
    import csv

    ordered = df.orderBy(*order_by)
    n = 0
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.writer(fh)
        writer.writerow(df.columns)
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            writer.writerow(list(row))
            n += 1
    return n


def write_training_shards(
    df: "DataFrame",
    path: str,
    order_col: str,
    n_shards: int,
    max_records_per_file: int,
) -> None:
    """Emit a training corpus as globally-ordered, size-bounded parquet
    shards: range-partition on the order column (the epoch_shuffle
    position), sort within partitions, cap records per file.  Every
    shard file then covers a disjoint, internally-sorted slice of the
    global order — a data loader streams shards in filename-interval
    order and sees the exact epoch permutation, with no single-node
    sort anywhere (the range partitioner samples boundaries; each task
    sorts only its slice).  ``maxRecordsPerFile`` keeps individual
    files loader-friendly regardless of partition skew."""
    (
        df.repartitionByRange(n_shards, order_col)
        .sortWithinPartitions(order_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )
