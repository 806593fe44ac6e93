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

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write (hive layout: one dir per value)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """M5: dynamic partition overwrite — replace ONLY the partitions
    present in ``df``, leave every other partition untouched
    (delete-and-recreate children of touched parents,
    transformer_loaders/pure_api_internal_person.py:282-302)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


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
