"""Sources and sinks (SURVEY.md §2.1).

The reference reads Oracle tables via an ORM and a REST change feed
(reference: oit_to_edw/person.py:43, extractor_loaders/pure_api_changes.py:98);
here every source is a columnar scan — parquet locally, the same code
against object storage / JDBC on a cluster.  Filters and projections
stay declarative so Catalyst pushes them into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: columnar table scan with pushdown (reference full-scans via ORM,
    e.g. edw_to_pure/person.py:37).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long that we
    floor-divide to microseconds (identical to DuckDB's ns→µs cast).
    """
    if name == "events":
        # Runtime-settable; required even when the session wasn't built by
        # our factory (the driver passes its own plain SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
