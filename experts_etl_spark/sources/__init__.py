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

    ``events.ts`` may arrive in any of three parquet encodings and is
    normalized to Spark ``TIMESTAMP`` here, once, at the boundary:

    - TIMESTAMP(NANOS): ``spark.sql.legacy.parquet.nanosAsLong`` reads it
      as a long we floor-divide to microseconds (identical to DuckDB's
      ns→µs cast);
    - plain ``timestamp[us]`` (no tz): Spark 4 infers TIMESTAMP_NTZ,
      which watermarks/``unix_micros`` reject — read as TIMESTAMP via
      ``inferTimestampNTZ=false`` (lossless: session tz is pinned UTC,
      session.py) and defensively cast if a caller's session still
      inferred NTZ;
    - tz-aware µs: already TIMESTAMP.
    """
    if name == "events":
        # Runtime-settable; required even when the session wasn't built by
        # our factory (the driver passes its own plain SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
