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


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    jdbc_options: dict[str, str] | None = None,
) -> DataFrame:
    """S1: table scan with pushdown (reference full-scans via ORM,
    e.g. edw_to_pure/person.py:37).

    ``sf_dir`` is either a directory of parquet tables (local path or
    object-store URI — the default everywhere in this repo) or a JDBC
    URL (``jdbc:...``), in which case ``name`` is read as a database
    table through Spark's JDBC source — the cluster shape of the
    reference's Oracle reads (oit_to_edw/person.py:43).  Filter and
    LIMIT pushdown stay enabled so Catalyst ships predicates into the
    database's WHERE clause instead of scanning the table
    (plan-asserted in tests/test_jdbc.py against embedded Derby); for
    a parallel partitioned read pass the standard
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    (and ``driver``/``fetchsize``) through ``jdbc_options`` — without
    them a JDBC read is a single task, which is fine for dim-sized
    sync tables and wrong for facts.

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
    if sf_dir.startswith("jdbc:"):
        reader = (
            spark.read.format("jdbc")
            .option("url", sf_dir)
            .option("dbtable", name)
            .option("pushDownPredicate", "true")
            .option("pushDownLimit", "true")
        )
        for k, v in (jdbc_options or {}).items():
            reader = reader.option(k, v)
        return reader.load()
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
