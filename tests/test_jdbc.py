"""JDBC branch of sources.read_table (S1 at the database boundary —
the cluster shape of the reference's Oracle reads,
oit_to_edw/person.py:43), driven end-to-end against embedded Derby
(the only JDBC engine on this container's classpath; same code path as
Oracle/Postgres, only the URL/driver differ)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from experts_etl_spark.sources import read_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """A Derby database seeded with a small orders slice via the same
    Spark JDBC sink a cluster would use."""
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    rows = [(i, i % 7, float(i) * 1.5, f"O{i:04d}") for i in range(100)]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_label string"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_read_table_jdbc_roundtrip(spark, derby_url):
    got = read_table(spark, derby_url, "orders", {"driver": DRIVER})
    assert got.count() == 100
    assert sorted(c.lower() for c in got.columns) == [
        "o_custkey",
        "o_label",
        "o_orderkey",
        "o_totalprice",
    ]
    top = got.orderBy(F.col("o_orderkey").desc()).limit(1).collect()[0]
    assert top[0] == 99


def test_read_table_jdbc_predicate_pushdown(spark, derby_url):
    """The filter must reach the JDBC relation (shipped into the
    database's WHERE clause), not run as a post-scan Spark filter —
    the whole point of a declarative source at 100 TB."""
    got = read_table(spark, derby_url, "orders", {"driver": DRIVER}).filter(
        F.col("o_custkey") == 3
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_custkey" in plan.split("PushedFilters")[1][:200]
    assert got.count() == len([i for i in range(100) if i % 7 == 3])


def test_read_table_jdbc_partitioned_read(spark, derby_url):
    """partitionColumn/bounds split the read into parallel range
    queries — the fact-table shape."""
    got = read_table(
        spark,
        derby_url,
        "orders",
        {
            "driver": DRIVER,
            "partitionColumn": "o_orderkey",
            "lowerBound": "0",
            "upperBound": "100",
            "numPartitions": "4",
        },
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 100
