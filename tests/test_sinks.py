"""Lake sinks: dynamic partition overwrite semantics and the
zero-exchange bucketed join (SURVEY.md §2.8 M1/M5 at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from experts_etl_spark.sources import read_table
from experts_etl_spark.sources.sinks import (
    overwrite_partitions,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    )
    write_partitioned(ev, path, ["event_type"])
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(path).groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Rebuild ONLY the 'click' partition with a single synthetic row
    one = spark.createDataFrame([(999_999, 1, "click")], ["event_id", "user_id", "event_type"])
    overwrite_partitions(one, path, ["event_type"])
    after = {
        r.event_type: r.n
        for r in spark.read.parquet(path).groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert after["click"] == 1
    for k in before:
        if k != "click":
            assert after[k] == before[k]
    # static overwrite mode must be restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    assert wh  # managed tables need a warehouse; session default is fine
    ev = read_table(spark, SF_SMOKE, "events")
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    latest = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    write_bucketed(agg, "b_agg", ["user_id"], n_buckets=8, sort_cols=["user_id"])
    write_bucketed(latest, "b_latest", ["user_id"], n_buckets=8, sort_cols=["user_id"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_agg").join(spark.table("b_latest"), "user_id")
            plan = joined._sc._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "simple"
            )
            assert "Exchange" not in plan, plan
            # and the join is still correct
            n = joined.count()
            assert n == agg.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
        spark.sql("DROP TABLE IF EXISTS b_latest")


def test_export_csv_ordered_with_header(spark, tmp_path):
    from experts_etl_spark.sources.sinks import export_csv

    df = spark.createDataFrame(
        [(2, "b"), (1, "a"), (3, "c")], ["k", "v"]
    ).repartition(3)
    path = str(tmp_path / "report.csv")
    n = export_csv(df, path, ["k"])
    lines = open(path).read().splitlines()
    assert n == 3
    assert lines == ["k,v", "1,a", "2,b", "3,c"]


def test_bucketed_entries_make_jobs_pipeline_zero_exchange(spark):
    """The jobs-transform window chain requires only co-location on
    emplid: a table bucketed by emplid satisfies the window's clustered
    distribution (hash(emplid) ⊆ cluster keys (emplid, position_nbr)),
    so the ENTIRE entries→jobs pipeline plans with ZERO exchanges —
    the lake layout a recurring 100 TB job-history feed should use."""
    from experts_etl_spark.plans.jobs_pipeline import employee_jobs

    import datetime as dt

    rows = [
        (i, str(100 + i % 7), "0", dt.datetime(2020, 1, 1 + i % 20), str(i % 2),
         str(i % 3), "J1", "Job", "A", "D1", "TXXX", "H", None,
         dt.datetime(2020, 1, 1))
        for i in range(200)
    ]
    entries = spark.createDataFrame(
        rows,
        "_idx long, emplid string, empl_rcdno string, effdt timestamp,"
        " effseq string, position_nbr string, jobcode string,"
        " jobcode_descr string, empl_status string, deptid string,"
        " um_campus string, status_flg string, last_date_worked timestamp,"
        " job_entry_dt timestamp",
    )
    write_bucketed(entries, "b_entries", ["emplid"], n_buckets=4,
                   sort_cols=["emplid"])
    try:
        dept = spark.createDataFrame([("D1", "O1")], ["deptid", "org_id"])
        defaults = spark.createDataFrame(
            [("J1", "Desc", "ET", "academic", "Public", True)],
            "jobcode string, pure_job_description string,"
            " default_employed_as string, default_staff_type string,"
            " default_visibility string, default_profiled boolean",
        )
        jobs, _ = employee_jobs(
            spark.table("b_entries"), dept, defaults, order_by=["effdt", "_idx"]
        )
        plan = jobs._sc._jvm.PythonSQLUtils.explainString(
            jobs._jdf.queryExecution(), "simple"
        )
        import re

        assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
        assert jobs.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_entries")
