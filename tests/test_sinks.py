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
    # WAP never needs (or flips) the session overwrite mode
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        == "static"
    )


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


def test_overwrite_partitions_audit_veto_leaves_target_untouched(spark, tmp_path):
    """WAP step 2: a failing audit aborts BEFORE publish — the target
    keeps its exact prior contents and no staging residue survives."""
    import os

    path = str(tmp_path / "audited")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["event_id", "event_type"]
    )
    write_partitioned(base, path, ["event_type"])
    before = sorted(
        (r.event_id, r.event_type) for r in spark.read.parquet(path).collect()
    )

    def audit(staged):
        raise ValueError("row-count audit failed")

    bad = spark.createDataFrame([(99, "a")], ["event_id", "event_type"])
    try:
        overwrite_partitions(bad, path, ["event_type"], audit=audit)
        raise AssertionError("audit veto should propagate")
    except ValueError:
        pass
    after = sorted(
        (r.event_id, r.event_type) for r in spark.read.parquet(path).collect()
    )
    assert after == before
    assert not [e for e in os.listdir(path) if e.startswith("._stage_")]


def test_overwrite_partitions_kill_mid_publish_leaves_target_readable(
    spark, tmp_path, monkeypatch
):
    """WAP step 3: a crash between per-partition publishes leaves every
    partition whole (old or new, never half) and the table readable."""
    import os

    from experts_etl_spark.sources import sinks

    path = str(tmp_path / "killed")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["event_id", "event_type"]
    )
    write_partitioned(base, path, ["event_type"])

    # Force the two-step fallback and kill the process after the first
    # partition has published (worst case for the fallback path).
    monkeypatch.setattr(sinks, "_atomic_exchange", lambda a, b: False)
    real_rename = os.rename
    published = {"n": 0}

    def dying_rename(src, dst):
        real_rename(src, dst)
        if "=_" not in dst and "._trash_" not in dst and os.sep + "._stage_" not in dst:
            published["n"] += 1
            if published["n"] >= 2:  # trash-away + publish of partition 1 done
                raise RuntimeError("simulated kill")

    monkeypatch.setattr(sinks.os, "rename", dying_rename)
    new = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c")], ["event_id", "event_type"]
    )
    try:
        overwrite_partitions(new, path, ["event_type"])
        raise AssertionError("simulated kill should propagate")
    except RuntimeError:
        pass
    monkeypatch.setattr(sinks.os, "rename", real_rename)

    got = {
        r.event_type: r.event_id for r in spark.read.parquet(path).collect()
    }
    # every partition present and whole: each is either fully old or fully new
    assert set(got) == {"a", "b", "c"}
    for etype, eid in got.items():
        assert eid in (
            {"a": 1, "b": 2, "c": 3}[etype],
            {"a": 10, "b": 20, "c": 30}[etype],
        )
    # at least one partition was published before the kill
    assert any(eid >= 10 for eid in got.values())


def test_write_training_shards_disjoint_sorted_bounded(spark, tmp_path):
    """Shard files must partition the global epoch order: pairwise
    disjoint [min,max] position intervals, sorted within each file,
    every file under the record cap, nothing lost."""
    import glob

    from experts_etl_spark.llm.queries import QUERIES
    from experts_etl_spark.sources.sinks import write_training_shards
    from tests.conftest import SF_SMOKE

    epoch = QUERIES["epoch_shuffle"](spark, SF_SMOKE)
    out = str(tmp_path / "shards")
    write_training_shards(epoch, out, "epoch_pos", n_shards=4,
                          max_records_per_file=64)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 8  # 500 rows / 64 cap over 4 range partitions
    intervals = []
    total = 0
    for f in files:
        rows = [r["epoch_pos"] for r in spark.read.parquet(f).collect()]
        assert len(rows) <= 64
        assert rows == sorted(rows), f
        intervals.append((min(rows), max(rows)))
        total += len(rows)
    assert total == epoch.count()
    intervals.sort()
    for (a1, b1), (a2, b2) in zip(intervals, intervals[1:]):
        assert b1 < a2, (a1, b1, a2, b2)
