"""Golden-fixture unit tests for the window/sequence operators —
the same staged-fixture discipline as the reference's tests
(tests/test_employee_job.py asserts group_entries(entries) ==
entry_groups stage by stage), with fresh fixture data covering the
reference's edge cases: multi-stint same position, blank position_nbr,
rows after the closed ('C') row, groups with no preferred row."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from experts_etl_spark.operators import (
    dedupe_keep_best,
    elect_primary,
    latest_per_key,
    reference_entry,
    run_groups,
    sessionize,
    split_stints,
    with_lead_end,
)


def d(s):
    return datetime.fromisoformat(s)


# Jobs-shaped fixture: one person, one position held twice (multi-stint,
# reference tests/employee_jobs_1217312.py shape) with a jobcode change
# in the middle and a literal-blank position_nbr row.
ENTRIES = [
    # (emplid, position_nbr, effdt, effseq, jobcode, deptid, status)
    ("100", "P1", d("2010-01-01"), 0, "J1", "D1", "A"),
    ("100", "P1", d("2011-01-01"), 0, "J1", "D1", "A"),   # same tuple → same group
    ("100", "P1", d("2012-01-01"), 0, "J2", "D1", "A"),   # jobcode change → new group
    ("100", "P1", d("2013-01-01"), 0, "J1", "D1", "C"),   # back to J1 → NEW group (not merged)
    ("100", " ",  d("2014-01-01"), 0, "J3", "D2", "A"),   # blank position_nbr
    ("200", "P9", d("2015-06-01"), 1, "J9", "D9", "L"),   # second person
]
COLS = ["emplid", "position_nbr", "effdt", "effseq", "jobcode", "deptid", "status"]


def entries_df(spark):
    return spark.createDataFrame(ENTRIES, COLS)


def test_run_groups_consecutive_identical(spark):
    out = run_groups(
        entries_df(spark),
        ["emplid"],
        [F.col("effdt"), F.col("effseq")],
        ["position_nbr", "jobcode", "deptid"],
    )
    got = {
        (r.emplid, r.effdt.isoformat()): r.group_id
        for r in out.collect()
    }
    assert got[("100", "2010-01-01T00:00:00")] == 1
    assert got[("100", "2011-01-01T00:00:00")] == 1  # unchanged tuple, same group
    assert got[("100", "2012-01-01T00:00:00")] == 2
    assert got[("100", "2013-01-01T00:00:00")] == 3  # J1 again but NOT merged with group 1
    assert got[("100", "2014-01-01T00:00:00")] == 4
    assert got[("200", "2015-06-01T00:00:00")] == 1  # numbering restarts per person


def test_run_groups_empty(spark):
    df = spark.createDataFrame([], "emplid string, effdt timestamp, jobcode string")
    out = run_groups(df, ["emplid"], [F.col("effdt")], ["jobcode"])
    assert out.count() == 0


# Affiliate-shaped stint fixture (reference split_entries_into_stints,
# oit_to_edw/affiliate_job.py:111-147): A=active, I=inactive, C=closed.
STINT_ROWS = [
    # (key, seq, status) — stint 1: A,A,I; stint 2: A; C closes; trailing ignored
    ("k1", 1, "A"),
    ("k1", 2, "A"),
    ("k1", 3, "I"),   # terminates stint 1 (belongs to it)
    ("k1", 4, "A"),   # starts stint 2
    ("k1", 5, "C"),   # closed row — consumption stops here
    ("k1", 6, "A"),   # after C: ignored entirely
    ("k2", 1, "I"),   # starts inactive: no stint yet (stint 0)
    ("k2", 2, "A"),   # stint 1
]


def test_split_stints_stop_after_closed(spark):
    df = spark.createDataFrame(STINT_ROWS, ["key", "seq", "status"])
    out = split_stints(
        df, ["key"], [F.col("seq")], "status", active_statuses=["A"],
        closed_status="C",
    )
    got = {(r.key, r.seq): r.stint_id for r in out.collect()}
    assert (("k1", 6)) not in got  # dropped: after the C row
    assert got[("k1", 1)] == 1
    assert got[("k1", 2)] == 1
    assert got[("k1", 3)] == 1  # inactive terminator belongs to stint 1
    assert got[("k1", 4)] == 2
    assert got[("k1", 5)] == 2  # the C row terminates stint 2
    assert got[("k2", 1)] == 0  # before any active row
    assert got[("k2", 2)] == 1


def test_reference_entry_first_c_else_last(spark):
    df = entries_df(spark)
    out = reference_entry(
        df, ["emplid"], [F.col("effdt"), F.col("effseq")], "status",
        preferred_status="C",
    )
    got = {r.emplid: r.effdt.isoformat() for r in out.collect()}
    # emplid 100 has a C row → the FIRST C row wins.
    assert got["100"] == "2013-01-01T00:00:00"
    # emplid 200 has no C row → the LAST row wins.
    assert got["200"] == "2015-06-01T00:00:00"


def test_elect_primary_exactly_one_and_cascade(spark):
    rows = [
        ("p1", 1, "emp", d("2020-01-01")),
        ("p1", 2, "emp", d("2019-01-01")),   # same class, earlier start → wins
        ("p1", 3, "affiliate", d("2010-01-01")),  # lower class loses despite earliest
        ("p2", 4, "affiliate", d("2021-01-01")),  # only job → wins
    ]
    df = spark.createDataFrame(rows, ["person", "job_id", "kind", "start"])
    priority = F.when(F.col("kind") == "emp", 1).otherwise(2)
    out = elect_primary(df, ["person"], priority, [F.col("start"), F.col("job_id")])
    primaries = {r.person: r.job_id for r in out.filter("primary").collect()}
    assert primaries == {"p1": 2, "p2": 4}
    # exactly-one invariant (reference asserts at person.py:455-457)
    counts = out.filter("primary").groupBy("person").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_dedupe_keep_best_prefers_open_and_ors_flags(spark):
    rows = [
        ("a1", 1, d("2020-01-01"), True),    # has end_date, primary
        ("a1", 2, None, False),              # no end_date → preferred row
        ("a2", 3, d("2021-01-01"), False),
    ]
    df = spark.createDataFrame(rows, "assoc string, job int, end_date timestamp, primary boolean")
    out = dedupe_keep_best(
        df, ["assoc"],
        [F.col("end_date").isNull().desc(), F.col("job")],
        or_cols=["primary"],
    )
    got = {r.assoc: (r.job, r.primary) for r in out.collect()}
    # a1 keeps the open row but inherits primary=True from the closed one
    assert got == {"a1": (2, True), "a2": (3, False)}


def test_with_lead_end(spark):
    rows = [("e", 1, d("2020-01-01")), ("e", 2, d("2021-01-01"))]
    df = spark.createDataFrame(rows, ["k", "g", "start"])
    out = with_lead_end(df, ["k"], [F.col("start")], "start")
    got = {r.g: r.next_start for r in out.collect()}
    assert got[1] == d("2021-01-01")
    assert got[2] is None


def test_sessionize_boundary_gap(spark):
    rows = [
        ("u", 1, d("2024-01-01T00:00:00")),
        ("u", 2, d("2024-01-01T00:30:00")),  # exactly 1800s → SAME session
        ("u", 3, d("2024-01-01T01:00:01")),  # 1801s → new session
    ]
    df = spark.createDataFrame(rows, ["u", "i", "ts"])
    out = sessionize(df, ["u"], "ts", 1800)
    got = {r.i: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_latest_per_key_tiebreak(spark):
    rows = [("k", 1, d("2024-01-01")), ("k", 2, d("2024-01-01"))]
    df = spark.createDataFrame(rows, ["k", "i", "ts"])
    out = latest_per_key(df, ["k"], [F.col("ts").desc(), F.col("i").desc()])
    assert [r.i for r in out.collect()] == [2]
