"""Parity against the reference's OWN golden fixtures.

The fixture modules under /root/reference/tests carry the reference's
pipeline stages as parallel constants (entries → entry_groups → stints,
SURVEY.md §5.1).  They are imported READ-ONLY at test time — pure data,
never copied into this repo — and our window operators must reproduce
the reference's expected staged outputs exactly:

- ``run_groups`` must partition every employee/poi fixture's ``entries``
  into the fixture's ``entry_groups`` (same membership, same group keys,
  same group order: position_nbr then encounter —
  oit_to_edw/employee_job.py:205-231).
- ``split_stints`` must partition every affiliate fixture's ``entries``
  into the fixture's ``stints`` / ``entry_groups``
  (oit_to_edw/affiliate_job.py:111-170), including the
  stop-after-status_flg='C' rule and inactive-tail retention.

Ordering note: the reference iterates each position's rows in ORIGINAL
list order (its ``sort_values`` result is discarded —
employee_job.py:215), so the parity runs order on an explicit input
index, which for these fixtures coincides with (effdt, effseq).
"""

from __future__ import annotations

import importlib
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from experts_etl_spark.functions import full_name, synthetic_assoc_id
from experts_etl_spark.operators.windows import (
    dedupe_keep_best,
    elect_primary,
    run_groups,
    split_stints,
)

REF_TESTS = "/root/reference/tests"

import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference checkout not present"
)

EMP_POI_FIXTURES = [
    "employee_jobs_0903070",
    "employee_jobs_1217312",
    "employee_jobs_1717940",
    "employee_jobs_1732812",
    "employee_jobs_2110507",
    "employee_jobs_8000397",
    "poi_jobs_2898289",
    "poi_jobs_2927554",
    "poi_jobs_5231388",
    "poi_jobs_5491169",
    "poi_jobs_5575725",
]

AFFILIATE_FIXTURES = [
    "fake357_aff_job_entries",
    "fake531_aff_job_entries",
    "fake531_aff_job_entries_2",
    "fake531_aff_job_entries_3",
]


def load_fixture(name: str):
    sys.path.insert(0, REF_TESTS)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REF_TESTS)


GROUP_KEY = ("position_nbr", "job_entry_dt", "jobcode", "deptid")


@pytest.mark.parametrize("name", EMP_POI_FIXTURES)
def test_run_groups_reproduces_reference_entry_groups(spark, name):
    mod = load_fixture(name)
    entries = mod.entries
    expected_groups = getattr(mod, "entry_groups", None)
    if expected_groups is None:
        pytest.skip(f"{name} has no entry_groups stage")

    idx_of = {id(e): i for i, e in enumerate(entries)}
    expected = [
        (
            tuple(g[k] for k in GROUP_KEY),
            [idx_of[id(e)] for e in g["entries"]],
        )
        for g in expected_groups
    ]

    df = spark.createDataFrame(
        [
            {
                "_idx": i,
                "position_nbr": e["position_nbr"],
                "job_entry_dt": e["job_entry_dt"],
                "jobcode": e["jobcode"],
                "deptid": e["deptid"],
            }
            for i, e in enumerate(entries)
        ]
    )
    out = run_groups(
        df,
        keys=["position_nbr"],
        order_by=["_idx"],
        change_cols=list(GROUP_KEY),
    ).collect()

    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r.position_nbr, r.group_id), []).append(r)
    got = []
    for _, rows in sorted(
        by_group.items(), key=lambda kv: (kv[0][0], min(r._idx for r in kv[1]))
    ):
        rows.sort(key=lambda r: r._idx)
        head = rows[0]
        got.append(
            (
                (head.position_nbr, head.job_entry_dt, head.jobcode, head.deptid),
                [r._idx for r in rows],
            )
        )
    assert got == expected, name


@pytest.mark.parametrize("name", AFFILIATE_FIXTURES)
def test_split_stints_reproduces_reference_stints(spark, name):
    mod = load_fixture(name)
    entries = mod.entries
    expected_stints = getattr(mod, "stints", None)
    if expected_stints is None:
        pytest.skip(f"{name} has no stints stage")

    idx_of = {id(e): i for i, e in enumerate(entries)}
    expected = [[idx_of[id(e)] for e in stint] for stint in expected_stints]

    df = spark.createDataFrame(
        [
            {
                "_idx": i,
                "deptid": e["deptid"],
                "um_affiliate_id": e["um_affiliate_id"],
                "um_affil_relation": e["um_affil_relation"],
                "status": e["status"],
                "status_flg": e["status_flg"],
                "effdt": e["effdt"],
            }
            for i, e in enumerate(entries)
        ]
    )
    out = split_stints(
        df,
        keys=["deptid", "um_affiliate_id", "um_affil_relation"],
        order_by=["_idx"],
        status_col="status",
        active_statuses=["A"],
        closed_status="C",
        closed_col="status_flg",
    ).collect()

    by_stint: dict[int, list] = {}
    for r in out:
        by_stint.setdefault(r.stint_id, []).append(r._idx)
    got = [
        sorted(idxs)
        for _, idxs in sorted(by_stint.items(), key=lambda kv: min(kv[1]))
    ]
    assert got == expected, name

    # The fixture's entry_groups stage restates stints with group keys —
    # check each group's start_date matches the stint head (affiliate
    # group_entries, oit_to_edw/affiliate_job.py:149-170).
    groups = getattr(mod, "entry_groups", None)
    if groups:
        assert [g["start_date"] for g in groups] == [
            entries[s[0]]["effdt"] for s in expected
        ]

# ---------------------------------------------------------------------------
# Person-assembly stages (oit_to_edw/person.py) against the fixture
# constants the reference's own test_person.py asserts.
# ---------------------------------------------------------------------------

ELECTION_FIXTURES = [
    "emp_job_entries_4604830",
    "employee_jobs_2110507",
    "employee_jobs_1217312",
    "emp_job_entries_1082441",
]

JOB_COLS = ("empl_rcdno", "start_date", "end_date", "staff_type", "profiled")


def _jobs_df(spark, jobs):
    return spark.createDataFrame(
        [
            {
                "_idx": i,
                "person": "p1",
                "empl_rcdno": j["empl_rcdno"],
                "start_date": j["start_date"],
                "end_date": j["end_date"],
                "staff_type": j["staff_type"],
                "profiled": j["profiled"],
            }
            for i, j in enumerate(jobs)
        ]
    )


def _election_priority(primary_rcdno: str):
    """The reference's 6-level fallback cascade (transform_primary_job,
    oit_to_edw/person.py:319-459) as ONE window ordering for the
    employee/poi-only case: active+rcdno-match, then active (earliest
    start, lowest rcdno), then inactive+rcdno-match, then inactive —
    every level tie-breaking on REVERSE input order (the reference
    iterates the reversed job list, person.py:364)."""
    active = F.col("end_date").isNull()
    match = F.col("empl_rcdno").rlike(r"^\d$") & (
        F.col("empl_rcdno") == F.lit(primary_rcdno)
    )
    prio = (
        F.when(active & match, 1)
        .when(active, 2)
        .when(~active & match, 3)
        .otherwise(4)
    )
    ties = [
        F.when(prio == 2, F.col("start_date")),
        F.when(prio == 2, F.col("empl_rcdno")),
        -F.col("_idx"),
    ]
    return prio, ties


def _expected_primary_by_idx(jobs, jobs_with_primary):
    """Match each expected output dict back to its input index (the
    reference reorders its output list)."""
    remaining = list(enumerate(jobs))
    flags = {}
    for out in jobs_with_primary:
        stripped = {k: v for k, v in out.items() if k != "primary"}
        for pos, (i, j) in enumerate(remaining):
            if j == stripped:
                flags[i] = out["primary"]
                del remaining[pos]
                break
        else:
            raise AssertionError(f"unmatched expected job: {stripped}")
    return flags


@pytest.mark.parametrize("name", ELECTION_FIXTURES)
def test_elect_primary_reproduces_reference(spark, name):
    mod = load_fixture(name)
    expected = _expected_primary_by_idx(mod.jobs, mod.jobs_with_primary)
    prio, ties = _election_priority("0")
    out = elect_primary(_jobs_df(spark, mod.jobs), ["person"], prio, ties)
    got = {r._idx: r.primary for r in out.collect()}
    assert got == expected, name
    assert sum(got.values()) == 1  # exactly-one-primary invariant


ASSOC_FIXTURES = [
    ("employee_jobs_1217312", "6030"),
    ("employee_jobs_2110507", "3021"),
]


@pytest.mark.parametrize("name,person_id", ASSOC_FIXTURES)
def test_staff_org_assoc_id_reproduces_reference(spark, name, person_id):
    """F5 synthetic id + W9 keep-best dedup vs the reference's
    transform_staff_org_assoc_id expected output (person.py:272-317):
    collapse same-assoc-id jobs preferring the no-end-date row, OR the
    primary flag through."""
    mod = load_fixture(name)
    jobs = mod.jobs_with_primary
    fields = sorted(mod.jobs_with_staff_org_assoc_id[0].keys())
    df = spark.createDataFrame(
        [{**j, "_idx": i} for i, j in enumerate(jobs)]
    ).withColumn(
        "staff_org_assoc_id",
        F.when(
            F.col("org_id").isNotNull()
            & F.col("job_title").isNotNull()
            & F.col("employment_type").isNotNull(),
            synthetic_assoc_id(
                F.lit(person_id),
                F.col("org_id"),
                F.col("job_title"),
                F.col("employment_type"),
                F.date_format("start_date", "yyyy-MM-dd"),
            ),
        ),
    )
    out = dedupe_keep_best(
        df,
        keys=["staff_org_assoc_id"],
        order_by=[F.col("end_date").isNotNull().cast("int"), F.col("_idx")],
        or_cols=["primary"],
    )
    got = {tuple(str(r[f]) for f in fields) for r in out.collect()}
    want = {
        tuple(str(j[f]) for f in fields) for j in mod.jobs_with_staff_org_assoc_id
    }
    assert got == want, name


@pytest.mark.parametrize("name", ["employee_jobs_1217312", "employee_jobs_2110507"])
def test_staff_type_and_profiled_rollups_reproduce_reference(spark, name):
    """transform_staff_type (person.py:461-469: non-academic primary →
    all jobs nonacademic) and transform_profiled (person.py:471-476:
    primary job profiled AND open) as A10-style window rollups."""
    mod = load_fixture(name)
    df = _jobs_df(spark, mod.jobs_with_primary).withColumn(
        "primary",
        F.lit(None).cast("boolean"),
    )
    df = spark.createDataFrame(
        [
            {"_idx": i, "person": "p1", **{k: j[k] for k in (*JOB_COLS, "primary")}}
            for i, j in enumerate(mod.jobs_with_primary)
        ]
    )
    person_w = Window.partitionBy("person")
    primary_staff = F.max(F.when(F.col("primary"), F.col("staff_type"))).over(person_w)
    out = df.withColumn(
        "staff_type_out",
        F.when(primary_staff == "academic", F.col("staff_type")).otherwise(
            F.lit("nonacademic")
        ),
    ).withColumn(
        "profiled_out",
        F.max(
            F.when(
                F.col("primary") & F.col("profiled") & F.col("end_date").isNull(), 1
            ).otherwise(0)
        ).over(person_w)
        == 1,
    )
    rows = {r._idx: r for r in out.collect()}
    for i, j in enumerate(mod.jobs_with_transformed_staff_type):
        assert rows[i].staff_type_out == j["staff_type"], name
    assert all(r.profiled_out == mod.transformed_profiled for r in rows.values())


def test_scalar_transforms_reproduce_reference(spark):
    """transform_first_name / transform_person_id expected values from
    the reference's test_person.py:31-46."""
    df = spark.createDataFrame(
        [
            ("Alex", "J", "5150075", "8185"),
            ("Alex", " ", "5150075", "5150075"),
            ("Alex", None, "5150075", None),
        ],
        ["first", "middle", "emplid", "scival_id"],
    ).select(
        full_name(F.col("first"), F.col("middle")).alias("name"),
        F.coalesce(F.col("scival_id"), F.col("emplid")).alias("person_id"),
    )
    assert [(r.name, r.person_id) for r in df.collect()] == [
        ("Alex J", "8185"),
        ("Alex", "5150075"),
        ("Alex", "5150075"),
    ]


# ---------------------------------------------------------------------------
# Byte-parity with the reference's REAL person.xml.j2 template: the
# native-column renderer must produce the exact bytes Jinja2 produces
# from the template file (read-only) for a matrix covering every
# conditional branch — resurrecting the reference's skipped golden-XML
# test (test_person.py:178-248) against live template behavior.
# ---------------------------------------------------------------------------

import datetime

PERSON_MATRIX = [
    # (postnominal, internet_id, jobs: [(email, end_date, primary)])
    (None, "mbezada", [("m@umn.edu", None, True)]),
    (None, None, [(None, datetime.datetime(2012, 3, 4), False)]),
    ("Ph.D. & <Hon>", "o'brien", []),
    (
        "MD",
        "x",
        [
            ("a@umn.edu", datetime.datetime(2011, 1, 2), True),
            (None, None, False),
        ],
    ),
]


def _person_dict(i, postnominal, internet_id, jobspec):
    return {
        "person_id": f"p{i}",
        "first_name": 'Max & "Co"',
        "last_name": "Bezada<X>",
        "postnominal": postnominal,
        "emplid": f"500{i}",
        "internet_id": internet_id,
        "visibility": "Public" if i % 2 else "Restricted",
        "profiled": bool(i % 2),
        "jobs": [
            {
                "staff_org_association_id": f"autoid:{i}-{k}",
                "affiliation_id": "9403",
                "email_address": email,
                "employment_type": "faculty",
                "primary_association": primary,
                "org_id": "IHRB'Q",
                "period_start_date": datetime.datetime(2014, 8, 29),
                "period_end_date": end,
                "staff_type": "academic",
                "job_description": 'Assistant "Prof" <i>',
            }
            for k, (email, end, primary) in enumerate(jobspec)
        ],
    }


def test_pure_person_xml_byte_parity_with_reference_template(spark):
    import jinja2

    from experts_etl_spark.plans.xml_sync import pure_person_xml

    src = open("/root/reference/experts_etl/templates/person.xml.j2").read()
    env = jinja2.Environment(
        autoescape=jinja2.select_autoescape(["html", "xml"])
    )
    tmpl = env.from_string(src)

    persons = [
        _person_dict(i, *spec) for i, spec in enumerate(PERSON_MATRIX)
    ]
    expected = {p["person_id"]: tmpl.render(**p) for p in persons}

    from pyspark.sql import types as T

    job_t = T.StructType(
        [
            T.StructField("staff_org_association_id", T.StringType()),
            T.StructField("affiliation_id", T.StringType()),
            T.StructField("email_address", T.StringType()),
            T.StructField("employment_type", T.StringType()),
            T.StructField("primary_association", T.BooleanType()),
            T.StructField("org_id", T.StringType()),
            T.StructField("period_start_date", T.TimestampType()),
            T.StructField("period_end_date", T.TimestampType()),
            T.StructField("staff_type", T.StringType()),
            T.StructField("job_description", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("person_id", T.StringType()),
            T.StructField("first_name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("postnominal", T.StringType()),
            T.StructField("emplid", T.StringType()),
            T.StructField("internet_id", T.StringType()),
            T.StructField("visibility", T.StringType()),
            T.StructField("profiled", T.BooleanType()),
            T.StructField("jobs", T.ArrayType(job_t)),
        ]
    )
    df = spark.createDataFrame(persons, schema)
    out = df.select(
        "person_id",
        pure_person_xml(
            F.col("person_id"),
            F.col("first_name"),
            F.col("last_name"),
            F.col("postnominal"),
            F.col("emplid"),
            F.col("internet_id"),
            F.col("visibility"),
            F.col("profiled"),
            F.col("jobs"),
        ).alias("xml"),
    )
    got = {r.person_id: r.xml for r in out.collect()}
    assert got == expected


def test_multi_format_ts_reproduces_reference_transformers(spark):
    """The reference's tests/test_transformers.py expectations: ISO-8601
    with millis+offset, %Y-%m-%d, %Y-%m, %Y (transformers.py:8-29);
    unknown format raises there — here it yields NULL for the quarantine
    branch (set-at-a-time error semantics, SURVEY §2.11)."""
    from experts_etl_spark.functions import multi_format_ts

    rows = [
        ("2018-07-13T06:00:04.110+0000", datetime.datetime(2018, 7, 13, 6, 0, 4, 110000)),
        ("2018-07-13", datetime.datetime(2018, 7, 13)),
        ("2018-07", datetime.datetime(2018, 7, 1)),
        ("2018", datetime.datetime(2018, 1, 1)),
        ("bogus", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], ["s"])
    got = {
        r.s: r.ts
        for r in df.select("s", multi_format_ts(F.col("s")).alias("ts")).collect()
    }
    assert got == {s: exp for s, exp in rows}


def test_pure_user_xml_byte_parity_with_reference_template(spark):
    import jinja2

    from experts_etl_spark.plans.xml_sync import pure_user_xml

    src = open("/root/reference/experts_etl/templates/user.xml.j2").read()
    env = jinja2.Environment(autoescape=jinja2.select_autoescape(["html", "xml"]))
    tmpl = env.from_string(src)
    users = [
        {
            "person_id": "8185",
            "user_name": "o'brien",
            "email": "a&b@x",
            "first_name": "M<",
            "last_name": 'B>"',
        },
        {
            "person_id": "2",
            "user_name": "plain",
            "email": "p@umn.edu",
            "first_name": "A",
            "last_name": "B",
        },
    ]
    expected = {u["person_id"]: tmpl.render(**u) for u in users}
    df = spark.createDataFrame(users)
    out = df.select(
        "person_id",
        pure_user_xml(
            F.col("person_id"),
            F.col("user_name"),
            F.col("email"),
            F.col("first_name"),
            F.col("last_name"),
        ).alias("xml"),
    )
    assert {r.person_id: r.xml for r in out.collect()} == expected


def _org_dict(i, full):
    tv = lambda t, v: {"type": t, "value": v}
    return {
        "organisation_id": f"ORG<{i}>",
        "type": "department & co",
        "name": 'Physics "Dept"',
        "start_date": datetime.datetime(2001, 2, 3),
        "end_date": datetime.datetime(2010, 11, 12) if full else None,
        "visibility": "Public",
        "parent_organisation_id": "P&1" if full else None,
        "name_variants": [tv("acronym", "PHY<")] if full else [],
        "profile_infos": [tv("bio", "raw <b>html</b> & 'stuff'")] if full else [],
        "photos": [tv("logo", "http://x/y.png")] if full else [],
        "phone_numbers": [tv("main", "+1 555"), tv("fax", "+2")] if full else [],
        "emails": [tv("office", "a@b.c")] if full else [],
        "web_addresses": [tv("home", "http://z?a=1&b=2")] if full else [],
        "addresses": [
            {
                "type": "postal",
                "city": "Mpls",
                "postalcode": None,
                "street": "1 St & Ave",
                "building": "",
                "country": "US",
                "subdivision": None,
                "geospatial_point": None,
            },
            # complement of the first: every optional address field is
            # exercised both present and absent across the pair
            {
                "type": "visiting",
                "city": None,
                "postalcode": "55455",
                "street": None,
                "building": None,
                "country": None,
                "subdivision": "MN",
                "geospatial_point": "44.97;-93.23",
            },
        ]
        if full
        else [],
        "ids": [tv("dept", "654A")] if full else [],
    }


def test_pure_organisation_xml_byte_parity_with_reference_template(spark):
    import jinja2

    from pyspark.sql import types as T

    from experts_etl_spark.plans.xml_sync import pure_organisation_xml

    src = open(
        "/root/reference/experts_etl/templates/organisation.xml.j2"
    ).read()
    env = jinja2.Environment(autoescape=jinja2.select_autoescape(["html", "xml"]))
    tmpl = env.from_string(src)

    orgs = [_org_dict(0, True), _org_dict(1, False)]
    expected = {o["organisation_id"]: tmpl.render(**o) for o in orgs}

    tv_t = T.ArrayType(
        T.StructType(
            [T.StructField("type", T.StringType()), T.StructField("value", T.StringType())]
        )
    )
    addr_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("type", T.StringType()),
                T.StructField("city", T.StringType()),
                T.StructField("postalcode", T.StringType()),
                T.StructField("street", T.StringType()),
                T.StructField("building", T.StringType()),
                T.StructField("country", T.StringType()),
                T.StructField("subdivision", T.StringType()),
                T.StructField("geospatial_point", T.StringType()),
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("organisation_id", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("start_date", T.TimestampType()),
            T.StructField("end_date", T.TimestampType()),
            T.StructField("visibility", T.StringType()),
            T.StructField("parent_organisation_id", T.StringType()),
            T.StructField("name_variants", tv_t),
            T.StructField("profile_infos", tv_t),
            T.StructField("photos", tv_t),
            T.StructField("phone_numbers", tv_t),
            T.StructField("emails", tv_t),
            T.StructField("web_addresses", tv_t),
            T.StructField("addresses", addr_t),
            T.StructField("ids", tv_t),
        ]
    )
    df = spark.createDataFrame(orgs, schema)
    out = df.select(
        "organisation_id",
        pure_organisation_xml(
            F.col("organisation_id"),
            F.col("type"),
            F.col("name"),
            F.col("start_date"),
            F.col("end_date"),
            F.col("visibility"),
            F.col("parent_organisation_id"),
            F.col("name_variants"),
            F.col("profile_infos"),
            F.col("photos"),
            F.col("phone_numbers"),
            F.col("emails"),
            F.col("web_addresses"),
            F.col("addresses"),
            F.col("ids"),
        ).alias("xml"),
    )
    assert {r.organisation_id: r.xml for r in out.collect()} == expected


# ---------------------------------------------------------------------------
# Full entries → jobs parity (transform_entry_groups): the reference's
# test_transform equivalents, with the Oracle dim tables reverse-derived
# from the fixtures' own expected jobs (dept→org and jobcode defaults
# are uniquely determined by them).
# ---------------------------------------------------------------------------

from pyspark.sql import types as T

EMP_JOBS_FIXTURES = [
    "emp_job_entries_4604830",
    "emp_job_entries_1082441",
    "emp_job_entries_3262322",
    "emp_job_entries_5150075",
    "employee_jobs_1217312",
    "employee_jobs_1732812",
    "employee_jobs_0903070",
    "employee_jobs_2110507",
    "employee_jobs_8000397",
]

POI_JOBS_FIXTURES = [
    "poi_jobs_2898289",
    "poi_jobs_2927554",
    "poi_jobs_5231388",
    "poi_jobs_5491169",
    "poi_jobs_5575725",
]

_ENTRY_T = T.StructType(
    [
        T.StructField("_idx", T.LongType()),
        T.StructField("emplid", T.StringType()),
        T.StructField("empl_rcdno", T.StringType()),
        T.StructField("effdt", T.TimestampType()),
        T.StructField("effseq", T.StringType()),
        T.StructField("position_nbr", T.StringType()),
        T.StructField("jobcode", T.StringType()),
        T.StructField("jobcode_descr", T.StringType()),
        T.StructField("empl_status", T.StringType()),
        T.StructField("deptid", T.StringType()),
        T.StructField("um_campus", T.StringType()),
        T.StructField("status_flg", T.StringType()),
        T.StructField("last_date_worked", T.TimestampType()),
        T.StructField("job_entry_dt", T.TimestampType()),
    ]
)

_DEFAULTS_T = T.StructType(
    [
        T.StructField("jobcode", T.StringType()),
        T.StructField("pure_job_description", T.StringType()),
        T.StructField("default_employed_as", T.StringType()),
        T.StructField("default_staff_type", T.StringType()),
        T.StructField("default_visibility", T.StringType()),
        T.StructField("default_profiled", T.BooleanType()),
    ]
)

JOB_FIELDS = (
    "affiliation_id deptid um_campus org_id empl_rcdno job_title "
    "job_description employment_type staff_type start_date end_date "
    "visibility profiled"
).split()

AFF_JOB_FIELDS = [f for f in JOB_FIELDS if f != "empl_rcdno"]


def _dims_from_jobs(spark, jobs, affiliate=False):
    dept_org = {}
    defaults: dict[str, dict] = {}
    for j in jobs:
        dept_org[j["deptid"]] = j["org_id"]
        d = defaults.setdefault(
            j["affiliation_id"],
            {
                "jobcode": j["affiliation_id"],
                "pure_job_description": j["job_description"],
                "default_employed_as": j["employment_type"],
                "default_staff_type": "nonacademic",
                "default_visibility": "Restricted",
                "default_profiled": False,
            },
        )
        if affiliate or j["end_date"] is None:
            d["default_staff_type"] = j["staff_type"]
            d["default_profiled"] = j["profiled"]
            if affiliate or j["um_campus"] in ("TXXX", "DXXX"):
                d["default_visibility"] = j["visibility"]
    dept_df = spark.createDataFrame(
        [(k, v) for k, v in dept_org.items()], ["deptid", "org_id"]
    )
    def_df = spark.createDataFrame(list(defaults.values()), _DEFAULTS_T)
    return dept_df, def_df


def _compare_jobs(got_rows, expected_jobs, fields):
    norm = lambda v: v if v is not None else None
    got = sorted(
        tuple(repr(norm(r[f])) for f in fields) for r in got_rows
    )
    want = sorted(
        tuple(repr(norm(j.get(f))) for f in fields) for j in expected_jobs
    )
    assert got == want


@pytest.mark.parametrize("name", EMP_JOBS_FIXTURES)
def test_employee_jobs_pipeline_reproduces_reference(spark, name):
    from experts_etl_spark.plans.jobs_pipeline import employee_jobs

    mod = load_fixture(name)
    rows = [
        (
            i,
            e["emplid"],
            e["empl_rcdno"],
            e["effdt"],
            str(e["effseq"]),
            e["position_nbr"],
            e["jobcode"],
            e["jobcode_descr"],
            e["empl_status"],
            e["deptid"],
            e["um_campus"],
            e["status_flg"],
            e.get("last_date_worked"),
            e["job_entry_dt"],
        )
        for i, e in enumerate(mod.entries)
    ]
    entries = spark.createDataFrame(rows, _ENTRY_T)
    dept_df, def_df = _dims_from_jobs(spark, mod.jobs)
    jobs, quarantine = employee_jobs(entries, dept_df, def_df, order_by=["_idx"])
    _compare_jobs(jobs.collect(), mod.jobs, JOB_FIELDS)
    assert quarantine.count() == 0


@pytest.mark.parametrize("name", POI_JOBS_FIXTURES)
def test_poi_jobs_pipeline_reproduces_reference(spark, name):
    from experts_etl_spark.plans.jobs_pipeline import poi_jobs

    mod = load_fixture(name)
    rows = [
        (
            i,
            e["emplid"],
            e["empl_rcdno"],
            e["effdt"],
            str(e["effseq"]),
            e["position_nbr"],
            e["jobcode"],
            e["jobcode_descr"],
            e["empl_status"],
            e["deptid"],
            e["um_campus"],
            e["status_flg"],
            None,
            e["job_entry_dt"],
        )
        for i, e in enumerate(mod.entries)
    ]
    entries = spark.createDataFrame(rows, _ENTRY_T)
    dept_df, def_df = _dims_from_jobs(spark, mod.jobs)
    jobs, quarantine = poi_jobs(entries, dept_df, def_df, order_by=["_idx"])
    _compare_jobs(jobs.collect(), mod.jobs, JOB_FIELDS)
    assert quarantine.count() == 0


_AFF_ENTRY_T = T.StructType(
    [
        T.StructField("_idx", T.LongType()),
        T.StructField("emplid", T.StringType()),
        T.StructField("deptid", T.StringType()),
        T.StructField("um_campus", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("um_affiliate_id", T.StringType()),
        T.StructField("um_affil_relation", T.StringType()),
        T.StructField("effdt", T.TimestampType()),
        T.StructField("status", T.StringType()),
        T.StructField("status_flg", T.StringType()),
    ]
)


@pytest.mark.parametrize("name", AFFILIATE_FIXTURES)
def test_affiliate_jobs_pipeline_reproduces_reference(spark, name):
    from experts_etl_spark.plans.jobs_pipeline import affiliate_jobs

    mod = load_fixture(name)
    if not hasattr(mod, "jobs"):
        pytest.skip(f"{name} has no jobs stage")
    rows = [
        (
            i,
            e["emplid"],
            e["deptid"],
            e["um_campus"],
            e["title"],
            e["um_affiliate_id"],
            e["um_affil_relation"],
            e["effdt"],
            e["status"],
            e["status_flg"],
        )
        for i, e in enumerate(mod.entries)
    ]
    entries = spark.createDataFrame(rows, _AFF_ENTRY_T)
    dept_df, def_df = _dims_from_jobs(spark, mod.jobs, affiliate=True)
    jobs, quarantine = affiliate_jobs(entries, dept_df, def_df, order_by=["_idx"])
    _compare_jobs(jobs.collect(), mod.jobs, AFF_JOB_FIELDS)
    assert quarantine.count() == 0


def test_employee_jobs_unknown_dept_quarantined(spark):
    """J1 null branch: a reference entry whose deptid is missing from the
    dept→org dim produces NO job and ONE quarantine row
    (record_unknown_dept_errors, employee_job.py:118-138)."""
    from experts_etl_spark.plans.jobs_pipeline import employee_jobs

    mod = load_fixture("employee_jobs_1217312")
    rows = [
        (
            i, e["emplid"], e["empl_rcdno"], e["effdt"], str(e["effseq"]),
            e["position_nbr"], e["jobcode"], e["jobcode_descr"],
            e["empl_status"], e["deptid"], e["um_campus"], e["status_flg"],
            e.get("last_date_worked"), e["job_entry_dt"],
        )
        for i, e in enumerate(mod.entries)
    ]
    entries = spark.createDataFrame(rows, _ENTRY_T)
    dept_df, def_df = _dims_from_jobs(spark, mod.jobs)
    empty_dept = dept_df.filter(F.lit(False))
    jobs, quarantine = employee_jobs(entries, empty_dept, def_df, order_by=["_idx"])
    assert jobs.count() == 0
    q = quarantine.collect()
    assert len(q) == len(mod.jobs)  # one per would-be job
    assert {r.deptid for r in q} == {j["deptid"] for j in mod.jobs}
    assert all(r.emplid == mod.entries[0]["emplid"] for r in q)


def test_employee_jobs_profiled_override_chain(spark):
    """J3 override chain (employee_job.py:160-199): overrideable jobcode
    + known pair + override row → overridden profiled; known pair, no
    override → default; UNKNOWN pair → default kept but quarantined;
    closed jobs never profiled."""
    from experts_etl_spark.plans.jobs_pipeline import employee_jobs

    import datetime as dt

    def entry(i, dept, status_flg="C", empl_status="A"):
        return (
            i, "e1", "0", dt.datetime(2020, 1, 1 + i), "0", f"P{i}", "JX",
            "Job X", empl_status, dept, "TXXX", status_flg, None,
            dt.datetime(2020, 1, 1 + i),
        )

    entries = spark.createDataFrame(
        [entry(0, "D1"), entry(1, "D2"), entry(2, "D3")], _ENTRY_T
    )
    dept_df = spark.createDataFrame(
        [("D1", "O1"), ("D2", "O2"), ("D3", "O3")], ["deptid", "org_id"]
    )
    def_df = spark.createDataFrame(
        [("JX", "Desc", "ET", "academic", "Public", True, True)],
        "jobcode string, pure_job_description string, default_employed_as string,"
        " default_staff_type string, default_visibility string,"
        " default_profiled boolean, default_profiled_overrideable boolean",
    )
    known = spark.createDataFrame([("JX", "D1"), ("JX", "D2")], ["jobcode", "deptid"])
    overrides = spark.createDataFrame(
        [("JX", "D1", False)], ["jobcode", "deptid", "profiled"]
    )
    jobs, quarantine = employee_jobs(
        entries, dept_df, def_df, order_by=["_idx"],
        known_override_pairs=known, profiled_overrides=overrides,
    )
    got = {r.deptid: r.profiled for r in jobs.collect()}
    assert got == {"D1": False, "D2": True, "D3": True}
    q = quarantine.collect()
    assert len(q) == 1 and q[0].deptid == "D3" and q[0].jobcode == "JX"


# ---------------------------------------------------------------------------
# Template branch coverage (VERDICT r3 item 8): every conditional and
# loop in the reference's OWN Jinja templates must be exercised BOTH
# ways by the byte-parity matrices above — "zero unreachable template
# branches".  Conditions are read from the template source, so a
# template change that adds a branch fails this test until the matrix
# covers it.
# ---------------------------------------------------------------------------

import re as _re

TEMPLATES = "/root/reference/experts_etl/templates"


def _conditions(src: str) -> list[str]:
    return [
        c
        for c in _re.findall(r"\{%-?\s*if\s+(.+?)\s*%\}", src)
        if not c.startswith("else")
    ]


def _loops(src: str) -> list[str]:
    return _re.findall(r"\{%-?\s*for\s+\w+\s+in\s+(\w+)\s*%\}", src)


def _assert_both_ways(src: str, contexts_for):
    import jinja2

    env = jinja2.Environment()
    uncovered = []
    for cond in _conditions(src):
        expr = env.compile_expression(cond, undefined_to_none=True)
        seen = {bool(expr(**ctx)) for ctx in contexts_for(cond)}
        if seen != {True, False}:
            uncovered.append((cond, seen))
    for lst in _loops(src):
        sizes = {
            len(ctx[lst]) > 0
            for ctx in contexts_for(lst)
            if lst in ctx
        }
        if sizes != {True, False}:
            uncovered.append((f"for-in {lst}", sizes))
    assert not uncovered, uncovered


def test_person_template_branches_fully_covered():
    src = open(f"{TEMPLATES}/person.xml.j2").read()
    persons = [_person_dict(i, *spec) for i, spec in enumerate(PERSON_MATRIX)]

    def contexts_for(cond):
        if "job." in cond or cond == "jobs":
            if cond == "jobs":
                return persons
            return [{"job": j} for p in persons for j in p["jobs"]]
        return persons

    _assert_both_ways(src, contexts_for)


def test_user_template_has_no_branches():
    """Pins the claim that user.xml.j2 is branch-free (any future branch
    must be added to a coverage matrix)."""
    src = open(f"{TEMPLATES}/user.xml.j2").read()
    assert _conditions(src) == [] and _loops(src) == []


def test_organisation_template_branches_fully_covered():
    src = open(f"{TEMPLATES}/organisation.xml.j2").read()
    orgs = [_org_dict(0, True), _org_dict(1, False)]

    def contexts_for(cond):
        if "address." in cond:
            return [{"address": a} for o in orgs for a in o["addresses"]]
        return orgs  # top-level conditions (|length, end_date, parent)

    _assert_both_ways(src, contexts_for)
