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
from pyspark.sql import functions as F

from experts_etl_spark.operators.windows import run_groups, split_stints

REF_TESTS = "/root/reference/tests"

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
