"""Runner DAG ordering (SURVEY.md §3.1) and C1 bookmark persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from experts_etl_spark.plans.runner import CycleError, Module, run_modules, topo_order
from experts_etl_spark.sources import read_table
from experts_etl_spark.sources.bookmarks import read_bookmark, write_bookmark
from tests.conftest import SF_SMOKE


def _mods():
    """orgs → persons → pubs, mirroring the reference's hand-encoded
    module order (runner.py:15-36)."""

    def orgs(spark, ds):
        return {"orgs": ds["raw_orgs"].filter(F.col("n_regionkey") < 3)}

    def persons(spark, ds):
        c = ds["raw_persons"]
        o = ds["orgs"]
        return {
            "persons": c.join(
                F.broadcast(o), c.c_nationkey == o.n_nationkey, "left_semi"
            )
        }

    def pubs(spark, ds):
        p = ds["raw_pubs"]
        keep = ds["persons"].select(F.col("c_custkey").alias("o_custkey"))
        return {"pubs": p.join(keep, "o_custkey", "left_semi")}

    return [
        Module("pubs", ["raw_pubs", "persons"], ["pubs"], pubs),
        Module("persons", ["raw_persons", "orgs"], ["persons"], persons),
        Module("orgs", ["raw_orgs"], ["orgs"], orgs),
    ]


def test_topo_order_respects_dataset_dependencies(spark):
    order = [m.name for m in topo_order(_mods())]
    assert order.index("orgs") < order.index("persons") < order.index("pubs")


def test_run_modules_end_to_end(spark):
    ds = run_modules(
        spark,
        _mods(),
        sources={
            "raw_orgs": read_table(spark, SF_SMOKE, "nation"),
            "raw_persons": read_table(spark, SF_SMOKE, "customer"),
            "raw_pubs": read_table(spark, SF_SMOKE, "orders"),
        },
    )
    assert set(ds) >= {"orgs", "persons", "pubs"}
    # every pub's owner survived the person gate, every person's org the org gate
    assert ds["pubs"].count() > 0
    owners = {r.o_custkey for r in ds["pubs"].select("o_custkey").distinct().collect()}
    persons = {r.c_custkey for r in ds["persons"].select("c_custkey").collect()}
    assert owners <= persons


def test_topo_order_detects_cycles():
    def noop(spark, ds):
        return {}

    mods = [
        Module("a", ["y"], ["x"], noop),
        Module("b", ["x"], ["y"], noop),
    ]
    with pytest.raises(CycleError):
        topo_order(mods)


def test_bookmark_roundtrip_cold_start_and_advance(spark, tmp_path):
    path = str(tmp_path / "bookmarks")
    assert read_bookmark(spark, path, "changes") is None  # cold start
    ev = read_table(spark, SF_SMOKE, "events")
    write_bookmark(ev, "ts", path, "changes")
    wm = read_bookmark(spark, path, "changes")
    assert wm == ev.agg(F.max("ts")).first()[0]
    # a second pipeline's bookmark doesn't clobber the first
    write_bookmark(ev.limit(10), "ts", path, "other")
    assert read_bookmark(spark, path, "changes") == wm
    assert read_bookmark(spark, path, "other") is not None


def test_bookmark_never_regresses(spark, tmp_path):
    """An empty batch (max=NULL) or a stale replay must not move the
    stored watermark backwards — otherwise the next cycle cold-starts
    and duplicates rows through append-mode sinks."""
    path = str(tmp_path / "bookmarks")
    ev = read_table(spark, SF_SMOKE, "events")
    write_bookmark(ev, "ts", path, "changes")
    wm = read_bookmark(spark, path, "changes")
    # empty batch: watermark unchanged, not NULL
    write_bookmark(ev.filter(F.lit(False)), "ts", path, "changes")
    assert read_bookmark(spark, path, "changes") == wm
    # stale replay: an old batch's smaller max is ignored
    stale = ev.filter(F.col("ts") < F.lit(wm))
    write_bookmark(stale, "ts", path, "changes")
    assert read_bookmark(spark, path, "changes") == wm
