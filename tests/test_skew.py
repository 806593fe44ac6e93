"""Skew operators: salted plans must be value-identical to naive plans,
and salts must be deterministic (SURVEY.md §7.3.1 reproducibility)."""

from __future__ import annotations

from pyspark.sql import functions as F

from experts_etl_spark.operators import salted_join, two_stage_agg, with_salt
from experts_etl_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_with_salt_deterministic(spark):
    ev = read_table(spark, SF_SMOKE, "events").limit(100)
    a = {(r.event_id, r._salt) for r in with_salt(ev, "event_id", 8).collect()}
    b = {(r.event_id, r._salt) for r in with_salt(ev, "event_id", 8).collect()}
    assert a == b
    assert {s for _, s in a} <= set(range(8))


def test_two_stage_agg_equals_naive(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    naive = {
        (r.event_type, r.n, r.mx)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("mx"))
        .collect()
    }
    salted = two_stage_agg(
        ev,
        ["event_type"],
        {"n": ("event_id", "count"), "mx": ("ts", "max")},
        unique_col="event_id",
    )
    got = {(r.event_type, r.n, r.mx) for r in salted.collect()}
    assert got == naive


def test_salted_join_equals_plain_join(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)], ["event_type", "weight"]
    )
    plain = {
        (r.event_id, r.weight)
        for r in ev.join(dim, "event_type", "left").select("event_id", "weight").collect()
    }
    salted = salted_join(ev, dim, ["event_type"], "event_id", n_salts=4, how="left")
    got = {(r.event_id, r.weight) for r in salted.select("event_id", "weight").collect()}
    assert got == plain
