"""Silver-layer schema contract (SURVEY.md §1.3) and C6 defer-retry
convergence across cycles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from experts_etl_spark.operators import existence_gate
from experts_etl_spark.sources.schemas import SCHEMAS, SchemaMismatch, validated_read
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(SCHEMAS))
def test_every_table_satisfies_declared_schema(spark, name):
    df = validated_read(spark, SF_SMOKE, name)
    assert df.schema == SCHEMAS[name]
    assert df.count() > 0


def test_validated_read_raises_on_missing_column(spark, tmp_path):
    path = str(tmp_path / "bad")
    validated_read(spark, SF_SMOKE, "nation").drop("n_regionkey").write.parquet(path)
    import experts_etl_spark.sources.schemas as S

    orig = S.read_table
    S.read_table = lambda sp, d, n: sp.read.parquet(path)
    try:
        with pytest.raises(SchemaMismatch):
            validated_read(spark, SF_SMOKE, "nation")
    finally:
        S.read_table = orig


def test_defer_retry_converges_when_dependency_arrives(spark):
    """C6: entities whose dependency is missing are deferred (not
    dropped) and pass on a later cycle once the dependency lands
    (transformer_loaders/pure_api_internal_person.py:161-186)."""
    persons = spark.createDataFrame(
        [(1, "o1"), (2, "o2"), (3, "o3")], ["pid", "org"]
    )
    orgs_c1 = spark.createDataFrame([("o1",)], ["org"])
    passed1, deferred1 = existence_gate(persons, orgs_c1, ["org"])
    assert sorted(r.pid for r in passed1.collect()) == [1]
    assert sorted(r.pid for r in deferred1.collect()) == [2, 3]
    # cycle 2: o2 arrives; retry ONLY the deferred set
    orgs_c2 = orgs_c1.union(spark.createDataFrame([("o2",)], ["org"]))
    passed2, deferred2 = existence_gate(deferred1, orgs_c2, ["org"])
    assert sorted(r.pid for r in passed2.collect()) == [2]
    assert sorted(r.pid for r in deferred2.collect()) == [3]
    # no entity is ever lost: passed ∪ deferred is a partition of input
    total = passed1.count() + passed2.count() + deferred2.count()
    assert total == persons.count()
