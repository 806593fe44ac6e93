"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_spark_duckdb

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare_spark_duckdb(df, duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "user_id" in df.columns
