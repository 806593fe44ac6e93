"""Merged query/oracle registry across all packs.

Import order defines registration; every pack module appends to its own
QUERIES/ORACLES dicts which are merged here for ``__spark_entry__``.
"""

from __future__ import annotations

from experts_etl_spark.llm import queries as llm_queries
from experts_etl_spark.plans import reference_queries

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

for mod in (reference_queries, llm_queries):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
