"""Join / enrichment operators (SURVEY.md §2.3).

The reference does per-row dimension lookups (N+1 point queries, e.g.
oit_to_edw/employee_job.py:55-64) with a quarantine branch on miss.
Spark-first: broadcast left joins — the dimension ships to every
executor once, the fact table never shuffles — plus anti-join
quarantine splits.  At 100 TB the fact side streams through map tasks;
only genuinely small dims are broadcast (caller's responsibility via
``broadcast_dim``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    required_col: str,
    broadcast_dim: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """J1/J2: dimension enrichment with quarantine on miss.

    Returns ``(matched, missing)`` — the reference records a
    UmnDataError and skips the job when the dept has no Pure org
    (oit_to_edw/employee_job.py:118-138).  ``required_col`` is a dim
    column whose null-ness after the left join signals a miss.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    joined = facts.join(d, on=list(on), how="left")
    matched = joined.filter(F.col(required_col).isNotNull())
    missing = joined.filter(F.col(required_col).isNull()).select(*facts.columns)
    return matched, missing


def override_join(
    facts: DataFrame,
    defaults: DataFrame,
    overrides: DataFrame,
    default_on: Sequence[str],
    override_on: Sequence[str],
    value_cols: Sequence[str],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J3: two-level default/override lookup with coalesce.

    Reference checks jobcode defaults then a (jobcode, deptid) override
    table (oit_to_edw/employee_job.py:152-199).  Two broadcast left
    joins; for each value column the override wins when present.
    ``defaults`` and ``overrides`` must carry the value columns named
    ``<col>`` and the overrides' versions are suffixed ``_ovr`` here to
    avoid ambiguity.
    """
    d = F.broadcast(defaults) if broadcast_dims else defaults
    o = overrides
    for c in value_cols:
        o = o.withColumnRenamed(c, f"{c}_ovr")
    o = F.broadcast(o) if broadcast_dims else o
    out = facts.join(d, on=list(default_on), how="left").join(
        o, on=list(override_on), how="left"
    )
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"{c}_ovr"), F.col(c))).drop(
            f"{c}_ovr"
        )
    return out


def existence_gate(
    df: DataFrame, present_in: DataFrame, on: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """J6/J9/C6: referential-integrity gate.

    Returns ``(passed, deferred)``: left-semi join keeps rows whose key
    exists, left-anti produces the deferred set retried next cycle
    (reference skips persons/pubs whose org deps are missing,
    transformer_loaders/pure_api_internal_person.py:161-186,
    pure_api_pub.py:207-225).
    """
    keys = present_in.select(*on).distinct()
    passed = df.join(keys, on=list(on), how="left_semi")
    deferred = df.join(keys, on=list(on), how="left_anti")
    return passed, deferred
