"""Skew-mitigation operators (100 TB posture; SURVEY.md §7.1 step 9).

The reference never meets skew (per-person row groups are tiny), but at
fact scale a handful of hot keys — the org everyone belongs to, the
bot user emitting half the events — dominate one shuffle partition and
stall the stage.  Two standing mitigations, both pure plan rewrites
with bit-identical results:

- **AQE skew-join splitting** is enabled session-wide
  (session.py: ``spark.sql.adaptive.skewJoin.enabled``) and handles
  sort-merge-join skew at runtime with zero code changes.
- **Salting** (here) handles what AQE can't: skewed *aggregations* and
  joins where the build side must be replicated.  Deterministic salts
  only — reproducibility is a correctness feature (SURVEY.md §7.3.1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): a hash of a unique column,
    never ``rand()`` — replays and retries must land rows in the same
    salt bucket or exactly-once sinks break."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_unique_col: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Equi-join a skew-keyed fact table against a small-but-not-tiny dim.

    Facts get a deterministic salt; the dim is replicated ``n_salts``
    times (explode over a salt range) so each (key, salt) bucket joins
    independently — a hot key's rows spread over ``n_salts`` partitions
    instead of one.  Use when the dim is too big to broadcast outright
    but small enough to replicate; otherwise prefer broadcast (true
    dims) or AQE skew-join (fact-fact)."""
    keys = list(on)
    salted_facts = with_salt(facts, fact_unique_col, n_salts)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_facts.join(salted_dim, keys + ["_salt"], how)
    return out.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-tolerant aggregation: partial-aggregate on (keys, salt),
    then final-aggregate on keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max}; these are the reference's whole aggregate
    surface (SURVEY.md §2.4) and all decompose as partial/final pairs.
    Spark's map-side combine already does this for non-skewed data; the
    explicit salt stage guarantees no single reducer sees a whole hot
    key even before AQE kicks in."""
    keys = list(keys)
    partial_exprs, final_exprs = [], []
    for out_col, (in_col, fn) in aggs.items():
        p = f"_p_{out_col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out_col))
        elif fn == "sum":
            partial_exprs.append(F.sum(in_col).alias(p))
            final_exprs.append(F.sum(p).alias(out_col))
        elif fn == "min":
            partial_exprs.append(F.min(in_col).alias(p))
            final_exprs.append(F.min(p).alias(out_col))
        elif fn == "max":
            partial_exprs.append(F.max(in_col).alias(p))
            final_exprs.append(F.max(p).alias(out_col))
        else:  # pragma: no cover
            raise ValueError(f"unsupported agg fn: {fn}")
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
