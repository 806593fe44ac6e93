"""Snapshot-diff operators (SURVEY.md §2.6, X1/X2, M3).

The reference delegates these to Oracle MINUS statements
(oit_to_edw/person.py:129-186).  Spark-first: ``exceptAll`` / left-anti
joins, which Catalyst plans as hash-aggregate or broadcast-anti
depending on size; the latest-history side reuses the
``latest_per_key`` window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from experts_etl_spark.operators.windows import latest_per_key


def snapshot_diff_keys(
    current: DataFrame, history: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """X1: new keys = current keys MINUS history keys
    (pure_eligible_person MINUS ..._chng_hst, oit_to_edw/person.py:129-140).

    A left-anti join rather than ``except`` so the full current row
    survives (the reference re-selects it afterwards anyway).
    """
    return current.join(
        history.select(*keys).distinct(), on=list(keys), how="left_anti"
    )


def snapshot_diff_rows(
    current: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    history_order: Sequence,
    compare_cols: Sequence[str],
) -> DataFrame:
    """X2: changed-or-new rows = current full-row tuples MINUS the
    latest-timestamp history row per key (oit_to_edw/person.py:142-186,
    an Oracle MINUS against a correlated max-subquery).

    ``latest_per_key`` (window, ordered by ``history_order`` — a total
    order, e.g. timestamp desc + unique id desc) replaces the correlated
    subquery; the MINUS is a null-safe LEFT ANTI join on
    (keys ∪ compare_cols) — NULLs compare equal, exactly like SQL
    EXCEPT.  Precondition: ``current`` is a keyed snapshot (≤1 row per
    key), which makes anti-join ≡ EXCEPT and lets the plan reference
    ``current`` exactly once (the exceptAll + semi-join-back formulation
    scans the current side twice).
    """
    latest_hist = latest_per_key(
        history, keys, history_order
    ).select(
        *[F.col(k).alias(f"_h_{k}") for k in keys],
        *[F.col(c).alias(f"_h_{c}") for c in compare_cols],
    )
    cond = None
    for c in [*keys, *compare_cols]:
        clause = F.col(c).eqNullSafe(F.col(f"_h_{c}"))
        cond = clause if cond is None else (cond & clause)
    return current.join(latest_hist, cond, "left_anti")


def history_append(
    changed: DataFrame, cols: Sequence[str], ts_col: str = "timestamp"
) -> DataFrame:
    """M3: stamp changed rows for append into the ``_chng_hst`` table
    (oit_to_edw/person.py:137-140,187-206).  The write itself is
    ``.write.mode('append')`` — this returns the stamped DataFrame."""
    return changed.select(*cols).withColumn(ts_col, F.current_timestamp())
