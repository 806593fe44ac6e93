"""Window / sequence operators (SURVEY.md §2.5) — the reference's core.

The reference implements these as per-entity Python/pandas loops
(e.g. group_entries at oit_to_edw/employee_job.py:205-231, stint
splitting at oit_to_edw/affiliate_job.py:111-147, primary-job election
at oit_to_edw/person.py:319-459).  Here each one is a single window
specification: one shuffle on the partition key, then JVM-side
whole-stage-codegen'd window evaluation — no per-group materialization,
so the same code runs on 60k rows or 100 TB (partitioned by entity key).

Determinism note (SURVEY.md §7.3): every ordering includes an explicit
unique tie-break column so row_number picks are stable across runs and
engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnsArg = Sequence[str | Column]


def _cols(cols: ColumnsArg) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def latest_per_key(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    rn_col: str = "_rn",
) -> DataFrame:
    """A4/J5: latest record per key.

    Reference does ``order_by(modified desc).first()`` per uuid
    (transformer_loaders/pure_api_internal_person.py:19-27) and a
    correlated max-timestamp subquery per emplid (demographics.py:4-14).
    One window, one shuffle; ``order_by`` must be a total order (include
    a unique tie-break).
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col)
    )


def run_groups(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    change_cols: Sequence[str],
    group_col: str = "group_id",
) -> DataFrame:
    """W2: run-length (consecutive-identical) grouping — gaps-and-islands.

    Reference walks ordered entries per person and opens a new group
    whenever the tuple of ``change_cols`` differs from the previous entry
    (group_entries + entry_matches_last_group,
    oit_to_edw/employee_job.py:205-231; identical in poi_job.py:164-190).

    Spark-first: ``lag`` the change tuple, flag differences (null-safe),
    and running-sum the flags → a dense group id per key, in encounter
    order.  All inside one window partition; no pandas, no loop.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    tup = F.struct(*[F.col(c) for c in change_cols])
    changed = F.when(
        F.lag(tup).over(w).isNull() | ~F.lag(tup).over(w).eqNullSafe(tup),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(group_col, F.sum(changed).over(running))


def sessionize(
    df: DataFrame,
    keys: ColumnsArg,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Sessionization: new session when the gap to the previous event
    exceeds ``gap_seconds``.  Same gaps-and-islands shape as W2 but keyed
    on time distance (the reference's only session-like behavior is W3
    stint splitting; this is the generalized scale operator)."""
    # ``unix_micros`` requires TIMESTAMP; cast defensively so a
    # TIMESTAMP_NTZ source (plain timestamp[us] parquet) still works —
    # a no-op for TIMESTAMP, session-tz (UTC) interpretation for NTZ.
    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(*_cols(keys)).orderBy(F.col(ts_col))
    prev_ts = F.lag(ts).over(w)
    # Exact integer microsecond arithmetic (unix_micros) so the gap
    # comparison is bit-identical across engines — no double rounding.
    gap_us = int(gap_seconds) * 1_000_000
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(running))


def split_stints(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    status_col: str,
    active_statuses: Sequence[str],
    closed_status: str = "C",
    stint_col: str = "stint_id",
    drop_after_closed: bool = True,
    closed_col: str | None = None,
) -> DataFrame:
    """W3: stint splitting (sessionize by status transitions).

    Reference semantics (split_entries_into_stints,
    oit_to_edw/affiliate_job.py:111-147): within a key group ordered by
    effective date, a stint ends at the first inactive-status entry; a
    later active entry starts a new stint; rows after the first
    ``closed_status`` row are ignored entirely.

    Spark-first: a stint starts at an active row whose previous row was
    inactive (or absent) → flag + running sum.  The stop-after-closed rule
    is ``min(row_number where closed)`` per key, then a filter — all
    window expressions, no state machine.

    ``closed_col`` lets the closed marker live in a different column than
    the active state — the reference checks ``entry['status'] in
    active_states`` but ``entry['status_flg'] == 'C'``
    (oit_to_edw/affiliate_job.py:121-141).
    """
    part = _cols(keys)
    w = Window.partitionBy(*part).orderBy(*_cols(order_by))
    wall = Window.partitionBy(*part)

    active = F.col(status_col).isin(list(active_statuses))
    rn = F.row_number().over(w)
    df = df.withColumn("_rn", rn)

    if drop_after_closed:
        df = df.withColumn(
            "_closed_rn",
            F.min(
                F.when(
                    F.col(closed_col or status_col) == closed_status, F.col("_rn")
                )
            ).over(wall),
        )
        df = df.filter(
            F.col("_closed_rn").isNull() | (F.col("_rn") <= F.col("_closed_rn"))
        ).drop("_closed_rn")

    # Recompute neighborhood on the surviving rows.
    w2 = Window.partitionBy(*part).orderBy("_rn")
    prev_active = F.lag(active.cast("int")).over(w2)
    starts = F.when(active & (prev_active.isNull() | (prev_active == 0)), 1).otherwise(0)
    running = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = df.withColumn(stint_col, F.sum(starts).over(running))
    # Inactive rows belong to the stint they terminate (stint_id already
    # carries forward); rows before the first active row get stint 0.
    return df.drop("_rn")


def with_lead_end(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    value_col: str,
    out_col: str = "next_start",
) -> DataFrame:
    """W4: prev/curr/next neighborhood — the next group's start date caps
    the current one's end date (oit_to_edw/employee_job.py:66-73,108-116).
    ``lead`` over the same window the groups were built with."""
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    return df.withColumn(out_col, F.lead(F.col(value_col)).over(w))


def reference_entry(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    status_col: str,
    preferred_status: str = "C",
    rn_col: str = "_rn",
) -> DataFrame:
    """W5: reference-entry selection — within a group take the *first*
    ``preferred_status`` row if any, else the *last* row
    (oit_to_edw/employee_job.py:97-106).

    Encoded as one conditional ordering: preferred rows first (by
    ascending original order), then the rest by descending original
    order; row_number()==1 is the reference entry.
    """
    order = _cols(order_by)
    is_pref = (F.col(status_col) == preferred_status).cast("int")
    # Groups WITH a preferred row take the first preferred row (ascending
    # order); groups WITHOUT take the last row (descending order).
    rn_pref = F.row_number().over(
        Window.partitionBy(*_cols(keys)).orderBy(is_pref.desc(), *[c.asc() for c in order])
    )
    rn_last = F.row_number().over(
        Window.partitionBy(*_cols(keys)).orderBy(*[c.desc() for c in order])
    )
    has_pref = F.max(is_pref).over(Window.partitionBy(*_cols(keys)))
    pick = F.when(has_pref == 1, rn_pref).otherwise(rn_last)
    return df.withColumn(rn_col, pick).filter(F.col(rn_col) == 1).drop(rn_col)


def elect_primary(
    df: DataFrame,
    entity_keys: ColumnsArg,
    priority: Column,
    tie_breakers: ColumnsArg,
    flag_col: str = "primary",
) -> DataFrame:
    """W8: primary election — exactly one row per entity marked primary.

    The reference's 140-line cascading fallback (transform_primary_job,
    oit_to_edw/person.py:319-459) collapses to a single window ordering:
    ``priority`` is a when()-cascade expression encoding the fallback
    levels, tie_breakers pin a total order, row_number()==1 wins.  The
    exactly-one invariant holds by construction (row_number is total).
    """
    w = Window.partitionBy(*_cols(entity_keys)).orderBy(
        priority.asc(), *[c.asc() for c in _cols(tie_breakers)]
    )
    return df.withColumn(flag_col, (F.row_number().over(w) == 1))


def dedupe_keep_best(
    df: DataFrame,
    keys: ColumnsArg,
    order_by: ColumnsArg,
    or_cols: Sequence[str] = (),
) -> DataFrame:
    """W9: dedup by composite business key, keep best row, OR-ing flags.

    Reference collapses jobs sharing ``staff_org_assoc_id`` preferring
    the no-end-date row, OR of ``primary``
    (transform_staff_org_assoc_id, oit_to_edw/person.py:272-317).
    ``or_cols`` are boolean columns whose group-wide OR survives.
    """
    part = Window.partitionBy(*_cols(keys))
    for c in or_cols:
        df = df.withColumn(c, F.max(F.col(c).cast("int")).over(part) == 1)
    w = part.orderBy(*_cols(order_by))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
