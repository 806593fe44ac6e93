"""Shared Spark-vs-DuckDB comparison mimicking the driver's check:
row count + column-name-sorted, order-insensitive value comparison."""

from __future__ import annotations

import math
from datetime import datetime


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:  # pragma: no cover
        pass
    return v


def rows_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(repr(_norm(r[i])) for i in idx) for r in rows
    )
    return [c for _, c in sorted(enumerate(cols), key=lambda t: t[1])], out


def compare_spark_duckdb(spark_df, duck_con, sql):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"schema: {s_cols} vs {d_cols}"
    _, s_ms = rows_multiset(s_cols, s_rows)
    _, d_ms = rows_multiset(d_cols, d_rows)
    assert len(s_ms) == len(d_ms), f"rowcount: {len(s_ms)} vs {len(d_ms)}"
    mismatches = [
        (a, b) for a, b in zip(s_ms, d_ms) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"
