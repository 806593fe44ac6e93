"""Timestamp-type portability matrix (VERDICT r3 item 10).

At 100 TB you don't choose your producers' parquet logical types: the
same ``events`` table may arrive as TIMESTAMP(NANOS), plain
``timestamp[us]`` (Spark 4: TIMESTAMP_NTZ), or tz-aware microseconds.
Every ts-consuming operator must accept all three and produce identical
results.  This pins the class of failure that broke round 3 (the driver
regenerated events.parquet as timestamp[us] and sessionize + every
streaming watermark rejected it).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from experts_etl_spark.operators.windows import sessionize
from experts_etl_spark.sources import read_table
from experts_etl_spark.streaming.incremental import (
    stream_events,
    windowed_counts_frame,
)

ENCODINGS = {
    "nanos_ntz": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}

# Two users; user 1 has a >30 min gap → 2 sessions; user 2 has 1.
_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
_ROWS = [
    (1, 1, _BASE),
    (2, 1, _BASE + dt.timedelta(minutes=10)),
    (3, 1, _BASE + dt.timedelta(minutes=50)),  # gap 40 min > 30 → new session
    (4, 2, _BASE + dt.timedelta(minutes=5)),
    (5, 2, _BASE + dt.timedelta(minutes=20)),
]


def _write_events(tmp_path, ts_type: pa.DataType) -> str:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "user_id": pa.array([r[1] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[2] for r in _ROWS], ts_type),
            "event_type": pa.array(["click"] * len(_ROWS)),
            "value": pa.array([1.0] * len(_ROWS), pa.float64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(table, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_read_table_normalizes_to_timestamp(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, ENCODINGS[encoding])
    df = read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # Values identical across encodings (UTC session tz → lossless).
    got = sorted(r["ts"] for r in df.select("ts").collect())
    want = sorted(r[2] for r in _ROWS)
    assert got == want


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_sessionize_all_encodings(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, ENCODINGS[encoding])
    df = read_table(spark, sf_dir, "events")
    s = sessionize(df, ["user_id"], "ts", 1800)
    per_user = {
        r["user_id"]: r["n"]
        for r in s.groupBy("user_id")
        .agg(F.max("session_id").alias("n"))
        .collect()
    }
    assert per_user == {1: 2, 2: 1}


def test_sessionize_accepts_raw_ntz(spark, tmp_path):
    """Even when a caller bypasses read_table and hands sessionize a raw
    TIMESTAMP_NTZ column, the defensive cast keeps it working."""
    sf_dir = _write_events(tmp_path, pa.timestamp("us"))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
        s = sessionize(raw, ["user_id"], "ts", 1800)
        assert s.count() == len(_ROWS)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_streaming_watermark_all_encodings(spark, tmp_path, encoding):
    """The streaming reader's schema must surface TIMESTAMP (never NTZ),
    or every ``withWatermark`` downstream throws
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.  Forcing .schema analyzes the
    watermarked plan, which is exactly where round 3 died."""
    sf_dir = _write_events(tmp_path, ENCODINGS[encoding])
    ev = stream_events(spark, sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    frame = windowed_counts_frame(ev)
    assert "win_start" in frame.schema.fieldNames()
