"""Structured Streaming operators: the same plan must produce identical
results in batch and incremental (availableNow-triggered) execution, and
stateful stream dedup must suppress in-watermark duplicates."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from capex_data_pipeline_spark.sources.parquet import read_table
from capex_data_pipeline_spark.streaming.windows import (
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
    tumbling_window_stream,
)

SF_DIR = "/root/testdata/sf0.001"

def _events_ts_is_nanos() -> bool:
    """The corpus has shipped events.ts as both INT64 TIMESTAMP(NANOS)
    and TIMESTAMP(MICROS); probe the file so the stream-side schema
    matches whatever read_table sees batch-side."""
    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(SF_DIR, "events.parquet")).field("ts").type
    return getattr(t, "unit", None) == "ns" or str(t) == "int64"


def _events_raw_schema() -> T.StructType:
    # nanos surface as LongType under nanosAsLong; micros as TimestampType
    # (raw int64 copy — same micros DuckDB and the batch reader see)
    ts_type = T.LongType() if _events_ts_is_nanos() else T.TimestampType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")
    return str(d)


def _streaming_events(spark, path):
    sdf = spark.readStream.schema(_events_raw_schema()).parquet(path)
    if _events_ts_is_nanos():
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def _run_to_memory(sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, events_stream_dir):
    batch = {
        tuple(r): None
        for r in tumbling_window_agg(read_table(spark, SF_DIR, "events")).collect()
    }
    stream = tumbling_window_stream(
        _streaming_events(spark, events_stream_dir), "1 hour", watermark="10 days"
    )
    _run_to_memory(stream, "tumbling_mem", "complete")
    got = {tuple(r): None for r in spark.sql("SELECT * FROM tumbling_mem").collect()}
    assert got == batch


def test_session_stream_matches_batch(spark, events_stream_dir):
    batch = sorted(
        tuple(r)
        for r in session_window_agg(read_table(spark, SF_DIR, "events")).collect()
    )
    stream = session_window_agg(
        _streaming_events(spark, events_stream_dir).withWatermark("ts", "10 days")
    )
    _run_to_memory(stream, "session_mem", "complete")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM session_mem").collect())
    assert got == batch


def test_stateful_user_activity_matches_batch(spark, events_stream_dir):
    """applyInPandasWithState profile == batch aggregation (the state
    transition is commutative, so any micro-batching gives the same
    final answer). The memory sink in update mode may emit a row per
    batch per user; the LAST emission per user is the final profile."""
    from capex_data_pipeline_spark.streaming.stateful import (
        user_activity_batch,
        user_activity_stream,
    )

    batch = {
        r.user_id: (r.n_active_days, r.n_events, r.sum_value)
        for r in user_activity_batch(read_table(spark, SF_DIR, "events")).collect()
    }
    stream = user_activity_stream(_streaming_events(spark, events_stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("activity_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM activity_mem").collect()
    got = {}
    for r in rows:  # later emissions overwrite earlier (monotone counters)
        cur = got.get(r.user_id)
        if cur is None or r.n_events >= cur[1]:
            got[r.user_id] = (r.n_active_days, r.n_events, r.sum_value)
    assert got == batch


def test_stream_dedup_suppresses_duplicates(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 1, 2, 2, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:05:00",
                    "2024-01-01 00:10:00",
                    "2024-01-01 00:11:00",
                    "2024-01-01 00:12:00",
                    "2024-01-01 01:00:00",
                ]
            ),
            "user_id": [1, 1, 2, 2, 2, 3],
            "event_type": ["click"] * 6,
            "value": [1.0, 1.0, 2.0, 2.0, 2.0, 3.0],
            "props": ["{}"] * 6,
        }
    )
    src = tmp_path / "dup_events"
    src.mkdir()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src / "p"))
    schema = spark.read.parquet(str(src / "p")).schema
    sdf = spark.readStream.schema(schema).parquet(str(src / "p"))
    deduped = stream_dedup(sdf, watermark="1 day")
    _run_to_memory(deduped, "dedup_mem", "append")
    out = spark.sql("SELECT event_id, count(*) n FROM dedup_mem GROUP BY 1").collect()
    assert {r.event_id: r.n for r in out} == {1: 1, 2: 1, 3: 1}


def test_attribution_join_stream_matches_batch(spark, events_stream_dir):
    from capex_data_pipeline_spark.streaming.windows import (
        attribution_join,
        attribution_join_stream,
    )

    e = read_table(spark, SF_DIR, "events")
    batch = sorted(tuple(r) for r in attribution_join(e, e).collect())
    assert len(batch) > 0

    left = _streaming_events(spark, events_stream_dir)
    right = _streaming_events(spark, events_stream_dir)
    stream = attribution_join_stream(left, right, watermark="10 days")
    _run_to_memory(stream, "attribution_mem", "append")
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM attribution_mem").collect()
    )
    assert got == batch
