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
    sliding_window_agg,
    sliding_window_stream,
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


def test_sliding_stream_matches_batch(spark, events_stream_dir):
    batch = {
        tuple(r): None
        for r in sliding_window_agg(
            read_table(spark, SF_DIR, "events"), "1 hour", "30 minutes"
        ).collect()
    }
    stream = sliding_window_stream(
        _streaming_events(spark, events_stream_dir),
        "1 hour",
        "30 minutes",
        watermark="10 days",
    )
    _run_to_memory(stream, "sliding_mem", "complete")
    got = {tuple(r): None for r in spark.sql("SELECT * FROM sliding_mem").collect()}
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


def test_transform_with_state_matches_batch(spark, events_stream_dir):
    """The transformWithStateInPandas variant (typed ValueState, Spark 4
    stateful-processor API) produces the same final profiles as the
    batch aggregation. Needs the RocksDB state store provider and the
    protobuf package (the TWS driver worker's wire format) — skipped
    where protobuf isn't installed, with the eager ImportError checked
    instead."""
    import importlib.util

    from capex_data_pipeline_spark.streaming.stateful import (
        user_activity_batch,
        user_activity_tws,
    )

    try:
        _pb = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no parent 'google' package at all
        _pb = None
    if _pb is None:
        # self-verifying skip (VERDICT r12 task 8): before skipping,
        # pin (a) that the pyspark API this test shadows still exists
        # (the skip must never mask API drift) and (b) that our
        # operator raises its loud install-pointer ImportError eagerly
        # rather than dying mid-stream. The moment protobuf appears in
        # the environment, _pb is non-None and the full parity test
        # below runs — no action needed.
        from pyspark.sql import GroupedData

        assert hasattr(GroupedData, "transformWithStateInPandas"), (
            "pyspark dropped transformWithStateInPandas: the skip is "
            "masking API drift — rewrite user_activity_tws"
        )
        with pytest.raises(ImportError, match="protobuf"):
            user_activity_tws(_streaming_events(spark, events_stream_dir))
        pytest.skip("protobuf not installed: transformWithState cannot run here")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = {
            r.user_id: (r.n_active_days, r.n_events, r.sum_value)
            for r in user_activity_batch(
                read_table(spark, SF_DIR, "events")
            ).collect()
        }
        stream = user_activity_tws(_streaming_events(spark, events_stream_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("tws_mem")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM tws_mem").collect()
        got = {}
        for r in rows:  # later emissions overwrite earlier (monotone)
            cur = got.get(r.user_id)
            if cur is None or r.n_events >= cur[1]:
                got[r.user_id] = (r.n_active_days, r.n_events, r.sum_value)
        assert got == batch
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


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


_STATE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


@pytest.fixture(params=sorted(_STATE_PROVIDERS))
def state_provider(request, spark):
    """Run the multi-batch stateful tests under BOTH state store
    providers: the default on-heap HDFS-backed one and RocksDB (the
    documented production provider for the *_stream wrappers at scale,
    streaming/windows.py::use_rocksdb_state_store)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if request.param == "rocksdb":
        from capex_data_pipeline_spark.streaming.windows import (
            use_rocksdb_state_store,
        )

        use_rocksdb_state_store(spark)
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            _STATE_PROVIDERS[request.param],
        )
    yield request.param
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@pytest.fixture(scope="module")
def events_split3_dir(spark, tmp_path_factory):
    """The sf0.001 events corpus split into 3 parquet files by
    event_id % 3. Each file spans the FULL time range, so with
    maxFilesPerTrigger=1 every micro-batch after the first delivers
    events far 'late' relative to the prior batch's max event time —
    a replay with heavy cross-batch disorder."""
    d = tmp_path_factory.mktemp("events_split3")
    e = read_table(spark, SF_DIR, "events")
    for i in range(3):
        e.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            str(d / f"part{i}")
        )
    # flatten: move each part's single parquet file up into d
    import glob

    for i, f in enumerate(glob.glob(str(d / "part*" / "*.parquet"))):
        os.rename(f, d / f"file{i}.parquet")
        shutil.rmtree(os.path.dirname(f))
    return str(d)


def _streaming_events_one_file_per_batch(spark, path):
    sdf = (
        spark.readStream.schema(_events_raw_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    if _events_ts_is_nanos():
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def test_tumbling_multibatch_replay_matches_batch(
    spark, events_split3_dir, state_provider
):
    """3+ micro-batches with fully out-of-order cross-batch arrivals:
    inside the watermark horizon the stream must still converge to the
    batch answer (state survives across batches and late rows merge
    into already-open windows). Parametrized over both state store
    providers."""
    batch = {
        tuple(r): None
        for r in tumbling_window_agg(read_table(spark, SF_DIR, "events")).collect()
    }
    stream = tumbling_window_stream(
        _streaming_events_one_file_per_batch(spark, events_split3_dir),
        "1 hour",
        watermark="400 days",  # corpus spans ~1 year: nothing expires
    )
    sink = f"tumbling_mb_mem_{state_provider}"
    q = _run_to_memory(stream, sink, "complete")
    assert len(q.recentProgress) >= 3  # one micro-batch per file
    got = {tuple(r): None for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    assert got == batch


def test_stream_dedup_across_micro_batches(spark, tmp_path, state_provider):
    """Duplicates split ACROSS micro-batches (not just within one) are
    suppressed while inside the watermark horizon: the dedup state must
    survive batch boundaries. Parametrized over both state store
    providers."""
    import pandas as pd

    base = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 01:00:00"]
            ),
            "user_id": [1, 2, 3],
            "event_type": ["click"] * 3,
            "value": [1.0, 2.0, 3.0],
            "props": ["{}"] * 3,
        }
    )
    dup = base.assign(ts=base.ts + pd.Timedelta(minutes=5))  # same event_ids
    src = tmp_path / "dup_across"
    src.mkdir()
    schema = None
    for i, pdf in enumerate([base, dup, base]):  # each file -> one batch
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.parquet(str(src / f"stage{i}"))
        schema = sdf.schema
    import glob

    for i, f in enumerate(sorted(glob.glob(str(src / "stage*" / "*.parquet")))):
        os.rename(f, src / f"file{i}.parquet")
    stream = stream_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        watermark="1 day",
    )
    sink = f"dedup_mb_mem_{state_provider}"
    q = _run_to_memory(stream, sink, "append")
    assert len(q.recentProgress) >= 3
    out = spark.sql(f"SELECT event_id, count(*) n FROM {sink} GROUP BY 1").collect()
    assert {r.event_id: r.n for r in out} == {1: 1, 2: 1, 3: 1}


def test_tumbling_watermark_drops_expired_late_rows(spark, tmp_path, state_provider):
    """Empirical watermark-expiry check, pinning Spark's dual-watermark
    semantics (SPARK-24634): in micro-batch N the LATE-EVENT filter uses
    the watermark as of batch N's START (i.e. derived from data through
    batch N-1), while state EVICTION uses the watermark advanced by
    batch N itself. So a late row arriving one batch after the horizon
    passed is still accepted (filter watermark hasn't caught up), and a
    row arriving two batches after is dropped. Uses update mode
    (complete mode disables late-row dropping by design)."""
    import pandas as pd

    def events_pdf(rows, start=0):
        return pd.DataFrame(
            {
                "event_id": list(range(start, start + len(rows))),
                "ts": pd.to_datetime([t for t, _ in rows]),
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [v for _, v in rows],
                "props": ["{}"] * len(rows),
            }
        )

    # batch 1: window 09:00 gets one event; max event time 12:00 ->
    # watermark AFTER batch 1 = 11:00 (delay 1h)
    b1 = events_pdf([("2024-01-01 09:30:00", 1.0), ("2024-01-01 12:00:00", 4.0)])
    # batch 2 filters with batch 1's STARTING watermark (epoch 0): the
    # 09:45 row is late-but-accepted; 11:30 is in-horizon regardless
    b2 = events_pdf([("2024-01-01 09:45:00", 100.0), ("2024-01-01 11:30:00", 8.0)], 2)
    # batch 3 filters with watermark 11:00: the 08:15 row is DROPPED
    b3 = events_pdf([("2024-01-01 08:15:00", 1000.0)], 4)
    src = tmp_path / "late_drop"
    src.mkdir()
    schema = None
    for i, pdf in enumerate([b1, b2, b3]):
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.parquet(str(src / f"stage{i}"))
        schema = sdf.schema
    import glob

    for i, f in enumerate(sorted(glob.glob(str(src / "stage*" / "*.parquet")))):
        os.rename(f, src / f"file{i}.parquet")
    stream = tumbling_window_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        "1 hour",
        watermark="1 hour",
    )
    sink = f"late_drop_mem_{state_provider}"
    q = _run_to_memory(stream, sink, "update")
    assert len(q.recentProgress) >= 3
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    final: dict[int, tuple] = {}
    for r in rows:  # update mode re-emits a window on change: last wins
        final[r.window_start_us] = (r.n_events, r.sum_value)
    us = lambda s: int(pd.Timestamp(s).value // 1000)
    assert final[us("2024-01-01 09:00:00")] == (2, 101.0)  # late-but-accepted
    assert final[us("2024-01-01 11:00:00")] == (1, 8.0)
    assert final[us("2024-01-01 12:00:00")] == (1, 4.0)
    assert us("2024-01-01 08:00:00") not in final  # behind filter watermark


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


@pytest.fixture(scope="module")
def events_chrono3_dir(spark, tmp_path_factory):
    """events split into 3 parquet files by TIME TERCILE, written in
    chronological order — so a maxFilesPerTrigger=1 replay advances
    the watermark batch over batch (the shape outer joins need to
    emit their null side)."""
    d = tmp_path_factory.mktemp("events_chrono3")
    e = read_table(spark, SF_DIR, "events")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    e = e.withColumn("_ep", ep)
    t1, t2 = e.approxQuantile("_ep", [1 / 3, 2 / 3], 0.001)
    parts = [
        e.filter(F.col("_ep") < t1).drop("_ep"),
        e.filter((F.col("_ep") >= t1) & (F.col("_ep") < t2)).drop("_ep"),
        e.filter(F.col("_ep") >= t2).drop("_ep"),
    ]
    import glob
    import time as _time

    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(d / f"part{i}"))
        f = glob.glob(str(d / f"part{i}" / "*.parquet"))[0]
        os.rename(f, d / f"file{i}.parquet")
        shutil.rmtree(str(d / f"part{i}"))
        _time.sleep(1.1)  # distinct mtimes → deterministic batch order
    return str(d)


def test_attribution_outer_stream_null_emission_is_watermark_driven(
    spark, events_chrono3_dir
):
    """LEFT OUTER stream-stream interval join: matched pairs equal the
    batch inner join exactly; null-side rows emit ONLY for left rows
    whose horizon the watermark has provably passed — pinned with a
    safety band around the final watermark (batch-exact null parity is
    not defined at shutdown: rows still inside the horizon are
    withheld, which is the correctness property)."""
    import datetime as _dt

    from capex_data_pipeline_spark.streaming.windows import (
        attribution_join,
        attribution_join_outer_stream,
    )

    e = read_table(spark, SF_DIR, "events")
    horizon_s, wm_s = 3600.0, 7200.0
    inner = {
        tuple(r)
        for r in attribution_join(e, e).collect()
    }
    batch_outer = attribution_join(e, e, how="left_outer").collect()
    batch_nulls = {
        tuple(r): r["l_ts_us"] for r in batch_outer if r["r_event_id"] is None
    }

    stream = attribution_join_outer_stream(
        _streaming_events_one_file_per_batch(spark, events_chrono3_dir),
        _streaming_events_one_file_per_batch(spark, events_chrono3_dir),
        watermark="2 hours",
    )
    _run_to_memory(stream, "attr_outer_mem", "append")
    got = spark.sql("SELECT * FROM attr_outer_mem").collect()
    got_matched = {tuple(r) for r in got if r["r_event_id"] is not None}
    got_nulls = {tuple(r) for r in got if r["r_event_id"] is None}

    # matched pairs: exact batch parity
    assert got_matched == inner
    # every emitted null row is a true batch null row
    assert got_nulls <= set(batch_nulls)
    # and every null row safely below the second-batch watermark emitted
    files = sorted(
        __import__("glob").glob(os.path.join(events_chrono3_dir, "*.parquet"))
    )[:2]
    wm2_us = (
        spark.read.parquet(*files)
        .select(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .collect()[0][0]
        - int(wm_s * 1_000_000)
    )
    margin_us = 600 * 1_000_000
    must = {
        k
        for k, l_us in batch_nulls.items()
        if l_us + horizon_s * 1_000_000 < wm2_us - margin_us
    }
    assert must <= got_nulls
    assert must  # the band is non-degenerate: it demands real emissions


# ------------------------------------------- stream-static enrichment


def test_static_enrich_stream_matches_batch(spark, events_stream_dir):
    from capex_data_pipeline_spark.streaming.windows import static_enrich

    cust = read_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    batch = sorted(
        (r.event_id, r.user_id, r.c_mktsegment)
        for r in static_enrich(
            read_table(spark, SF_DIR, "events"), cust, "user_id", "c_custkey"
        ).collect()
    )
    stream = static_enrich(
        _streaming_events(spark, events_stream_dir),
        cust,
        "user_id",
        "c_custkey",
    ).select("event_id", "user_id", "c_mktsegment")
    _run_to_memory(stream, "static_enrich_mem", "append")
    got = sorted(
        (r.event_id, r.user_id, r.c_mktsegment)
        for r in spark.sql("SELECT * FROM static_enrich_mem").collect()
    )
    assert got == batch
    # every event emits exactly once (stateless left join, no watermark
    # withholding): row count equals the source row count
    assert len(got) == read_table(spark, SF_DIR, "events").count()


def test_static_enrich_rejects_unsupported_mode(spark):
    from capex_data_pipeline_spark.streaming.windows import static_enrich

    ev = spark.createDataFrame([(1, 2)], "event_id long, user_id long")
    dim = spark.createDataFrame([(2, "x")], "c_custkey long, c_mktsegment string")
    with pytest.raises(ValueError):
        static_enrich(ev, dim, "user_id", "c_custkey", how="right")


def test_windowed_topk_batch_and_stream_counts(spark, events_stream_dir):
    """The q59 leaderboard: batch top-k is deterministic, and its COUNT
    stage (the streaming form) matches between a readStream run and
    batch exactly."""
    from capex_data_pipeline_spark.streaming.windows import (
        tumbling_window_stream,
        windowed_topk,
    )

    ev = read_table(spark, SF_DIR, "events")
    top = windowed_topk(ev, "1 hour", k=3).collect()
    assert top, "corpus has events"
    by_window = {}
    for r in top:
        by_window.setdefault(r.window_start_us, []).append(r)
    for rows in by_window.values():
        assert len(rows) <= 3
        assert [r.rank for r in sorted(rows, key=lambda x: x.rank)] == list(
            range(1, len(rows) + 1)
        )
        counts = [r.n_events for r in sorted(rows, key=lambda x: x.rank)]
        assert counts == sorted(counts, reverse=True)

    from capex_data_pipeline_spark.streaming.windows import (
        tumbling_window_agg,
    )

    batch_counts = {
        (r.window_start_us, r.event_type): r.n_events
        for r in tumbling_window_agg(ev, "1 hour").collect()
    }
    stream = tumbling_window_stream(
        _streaming_events(spark, events_stream_dir), "1 hour",
        watermark="10 days",
    )
    _run_to_memory(stream, "topk_counts_mem", "complete")
    got = {
        (r.window_start_us, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM topk_counts_mem").collect()
    }
    assert got == batch_counts


def test_incremental_neardup_stream_matches_batch(spark, tmp_path):
    """The daily-crawl dedup shape runs UNCHANGED as a stream: the new
    batch arrives via readStream, the accumulated index is the static
    side, and the bipartite band join + stateful pair dedup produce
    exactly the batch result — the same-function-both-modes contract
    the window family already pins."""
    from capex_data_pipeline_spark.extensions.dedup import (
        minhash_near_dups_incremental,
    )

    dup = "a long enough shared document body that minhash will match"
    index_rows = [
        (1, dup),
        (2, "existing index content about something else entirely"),
        (3, dup + " with a tiny suffix change"),
    ]
    new_rows = [
        (100, dup),                                  # dups 1 (and ~3)
        (101, "fresh unrelated text with new words"),
    ]
    index = spark.createDataFrame(index_rows, "doc_id long, text string")
    batch_new = spark.createDataFrame(new_rows, "doc_id long, text string")
    expected = sorted(
        (r["new_id"], r["index_id"], r["est_jaccard"])
        for r in minhash_near_dups_incremental(
            batch_new, index, num_hashes=8, bands=4, threshold=0.5
        ).collect()
    )
    assert expected, "fixture must produce at least one pair"

    d = tmp_path / "newdocs"
    batch_new.coalesce(1).write.parquet(str(d))
    stream_new = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(d))
    out = minhash_near_dups_incremental(
        stream_new, index, num_hashes=8, bands=4, threshold=0.5
    )
    q = (
        out.writeStream.format("memory")
        .queryName("inc_neardup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["new_id"], r["index_id"], r["est_jaccard"])
        for r in spark.sql("SELECT * FROM inc_neardup_stream").collect()
    )
    assert got == expected


def test_incremental_neardup_true_stream_matches_batch(spark, tmp_path):
    """Round-9 close of the q75 loop: the incremental near-dedup runs
    under a REAL Structured Streaming query (file source, one file per
    micro-batch via maxFilesPerTrigger, foreachBatch), maintaining the
    growing corpus index exactly as a daily-crawl deployment would —
    and the union of per-batch pair outputs is BIT-identical to the
    same operator replayed batch-by-batch, and set-identical to the
    cross-batch slice of the full-corpus self-join."""
    import time

    from capex_data_pipeline_spark.extensions.dedup import (
        minhash_near_dups,
        minhash_near_dups_incremental,
    )

    batches = [
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "an entirely different first document about spark plans"),
        ],
        [
            (3, "the quick brown fox jumps over the lazy dog tonight"),
            (4, "nothing like the others at all whatsoever in here"),
        ],
        [
            (5, "the quick brown fox jumps over the lazy dog today"),
            (6, "an entirely different first document about spark joins"),
        ],
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    # one parquet file per micro-batch; mtime spacing pins file-source
    # processing order (mod time, then path)
    for i, rows in enumerate(batches):
        p = str(src / f"batch_{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "pairs")

    def handle(batch_df, _epoch):
        b = batch_df.localCheckpoint()
        try:
            idx = b.sparkSession.read.parquet(index_dir)
            has_index = True
        except Exception:  # first batch: no index yet
            has_index = False
        if has_index:
            minhash_near_dups_incremental(b, idx).write.mode(
                "append"
            ).parquet(out_dir)
        b.write.mode("append").parquet(index_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["new_id"], r["index_id"], r["est_jaccard"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # reference 1: the identical operator replayed batch-by-batch
    want = set()
    for i in range(1, len(batches)):
        new = spark.createDataFrame(batches[i], schema)
        idx = spark.createDataFrame(
            [r for b in batches[:i] for r in b], schema
        )
        want |= {
            (r["new_id"], r["index_id"], r["est_jaccard"])
            for r in minhash_near_dups_incremental(new, idx).collect()
        }
    assert got == want
    assert got  # the corpus contains real cross-batch near-dups

    # reference 2: the cross-batch slice of the full self-join —
    # orientation-normalized (incremental reports (newer, older))
    full = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    batch_of = {
        doc_id: i for i, b in enumerate(batches) for doc_id, _ in b
    }
    self_pairs = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in minhash_near_dups(full).collect()
        if batch_of[r["id_a"]] != batch_of[r["id_b"]]
    }
    assert {(a, b) for a, b, _ in got} == self_pairs


def test_hll_registers_maintained_under_true_stream(spark, tmp_path):
    """Sketch mergeability under a REAL streaming query: foreachBatch
    folds each micro-batch's HLL registers into a persistent register
    store by per-bucket MAX (the q166 merge), and the final registers
    are BIT-identical to the batch registers over the whole stream —
    so the streaming estimate equals the batch estimate exactly."""
    import time

    from pyspark.sql import functions as F

    batches = [
        [(u,) for u in range(0, 400)],
        [(u,) for u in range(300, 700)],   # overlaps batch 1
        [(u,) for u in range(650, 1000)],
    ]
    schema = "user_id long"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    b = 6
    m = 1 << b
    rest_bits = 52 - b

    def registers(df):
        k = F.coalesce(F.col("user_id").cast("string"), F.lit("<null>"))
        h = F.conv(F.substring(F.md5(k), 1, 13), 16, 10).cast("long")
        rest = F.shiftright(h, b)
        bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
        rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
            F.lit(rest_bits) - bitlen + 1
        )
        return (
            df.select((h % m).alias("bucket"), rank.alias("r"))
            .groupBy("bucket")
            .agg(F.max("r").alias("r"))
        )

    store = str(tmp_path / "registers")

    def handle(batch_df, _epoch):
        nb = registers(batch_df.localCheckpoint())
        try:
            prev = nb.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(nb)
                .groupBy("bucket")
                .agg(F.max("r").alias("r"))
            )
        except Exception:
            merged = nb
        # rewrite the (<= 64-row) store atomically-enough for a test
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket"], r["r"])
        for r in spark.read.parquet(store).collect()
    }
    whole = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    want = {(r["bucket"], r["r"]) for r in registers(whole).collect()}
    assert got == want  # register-exact: streaming == batch
    assert len(got) <= m


def test_stats_cells_stream_fold_matches_batch(spark, tmp_path):
    """q184/q199's cell merge is algebraic by construction — prove it
    STREAMS: foreachBatch folds each micro-batch's stats cells into a
    persistent cell store (counts/widths by SUM, HLL register max by
    MAX — exactly stats_fold_persisted's merge), and the finalized
    statistics from the streamed store are value-identical to
    table_stats_sketch over the whole data. The stream==batch pin the
    HLL register test established, extended to the full ANALYZE cell
    frame (VERDICT r10 task #8)."""
    import time

    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.sketches import (
        _stats_cells,
        _stats_finalize,
        _stats_melt,
        table_stats_sketch,
    )

    batches = [
        [(i, f"s{i % 7}") for i in range(0, 300)],
        [(i, None) for i in range(200, 500)],       # NULL string values
        [(i, f"s{i % 11}") for i in range(450, 800)],
    ]
    schema = "a long, s string"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    store = str(tmp_path / "cells")
    cols = ["a", "s"]

    def handle(batch_df, _epoch):
        nb = _stats_cells(
            _stats_melt(batch_df.localCheckpoint(), cols), 6
        )
        try:
            prev = nb.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(nb)
                .groupBy("_col", "_b")
                .agg(
                    F.sum("_cnt").alias("_cnt"),
                    F.sum("_slen").alias("_slen"),
                    F.max("_mr").alias("_mr"),
                )
            )
        except Exception:
            merged = nb
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    folded = {
        tuple(r)
        for r in _stats_finalize(
            spark.read.parquet(store), None, 64, 6
        ).collect()
    }
    whole = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    want = {tuple(r) for r in table_stats_sketch(whole, cols).collect()}
    assert folded == want  # value-exact: streaming fold == batch scan


def test_day_registers_stream_fold_matches_batch_rolling(spark, tmp_path):
    """q230's register state streams: foreachBatch folds each
    micro-batch's per-(day, register) cells into a persistent store by
    MAX (analytics.day_user_registers' algebra), and finalizing the
    streamed store through rolling_from_registers is value-identical
    to the one-shot batch rolling_active_users_hll over the whole
    stream — the engagement report a 100 TB event stream maintains
    without ever re-scanning history."""
    import datetime
    import time

    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.analytics import (
        day_user_registers,
        rolling_active_users_hll,
        rolling_from_registers,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    batches = [
        [(u, base + datetime.timedelta(days=u % 4)) for u in range(0, 300)],
        [(u, base + datetime.timedelta(days=u % 5))
         for u in range(200, 600)],
        [(u, base + datetime.timedelta(days=2 + u % 3))
         for u in range(550, 900)],
    ]
    schema = "user_id long, ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    store = str(tmp_path / "dayregs")

    def handle(batch_df, _epoch):
        nb = day_user_registers(
            batch_df.localCheckpoint(), "user_id", "ts", b=6
        )
        try:
            prev = nb.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(nb)
                .groupBy("_d", "_b")
                .agg(F.max("_mr").alias("_mr"))
            )
        except Exception:
            merged = nb
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt_dayregs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = rolling_from_registers(
        spark.read.parquet(store), window_days=3, b=6
    )
    whole = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    batch = rolling_active_users_hll(
        whole, "user_id", "ts", window_days=3, b=6
    )
    key = lambda r: (str(r["day"]), r["dau_est"], r["rolling_au_est"],
                     r["full_window"])
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )
