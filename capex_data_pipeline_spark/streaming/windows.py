"""Event-time windowed aggregations (SURVEY.md §2.10 extensions).

Each operator is ONE function usable in both execution modes: pass a
batch DataFrame for batch semantics (what the DuckDB oracle checks), or
a streaming DataFrame (``spark.readStream``) and the identical plan runs
incrementally under Structured Streaming — that mode-agnosticism is the
point of the DataFrame API, and it's what makes the batch-mode oracle a
valid correctness check for the streaming operator.

Streaming specifics (watermarking, output modes, state cleanup) live in
the ``*_stream`` wrappers: the watermark bounds state (late events
older than the bound are dropped; state for closed windows is freed),
which is what lets these run indefinitely on an unbounded source.

State store at scale: Spark's default HDFSBackedStateStoreProvider
keeps every key's state ON-HEAP in each executor — with 100 TB of
input, windowed/session/dedup state for a long watermark horizon will
not fit. Production sessions running the ``*_stream`` wrappers should
set the RocksDB provider (:func:`use_rocksdb_state_store`), which
keeps state off-heap/on local disk with incremental checkpointing.
The operators are provider-agnostic — the multi-batch replay tests run
under BOTH providers (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession

#: production state-store provider for the *_stream wrappers
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession) -> None:
    """Switch streaming state to RocksDB (off-heap, disk-backed,
    incremental checkpoints) — required at scale; the default
    HDFS-backed provider holds all state on the executor heap. Must be
    set before the streaming query starts."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE
    )


def _window_agg(df: DataFrame, window_col, group_cols: list[str]) -> DataFrame:
    return (
        df.groupBy(window_col.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def tumbling_window_agg(
    events: DataFrame, width: str = "1 hour", group_cols: list[str] | None = None
) -> DataFrame:
    """Non-overlapping event-time windows: count + exact-decimal sum per
    (window, event_type)."""
    return _window_agg(
        events, F.window(F.col("ts"), width), group_cols or ["event_type"]
    )


def sliding_window_agg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows)."""
    return _window_agg(
        events, F.window(F.col("ts"), width, slide), group_cols or ["event_type"]
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: events within ``gap`` of each other merge;
    session end = last event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# --- streaming wrappers ----------------------------------------------------


def tumbling_window_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming tumbling windows with a late-data bound: events more
    than ``watermark`` behind the max seen event time are dropped and
    closed-window state is released."""
    return tumbling_window_agg(events.withWatermark("ts", watermark), width)


def sliding_window_stream(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sliding windows; same watermark semantics as
    :func:`tumbling_window_stream` (each event lands in width/slide
    windows, all bounded by the watermark)."""
    return sliding_window_agg(events.withWatermark("ts", watermark), width, slide)


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return session_window_agg(events.withWatermark("ts", watermark), gap)


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on event_id: duplicates arriving within
    the watermark horizon are suppressed; state ages out with the
    watermark (bounded memory on an unbounded stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Event-to-event interval join ("attribution": every ``right_type``
    event paired with the same user's ``left_type`` events in the
    preceding ``horizon``). The join condition is an equi-key
    (user_id) plus an event-time range — exactly the shape Structured
    Streaming's stream-stream join requires to bound state.

    Batch mode is the oracle semantics; ``attribution_join_stream``
    runs the identical plan on two streams with watermarks, where the
    time bound lets Spark expire buffered rows on both sides.
    """
    l = left.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    r = right.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        "l_event_id",
        "r_event_id",
        F.unix_micros(F.col("l_ts")).alias("l_ts_us"),
        F.unix_micros(F.col("r_ts")).alias("r_ts_us"),
        F.round(
            (
                F.col("r_value").cast("decimal(18,6)")
                - F.col("l_value").cast("decimal(18,6)")
            ).cast("double"),
            2,
        ).alias("value_delta"),
    )


def attribution_join_stream(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: both sides watermarked, so
    each side buffers at most watermark+horizon of state — the bounded
    formulation that runs indefinitely on unbounded sources."""
    return attribution_join(
        left.withWatermark("ts", watermark),
        right.withWatermark("ts", watermark),
        left_type,
        right_type,
        horizon,
    )


def attribution_join_outer_stream(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matched pairs emit as
    they join; a matchless left row emits with null right columns only
    once the watermark proves no future right row can fall inside its
    horizon (event_time + horizon < watermark).  The streaming
    semantics inner joins never exercise: null emission is
    WATERMARK-DRIVEN, so rows still inside the horizon at shutdown are
    withheld, not emitted null — the correctness property
    tests/test_streaming.py pins against the batch left join."""
    return attribution_join(
        left.withWatermark("ts", watermark),
        right.withWatermark("ts", watermark),
        left_type,
        right_type,
        horizon,
        how="left_outer",
    )


def static_enrich(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to an event stream — the most common production
    streaming join (sessions → user profile, clicks → campaign, event
    → device registry), and stateless: unlike stream-stream joins it
    needs no watermark, because the static side is re-read and
    broadcast fresh on EVERY micro-batch (which is also how dimension
    updates between batches become visible).

    Batch mode is the oracle semantics; the identical plan runs on a
    ``readStream`` source. Spark supports stream-static ``inner`` and
    ``left_outer`` with the stream on the left — a matchless event
    emits immediately with null dimension columns (no watermark delay;
    there is no future static row to wait for).

    Scale: the dimension side is broadcast explicitly — at 100 TB of
    stream the one thing this join must never do is shuffle the
    stream; a dimension too large to broadcast belongs in a
    pre-bucketed table co-partitioned with the stream sink instead.

    Returns the events columns plus the dim columns (minus the
    duplicate join key).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"static_enrich: how={how!r}; stream-static supports inner "
            "and left_outer with the stream on the left"
        )
    cond = events[stream_key] == dim[dim_key]
    return events.join(F.broadcast(dim), cond, how).drop(dim[dim_key])


def windowed_topk(
    events: DataFrame,
    width: str = "1 hour",
    k: int = 3,
    group_col: str = "event_type",
) -> DataFrame:
    """Per-window heavy hitters: the top-``k`` ``group_col`` values by
    event count inside each tumbling window — the "what dominated each
    hour" report behind dashboard leaderboards and hot-key detection.

    Batch shape: the tumbling count aggregate (one shuffle on the
    compact (window, group) key) + a per-window WindowGroupLimit rank
    (top-k applied map-side before the rank exchange). Deterministic:
    ties break on the group value ascending.

    Streaming: ranking is not incrementally emittable under append
    mode (a late event can reorder a window's leaderboard), so the
    streaming form of this report is the COUNT stage —
    ``tumbling_window_stream`` in update mode, with the rank applied
    at read time on the (window, group)-sized sink; the stream==batch
    parity of that count stage is what tests/test_streaming.py pins.
    """
    from pyspark.sql.window import Window

    counts = (
        events.groupBy(F.window(F.col("ts"), width).alias("w"), group_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            group_col,
            "n_events",
        )
    )
    w = Window.partitionBy("window_start_us").orderBy(
        F.desc("n_events"), F.asc(group_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
