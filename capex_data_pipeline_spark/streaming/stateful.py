"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key streaming logic the built-in windowed
aggregations can't express.

Operator: per-user activity profile — distinct active days, event count,
value sum. The state transition is a commutative monoid (set-union +
sums), so results are EXACTLY batch-equivalent under any micro-batch
arrival order — which is what makes the batch formulation a valid
oracle for the streaming one (tests/test_streaming.py).

State lives per group in the state store (checkpointed, recoverable);
``GroupStateTimeout.NoTimeout`` keeps profiles forever — production
would use event-time timeout to age out idle users.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_active_days", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# Bumped when a slot's meaning changes: v1 stored a double sum_value in
# slot 3, v2 stores long sum_value_micros. applyInPandasWithState cannot
# tell them apart, so resuming a v2 job from a v1 checkpoint silently
# misreads state — start v2 jobs from a fresh checkpoint location.
STATE_SCHEMA_VERSION = 2

STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.StringType())),
        T.StructField("n_events", T.LongType()),
        # integer micro-units: int64 addition is an exact, associative
        # monoid, so the accumulated sum is identical under ANY
        # micro-batch split/arrival order (float += is not associative
        # and would drift from the batch oracle's exact decimal sum)
        T.StructField("sum_value_micros", T.LongType()),
    ]
)


def _round_like_spark(x: float) -> float:
    """Spark's ROUND on doubles goes through BigDecimal.valueOf (shortest
    decimal repr) with HALF_UP; Python's round() is half-even. Mirror
    Spark so stream output == batch-oracle output bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


def _update(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    days: set[str] = set()
    n_events = 0
    sum_micros = 0
    if state.exists:
        prev_days, prev_n, prev_sum = state.get
        days.update(prev_days or [])
        n_events = prev_n or 0
        sum_micros = prev_sum or 0
    for pdf in pdfs:
        days.update(pdf["ts"].dt.strftime("%Y-%m-%d"))
        n_events += len(pdf)
        sum_micros += int(pdf["value_micros"].sum())
    state.update((sorted(days), n_events, sum_micros))
    # Output edge mirrors the batch oracle EXACTLY: the oracle computes
    # ROUND(CAST(exact_decimal_sum AS DOUBLE), 2), i.e. exact value ->
    # nearest double -> HALF_UP. Decimal.scaleb(-6) is the exact value and
    # float() its correctly-rounded double, so the two paths agree even
    # past 2^53 micros where a naive float accumulation (or skipping the
    # double edge entirely) would diverge; the STATE stays exact int64.
    from decimal import Decimal

    edge_double = float(Decimal(sum_micros).scaleb(-6))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_active_days": [len(days)],
            "n_events": [n_events],
            "sum_value": [_round_like_spark(edge_double)],
        }
    )


def user_activity_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user activity profile (emits the updated profile for
    each user touched by a micro-batch).

    ``value`` is converted to integer micros JVM-side with the same
    DECIMAL(18,6) cast the batch oracle uses, so the per-row quantization
    is identical by construction; the state then sums exactly."""
    events = events.withColumn(
        "value_micros",
        F.expr("CAST(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"),
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_activity_batch(events: DataFrame) -> DataFrame:
    """The batch-equivalent formulation (the correctness oracle)."""
    return events.groupBy("user_id").agg(
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd"))
        .cast("int")
        .alias("n_active_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)")).cast(
                "double"
            ),
            2,
        ).alias("sum_value"),
    )


# --- transformWithState variant (Spark 4 stateful-processor API) -----------


def _make_user_activity_processor():
    """Build the StatefulProcessor lazily: the class only exists on
    Spark ≥ 4.0, and constructing it at import time would break older
    sessions importing this module."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserActivityProcessor(StatefulProcessor):
        """Same commutative-monoid profile as ``_update`` above, on the
        typed-state API: a ValueState holds (days, n_events,
        sum_value_micros); int64-micros keeps the sum exact under any
        micro-batch split, and the output edge mirrors the batch
        oracle's decimal -> double cast (see ``_update``)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal

            days: set[str] = set()
            n_events = 0
            sum_micros = 0
            if self._profile.exists():
                prev_days, prev_n, prev_sum = self._profile.get()
                days.update(prev_days or [])
                n_events = prev_n or 0
                sum_micros = prev_sum or 0
            for pdf in rows:
                days.update(pdf["ts"].dt.strftime("%Y-%m-%d"))
                n_events += len(pdf)
                sum_micros += int(pdf["value_micros"].sum())
            self._profile.update((sorted(days), n_events, sum_micros))
            edge_double = float(Decimal(sum_micros).scaleb(-6))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_active_days": [len(days)],
                    "n_events": [n_events],
                    "sum_value": [_round_like_spark(edge_double)],
                }
            )

        def close(self) -> None:
            pass

    return UserActivityProcessor()


def user_activity_tws(events: DataFrame) -> DataFrame:
    """``user_activity_stream`` on ``transformWithStateInPandas`` (the
    Spark 4 stateful-processor API): typed per-key state instead of one
    opaque tuple, and room to grow timers/TTL — the forward path for
    custom stateful operators. Requires the RocksDB state store
    provider (`spark.sql.streaming.stateStore.providerClass`) AND the
    ``protobuf`` package (the TWS driver worker speaks protobuf to the
    JVM); raises ImportError eagerly when it's absent so the failure is
    a clear message instead of a crashed streaming worker."""
    import importlib.util

    try:
        _pb = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no parent 'google' package at all
        _pb = None
    if _pb is None:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark[connect] dependency); it is not installed in this "
            "environment — use user_activity_stream "
            "(applyInPandasWithState) instead, which is semantically "
            "identical for this operator"
        )
    events = events.withColumn(
        "value_micros",
        F.expr("CAST(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"),
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_user_activity_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
