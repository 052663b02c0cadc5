"""Parquet source helpers for the test corpus and production tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    spark: SparkSession, sf_dir: str, name: str, pin_utc: bool = True
) -> DataFrame:
    """Read one corpus table. Nanosecond parquet timestamps (which Spark
    surfaces as LongType under ``nanosAsLong``) are normalized back to
    TimestampType at microsecond precision, matching what DuckDB sees."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The events table has carried both INT64 TIMESTAMP(NANOS) and
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet columns across
    # corpus versions. Both confs are runtime-settable (non-static SQL
    # confs), so set them here rather than at session build — consuming
    # sessions we don't construct (e.g. an external driver harness) must
    # work too:
    #  - nanosAsLong: Spark rejects TIMESTAMP(NANOS) outright otherwise.
    #  - inferTimestampNTZ off: unadjusted micros timestamps then read as
    #    TimestampType via a RAW int64 copy (no session-timezone math in
    #    the decoder), i.e. the exact micros DuckDB sees. The NTZ ->
    #    TIMESTAMP cast route would instead shift by the consuming
    #    session's spark.sql.session.timeZone.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Downstream operators render timestamps to dates/strings
    # (date_format, window boundaries); those go through the session
    # timezone. The engine's documented contract — and what makes the
    # naive-timestamp DuckDB oracles valid — is UTC rendering, so pin it
    # for consuming sessions we didn't construct (get_spark already
    # sets it; an external harness session might not). Reassigning a
    # session-global conf from inside a reader is a side effect the
    # caller may not want, so it is (a) warned about and (b) opt-out via
    # ``pin_utc=False`` for sessions that deliberately run elsewhere.
    if pin_utc:
        current_tz = spark.conf.get("spark.sql.session.timeZone", "")
        if current_tz != "UTC":
            import warnings

            warnings.warn(
                f"read_table: pinning spark.sql.session.timeZone to UTC "
                f"(was {current_tz!r}) — the engine's timestamp-rendering "
                f"contract is UTC; pass pin_utc=False to keep the session "
                f"timezone (timestamp-rendering queries may then diverge "
                f"from the documented semantics)",
                stacklevel=2,
            )
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: truncate nanos exactly like DuckDB's epoch_us
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TPCH_TABLES,
    pin_utc: bool = True,
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n, pin_utc=pin_utc) for n in names}


def spread_few_splits(df: DataFrame) -> DataFrame:
    """Restore executor parallelism over a FEW-SPLIT input before
    heavy per-row compute (shingles, per-row md5 fan-outs, signature
    batteries, wide decimal aggregates).

    A parquet file is splittable only at row-group boundaries; a
    single-row-group file — the shape of every testdata table, and of
    any small upstream extract — therefore scans as ONE task no matter
    how many cores the cluster has, and every codegen'd stage fused
    onto that scan runs single-threaded (the unsplittable-input case
    of the optimization guide: repartition right after the read). One
    round-robin exchange of the (ideally pre-projected) frame spreads
    the rows across ``defaultParallelism`` tasks.

    Scale-adaptive, not local-tuned: when the scan already carries at
    least ``defaultParallelism`` partitions — any real many-split
    table at production scale — this is a NO-OP, so consumers never
    pay a pointless corpus shuffle; the exchange only appears when
    the input genuinely cannot parallelize by splits. Row order is
    not preserved — callers must be order-insensitive (every consumer
    here is an aggregation or per-row flag; their oracles re-certify
    value equality)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
