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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Nanosecond parquet timestamps (which Spark
    surfaces as LongType under ``nanosAsLong``) are normalized back to
    TimestampType at microsecond precision, matching what DuckDB sees."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The events table carries INT64 TIMESTAMP(NANOS) parquet columns, which
    # Spark rejects outright unless nanosAsLong is set.  The conf is
    # runtime-settable (non-static SQL conf), so set it here rather than at
    # session build — consuming sessions we don't construct (e.g. an external
    # driver harness) must work too.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: truncate nanos exactly like DuckDB's epoch_us
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}
