"""ORC source/sink — the second columnar format Spark ships natively
(predicate pushdown, column pruning, and zone-map-style row-group
statistics work exactly like parquet's; some warehouses standardize on
ORC, and an engine claiming source coverage should read both without a
conversion hop).

Same house rules as the parquet/JSONL sources: EXPLICIT schemas on
read (inference is a full extra pass at 100 TB and can silently widen
types), writes partitioned however the caller's DataFrame is
partitioned (no hidden coalesce), q216 pins the write -> read -> value
round-trip against the parquet oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ORC files under ``path``."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read ORC files with an EXPLICIT schema (never inference — the
    footer schema is trusted for layout, the declared schema is the
    contract; a mismatch surfaces as nulls/errors at read, not as a
    silently widened downstream type)."""
    return spark.read.schema(schema).orc(path)
