"""JSON-lines source/sink — the interchange format training-data
pipelines actually ship (one JSON object per line; gzip splits per
file, plain text splits per block).

Scale rules encoded here:

- **Always pass an explicit schema.**  Inference costs a full extra
  pass over the data (``samplingRatio`` trades that for schema risk);
  at 100 TB that pass is a cluster-day.  ``read_jsonl`` therefore
  takes ``schema`` as a required argument; use
  :func:`infer_jsonl_schema` explicitly when exploring.
- **Corrupt lines are data, not exceptions.**  PERMISSIVE mode with a
  ``_corrupt_record`` column captures undecodable lines for audit
  instead of killing a 10-hour job (FAILFAST is opt-in).  Spark quirk
  handled here: the corrupt column must be DECLARED in the schema, and
  a query may not select ONLY that column (SPARK-26243) — keep a data
  column in any corrupt-row audit query.
- Compression: pass ``compression='gzip'`` on write for archival
  (one-file-one-split: fine for many medium files, wrong for a few
  huge ones); leave plain for splittable scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Spark's conventional permissive-mode capture column
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
    capture_corrupt: bool = True,
) -> DataFrame:
    """Read JSON-lines with an EXPLICIT schema (DDL string or
    StructType).  In PERMISSIVE mode with ``capture_corrupt``,
    undecodable lines land in ``_corrupt_record`` (other columns
    null); DROPMALFORMED silently drops them; FAILFAST raises.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "PERMISSIVE" and capture_corrupt:
        if CORRUPT_COL not in schema.fieldNames():
            # copy: StructType.add MUTATES in place — never the caller's object
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField(CORRUPT_COL, T.StringType(), True)]
            )
    reader = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def infer_jsonl_schema(
    spark: SparkSession, path: str, sampling_ratio: float = 1.0
) -> T.StructType:
    """Exploration helper: infer the schema with an extra pass (scaled
    by ``sampling_ratio``).  Print/persist the result and pin it as the
    explicit schema in production reads — never infer at 100 TB."""
    return (
        spark.read.option("samplingRatio", sampling_ratio).json(path).schema
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """JSON-lines sink.  ``partition_by`` gives the same directory
    pruning as the parquet sink; ``compression='gzip'`` for archival
    interchange (see module docstring for the split trade-off)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
