"""Sinks (S5 in SURVEY.md §2.1) — the reference's only sink is an
in-memory CSV download link (app.py:117-122); at scale the equivalents
are partitioned distributed writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Distributed CSV write (one file per partition). For a
    UI-download-sized result, coalesce(1) first — never for bulk data."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` low-cardinality columns (Zone,
    Category_Type, a date bucket) to get partition pruning on re-read —
    the layout choice that makes 100 TB outputs queryable."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def csv_bytes(df: DataFrame, limit: int = 100_000) -> bytes:
    """The reference's download-link shape (app.py:117-122): materialize
    a bounded result to CSV bytes on the driver. Guarded by ``limit`` —
    this is for UI-sized frames only."""
    pdf = df.limit(limit).toPandas()
    return pdf.to_csv(index=False).encode("utf-8")
