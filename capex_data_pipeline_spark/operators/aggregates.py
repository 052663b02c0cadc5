"""Aggregation operators A1-A5 (SURVEY.md §2.5).

All are partial+final hash aggregates (map-side combine for free); the
pivot groups on low-cardinality keys so the shuffle is tiny relative to
the scan even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_request_date(df: DataFrame, legacy_dates: bool = False) -> DataFrame:
    """RequestDate arrives as dd-MM-yyyy text. The reference parses it
    with ``pd.to_datetime(errors='coerce')`` and no ``dayfirst``
    (process_capex.py:928), so ambiguous values are misparsed month-first.
    Default here: correct day-first parse. ``legacy_dates=True``
    reproduces the reference bug (month-first when the first component
    ≤ 12, day-first otherwise), for bit-parity testing."""
    c = F.col("RequestDate").cast("string")
    # try_to_date = errors='coerce' (unparseable -> null), ANSI-mode safe
    dayfirst = F.try_to_date(c, "dd-MM-yyyy")
    if not legacy_dates:
        parsed = dayfirst
    else:
        monthfirst = F.try_to_date(c, "MM-dd-yyyy")
        parsed = F.coalesce(monthfirst, dayfirst)
    return df.withColumn("RequestDate", parsed)


def create_pivot_table(df: DataFrame, legacy_dates: bool = False) -> DataFrame:
    """A1 (rule 14, process_capex.py:925-936) — group-sum of
    AssetItemAmount by Zone, Region, normalized category and request date.
    pandas' pivot_table drops NaT dates from the index; the filter
    mirrors that."""
    dated = parse_request_date(df, legacy_dates=legacy_dates)
    return (
        dated.filter(F.col("RequestDate").isNotNull())
        .groupBy("Zone", "Region", "AssetCategoryName_2", "RequestDate")
        .agg(F.sum("AssetItemAmount").alias("AssetItemAmount"))
    )


def summary_report(df: DataFrame) -> dict[str, DataFrame]:
    """A2 (process_capex.py:938-980) — per-dimension count/sum reports
    plus global totals. Kept as four independent group-bys for parity
    with the reference's output shape; each is one small hash aggregate
    over the (already tiny) processed frame."""
    out: dict[str, DataFrame] = {}
    for dim in ("Zone", "AssetCategoryName", "RequestFunction", "CurrentStatus"):
        out[dim] = (
            df.groupBy(dim)
            .agg(
                F.count("AssetItemAmount").alias("Count"),
                F.round(F.sum("AssetItemAmount"), 2).alias("Total_Amount"),
            )
        )
    out["totals"] = df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.sum("AssetItemAmount").alias("total_amount"),
    )
    return out


def analytics_summary(df: DataFrame, dim: str) -> DataFrame:
    """A3 (app.py:344-365) — count/sum/mean by one dimension.

    The sum accumulates as exact DECIMAL and casts to double at the
    edge, so the result is identical under any partial-aggregation
    order (a plain double sum re-rounds per merge order); the mean then
    divides that one exact sum."""
    total = F.sum(F.col("AssetItemAmount").cast("decimal(18,2)"))
    cnt = F.count("AssetItemAmount")
    return df.groupBy(dim).agg(
        cnt.alias("Count"),
        F.round(total.cast("double"), 2).alias("Total_Amount"),
        F.round(total.cast("double") / cnt, 2).alias("Average_Amount"),
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A5 — pandas ``value_counts()``: counts descending."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), F.asc(col)
    )


def duplicate_keys(df: DataFrame, subset: list[str]) -> DataFrame:
    """A5b — keys occurring more than once (HAVING count(*) > 1)."""
    return (
        df.groupBy(*subset)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
