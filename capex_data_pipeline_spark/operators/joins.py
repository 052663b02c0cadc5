"""Join operators J1-J4 (SURVEY.md §2.4).

J1 (zone/region attach) is the reference's hand-rolled dict-map join
(process_capex.py:225-289) re-expressed as a broadcast equi-join plus a
broadcast *regex* fallback join — both build sides are the 651-row
office dimension, so at 100 TB the fact table never shuffles here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_zone_region(df: DataFrame, office: DataFrame) -> DataFrame:
    """J1 + J1b — Zone/Region via BranchCode equi-join; unmatched rows fall
    back to scanning UserRemarks for a region code as a whole word (first
    code in office-file order wins, process_capex.py:268-279); anything
    still unmatched becomes 'Unknown' (process_capex.py:284-285).

    The branch map is a broadcast equi-join (fact side keeps its
    partitioning — no shuffle). The remarks fallback is compiled into a
    first-match WHEN chain over the ~21 distinct region codes, collected
    from the dimension at plan-build time: exactly the reference's
    Python-dict iteration, fully deterministic, no extra join/window, and
    row-multiplicity-safe (a join+rank formulation would need a unique
    per-row id, which the fail-open union deliberately breaks).
    """
    # All dim-side columns get underscore-prefixed names up front: the fact
    # table has its own RegionCode column and Spark resolves names
    # case-insensitively, so the raw dim names would clash.
    dim = office.select(
        F.col("office").alias("_dim_office"),
        F.col("zone").alias("_dim_zone"),
        F.col("region").alias("_dim_region"),
        F.col("regioncode").alias("_dim_rc"),
    ).withColumn("_dim_row_id", F.monotonically_increasing_id())

    # branch-code map: dict semantics — last occurrence of a duplicate
    # office code wins (process_capex.py:234-239).
    by_branch = (
        dim.groupBy("_dim_office")
        .agg(
            F.max_by("_dim_zone", "_dim_row_id").alias("_zone_b"),
            F.max_by("_dim_region", "_dim_row_id").alias("_region_b"),
        )
    )

    # region-code dict: insertion order = first occurrence, value = last
    # occurrence (process_capex.py:259-264). Collected to the driver —
    # the office table is a small dimension by construction.
    rc_rows = (
        dim.filter(F.col("_dim_rc").isNotNull())
        .groupBy("_dim_rc")
        .agg(
            F.max_by("_dim_zone", "_dim_row_id").alias("z"),
            F.max_by("_dim_region", "_dim_row_id").alias("r"),
            F.min("_dim_row_id").alias("pos"),
        )
        .orderBy("pos")
        .collect()
    )

    out = df.join(
        F.broadcast(by_branch), df["BranchCode"] == by_branch["_dim_office"], "left"
    ).drop("_dim_office")

    remarks = F.coalesce(F.col("UserRemarks").cast("string"), F.lit("nan"))
    fb_zone: Column = F.lit(None).cast("string")
    fb_region: Column = F.lit(None).cast("string")
    for row in reversed(rc_rows):  # reversed so the first code wins
        # \Q..\E quoting mirrors re.escape + word boundaries (:273)
        pat = r"(?i)\b\Q" + str(row["_dim_rc"]) + r"\E\b"
        hit = remarks.rlike(pat)
        fb_zone = F.when(hit, F.lit(row["z"])).otherwise(fb_zone)
        fb_region = F.when(hit, F.lit(row["r"])).otherwise(fb_region)

    return (
        out.withColumn(
            "Zone", F.coalesce(F.col("_zone_b"), fb_zone, F.lit("Unknown"))
        )
        .withColumn(
            "Region", F.coalesce(F.col("_region_b"), fb_region, F.lit("Unknown"))
        )
        .drop("_zone_b", "_region_b")
    )


def semi_join_on_keys(df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """J2/F15 — keep rows whose key appears in the (small) key set."""
    return df.join(F.broadcast(keys.select(on).distinct()), on, "left_semi")


def anti_join_on_keys(df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """J3/J4 building block — rows whose key does NOT appear in the set."""
    return df.join(F.broadcast(keys.select(on).distinct()), on, "left_anti")
