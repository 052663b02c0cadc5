"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join aggregation at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (and the §7 extensions) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by region /
    market segment / order month across the 5-table star join
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region) — the testdata
    analog of the reference pipeline's filter → broadcast-join → pivot
    aggregation core (SURVEY.md §7 phase 0)."""
    sf_dir = "/root/testdata/sf0.001"

    def t(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    li, orders, cust = t("lineitem"), t("orders"), t("customer")
    nation, region = t("nation"), t("region")
    dim = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]).select(
        "c_custkey", "c_mktsegment", F.col("r_name").alias("region_name")
    )
    return (
        li.filter(F.lower(F.trim(F.col("l_returnflag"))) != "r")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"])
        .groupBy(
            "region_name",
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from capex_data_pipeline_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from capex_data_pipeline_spark.registry import ORACLES

    return dict(ORACLES)
