"""Validation harness (A6-A8, process_capex.py:1272-1731) as pure joins.

The reference's validators run a pandas filter per composite key inside
Python loops — O(keys × rows) (process_capex.py:1636,1662,1689). Here
every per-key comparison is one aggregation per side plus one join:
O(n log n) distributed, and only scalar metrics ever reach the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from capex_data_pipeline_spark.functions.keys import robust_key

F1_PASS_THRESHOLD = 0.95  # process_capex.py:1719


def with_robust_key(df: DataFrame, out: str = "CompositeKey") -> DataFrame:
    vendor = F.col("VendorName") if "VendorName" in df.columns else F.lit("")
    return df.withColumn(
        out, robust_key(F.col("RequestNo"), F.col("AssetItemName"), vendor)
    )


def validate_composite_key(df: DataFrame, key_col: str = "CompositeKey") -> dict:
    """Key integrity (process_capex.py:1272-1351): completeness of the
    three components and duplicate keys."""
    counts = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(
                F.trim(F.coalesce(F.col("RequestNo").cast("string"), F.lit(""))) == "", 1
            ).otherwise(0)
        ).alias("missing_request_no"),
        F.sum(
            F.when(
                F.trim(F.coalesce(F.col("AssetItemName").cast("string"), F.lit(""))) == "",
                1,
            ).otherwise(0)
        ).alias("missing_item"),
    ).collect()[0]
    dup = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    n_dup_keys = dup.count()
    return {
        "total_rows": counts["total"],
        "missing_request_no": counts["missing_request_no"],
        "missing_item": counts["missing_item"],
        "duplicate_keys": n_dup_keys,
        "validation_status": "PASS"
        if (counts["missing_request_no"] == 0 and counts["missing_item"] == 0)
        else "FAIL",
    }


@dataclass
class ValidationResult:
    true_positives: int = 0
    false_positives: int = 0
    false_negatives: int = 0
    precision: float = 0.0
    recall: float = 0.0
    f1_score: float = 0.0
    amount_accuracy: float | None = None
    zone_accuracy: float | None = None
    category_accuracy: float | None = None
    status: str = "FAIL"
    mismatches: dict[str, DataFrame] = field(default_factory=dict)


def validate_processed(processed: DataFrame, reference: DataFrame) -> ValidationResult:
    """P/R/F1 over robust key sets plus per-field accuracies
    (process_capex.py:1501-1731), entirely as joins and aggregates.

    - amount: per-key SUM compared with ±0.01 tolerance (:1633-1656)
    - zone: casefolded per-key set equality (:1658-1683)
    - category: exact per-key set equality (:1685-1708)
    """
    p = with_robust_key(processed).select(
        "CompositeKey",
        F.col("AssetItemAmount").alias("_amt"),
        (F.col("Zone") if "Zone" in processed.columns else F.lit(None)).alias("_zone"),
        (
            F.col("AssetCategoryName")
            if "AssetCategoryName" in processed.columns
            else F.lit(None)
        ).alias("_cat"),
    )
    r = with_robust_key(reference).select(
        "CompositeKey",
        F.col("AssetItemAmount").alias("_amt"),
        (F.col("Zone") if "Zone" in reference.columns else F.lit(None)).alias("_zone"),
        (
            F.col("AssetCategoryName")
            if "AssetCategoryName" in reference.columns
            else F.lit(None)
        ).alias("_cat"),
    )

    # one aggregation per side: per-key sum + per-key value sets
    def _per_key(df: DataFrame) -> DataFrame:
        return df.groupBy("CompositeKey").agg(
            F.sum("_amt").alias("amt"),
            F.array_sort(
                F.collect_set(F.lower(F.trim(F.col("_zone").cast("string"))))
            ).alias("zones"),
            F.array_sort(F.collect_set(F.col("_cat").cast("string"))).alias("cats"),
        )

    pk, rk = _per_key(p), _per_key(r)
    # membership markers (amt nullability can't signal membership: a key
    # whose amounts are all null would look absent)
    joined = pk.select("CompositeKey", F.lit(True).alias("in_p"), "amt", "zones", "cats").withColumnRenamed("amt", "p_amt").withColumnRenamed("zones", "p_zones").withColumnRenamed("cats", "p_cats").join(
        rk.select("CompositeKey", F.lit(True).alias("in_r"), F.col("amt").alias("r_amt"), F.col("zones").alias("r_zones"), F.col("cats").alias("r_cats")),
        "CompositeKey",
        "full_outer",
    ).withColumn("in_p", F.coalesce("in_p", F.lit(False))).withColumn(
        "in_r", F.coalesce("in_r", F.lit(False))
    )
    # tracked persist (not a bare DataFrame cache call): the agg below and any
    # caller re-use both read this frame, and release_persisted() must
    # be able to free it like every other engine-internal persist
    from capex_data_pipeline_spark.cache import persisted

    joined = persisted(joined)

    amount_mismatch = F.abs(
        F.coalesce("p_amt", F.lit(0.0)) - F.coalesce("r_amt", F.lit(0.0))
    ) > 0.01
    zone_mismatch = ~(F.col("p_zones") == F.col("r_zones"))
    cat_mismatch = ~(F.col("p_cats") == F.col("r_cats"))

    agg = joined.agg(
        F.sum(F.when(F.col("in_p") & F.col("in_r"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("in_p") & ~F.col("in_r"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("in_p") & F.col("in_r"), 1).otherwise(0)).alias("fn"),
        F.sum(
            F.when(F.col("in_p") & F.col("in_r") & amount_mismatch, 1).otherwise(0)
        ).alias("amt_mismatch"),
        F.sum(
            F.when(F.col("in_p") & F.col("in_r") & zone_mismatch, 1).otherwise(0)
        ).alias("zone_mismatch"),
        F.sum(
            F.when(F.col("in_p") & F.col("in_r") & cat_mismatch, 1).otherwise(0)
        ).alias("cat_mismatch"),
    ).collect()[0]

    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0

    res = ValidationResult(
        true_positives=tp,
        false_positives=fp,
        false_negatives=fn,
        precision=round(precision, 4),
        recall=round(recall, 4),
        f1_score=round(f1, 4),
        status="PASS" if f1 >= F1_PASS_THRESHOLD else "FAIL",
    )
    if tp:
        res.amount_accuracy = round((tp - agg["amt_mismatch"]) / tp * 100, 2)
        res.zone_accuracy = round((tp - agg["zone_mismatch"]) / tp * 100, 2)
        res.category_accuracy = round((tp - agg["cat_mismatch"]) / tp * 100, 2)
    res.mismatches = {
        "false_positives": joined.filter(F.col("in_p") & ~F.col("in_r")).select(
            "CompositeKey"
        ),
        "false_negatives": joined.filter(~F.col("in_p") & F.col("in_r")).select(
            "CompositeKey"
        ),
        "amount": joined.filter(F.col("in_p") & F.col("in_r") & amount_mismatch).select(
            "CompositeKey", "p_amt", "r_amt"
        ),
        "zone": joined.filter(F.col("in_p") & F.col("in_r") & zone_mismatch).select(
            "CompositeKey", "p_zones", "r_zones"
        ),
        "category": joined.filter(F.col("in_p") & F.col("in_r") & cat_mismatch).select(
            "CompositeKey", "p_cats", "r_cats"
        ),
    }
    return res
