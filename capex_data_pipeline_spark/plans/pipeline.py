"""The end-to-end capex cleaning pipeline — the reference's 19-stage DAG
(process_capex.py:1080-1181, see SURVEY.md §3) as one lazy Spark plan.

Shape of the plan (4 tagging passes instead of 15 materialized filters):

    raw ──[+_row_id]── pass A (F1-F4) ── P2 ── P1 ── pass B (F5-F7)
        ── J1 zone/region (broadcast) ── pass C (F8-F13)
        ├── A1 pivot                       (aggregate branch)
        ── P3 ── P4 (Category_Type + extracts) ── P5 ── pass D (F14)
        ── P6 composite key ── [F15 golden semi-join] ── W1 top-5 window
        ── [J4 fail-open re-include] ──► processed

Catalyst fuses each pass's predicates into one codegen'd loop; the only
shuffles in the whole plan are the W1 window (top-k pushed into the
shuffle via WindowGroupLimit) and the audit/fail-open key aggregations.
The office dimension and golden key set are broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from capex_data_pipeline_spark.functions.keys import robust_key, strict_composite_key
from capex_data_pipeline_spark.operators.audit import build_audit
from capex_data_pipeline_spark.operators.joins import add_zone_region
from capex_data_pipeline_spark.operators.rules import (
    PASS_A,
    PASS_B,
    PASS_C,
    PASS_D,
    ExclusionRule,
    split_pass,
)
from capex_data_pipeline_spark.operators.aggregates import create_pivot_table
from capex_data_pipeline_spark.operators.projections import (
    apply_category_type,
    apply_mum_remarks,
    apply_normalize_category,
    apply_office_furniture_recat,
    apply_separate_plant_machinery,
    normalized_category,
)
from capex_data_pipeline_spark.operators.windows import (
    dedup_keep_first,
    select_representative_rows,
)

GOLDEN_FILTER_LABEL = "Post: Not in final_data RequestNos"
_GOLDEN_RULE_ORDER = 99


@dataclass(frozen=True)
class CapexPipelineConfig:
    fail_open: bool = True  # FAIL_OPEN_UNKNOWN defaults true (process_capex.py:10)
    legacy_dates: bool = False  # reproduce the dayfirst misparse when True


@dataclass
class PipelineResult:
    processed: DataFrame
    pivot: DataFrame
    amc: DataFrame
    sorter: DataFrame
    rental: DataFrame
    audit: DataFrame
    cleaned: DataFrame = None  # post-rule, pre-window frame (for tests)
    stage_counts: dict = field(default_factory=dict)


def _ingest(raw: DataFrame) -> DataFrame:
    """Attach the deterministic row id used for pandas-order tiebreaks."""
    return raw.withColumn("_row_id", F.monotonically_increasing_id())


def run_pipeline(
    raw: DataFrame,
    office: DataFrame,
    golden: DataFrame | None = None,
    config: CapexPipelineConfig = CapexPipelineConfig(),
) -> PipelineResult:
    """Build the full lazy plan; nothing executes until an action runs."""
    df = _ingest(raw)
    raw_with_id = df

    excluded_frames: list[DataFrame] = []

    # pass A: F1 rejected, F2 dash vendor, F3 functions, F4 equipment
    df, excl = split_pass(df, PASS_A)
    excluded_frames.append(excl)

    # P2 office/furniture re-cat (mutates AssetCategoryName), then P1
    # normalize into AssetCategoryName_2 — reference order :1123-1125.
    df = apply_normalize_category(apply_office_furniture_recat(df))

    # pass B: F5 category keep-3, F6 personal devices, F7 ds/darkstore/counter
    df, excl = split_pass(df, PASS_B)
    excluded_frames.append(excl)

    # J1(+J1b): zone/region broadcast join with remarks fallback
    df = add_zone_region(df, office)

    # pass C: F8 IT, F9 approval, F10 darkstore, F11 Admin, F12 Ops, F13 OtIT
    df, excl = split_pass(df, PASS_C)
    excluded_frames.append(excl)

    # A1: pivot branch from the cleaned frame (pre-P3, as in :1147)
    pivot = create_pivot_table(df, legacy_dates=config.legacy_dates)

    # P3 separate P&M items, P4 Category_Type + extracts, P5 MUM remarks
    df = apply_separate_plant_machinery(df)
    df, amc, sorter, rental = apply_category_type(df)
    df = apply_mum_remarks(df)

    # pass D: F14 non-ops keywords + CCTV
    df, excl = split_pass(df, PASS_D)
    excluded_frames.append(excl)

    # P6: strict composite key (trailing '|' on empty vendor, :1245-1270)
    df = df.withColumn(
        "CompositePrimaryKey",
        strict_composite_key(
            F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")
        ),
    )

    # F15: golden RequestNo semi-join (skipped when no golden file,
    # :982-1004). Implemented as a broadcast IN-set tag so excluded rows
    # feed the audit like any other rule.
    if golden is not None:
        golden_keys = golden.select("RequestNo").distinct()
        tagged = df.join(
            F.broadcast(golden_keys.withColumn("_in_golden", F.lit(True))),
            "RequestNo",
            "left",
        )
        kept = tagged.filter(F.col("_in_golden").isNotNull()).drop("_in_golden")
        gone = (
            tagged.filter(F.col("_in_golden").isNull())
            .drop("_in_golden")
            .withColumn("_excl_order", F.lit(_GOLDEN_RULE_ORDER))
            .withColumn("_excl_label", F.lit(GOLDEN_FILTER_LABEL))
            .withColumn("_excl_column", F.lit("RequestNo"))
            .withColumn("_excl_value", F.col("RequestNo").cast("string"))
        )
        excluded_frames.append(gone)
        df = kept

    cleaned = df  # survived every exclusion rule; W1 removals are unaudited
    audit = build_audit(excluded_frames, cleaned)

    # W1: top-5 representative rows per RequestNo (adds leaky 'priority')
    df = select_representative_rows(df)

    # J4: fail-open — re-include raw rows whose key was neither kept nor
    # audited (reinstate_unknown_exclusions, process_capex.py:12-56).
    if config.fail_open:
        df = _fail_open(raw_with_id, df, office, audit)

    return PipelineResult(
        processed=df,
        pivot=pivot,
        amc=amc,
        sorter=sorter,
        rental=rental,
        audit=audit,
        cleaned=cleaned,
    )


def _fail_open(
    raw: DataFrame, processed: DataFrame, office: DataFrame, audit: DataFrame
) -> DataFrame:
    """Reinstate unexplained exclusions, then re-normalize — reproducing
    reinstate_unknown_exclusions (process_capex.py:12-56) including its
    side effects on already-processed rows:

    - re-running P1 on the merged frame erases P3's
      'PLANT & MACHINERY - <item>' labels from AssetCategoryName_2
      (process_capex.py:43-46) — a real reference quirk;
    - re-running the zone join recomputes Zone/Region for every row
      (idempotent for previously mapped rows);
    - dedup on (CompositePrimaryKey, AssetItemAmount) keeps processed
      rows over re-included ones (concat order + keep='first', :40-53).
    """
    raw_keyed = raw.withColumn(
        "CompositePrimaryKey",
        robust_key(F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")),
    )
    # Reference quirk (process_capex.py:22-26): the processed side keeps its
    # STRICT keys (P6 already set CompositePrimaryKey, with a trailing '|'
    # on empty vendors) while the raw side uses robust keys — so a kept row
    # with an empty vendor never matches and gets re-included as a
    # duplicate. Reproduced deliberately.
    processed_keys = processed.select("CompositePrimaryKey").distinct()
    audited_keys = audit.select(
        F.col("CompositeKey").alias("CompositePrimaryKey")
    ).distinct()

    add_back = (
        raw_keyed.join(processed_keys, "CompositePrimaryKey", "left_anti")
        .join(audited_keys, "CompositePrimaryKey", "left_anti")
        .withColumn("ReincludedViaFailOpen", F.lit(True))
        .withColumn("FailOpenNote", F.lit("Unknown exclusion; fail-open applied"))
    )

    merged = processed.unionByName(add_back, allowMissingColumns=True)
    # P1 re-run on the merged frame (erases P3 suffixes — see docstring)
    merged = merged.withColumn(
        "AssetCategoryName_2", normalized_category(F.col("AssetCategoryName"))
    )
    # zone join re-run; drop previous Zone/Region first
    merged = add_zone_region(merged.drop("Zone", "Region"), office)
    # keep processed rows over re-included ones, then raw input order
    merged = merged.withColumn(
        "_failopen_ord",
        F.when(F.col("ReincludedViaFailOpen").isNotNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    merged = dedup_keep_first(
        merged.withColumn(
            "_dedup_ord",
            F.col("_failopen_ord") * F.lit(1 << 40) + F.col("_row_id"),
        ),
        ["CompositePrimaryKey", "AssetItemAmount"],
        order_col="_dedup_ord",
    ).drop("_failopen_ord", "_dedup_ord")
    return merged
