"""Exclusion-rule engine — filters F1-F15 (SURVEY.md §2.2) as a
declarative registry of native column predicates, evaluated in *tagging
passes*.

Instead of the reference's 15 sequential frame materializations plus a
global mutable ``EXCLUSION_REASONS`` dict (process_capex.py:9,181-223),
each pass computes every rule predicate in one projection and tags each
row with the *first* matching rule (rules.txt order). Kept rows are the
untagged ones; excluded rows become audit records in the same scan.
One pass = one codegen'd loop over the data; fully parallel.

Audit attribution parity: the reference records a key only when the last
row carrying it disappears, labeled with the rule of *that* step and
valued from the first removed row of that step (process_capex.py:197-220).
``capex_data_pipeline_spark.operators.audit`` reproduces this from the
per-row tags.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from capex_data_pipeline_spark.functions.text import (
    DARK_STORE,
    EXPERIMENTAL,
    IT_NON_RELEVANT,
    PERSONAL_DEVICE_WORDS,
    PERSONAL_NONBUSINESS,
    negation_aware_any,
)
from capex_data_pipeline_spark.operators.projections import contains_any_ci


@dataclass(frozen=True)
class ExclusionRule:
    """One rules.txt rule: name, audit label (exact reference string),
    audit column, and the *exclusion* predicate builder."""

    name: str
    order: int
    label: str
    audit_column: str
    predicate: Callable[[], Column]


def _nan_str(name: str) -> Column:
    """pandas ``astype(str)`` semantics: null renders as the literal 'nan'.
    Needed wherever the reference concatenates columns before matching."""
    return F.coalesce(F.col(name).cast("string"), F.lit("nan"))


def _norm_lower(name: str) -> Column:
    return F.lower(F.trim(F.col(name).cast("string")))


# --- F1 (rule 1, process_capex.py:291-301) ---------------------------------


def _f1_rejected() -> Column:
    return F.coalesce(_norm_lower("CurrentStatus") == "rejected", F.lit(False))


# --- F2 (rule 2, process_capex.py:503-513): '-' removed, null kept ---------


def _f2_dash_vendor() -> Column:
    return F.coalesce(
        F.trim(F.col("IsSelectedVendor").cast("string")) == "-", F.lit(False)
    )


# --- F3 (rule 3, process_capex.py:316-327) ---------------------------------

UNWANTED_FUNCTIONS = ("cs", "fa", "sales", "channel", "vigilance")


def _f3_functions() -> Column:
    return F.coalesce(_norm_lower("RequestFunction").isin(*UNWANTED_FUNCTIONS), F.lit(False))


# --- F4 (rule 3a, process_capex.py:330-382) --------------------------------
# Regexes are the reference's patterns verbatim (they are plain Java-
# compatible syntax): process_capex.py:353-371.

FIRE_REGEX = r"(?i)fire\s*extinguish\w*|\bfire\s*ex\w*|\bfireex\b"
FAN_REGEX = r"(?i)\bfans?\b"
AIRCOND_REGEX = (
    r"(?i)air\s*condit(?:ion|ioner|ioning)?|air[-\s]*conditioning|air\s*condition"
    r"|air\s*conditioner|air\s*conditioning|air\s*con\b|aircon\b|a\s*\/\s*c"
)
AC_WORD_REGEX = r"(?i)\bAC\b"
AC_CONTEXT_REGEX = r"(?i)split|window|\bton\b|inverter|compressor|air|cond"
STOOL_OPS_REGEX = r"(?i)stool\s*-\s*ops"
CCTV_REGEX = r"(?i)\bcctv\b|camera"


def _f4_combined() -> Column:
    # astype(str) + ' ' join over the three columns (process_capex.py:346-350)
    return F.concat_ws(
        " ", _nan_str("AssetItemName"), _nan_str("ItemCategory"), _nan_str("AssetCategoryName")
    )


def _f4_equipment() -> Column:
    c = _f4_combined()
    return (
        c.rlike(FIRE_REGEX)
        | c.rlike(FAN_REGEX)
        | c.rlike(AIRCOND_REGEX)
        | (c.rlike(AC_WORD_REGEX) & c.rlike(AC_CONTEXT_REGEX))
        | c.rlike(CCTV_REGEX)
        | c.rlike(STOOL_OPS_REGEX)
    )


# --- F5 (rule 5, process_capex.py:303-314): runs on normalized _2 ----------

ALLOWED_CATEGORIES = ("computer", "plant & machinery", "leasehold")


def _f5_categories() -> Column:
    return ~F.coalesce(
        _norm_lower("AssetCategoryName_2").isin(*ALLOWED_CATEGORIES), F.lit(False)
    )


# --- F6 (rule 5a, process_capex.py:803-833): negation-aware device match ---


def _f6_personal_devices() -> Column:
    combined = F.concat_ws(
        " ",
        _nan_str("AssetItemName"),
        _nan_str("ItemCategory"),
        _nan_str("AssetCategoryName"),
        _nan_str("UserRemarks"),
    )
    return negation_aware_any(combined, PERSONAL_DEVICE_WORDS)


# --- F7 (rules 6/10, process_capex.py:772-800) -----------------------------

LEGITIMATE_COUNTER_ITEMS = (
    "table",
    "electrical work",
    "interior work",
    "renovation",
    "relocation",
    "construction",
    "installation",
)


def _remarks() -> Column:
    return F.col("UserRemarks")


def _f7_ds_darkstore_counter() -> Column:
    remarks = _remarks()
    ds = F.coalesce(F.col("UserRemarks").cast("string"), F.lit("")).rlike(r"(?i)\bds\b")
    dark = negation_aware_any(remarks, DARK_STORE)
    counter = negation_aware_any(remarks, ("counter",))
    legit = contains_any_ci(F.col("AssetItemName"), LEGITIMATE_COUNTER_ITEMS)
    return ds | dark | (counter & ~legit)


# --- remark-flag disjunction shared by F8/F9/F11/F12/F13 -------------------
# The disjunction is ~15 negation-aware regexes; five rules consume it, so
# it is materialized once per row as a shared pass column (see PASS_C_SHARED)
# rather than re-evaluated inside every consuming predicate.

_NONREL_COL = "_shared_nonrelevant_remarks"


def _nonrelevant_remarks() -> Column:
    remarks = _remarks()
    return (
        negation_aware_any(remarks, IT_NON_RELEVANT)
        | negation_aware_any(remarks, PERSONAL_NONBUSINESS)
        | negation_aware_any(remarks, EXPERIMENTAL)
    )


def _function_remark_rule(function_value: str) -> Callable[[], Column]:
    # exact (untrimmed) equality, as in the reference's boolean masks
    # (process_capex.py:521,615,645,675)
    def _pred() -> Column:
        return F.coalesce(
            (F.col("RequestFunction") == function_value) & F.col(_NONREL_COL),
            F.lit(False),
        )

    return _pred


# --- F9 (rule 9, process_capex.py:546-590) ---------------------------------


def _f9_approval_status() -> Column:
    status = F.col("CurrentStatus")
    # all 'Approval in Progress' rows go (hard-coded, process_capex.py:575-577);
    # 'Sent for Approval' rows go only when remark-flagged.
    return F.coalesce(
        (status == "Approval in Progress")
        | ((status == "Sent for Approval") & F.col(_NONREL_COL)),
        F.lit(False),
    )


# --- F10 (rule 10, process_capex.py:592-607): dark-store re-application ----


def _f10_dark_store() -> Column:
    return negation_aware_any(_remarks(), DARK_STORE)


# --- F14 (rule 18, process_capex.py:847-879) -------------------------------
# Substring (NOT word-bounded) contains over three columns, one reference
# "step" per keyword — 'latest' matches 'test': reproduced deliberately.

NON_OPS_KEYWORDS = (
    "Personal",
    "Individual",
    "Non-operational",
    "Administrative only",
    "test",
    "demo",
    "sample",
)


def _f14_keyword(keyword: str) -> Callable[[], Column]:
    def _pred() -> Column:
        return (
            contains_any_ci(F.col("AssetItemName"), (keyword,))
            | contains_any_ci(F.col("ItemCategory"), (keyword,))
            | contains_any_ci(F.col("UserRemarks"), (keyword,))
        )

    return _pred


def _f14_cctv() -> Column:
    pat = r"(?i)CCTV|camera"
    return (
        F.coalesce(F.col("AssetItemName").cast("string").rlike(pat), F.lit(False))
        | F.coalesce(F.col("ItemCategory").cast("string").rlike(pat), F.lit(False))
        | F.coalesce(F.col("UserRemarks").cast("string").rlike(pat), F.lit(False))
    )


# --- the ordered registry ---------------------------------------------------
# Grouped into passes; pass boundaries are where projections/joins mutate
# columns the later rules read (SURVEY.md §4.3).

PASS_A = (
    ExclusionRule("F1_rejected", 1, "1: Rejected status", "CurrentStatus", _f1_rejected),
    ExclusionRule("F2_dash_vendor", 2, "2: IsSelectedVendor is '-'", "IsSelectedVendor", _f2_dash_vendor),
    ExclusionRule(
        "F3_functions",
        3,
        "3: Removed RequestFunction (CS/FA/Sales/Channel/Vigilance)",
        "RequestFunction",
        _f3_functions,
    ),
    ExclusionRule(
        "F4_equipment",
        4,
        "3a: Excluded equipment (AirCon/Fan/FireExt/CCTV/STOOL-Ops)",
        "AssetItemName",
        _f4_equipment,
    ),
)

PASS_B = (
    ExclusionRule(
        "F5_categories",
        5,
        "5: Asset category not in [COMPUTER, PLANT & MACHINERY, LEASEHOLD]",
        "AssetCategoryName_2",
        _f5_categories,
    ),
    ExclusionRule(
        "F6_personal_devices",
        6,
        "19: Personal devices excluded (laptop/macbook/tablet/phone)",
        "AssetItemName",
        _f6_personal_devices,
    ),
    ExclusionRule(
        "F7_ds_darkstore_counter",
        7,
        "6/10: UserRemarks mention DS/dark store/counter",
        "UserRemarks",
        _f7_ds_darkstore_counter,
    ),
)

PASS_C = (
    ExclusionRule(
        "F8_it", 8, "8: IT non-relevant by UserRemarks", "UserRemarks", _function_remark_rule("IT")
    ),
    ExclusionRule(
        "F9_approval",
        9,
        "9: Removed Approval in Progress/Sent for Approval (non-relevant)",
        "CurrentStatus",
        _f9_approval_status,
    ),
    ExclusionRule(
        "F10_dark_store", 10, "10: UserRemarks mention dark store", "UserRemarks", _f10_dark_store
    ),
    ExclusionRule(
        "F11_admin",
        11,
        "11: Admin non-relevant by UserRemarks",
        "UserRemarks",
        _function_remark_rule("Admin"),
    ),
    ExclusionRule(
        "F12_ops",
        12,
        "12: Ops non-relevant by UserRemarks",
        "UserRemarks",
        _function_remark_rule("Ops"),
    ),
    ExclusionRule(
        "F13_ops_it",
        13,
        "13: Ops through IT non-relevant by UserRemarks",
        "UserRemarks",
        _function_remark_rule("Ops through IT"),
    ),
)

PASS_D = tuple(
    ExclusionRule(
        f"F14_{kw.lower().replace(' ', '_').replace('-', '_')}",
        14 + i,
        f"18: Non-Ops equipment keyword ('{kw}')",
        "AssetItemName",
        _f14_keyword(kw),
    )
    for i, kw in enumerate(NON_OPS_KEYWORDS)
) + (
    ExclusionRule(
        "F14_cctv",
        14 + len(NON_OPS_KEYWORDS),
        "18: Non-Ops equipment keyword ('CCTV/camera')",
        "AssetItemName",
        _f14_cctv,
    ),
)

ALL_PASSES: tuple[tuple[ExclusionRule, ...], ...] = (PASS_A, PASS_B, PASS_C, PASS_D)

#: shared-expression columns each pass materializes before its predicates
#: run (regex work consumed by several rules is computed once per row)
PASS_SHARED: dict[int, dict[str, Callable[[], Column]]] = {
    id(PASS_C): {_NONREL_COL: _nonrelevant_remarks},
}


def tag_pass(df: DataFrame, rules: tuple[ExclusionRule, ...]) -> DataFrame:
    """Add first-matching-rule tag columns: ``_excl_order`` (int, null =
    kept), ``_excl_label``, ``_excl_column``, ``_excl_value``.

    Every predicate is evaluated exactly ONCE per row into an
    intermediate boolean column; the four tag chains then reference
    those attributes. (Building the chains directly over the predicate
    expressions would evaluate each — including the expensive
    negation-regex ones — four times per row; Catalyst's CollapseProject
    deliberately refuses to inline non-trivial expressions referenced
    more than once, so the staging survives optimization.)
    """
    shared = PASS_SHARED.get(id(rules), {})
    # two batched withColumns calls: every withColumn triggers a full
    # plan re-analysis on the driver, which adds up on a plan this wide
    stage_cols: dict[str, Column] = {name: build() for name, build in shared.items()}
    # shared columns must resolve before predicates that reference them
    staged = df.withColumns(stage_cols) if stage_cols else df
    pred_names = [f"_pred_{rule.order}" for rule in rules]
    staged = staged.withColumns(
        {
            f"_pred_{rule.order}": F.coalesce(rule.predicate(), F.lit(False))
            for rule in rules
        }
    )

    order_expr: Column = F.lit(None).cast("int")
    label_expr: Column = F.lit(None).cast("string")
    column_expr: Column = F.lit(None).cast("string")
    value_expr: Column = F.lit(None).cast("string")
    # build WHEN chain in reverse so the first rule ends up outermost
    for rule in reversed(rules):
        pred = F.col(f"_pred_{rule.order}")
        order_expr = F.when(pred, F.lit(rule.order)).otherwise(order_expr)
        label_expr = F.when(pred, F.lit(rule.label)).otherwise(label_expr)
        column_expr = F.when(pred, F.lit(rule.audit_column)).otherwise(column_expr)
        value_expr = F.when(
            pred, F.col(rule.audit_column).cast("string")
        ).otherwise(value_expr)
    return staged.withColumns(
        {
            "_excl_order": order_expr,
            "_excl_label": label_expr,
            "_excl_column": column_expr,
            "_excl_value": value_expr,
        }
    ).drop(*pred_names, *shared.keys())


def split_pass(
    df: DataFrame, rules: tuple[ExclusionRule, ...]
) -> tuple[DataFrame, DataFrame]:
    """Run one tagging pass; return (kept, excluded) frames. ``excluded``
    carries the tag columns for the audit builder."""
    tagged = tag_pass(df, rules)
    kept = tagged.filter(F.col("_excl_order").isNull()).drop(
        "_excl_order", "_excl_label", "_excl_column", "_excl_value"
    )
    excluded = tagged.filter(F.col("_excl_order").isNotNull())
    return kept, excluded


TAG_COLUMNS = ("_excl_order", "_excl_label", "_excl_column", "_excl_value")


def init_tags(df: DataFrame) -> DataFrame:
    """Start the accumulated-lineage frame: null tag columns."""
    return df.withColumns(
        {
            "_excl_order": F.lit(None).cast("int"),
            "_excl_label": F.lit(None).cast("string"),
            "_excl_column": F.lit(None).cast("string"),
            "_excl_value": F.lit(None).cast("string"),
        }
    )


def accumulate_pass(df: DataFrame, rules: tuple[ExclusionRule, ...]) -> DataFrame:
    """Apply one tagging pass WITHOUT splitting the frame: rows already
    tagged keep their first tag; untagged rows matching a rule gain it.

    Keeping everything in one frame means the expensive upstream (scan,
    regexes, joins) is evaluated once for all downstream consumers
    (kept rows, audit, fail-open) instead of once per split branch —
    the difference between 1 and ~6 full input scans at 100 TB.
    Predicates run on already-excluded rows too (their result is
    discarded by the coalesce), trading a little CPU for plan linearity.
    """
    stage = tag_pass(
        df.withColumnsRenamed(
            {
                "_excl_order": "_prev_order",
                "_excl_label": "_prev_label",
                "_excl_column": "_prev_column",
                "_excl_value": "_prev_value",
            }
        ),
        rules,
    )
    merged = stage.withColumns(
        {
            "_excl_order": F.coalesce("_prev_order", "_excl_order"),
            "_excl_label": F.coalesce("_prev_label", "_excl_label"),
            "_excl_column": F.coalesce("_prev_column", "_excl_column"),
            "_excl_value": F.when(
                F.col("_prev_order").isNotNull(), F.col("_prev_value")
            ).otherwise(F.col("_excl_value")),
        }
    )
    return merged.drop("_prev_order", "_prev_label", "_prev_column", "_prev_value")
