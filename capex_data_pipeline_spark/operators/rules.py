"""Exclusion-rule engine — filters F1-F15 (SURVEY.md §2.2) as a
declarative registry of native SQL predicates, evaluated in *tagging
passes*.

Instead of the reference's 15 sequential frame materializations plus a
global mutable ``EXCLUSION_REASONS`` dict (process_capex.py:9,181-223),
each pass computes every rule predicate in one projection and tags each
row with the *first* matching rule (rules.txt order). Kept rows are the
untagged ones; excluded rows become audit records in the same scan.
One pass = one codegen'd loop over the data; fully parallel.

Predicates are SQL *strings*, assembled in pure Python and handed to the
JVM as ONE ``selectExpr`` per pass. The earlier Column-object version
spent most of the pipeline's wall-clock on the driver: every ``F.when``/
``F.col`` call is a py4j round trip, and every ``withColumns`` re-runs
the analyzer over the whole (growing) plan. One selectExpr per pass is
a single parse + single analysis, independent of how many rules the
pass carries. Execution-side the plan is identical: the predicates
stage into boolean columns (lateral column aliases -> nested Projects)
that whole-stage codegen evaluates once per row.

Audit attribution parity: the reference records a key only when the last
row carrying it disappears, labeled with the rule of *that* step and
valued from the first removed row of that step (process_capex.py:197-220).
``capex_data_pipeline_spark.operators.audit`` reproduces this from the
per-row tags.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from capex_data_pipeline_spark.functions.text import (
    DARK_STORE,
    EXPERIMENTAL,
    IT_NON_RELEVANT,
    PERSONAL_DEVICE_WORDS,
    PERSONAL_NONBUSINESS,
    negation_aware_any_pattern,
)


@dataclass(frozen=True)
class ExclusionRule:
    """One rules.txt rule: name, audit label (exact reference string),
    audit column, and the *exclusion* predicate as a SQL boolean expr."""

    name: str
    order: int
    label: str
    audit_column: str
    predicate: str


def sql_str(s: str) -> str:
    """A SQL string literal (default Spark parser escaping: backslash is
    the escape char, so literal backslashes — ubiquitous in the Java
    regexes below — and quotes must be doubled/escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _nan_str(name: str) -> str:
    """pandas ``astype(str)`` semantics: null renders as the literal 'nan'.
    Needed wherever the reference concatenates columns before matching."""
    return f"COALESCE(CAST(`{name}` AS STRING), 'nan')"


def _empty_str(name: str) -> str:
    """None/NaN-safe remark normalization (process_capex.py:82-85)."""
    return f"COALESCE(CAST(`{name}` AS STRING), '')"


def _norm_lower(name: str) -> str:
    return f"lower(trim(CAST(`{name}` AS STRING)))"


def _rlike(expr: str, pattern: str) -> str:
    return f"({expr} RLIKE {sql_str(pattern)})"


def _contains_ci(name: str, literal: str) -> str:
    """pandas ``str.contains(lit, case=False, na=False)`` equivalent:
    case-insensitive substring, null -> False."""
    return (
        f"COALESCE(CONTAINS(lower(CAST(`{name}` AS STRING)),"
        f" {sql_str(literal.lower())}), false)"
    )


def _contains_any_ci(name: str, literals) -> str:
    # Empty literal list must stay a valid (vacuously-false) SQL expression —
    # "()" is a parse error and the Column path returns lit(False).
    if not literals:
        return "false"
    return "(" + " OR ".join(_contains_ci(name, lit) for lit in literals) + ")"


def _negation_aware_any(expr: str, phrases) -> str:
    return _rlike(expr, negation_aware_any_pattern(phrases))


# --- F1 (rule 1, process_capex.py:291-301) ---------------------------------

_F1 = f"({_norm_lower('CurrentStatus')} = 'rejected')"

# --- F2 (rule 2, process_capex.py:503-513): '-' removed, null kept ---------

_F2 = "(trim(CAST(`IsSelectedVendor` AS STRING)) = '-')"

# --- F3 (rule 3, process_capex.py:316-327) ---------------------------------

UNWANTED_FUNCTIONS = ("cs", "fa", "sales", "channel", "vigilance")

_F3 = (
    f"({_norm_lower('RequestFunction')} IN "
    "('cs', 'fa', 'sales', 'channel', 'vigilance'))"
)

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

# astype(str) + ' ' join over the three columns (process_capex.py:346-350);
# six regexes read it, so each pass stages it once per row (PASS_SHARED)
_F4_TEXT_COL = "_shared_f4_text"
_F4_TEXT_SQL = (
    "CONCAT_WS(' ', "
    + ", ".join(_nan_str(c) for c in ("AssetItemName", "ItemCategory", "AssetCategoryName"))
    + ")"
)

_F4 = (
    "("
    + " OR ".join(
        [
            _rlike(_F4_TEXT_COL, FIRE_REGEX),
            _rlike(_F4_TEXT_COL, FAN_REGEX),
            _rlike(_F4_TEXT_COL, AIRCOND_REGEX),
            f"({_rlike(_F4_TEXT_COL, AC_WORD_REGEX)}"
            f" AND {_rlike(_F4_TEXT_COL, AC_CONTEXT_REGEX)})",
            _rlike(_F4_TEXT_COL, CCTV_REGEX),
            _rlike(_F4_TEXT_COL, STOOL_OPS_REGEX),
        ]
    )
    + ")"
)

# --- F5 (rule 5, process_capex.py:303-314): runs on normalized _2 ----------

ALLOWED_CATEGORIES = ("computer", "plant & machinery", "leasehold")

_F5 = (
    f"(NOT COALESCE({_norm_lower('AssetCategoryName_2')} IN "
    "('computer', 'plant & machinery', 'leasehold'), false))"
)

# --- F6 (rule 5a, process_capex.py:803-833): negation-aware device match ---

_F6_TEXT = (
    "CONCAT_WS(' ', "
    + ", ".join(
        _nan_str(c)
        for c in ("AssetItemName", "ItemCategory", "AssetCategoryName", "UserRemarks")
    )
    + ")"
)
_F6 = _negation_aware_any(_F6_TEXT, PERSONAL_DEVICE_WORDS)

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

_REMARKS = _empty_str("UserRemarks")

_F7 = (
    "("
    + _rlike(_REMARKS, r"(?i)\bds\b")
    + " OR "
    + _negation_aware_any(_REMARKS, DARK_STORE)
    + " OR ("
    + _negation_aware_any(_REMARKS, ("counter",))
    + f" AND NOT {_contains_any_ci('AssetItemName', LEGITIMATE_COUNTER_ITEMS)})"
    + ")"
)

# --- remark-flag disjunction shared by F8/F9/F11/F12/F13 -------------------
# The three phrase families compile into ONE alternation regex (the
# negation lookbehind is evaluated per alternation match, so a single
# combined pattern is equivalent to OR-ing the three — and scans each
# remark once instead of three times). Five rules consume the result,
# so it is materialized once per row as a shared pass column.

_NONREL_COL = "_shared_nonrelevant_remarks"
# gated on "row still untagged" so the expensive lookbehind regex is
# skipped for rows excluded by an earlier pass (AND short-circuits)
_NONREL_SQL = "((_excl_order IS NULL) AND " + _negation_aware_any(
    _REMARKS, IT_NON_RELEVANT + PERSONAL_NONBUSINESS + EXPERIMENTAL
) + ")"


def _function_remark_rule(function_value: str) -> str:
    # exact (untrimmed) equality, as in the reference's boolean masks
    # (process_capex.py:521,615,645,675)
    return f"((`RequestFunction` = {sql_str(function_value)}) AND {_NONREL_COL})"


# --- F9 (rule 9, process_capex.py:546-590) ---------------------------------
# all 'Approval in Progress' rows go (hard-coded, process_capex.py:575-577);
# 'Sent for Approval' rows go only when remark-flagged.

_F9 = (
    "((`CurrentStatus` = 'Approval in Progress')"
    f" OR ((`CurrentStatus` = 'Sent for Approval') AND {_NONREL_COL}))"
)

# --- F10 (rule 10, process_capex.py:592-607): dark-store re-application ----

_F10 = _negation_aware_any(_REMARKS, DARK_STORE)

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

_F14_COLS = ("AssetItemName", "ItemCategory", "UserRemarks")


def _f14_keyword(keyword: str) -> str:
    return "(" + " OR ".join(_contains_ci(c, keyword) for c in _F14_COLS) + ")"


_F14_CCTV = (
    "("
    + " OR ".join(
        f"COALESCE({_rlike(f'CAST(`{c}` AS STRING)', r'(?i)CCTV|camera')}, false)"
        for c in _F14_COLS
    )
    + ")"
)

# --- the ordered registry ---------------------------------------------------
# Grouped into passes; pass boundaries are where projections/joins mutate
# columns the later rules read (SURVEY.md §4.3).

PASS_A = (
    ExclusionRule("F1_rejected", 1, "1: Rejected status", "CurrentStatus", _F1),
    ExclusionRule("F2_dash_vendor", 2, "2: IsSelectedVendor is '-'", "IsSelectedVendor", _F2),
    ExclusionRule(
        "F3_functions",
        3,
        "3: Removed RequestFunction (CS/FA/Sales/Channel/Vigilance)",
        "RequestFunction",
        _F3,
    ),
    ExclusionRule(
        "F4_equipment",
        4,
        "3a: Excluded equipment (AirCon/Fan/FireExt/CCTV/STOOL-Ops)",
        "AssetItemName",
        _F4,
    ),
)

PASS_B = (
    ExclusionRule(
        "F5_categories",
        5,
        "5: Asset category not in [COMPUTER, PLANT & MACHINERY, LEASEHOLD]",
        "AssetCategoryName_2",
        _F5,
    ),
    ExclusionRule(
        "F6_personal_devices",
        6,
        "19: Personal devices excluded (laptop/macbook/tablet/phone)",
        "AssetItemName",
        _F6,
    ),
    ExclusionRule(
        "F7_ds_darkstore_counter",
        7,
        "6/10: UserRemarks mention DS/dark store/counter",
        "UserRemarks",
        _F7,
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
        _F9,
    ),
    ExclusionRule(
        "F10_dark_store", 10, "10: UserRemarks mention dark store", "UserRemarks", _F10
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
        _F14_CCTV,
    ),
)

ALL_PASSES: tuple[tuple[ExclusionRule, ...], ...] = (PASS_A, PASS_B, PASS_C, PASS_D)

#: shared-expression columns each pass materializes before its predicates
#: run (regex work consumed by several rules is computed once per row)
PASS_SHARED: dict[int, dict[str, str]] = {
    id(PASS_A): {_F4_TEXT_COL: _F4_TEXT_SQL},
    id(PASS_C): {_NONREL_COL: _NONREL_SQL},
}

TAG_COLUMNS = ("_excl_order", "_excl_label", "_excl_column", "_excl_value")


def init_tags(df: DataFrame) -> DataFrame:
    """Start the accumulated-lineage frame: null tag columns."""
    return df.selectExpr(
        "*",
        "CAST(NULL AS INT) AS _excl_order",
        "CAST(NULL AS STRING) AS _excl_label",
        "CAST(NULL AS STRING) AS _excl_column",
        "CAST(NULL AS STRING) AS _excl_value",
    )


def accumulate_pass(df: DataFrame, rules: tuple[ExclusionRule, ...]) -> DataFrame:
    """Apply one tagging pass WITHOUT splitting the frame: rows already
    tagged keep their first tag; untagged rows matching a rule gain it.

    Keeping everything in one frame means the expensive upstream (scan,
    regexes, joins) is evaluated once for all downstream consumers
    (kept rows, audit, fail-open) instead of once per split branch —
    the difference between 1 and ~6 full input scans at 100 TB.
    Predicates run on already-excluded rows too (their result is
    discarded by the CASE), trading a little CPU for plan linearity.

    The whole pass is ONE selectExpr: shared subexpressions and rule
    predicates stage as lateral column aliases (each evaluated once per
    row — the analyzer rewrites them into nested Projects, and
    CollapseProject refuses to inline non-cheap exprs referenced more
    than once), and four CASE chains fold the first matching rule into
    the accumulated tag columns.
    """
    shared = PASS_SHARED.get(id(rules), {})
    pred_names = [f"_pred_{rule.order}" for rule in rules]

    select: list[str] = [f"`{c}`" for c in df.columns if c not in TAG_COLUMNS]
    select += [f"{expr} AS {name}" for name, expr in shared.items()]
    # (_excl_order IS NULL) short-circuits the (regex-heavy) predicate
    # for rows an earlier pass already tagged — their result would be
    # discarded by the CASE anyway, and on real data most excluded rows
    # are tagged early, so this skips most of the regex work
    select += [
        f"COALESCE((_excl_order IS NULL) AND ({rule.predicate}), false)"
        f" AS _pred_{rule.order}"
        for rule in rules
    ]

    def chain(result: str, per_rule) -> str:
        # previously tagged rows keep their tag; otherwise first match wins
        branches = " ".join(
            f"WHEN _pred_{rule.order} THEN {per_rule(rule)}" for rule in rules
        )
        return (
            f"CASE WHEN _excl_order IS NOT NULL THEN {result} {branches} "
            f"ELSE {result} END AS {result}"
        )

    select += [
        chain("_excl_order", lambda r: str(r.order)),
        chain("_excl_label", lambda r: sql_str(r.label)),
        chain("_excl_column", lambda r: sql_str(r.audit_column)),
        chain("_excl_value", lambda r: f"CAST(`{r.audit_column}` AS STRING)"),
    ]
    return df.selectExpr(*select).drop(*pred_names, *shared.keys())


def tag_pass(df: DataFrame, rules: tuple[ExclusionRule, ...]) -> DataFrame:
    """Tag a fresh (untagged) frame with this pass's rules."""
    return accumulate_pass(init_tags(df), rules)


def split_pass(
    df: DataFrame, rules: tuple[ExclusionRule, ...]
) -> tuple[DataFrame, DataFrame]:
    """Run one tagging pass; return (kept, excluded) frames. ``excluded``
    carries the tag columns for the audit builder."""
    from pyspark.sql import functions as F

    tagged = tag_pass(df, rules)
    kept = tagged.filter(F.col("_excl_order").isNull()).drop(*TAG_COLUMNS)
    excluded = tagged.filter(F.col("_excl_order").isNotNull())
    return kept, excluded
