"""DuckDB oracle SQL for the full capex rule DAG on the synthesized
corpus input — used by q90/q91's driver-contract oracles.

The generator mirrors, stage by stage, what ``plans/pipeline.py`` builds
as a Spark plan (reference: process_capex.py, see SURVEY.md §3):
synth raw → P2/P1 category rewrite → first-match rule tagging F1-F18 →
robust/strict keys → audit attribution → zone join → W1 top-5 (native
deterministic ties) → J4 fail-open with its P1-rerun / zone-rerun /
dedup side effects.

Everything is plain DuckDB SQL assembled from Python constants that are
IMPORTED from the Spark-side modules where possible, so the two engines
cannot drift silently. Negation-aware phrase matching (Java bounded
lookbehind on the Spark side — RE2 has no lookbehind) is restated from
first principles: all word-bounded occurrence positions via substring
probing, negation window = last 3 tokens of the prefix.

Row-order surrogate: ``_row_id`` on the Spark side is assigned below
the ingest exchange from the parquet read, whose split order follows
file offsets — order-isomorphic to ``o_orderkey`` (the testdata orders
table is written in key order; asserted in tests).
"""

from __future__ import annotations

from capex_data_pipeline_spark.functions.text import (
    DARK_STORE,
    EXPERIMENTAL,
    IT_NON_RELEVANT,
    NEGATION_WORDS,
    PERSONAL_DEVICE_WORDS,
    PERSONAL_NONBUSINESS,
)
from capex_data_pipeline_spark.operators.projections import (
    CATEGORY_NORMALIZATION,
    P2_ALLOWED_ITEMS,
    P3_SEPARATED_ITEMS,
    AMC_KEYWORDS,
    RENTAL_KEYWORDS,
    SORTER_KEYWORDS,
    _P2_TYPO_MAP,
)
from capex_data_pipeline_spark.operators.rules import (
    ALL_PASSES,
    LEGITIMATE_COUNTER_ITEMS,
    NON_OPS_KEYWORDS,
    UNWANTED_FUNCTIONS,
)

# --- synth pools (plans/synth.py — keep in sync) ---------------------------
from capex_data_pipeline_spark.plans.synth import (
    _CATEGORY,
    _FUNCTION,
    _ITEM_SUFFIX,
    _REMARKS,
    _STATUS,
)


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _arr(values) -> str:
    return "[" + ", ".join(_lit(v) for v in values) + "]"


_NEG_ARR = _arr(NEGATION_WORDS)


def _neg_aware_any(text_expr: str, phrases) -> str:
    """DuckDB restatement of functions.text.negation_aware_any_pattern:
    some phrase has a word-bounded occurrence in ``text_expr`` (already
    lowercased) whose 3-token prefix window contains no negation word.
    Word boundary = Java regex \\b (word chars [a-z0-9_] on lowered
    text); window tokens = [a-z0-9']+ (the reference tokenizer)."""
    alts = []
    for phrase in dict.fromkeys(p.lower().strip() for p in phrases):
        n = len(phrase)
        # two-stage filter: the inner pass is a cheap substring probe per
        # position; boundary + negation-window checks (incl. tokenizing
        # the prefix) run only at actual occurrence positions. The
        # contains() guard skips the position scan entirely for the vast
        # majority of rows that never mention the phrase.
        alts.append(
            f"""(contains({text_expr}, {_lit(phrase)}) AND len(list_filter(
      list_filter(range(1, greatest(len({text_expr}) - {n} + 2, 1)),
                  i -> substr({text_expr}, i, {n}) = {_lit(phrase)}),
      i -> (i = 1 OR NOT regexp_matches(substr({text_expr}, i - 1, 1), '[a-z0-9_]'))
      AND NOT regexp_matches(substr({text_expr}, i + {n}, 1), '[a-z0-9_]')
      AND NOT list_has_any(
            (regexp_extract_all(substr({text_expr}, 1, i - 1), '[a-z0-9'']+'))[
              greatest(len(regexp_extract_all(substr({text_expr}, 1, i - 1), '[a-z0-9'']+')) - 2, 1)
              : len(regexp_extract_all(substr({text_expr}, 1, i - 1), '[a-z0-9'']+'))],
            {_NEG_ARR})
    )) > 0)"""
        )
    return "(" + " OR ".join(alts) + ")"


def _contains_ci(expr: str, literal: str) -> str:
    return f"coalesce(contains(lower({expr}), {_lit(literal.lower())}), false)"


def _contains_any_ci(expr: str, literals) -> str:
    # keep the empty-list edge in lockstep with rules._contains_any_ci:
    # "()" is a parse error in DuckDB too, and the engine side compiles
    # an empty list to a vacuously-false predicate
    if not literals:
        return "false"
    return "(" + " OR ".join(_contains_ci(expr, lit) for lit in literals) + ")"


def _case_map(expr: str, mapping: dict[str, str]) -> str:
    whens = " ".join(
        f"WHEN {_lit(k)} THEN {_lit(v)}" for k, v in mapping.items()
    )
    return f"(CASE {expr} {whens} ELSE {expr} END)"


# ---------------------------------------------------------------------------
# Synth raw + P2/P1 + rule predicates
# ---------------------------------------------------------------------------

# Spark F.round(double, 2) = BigDecimal.valueOf (shortest decimal repr)
# + HALF_UP. DuckDB's round(DOUBLE, 2) differs at representation
# boundaries, but VARCHAR (shortest repr) -> DECIMAL -> round(_, 2)
# (HALF_UP on decimals) reproduces the BigDecimal semantics exactly.
# (A DECIMAL(30,10)->DECIMAL(30,2) cast would NOT: rescale truncates.)
_AMOUNT = (
    "CAST(round(CAST(CAST(o_totalprice / 10 AS VARCHAR) AS DECIMAL(38,20)), 2)"
    " AS DOUBLE)"
)

_RAW_CTE = f"""
raw AS (
  SELECT
    o_orderkey AS ord,
    'REQ-' || CAST(o_orderkey // 4 AS VARCHAR) AS RequestNo,
    CASE WHEN o_orderkey % 7 = 0 THEN 'ZZ' || (o_custkey % 5)
         ELSE 'B' || (o_custkey % 25) END AS BranchCode,
    ({_arr(_FUNCTION)})[(o_custkey % {len(_FUNCTION)}) + 1] AS RequestFunction,
    ({_arr(_REMARKS)})[(o_orderkey % {len(_REMARKS)}) + 1] AS UserRemarks,
    ({_arr(_STATUS)})[(o_orderkey % {len(_STATUS)}) + 1] AS CurrentStatus,
    ({_arr(_CATEGORY)})[((o_custkey + 1) % {len(_CATEGORY)}) + 1] AS AssetCategoryName,
    ({_arr(_ITEM_SUFFIX)})[((o_orderkey + 3) % {len(_ITEM_SUFFIX)}) + 1]
      || ' #' || (o_orderkey % 97) AS AssetItemName,
    'OPSASSET' AS ItemCategory,
    {_AMOUNT} AS AssetItemAmount,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
         ELSE 'Vendor ' || (o_orderkey % 11) END AS VendorName,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
         WHEN o_orderkey % 3 = 1 THEN 'Yes' ELSE '-' END AS IsSelectedVendor
  FROM orders
)"""

_P2_CAT = _case_map("upper(trim(AssetCategoryName))", _P2_TYPO_MAP)
_P2_SHOULD = (
    f"((regexp_matches({_P2_CAT}, '\\bOFFICE\\b.*\\bEQUIP')"
    f" OR regexp_matches({_P2_CAT}, '\\bFURNIT'))"
    f" AND NOT {_contains_any_ci('AssetItemName', P2_ALLOWED_ITEMS)})"
)

_P2P1_CTE = f"""
p2p1 AS (
  -- P2 mutates AssetCategoryName; P1 derives AssetCategoryName_2 from
  -- the mutated value (reference order :1123-1125)
  SELECT *,
    CASE WHEN {_P2_SHOULD} THEN 'PLANT & MACHINERY'
         ELSE AssetCategoryName END AS cat_p2
  FROM raw
),
p1 AS (
  SELECT *, {_case_map("upper(trim(cat_p2))", CATEGORY_NORMALIZATION)} AS norm2
  FROM p2p1
)"""


def _rule_predicates() -> list[tuple[int, str, str, str, str]]:
    """(order, label, audit column, value SQL, predicate SQL) per rule,
    in rules.txt order — predicates restated over the p1 CTE columns
    with the same pre/post-mutation column versions each pass saw."""
    remarks = "lower(coalesce(UserRemarks, ''))"
    f4_text = (
        "lower(concat_ws(' ', coalesce(AssetItemName, 'nan'),"
        " coalesce(ItemCategory, 'nan'), coalesce(AssetCategoryName, 'nan')))"
    )
    # F6 sees the post-P2 category (pass B runs after the P2/P1 block)
    f6_text = (
        "lower(concat_ws(' ', coalesce(AssetItemName, 'nan'),"
        " coalesce(ItemCategory, 'nan'), coalesce(cat_p2, 'nan'),"
        " coalesce(UserRemarks, 'nan')))"
    )
    nonrel = _neg_aware_any(
        remarks, IT_NON_RELEVANT + PERSONAL_NONBUSINESS + EXPERIMENTAL
    )

    def fr(func: str) -> str:
        return f"(RequestFunction = {_lit(func)} AND {nonrel})"

    # F4 patterns are RE2-compatible as written ((?i), \b, \s, \w)
    f4 = (
        f"(regexp_matches({f4_text}, '(?i)fire\\s*extinguish\\w*|\\bfire\\s*ex\\w*|\\bfireex\\b')"
        f" OR regexp_matches({f4_text}, '(?i)\\bfans?\\b')"
        f" OR regexp_matches({f4_text}, '(?i)air\\s*condit(?:ion|ioner|ioning)?|air[-\\s]*conditioning|air\\s*condition|air\\s*conditioner|air\\s*conditioning|air\\s*con\\b|aircon\\b|a\\s*\\/\\s*c')"
        f" OR (regexp_matches({f4_text}, '(?i)\\bAC\\b')"
        f"     AND regexp_matches({f4_text}, '(?i)split|window|\\bton\\b|inverter|compressor|air|cond'))"
        f" OR regexp_matches({f4_text}, '(?i)\\bcctv\\b|camera')"
        f" OR regexp_matches({f4_text}, '(?i)stool\\s*-\\s*ops'))"
    )
    f7 = (
        f"(regexp_matches({remarks}, '(?i)\\bds\\b')"
        f" OR {_neg_aware_any(remarks, DARK_STORE)}"
        f" OR ({_neg_aware_any(remarks, ('counter',))}"
        f"     AND NOT {_contains_any_ci('AssetItemName', LEGITIMATE_COUNTER_ITEMS)}))"
    )

    rules: list[tuple[int, str, str, str, str]] = [
        (1, "1: Rejected status", "CurrentStatus", "CurrentStatus",
         "(lower(trim(CurrentStatus)) = 'rejected')"),
        (2, "2: IsSelectedVendor is '-'", "IsSelectedVendor", "IsSelectedVendor",
         "(trim(IsSelectedVendor) = '-')"),
        (3, "3: Removed RequestFunction (CS/FA/Sales/Channel/Vigilance)",
         "RequestFunction", "RequestFunction",
         f"(lower(trim(RequestFunction)) IN ({', '.join(_lit(f) for f in UNWANTED_FUNCTIONS)}))"),
        (4, "3a: Excluded equipment (AirCon/Fan/FireExt/CCTV/STOOL-Ops)",
         "AssetItemName", "AssetItemName", f4),
        (5, "5: Asset category not in [COMPUTER, PLANT & MACHINERY, LEASEHOLD]",
         "AssetCategoryName_2", "norm2",
         "(NOT coalesce(lower(trim(norm2)) IN ('computer', 'plant & machinery', 'leasehold'), false))"),
        (6, "19: Personal devices excluded (laptop/macbook/tablet/phone)",
         "AssetItemName", "AssetItemName",
         _neg_aware_any(f6_text, PERSONAL_DEVICE_WORDS)),
        (7, "6/10: UserRemarks mention DS/dark store/counter",
         "UserRemarks", "UserRemarks", f7),
        (8, "8: IT non-relevant by UserRemarks", "UserRemarks", "UserRemarks",
         fr("IT")),
        (9, "9: Removed Approval in Progress/Sent for Approval (non-relevant)",
         "CurrentStatus", "CurrentStatus",
         f"((CurrentStatus = 'Approval in Progress')"
         f" OR (CurrentStatus = 'Sent for Approval' AND {nonrel}))"),
        (10, "10: UserRemarks mention dark store", "UserRemarks", "UserRemarks",
         _neg_aware_any(remarks, DARK_STORE)),
        (11, "11: Admin non-relevant by UserRemarks", "UserRemarks", "UserRemarks",
         fr("Admin")),
        (12, "12: Ops non-relevant by UserRemarks", "UserRemarks", "UserRemarks",
         fr("Ops")),
        (13, "13: Ops through IT non-relevant by UserRemarks", "UserRemarks",
         "UserRemarks", fr("Ops through IT")),
    ]
    for i, kw in enumerate(NON_OPS_KEYWORDS):
        rules.append(
            (14 + i, f"18: Non-Ops equipment keyword ('{kw}')", "AssetItemName",
             "AssetItemName",
             "(" + " OR ".join(
                 _contains_ci(c, kw)
                 for c in ("AssetItemName", "ItemCategory", "UserRemarks")
             ) + ")")
        )
    rules.append(
        (14 + len(NON_OPS_KEYWORDS), "18: Non-Ops equipment keyword ('CCTV/camera')",
         "AssetItemName", "AssetItemName",
         "(" + " OR ".join(
             f"coalesce(regexp_matches({c}, '(?i)CCTV|camera'), false)"
             for c in ("AssetItemName", "ItemCategory", "UserRemarks")
         ) + ")")
    )
    return rules


def _tagged_cte() -> str:
    rules = _rule_predicates()

    def chain(per_rule) -> str:
        return " ".join(
            f"WHEN {pred} THEN {per_rule(order, label, col, val)}"
            for order, label, col, val, pred in rules
        )

    order_c = "CASE " + chain(lambda o, l, c, v: str(o)) + " ELSE NULL END"
    label_c = "CASE " + chain(lambda o, l, c, v: _lit(l)) + " ELSE NULL END"
    col_c = "CASE " + chain(lambda o, l, c, v: _lit(c)) + " ELSE NULL END"
    val_c = "CASE " + chain(lambda o, l, c, v: v) + " ELSE NULL END"
    return f"""
tagged AS MATERIALIZED (
  SELECT *,
    {order_c} AS rule_order,
    {label_c} AS rule_label,
    {col_c} AS rule_column,
    {val_c} AS rule_value,
    -- robust key: astype(str)-first (nulls render 'nan'; vendor 'nan'->'')
    trim(coalesce(RequestNo, 'nan')) || '|' || trim(coalesce(AssetItemName, 'nan'))
      || CASE WHEN coalesce(CASE WHEN trim(coalesce(VendorName, 'nan')) = 'nan'
                                 THEN '' ELSE trim(coalesce(VendorName, 'nan')) END, '') <> ''
              THEN '|' || CASE WHEN trim(coalesce(VendorName, 'nan')) = 'nan'
                               THEN '' ELSE trim(coalesce(VendorName, 'nan')) END
              ELSE '' END AS robust_key,
    trim(coalesce(RequestNo, '')) || '|' || trim(coalesce(AssetItemName, ''))
      || '|' || trim(coalesce(VendorName, '')) AS strict_key,
    -- the frame-permutation order each recording step saw (F8-F13 splits)
    (CASE WHEN rule_order > 8 THEN
       (CASE WHEN RequestFunction = 'IT' THEN 0 ELSE 1 END) ELSE 0 END)
    + 2 * (CASE WHEN rule_order > 9 THEN
       (CASE WHEN CurrentStatus IN ('Approval in Progress', 'Sent for Approval')
             THEN 0 ELSE 1 END) ELSE 0 END)
    + 4 * (CASE WHEN rule_order > 11 THEN
       (CASE WHEN RequestFunction = 'Admin' THEN 0 ELSE 1 END) ELSE 0 END)
    + 8 * (CASE WHEN rule_order > 12 THEN
       (CASE WHEN RequestFunction = 'Ops' THEN 0 ELSE 1 END) ELSE 0 END)
    + 16 * (CASE WHEN rule_order > 13 THEN
       (CASE WHEN RequestFunction = 'Ops through IT' THEN 0 ELSE 1 END) ELSE 0 END)
      AS step_ord
  FROM p1
)"""


_AUDIT_CTES = """
surviving AS (SELECT DISTINCT robust_key FROM tagged WHERE rule_order IS NULL),
audit AS MATERIALIZED (
  SELECT robust_key AS CompositeKey, rule_order, rule_label, rule_column,
         rule_value, step_ord, ord,
         row_number() OVER (PARTITION BY robust_key
                            ORDER BY rule_order DESC, step_ord ASC, ord ASC) AS rn
  FROM tagged
  WHERE rule_order IS NOT NULL
    AND robust_key NOT IN (SELECT robust_key FROM surviving)
)"""


def q91_audit_oracle_sql() -> str:
    """Audit lineage: one row per fully-excluded composite key, max-order
    rule attribution, value from the first removed row in the recording
    step's frame order."""
    ctes = ",\n".join(
        [
            _RAW_CTE.strip(),
            _P2P1_CTE.strip(),
            _tagged_cte().strip(),
            _AUDIT_CTES.strip(),
        ]
    )
    return f"""
    WITH {ctes}
    SELECT CompositeKey, rule_order, rule_label AS label,
           rule_column AS "column", rule_value AS value
    FROM audit WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# q90: zone join + W1 + fail-open
# ---------------------------------------------------------------------------

_ZONE_CTES = """
office AS (
  SELECT r_name AS zone, n_name AS region,
         'B' || n_nationkey AS office,
         substr(n_name, 1, 3) AS rc, n_nationkey AS pos
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
rcmap AS (  -- python-dict semantics: first occurrence ranks, last wins
  SELECT rc, arg_max(zone, pos) AS zone, arg_max(region, pos) AS region,
         min(pos) AS pos
  FROM office GROUP BY rc
),
zoned AS MATERIALIZED (
  SELECT t.*, coalesce(o.zone, f.fzone, 'Unknown') AS Zone,
         coalesce(o.region, f.fregion, 'Unknown') AS Region
  FROM tagged t
  LEFT JOIN office o ON t.BranchCode = o.office
  LEFT JOIN (
    SELECT ord AS ford, zone AS fzone, region AS fregion FROM (
      SELECT t2.ord, m.zone, m.region,
             row_number() OVER (PARTITION BY t2.ord ORDER BY m.pos) AS rn
      FROM tagged t2 JOIN rcmap m
        ON regexp_matches(lower(coalesce(t2.UserRemarks, 'nan')),
                          '\\b' || lower(m.rc) || '\\b')
    ) WHERE rn = 1
  ) f ON f.ford = t.ord
)"""


def _p3_cat(base: str, item: str = "AssetItemName") -> str:
    # later list entries win -> CASE checks them first
    whens = " ".join(
        f"WHEN {_contains_ci(item, it)} THEN {_lit('PLANT & MACHINERY - ' + it)}"
        for it in reversed(P3_SEPARATED_ITEMS)
    )
    return f"(CASE {whens} ELSE {base} END)"


def _category_type() -> str:
    return (
        "(CASE"
        f" WHEN {_contains_any_ci('AssetItemName', RENTAL_KEYWORDS)} THEN 'Rental_Opex'"
        f" WHEN {_contains_any_ci('AssetItemName', SORTER_KEYWORDS)} THEN 'Sorter'"
        f" WHEN {_contains_any_ci('AssetItemName', AMC_KEYWORDS)} THEN 'AMC'"
        " ELSE 'Regular' END)"
    )


def _first_occ_not_negated_sql(text_expr: str, word: str) -> str:
    """First word-bounded occurrence of ``word`` exists and is NOT
    negated (explain_exclusion_reason checks only the first span,
    process_capex.py:475-478)."""
    n = len(word)
    positions = (
        f"list_filter(list_filter(range(1, greatest(len({text_expr}) - {n} + 2, 1)),"
        f" i -> substr({text_expr}, i, {n}) = {_lit(word)}),"
        f" i -> (i = 1 OR NOT regexp_matches(substr({text_expr}, i - 1, 1), '[a-z0-9_]'))"
        f" AND NOT regexp_matches(substr({text_expr}, i + {n}, 1), '[a-z0-9_]'))"
    )
    first = f"coalesce(list_min({positions}), 0)"
    prefix_toks = (
        f"regexp_extract_all(substr({text_expr}, 1, {first} - 1), '[a-z0-9'']+')"
    )
    window = (
        f"({prefix_toks})[greatest(len({prefix_toks}) - 2, 1) : len({prefix_toks})]"
    )
    return (
        f"(contains({text_expr}, {_lit(word)}) AND {first} > 0"
        f" AND NOT list_has_any({window}, {_NEG_ARR}))"
    )


_EXPLAIN_MAP = {
    "LEASEHOLD IMPROVEMENTS": "LEASEHOLD",
    "LEASE HOLD": "LEASEHOLD",
    "LEASEHOLD IMPROVEMENT": "LEASEHOLD",
    "FURNITURE": "FURNITURE",
    "OFFICE EQUIPMENTS": "OFFICE EQUIPMENTS",
}


def _explain_reason_sql(label_expr: str) -> str:
    """``explain_exclusion_reason`` (process_capex.py:385-499) as one
    DuckDB CASE over golden-frame columns (no VendorName) — including
    the reduced category map, the missing CCTV/STOOL branch, the
    first-occurrence device negation, and the in-loop audit fallback
    that fires between the 'Personal' and 'Individual' keyword checks
    (the reference's try block is indented inside the keyword loop).
    ``label_expr`` is the audit label for the row's own un-stripped
    robust key (the in-loop fallback's lookup result)."""
    cs = "trim(coalesce(CurrentStatus, ''))"
    isv = "trim(coalesce(IsSelectedVendor, ''))"
    rf = "trim(coalesce(RequestFunction, ''))"
    ac = "trim(coalesce(AssetCategoryName, ''))"
    item = "trim(coalesce(AssetItemName, ''))"
    itemcat = "trim(coalesce(ItemCategory, ''))"
    remarks = "coalesce(UserRemarks, '')"

    combined = f"lower(concat_ws(' ', {item}, {itemcat}, {ac}))"
    f3a = (
        f"(regexp_matches({combined}, '(?i)fire\\s*extinguish\\w*|\\bfire\\s*ex\\w*|\\bfireex\\b')"
        f" OR regexp_matches({combined}, '(?i)\\bfans?\\b')"
        f" OR regexp_matches({combined}, '(?i)air\\s*condit(?:ion|ioner|ioning)?|air[-\\s]*conditioning|air\\s*condition|air\\s*conditioner|air\\s*conditioning|air\\s*con\\b|aircon\\b|a\\s*\\/\\s*c')"
        f" OR (regexp_matches({combined}, '(?i)\\bAC\\b')"
        f"     AND regexp_matches({combined}, '(?i)split|window|\\bton\\b|inverter|compressor|air|cond')))"
    )
    ac2 = _case_map(f"upper({ac})", _EXPLAIN_MAP)
    norm_remark = f"lower(trim({remarks}))"
    combined_pd = f"lower(concat_ws(' ', {item}, {itemcat}, {remarks}, {ac}))"
    device = "(" + " OR ".join(
        _first_occ_not_negated_sql(combined_pd, w.lower())
        for w in PERSONAL_DEVICE_WORDS
    ) + ")"
    nonrel = (
        "("
        + _neg_aware_any(norm_remark, PERSONAL_NONBUSINESS)
        + " OR "
        + _neg_aware_any(norm_remark, IT_NON_RELEVANT)
        + " OR "
        + _neg_aware_any(norm_remark, EXPERIMENTAL)
        + ")"
    )
    combined2 = f"lower(concat_ws(' ', {item}, {itemcat}, {remarks}))"

    whens = [
        f"WHEN lower({cs}) = 'rejected' THEN 'Rejected status'",
        f"WHEN {isv} = '-' THEN 'IsSelectedVendor is ''-'''",
        f"WHEN lower({rf}) IN ({', '.join(_lit(f) for f in UNWANTED_FUNCTIONS)})"
        f" THEN 'Removed RequestFunction ''' || {rf} || ''''",
        f"WHEN {f3a} THEN 'Excluded equipment: Air Conditioner/Fan/Fire Extinguisher'",
        f"WHEN NOT ({ac2} IN ('COMPUTER', 'PLANT & MACHINERY', 'LEASEHOLD'))"
        f" THEN 'Asset category excluded after normalization (''' || {ac2} || ''')'",
        f"WHEN regexp_matches({norm_remark}, '(?i)\\bds\\b') THEN 'UserRemarks mention ''DS'''",
        f"WHEN {_neg_aware_any(norm_remark, DARK_STORE)} THEN 'UserRemarks mention ''dark store'''",
        f"WHEN {_neg_aware_any(norm_remark, ('counter',))} THEN 'UserRemarks mention ''counter'''",
        f"WHEN {device} THEN 'Mention of personal computing device (laptop/macbook/tablet/phone)'",
    ]
    for func in ("IT", "Admin", "Ops", "Ops through IT"):
        whens.append(
            f"WHEN {rf} = {_lit(func)} AND {nonrel}"
            f" THEN {_lit(func + ' non-relevant by UserRemarks')}"
        )
    whens.append(
        f"WHEN {cs} = 'Approval in Progress' THEN 'Status ''Approval in Progress'' removed'"
    )
    kws = ("Personal", "Individual", "Non-operational", "Administrative only",
           "test", "demo", "sample")

    def kw_reason(kw: str) -> str:
        return _lit("Non-Ops equipment keyword: '" + kw + "'")

    whens.append(
        f"WHEN contains({combined2}, {_lit(kws[0].lower())}) THEN {kw_reason(kws[0])}"
    )
    whens.append(f"WHEN {label_expr} IS NOT NULL THEN {label_expr}")
    for kw in kws[1:]:
        whens.append(
            f"WHEN contains({combined2}, {_lit(kw.lower())}) THEN {kw_reason(kw)}"
        )
    return "CASE " + " ".join(whens) + " ELSE 'Unknown' END"


def q93_fn_enrichment_oracle_sql() -> str:
    """FN enrichment on the synth corpus: golden = raw minus VendorName
    (robust keys become short), FN = golden keys absent from the
    processed output's robust keys, each resolved through exact audit /
    short-key / prefix / explain-on-golden / Unknown.

    The raw-frame explain tier (strict keys) can never match here —
    every FN key is a 2-part short key while strict keys always carry
    two separators — so the oracle encodes only the golden-frame tier
    the reference would actually reach (process_capex.py:1445-1466).
    """
    w1_ord = (
        "(CASE WHEN RequestFunction = 'IT' THEN 0 ELSE 1 END)"
        " + 2 * (CASE WHEN CurrentStatus IN ('Approval in Progress', 'Sent for Approval') THEN 0 ELSE 1 END)"
        " + 4 * (CASE WHEN RequestFunction = 'Admin' THEN 0 ELSE 1 END)"
        " + 8 * (CASE WHEN RequestFunction = 'Ops' THEN 0 ELSE 1 END)"
        " + 16 * (CASE WHEN RequestFunction = 'Ops through IT' THEN 0 ELSE 1 END)"
    )
    priority = (
        "(CASE WHEN CurrentStatus = 'Approved' THEN 100 ELSE 0 END"
        " + CASE WHEN CurrentStatus = 'Sent for Approval' THEN 50 ELSE 0 END"
        " + CASE WHEN IsSelectedVendor = 'Yes' THEN 10 ELSE 0 END)"
    )
    ctes = ",\n".join(
        [
            _RAW_CTE.strip(),
            _P2P1_CTE.strip(),
            _tagged_cte().strip(),
            _AUDIT_CTES.strip(),
        ]
    )
    return f"""
    WITH {ctes},
    auditf AS (SELECT * FROM audit WHERE rn = 1),
    w1 AS (
      SELECT *, row_number() OVER (PARTITION BY RequestNo
                                   ORDER BY {priority} DESC, {w1_ord} ASC, ord ASC) AS w1rn
      FROM tagged WHERE rule_order IS NULL
    ),
    processed0 AS (SELECT * FROM w1 WHERE w1rn <= 5),
    addback AS (
      SELECT * FROM tagged
      WHERE robust_key NOT IN (SELECT DISTINCT strict_key FROM processed0)
        AND robust_key NOT IN (SELECT CompositeKey FROM auditf)
    ),
    prockeys AS (
      SELECT DISTINCT robust_key FROM processed0
      UNION SELECT DISTINCT robust_key FROM addback
    ),
    golden_keys AS (
      SELECT trim(coalesce(RequestNo, 'nan')) || '|' ||
             trim(coalesce(AssetItemName, 'nan')) AS ck,
             min(ord) AS first_ord
      FROM raw GROUP BY 1
    ),
    fn AS (
      SELECT ck AS CompositeKey FROM golden_keys
      WHERE ck NOT IN (SELECT robust_key FROM prockeys)
    ),
    -- prefix tier: audit keys extending a short key by a vendor part,
    -- earliest in dict-insertion order (recording step, frame order)
    prefix AS (
      SELECT short_ck, rule_label, rule_column, rule_value FROM (
        SELECT array_to_string(string_split(CompositeKey, '|')[1:2], '|')
                 AS short_ck,
               rule_label, rule_column, rule_value,
               row_number() OVER (
                 PARTITION BY array_to_string(string_split(CompositeKey, '|')[1:2], '|')
                 ORDER BY rule_order ASC, step_ord ASC, ord ASC) AS prn
        FROM audit
        WHERE rn = 1 AND len(string_split(CompositeKey, '|')) >= 3
      ) WHERE prn = 1
    ),
    -- explain tier over the golden frame (raw minus VendorName): robust
    -- keys are short; first matching row in input order explains. The
    -- LEFT JOIN feeds the in-loop fallback: the audit label for the
    -- row's own key (un-stripped components, vendor-less -> short)
    golden_expl AS (
      SELECT ck, reason FROM (
        SELECT trim(coalesce(g.RequestNo, 'nan')) || '|' ||
               trim(coalesce(g.AssetItemName, 'nan')) AS ck,
               {_explain_reason_sql("rk.rule_label")} AS reason,
               row_number() OVER (
                 PARTITION BY trim(coalesce(g.RequestNo, 'nan')) || '|' ||
                              trim(coalesce(g.AssetItemName, 'nan'))
                 ORDER BY g.ord ASC) AS ern
        FROM raw g
        LEFT JOIN auditf rk
          ON (coalesce(g.RequestNo, '') || '|' || coalesce(g.AssetItemName, ''))
             = rk.CompositeKey
      ) WHERE ern = 1
    )
    SELECT f.CompositeKey,
           string_split(f.CompositeKey, '|')[1] AS RequestNo,
           coalesce(string_split(f.CompositeKey, '|')[2], '') AS AssetItemName,
           coalesce(string_split(f.CompositeKey, '|')[3], '') AS VendorName,
           coalesce(x.rule_label, p.rule_label, g.reason, 'Unknown')
             AS exclusion_reason,
           CASE WHEN x.rule_label IS NOT NULL THEN x.rule_column
                WHEN p.rule_label IS NOT NULL THEN p.rule_column END
             AS exclusion_column,
           CASE WHEN x.rule_label IS NOT NULL THEN x.rule_value
                WHEN p.rule_label IS NOT NULL THEN p.rule_value END
             AS exclusion_value,
           CASE WHEN x.rule_label IS NOT NULL THEN 'audit_exact'
                WHEN p.rule_label IS NOT NULL THEN 'audit_prefix'
                WHEN g.reason IS NOT NULL THEN 'explained_reference'
                ELSE 'unknown' END AS reason_source
    FROM fn f
    LEFT JOIN auditf x ON x.CompositeKey = f.CompositeKey
    LEFT JOIN prefix p ON p.short_ck = f.CompositeKey
    LEFT JOIN golden_expl g ON g.ck = f.CompositeKey
    """


def _processed_chain_ctes() -> str:
    """The full pipeline-as-SQL CTE chain ending in ``deduped`` (+ the
    ``flags`` early-return marker): zone join, W1 top-5 per RequestNo
    (native deterministic ties), fail-open re-inclusion with the
    reference's P1-rerun / zone-rerun / keep-first dedup side effects.
    P5 (MUM remark suffix) never fires on the synth corpus (no MUMBAI
    region in the nation-derived dim), so remark mutation is the
    identity here."""
    w1_ord = (
        "(CASE WHEN RequestFunction = 'IT' THEN 0 ELSE 1 END)"
        " + 2 * (CASE WHEN CurrentStatus IN ('Approval in Progress', 'Sent for Approval') THEN 0 ELSE 1 END)"
        " + 4 * (CASE WHEN RequestFunction = 'Admin' THEN 0 ELSE 1 END)"
        " + 8 * (CASE WHEN RequestFunction = 'Ops' THEN 0 ELSE 1 END)"
        " + 16 * (CASE WHEN RequestFunction = 'Ops through IT' THEN 0 ELSE 1 END)"
    )
    priority = (
        "(CASE WHEN CurrentStatus = 'Approved' THEN 100 ELSE 0 END"
        " + CASE WHEN CurrentStatus = 'Sent for Approval' THEN 50 ELSE 0 END"
        " + CASE WHEN IsSelectedVendor = 'Yes' THEN 10 ELSE 0 END)"
    )
    return f"""{_RAW_CTE.strip()},
    {_P2P1_CTE.strip()},
    {_tagged_cte().strip()},
    {_AUDIT_CTES.strip()},
    {_ZONE_CTES.strip()},
    w1 AS (
      SELECT *, {priority} AS priority,
             row_number() OVER (PARTITION BY RequestNo
                                ORDER BY {priority} DESC, {w1_ord} ASC, ord ASC) AS w1rn
      FROM zoned WHERE rule_order IS NULL
    ),
    processed0 AS (SELECT * FROM w1 WHERE w1rn <= 5),
    prockeys AS (SELECT DISTINCT strict_key FROM processed0),
    auditkeys AS (SELECT DISTINCT CompositeKey FROM audit WHERE rn = 1),
    addback AS (
      SELECT * FROM zoned
      WHERE robust_key NOT IN (SELECT strict_key FROM prockeys)
        AND robust_key NOT IN (SELECT CompositeKey FROM auditkeys)
    ),
    flags AS (SELECT count(*) > 0 AS active FROM addback),
    merged AS (
      -- processed side: P3-suffixed category, erased again by the
      -- fail-open P1 rerun when anything was re-included
      SELECT RequestNo, AssetItemName, VendorName, RequestFunction,
             Zone, Region,
             CASE WHEN (SELECT active FROM flags)
                  THEN {_case_map("upper(trim(cat_p2))", CATEGORY_NORMALIZATION)}
                  ELSE {_p3_cat("norm2")} END AS AssetCategoryName_2,
             {_category_type()} AS Category_Type,
             AssetItemAmount, priority,
             FALSE AS ReincludedViaFailOpen,
             strict_key AS cpk, ord, {w1_ord} AS w1o, 0 AS reincl
      FROM processed0
      UNION ALL
      -- re-included side: ORIGINAL raw category (pre-P2 snapshot),
      -- P1 applied by the rerun; Category_Type/priority never assigned
      SELECT RequestNo, AssetItemName, VendorName, RequestFunction,
             Zone, Region,
             {_case_map("upper(trim(AssetCategoryName))", CATEGORY_NORMALIZATION)}
               AS AssetCategoryName_2,
             CAST(NULL AS VARCHAR) AS Category_Type,
             AssetItemAmount, CAST(NULL AS INT) AS priority,
             TRUE AS ReincludedViaFailOpen,
             robust_key AS cpk, ord, 0 AS w1o, 1 AS reincl
      FROM addback
    ),
    deduped AS (
      SELECT *, row_number() OVER (
               PARTITION BY cpk, AssetItemAmount
               ORDER BY reincl ASC,
                        CASE WHEN reincl = 1 THEN 0 ELSE -coalesce(priority, 0) END ASC,
                        CASE WHEN reincl = 1 THEN 0 ELSE w1o END ASC,
                        ord ASC) AS drn
      FROM merged
    ),
    processed_final AS (
      SELECT * FROM deduped
      WHERE (NOT (SELECT active FROM flags)) OR drn = 1
    )"""


def q90_processed_oracle_sql() -> str:
    """Full pipeline output — the processed_final chain projected to the
    q90 driver-contract columns."""
    return f"""
    WITH {_processed_chain_ctes()}
    SELECT RequestNo, AssetItemName, VendorName, Zone, Region,
           AssetCategoryName_2, Category_Type, AssetItemAmount,
           -- -1 sentinel: a NULL INT column round-trips as NaN through
           -- pandas on the oracle side; re-included rows have no W1
           -- priority (their null-ness is visible via the flag column)
           coalesce(priority, -1) AS priority,
           ReincludedViaFailOpen
    FROM processed_final
    """


def q27_analytics_oracle_sql() -> str:
    """A3 analytics (app.py:344-365) over the processed output: one
    count/sum/mean summary per dimension, unioned with a dim tag.
    Sums aggregate as exact DECIMAL (order-independent); the mean's
    final rounding goes through the shortest-repr VARCHAR -> DECIMAL
    path to match Spark's BigDecimal HALF_UP on doubles."""
    total = "CAST(sum(CAST(AssetItemAmount AS DECIMAL(18,2))) AS DOUBLE)"
    cnt = "count(AssetItemAmount)"
    avg = (
        f"CAST(round(CAST(CAST(({total} / {cnt}) AS VARCHAR)"
        " AS DECIMAL(38,20)), 2) AS DOUBLE)"
    )
    dims = ("Zone", "AssetCategoryName_2", "RequestFunction")
    selects = [
        f"""SELECT '{d}' AS dim, CAST({d} AS VARCHAR) AS dim_value,
               {cnt} AS Count, round({total}, 2) AS Total_Amount,
               {avg} AS Average_Amount
        FROM processed_final GROUP BY {d}"""
        for d in dims
    ]
    union = "\n    UNION ALL\n    ".join(selects)
    return f"""
    WITH {_processed_chain_ctes()}
    {union}
    """


def q94_explain_oracle_sql() -> str:
    """U3 explain_exclusion_reason over every synth raw row (no audit
    in scope -> the in-loop fallback label is NULL)."""
    return f"""
    WITH {_RAW_CTE.strip()}
    SELECT RequestNo, AssetItemName,
           {_explain_reason_sql("CAST(NULL AS VARCHAR)")} AS explained_reason
    FROM raw
    """
