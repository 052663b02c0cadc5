"""False-negative enrichment — the reference's main debugging affordance
(process_capex.py:1406-1471): every validation false negative gets an
exclusion reason attached, resolved through a fallback chain:

    1. exact audit hit on the FN composite key
    2. audit hit on the short key (RequestNo|AssetItemName)
    3. earliest audit entry whose key extends the short key by a vendor
       (string-prefix match, dict-insertion order = recording-step order
       then step-frame order — process_capex.py:1437-1443)
    4. rule re-derivation on the first matching raw input row
       (``explain_exclusion_reason``, :385-499; strict-key lookup, then
       short-key)
    5. the same re-derivation over the reference/golden frame
    6. 'Unknown'

Every stage is an equi-join on a key column (the "prefix" match is an
equi-join on the short key derived from BOTH sides) — no per-key driver
loops, no quadratic scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from capex_data_pipeline_spark.functions.keys import strict_composite_key
from capex_data_pipeline_spark.functions.text import (
    DARK_STORE,
    EXPERIMENTAL,
    IT_NON_RELEVANT,
    PERSONAL_DEVICE_WORDS,
    PERSONAL_NONBUSINESS,
    negation_aware_any,
    negation_aware_pattern,
    phrase_pattern,
)

#: explain_exclusion_reason's REDUCED normalization map
#: (process_capex.py:447-453 — not P1's 13-entry map)
_EXPLAIN_CATEGORY_MAP = {
    "LEASEHOLD IMPROVEMENTS": "LEASEHOLD",
    "LEASE HOLD": "LEASEHOLD",
    "LEASEHOLD IMPROVEMENT": "LEASEHOLD",
    "FURNITURE": "FURNITURE",
    "OFFICE EQUIPMENTS": "OFFICE EQUIPMENTS",
}

_NON_OPS_KEYWORDS = (
    "Personal",
    "Individual",
    "Non-operational",
    "Administrative only",
    "test",
    "demo",
    "sample",
)

_UNWANTED_FUNCTIONS = ("cs", "fa", "sales", "channel", "vigilance")


def _val(name: str, strip: bool = True) -> Column:
    v = F.coalesce(F.col(name).cast("string"), F.lit(""))
    return F.trim(v) if strip else v


def _first_occurrence_not_negated(text_lower: Column, word: str) -> Column:
    """The reference checks negation only at the FIRST occurrence of a
    device word (process_capex.py:475-478 uses _contains_phrase(...)[0]):
    true iff the first plain match position equals the first non-negated
    match position."""
    plain = F.regexp_instr(text_lower, F.lit(phrase_pattern(word)))
    nonneg = F.regexp_instr(text_lower, F.lit(negation_aware_pattern(word)))
    return (plain > 0) & (plain == nonneg)


def explain_exclusion_reason_col(rowkey_label: Column | None = None) -> Column:
    """``explain_exclusion_reason`` (process_capex.py:385-499) as one
    first-match CASE over raw-row columns — including its quirks: the
    reduced category map, no CCTV/STOOL branch in 3a, first-occurrence
    negation for device words, and the in-loop audit fallback that fires
    after the 'Personal' keyword check but before 'Individual'
    (:481-497 — the try block is indented inside the keyword loop).

    ``rowkey_label`` is the audit label for the row's own un-stripped
    robust key (the in-loop fallback's lookup); pass None to skip it.
    """
    cs = _val("CurrentStatus")
    isv = _val("IsSelectedVendor")
    rf = _val("RequestFunction")
    ac = _val("AssetCategoryName")
    item = _val("AssetItemName")
    itemcat = _val("ItemCategory")
    remarks = _val("UserRemarks", strip=False)

    combined = F.concat_ws(" ", item, itemcat, ac)
    fire = combined.rlike(r"(?i)fire\s*extinguish\w*|\bfire\s*ex\w*|\bfireex\b")
    fan = combined.rlike(r"(?i)\bfans?\b")
    aircond = combined.rlike(
        r"(?i)air\s*condit(?:ion|ioner|ioning)?|air[-\s]*conditioning"
        r"|air\s*condition|air\s*conditioner|air\s*conditioning"
        r"|air\s*con\b|aircon\b|a\s*\/\s*c"
    )
    ac_word = combined.rlike(r"(?i)\bAC\b") & combined.rlike(
        r"(?i)split|window|\bton\b|inverter|compressor|air|cond"
    )

    ac2 = F.upper(ac)
    for k, v in _EXPLAIN_CATEGORY_MAP.items():
        ac2 = F.when(F.upper(ac) == k, F.lit(v)).otherwise(ac2)

    norm_remark = F.trim(remarks)  # _normalize_remark strips (:82-85)
    ds_word = F.lower(norm_remark).rlike(r"(?i)\bds\b")
    dark = negation_aware_any(norm_remark, DARK_STORE)
    counter = negation_aware_any(norm_remark, ("counter",))

    combined_pd = F.lower(F.concat_ws(" ", item, itemcat, remarks, ac))
    device = F.lit(False)
    for w in PERSONAL_DEVICE_WORDS:
        device = device | _first_occurrence_not_negated(combined_pd, w)

    nonrel = (
        negation_aware_any(norm_remark, PERSONAL_NONBUSINESS)
        | negation_aware_any(norm_remark, IT_NON_RELEVANT)
        | negation_aware_any(norm_remark, EXPERIMENTAL)
    )

    combined2 = F.lower(F.concat_ws(" ", item, itemcat, remarks))

    def kw_hit(kw: str) -> Column:
        return combined2.contains(kw.lower())

    reason = F.when(F.lower(cs) == "rejected", F.lit("Rejected status"))
    reason = reason.when(isv == "-", F.lit("IsSelectedVendor is '-'"))
    reason = reason.when(
        F.lower(rf).isin(*_UNWANTED_FUNCTIONS),
        F.concat(F.lit("Removed RequestFunction '"), rf, F.lit("'")),
    )
    reason = reason.when(
        fire | fan | aircond | ac_word,
        F.lit("Excluded equipment: Air Conditioner/Fan/Fire Extinguisher"),
    )
    reason = reason.when(
        ~ac2.isin("COMPUTER", "PLANT & MACHINERY", "LEASEHOLD"),
        F.concat(
            F.lit("Asset category excluded after normalization ('"), ac2, F.lit("')")
        ),
    )
    reason = reason.when(ds_word, F.lit("UserRemarks mention 'DS'"))
    reason = reason.when(dark, F.lit("UserRemarks mention 'dark store'"))
    reason = reason.when(counter, F.lit("UserRemarks mention 'counter'"))
    reason = reason.when(
        device,
        F.lit("Mention of personal computing device (laptop/macbook/tablet/phone)"),
    )
    for func in ("IT", "Admin", "Ops", "Ops through IT"):
        reason = reason.when(
            (rf == func) & nonrel, F.lit(f"{func} non-relevant by UserRemarks")
        )
    reason = reason.when(
        cs == "Approval in Progress", F.lit("Status 'Approval in Progress' removed")
    )
    # 18) keyword loop with the in-loop audit fallback after 'Personal'
    reason = reason.when(
        kw_hit(_NON_OPS_KEYWORDS[0]),
        F.lit(f"Non-Ops equipment keyword: '{_NON_OPS_KEYWORDS[0]}'"),
    )
    if rowkey_label is not None:
        reason = reason.when(rowkey_label.isNotNull(), rowkey_label)
    for kw in _NON_OPS_KEYWORDS[1:]:
        reason = reason.when(kw_hit(kw), F.lit(f"Non-Ops equipment keyword: '{kw}'"))
    return reason.otherwise(F.lit("Unknown"))


def _short_key(key: Column) -> Column:
    return F.concat_ws("|", F.slice(F.split(key, r"\|", -1), 1, 2))


def _loop_fallback_rowkey(has_vendor: bool = True) -> Column:
    """The key the in-loop fallback builds from the row itself
    (process_capex.py:484-490): UN-stripped components, '' for nulls,
    vendor included only when non-blank after stripping (row.get of a
    missing VendorName column renders '')."""
    req = _val("RequestNo", strip=False)
    item = _val("AssetItemName", strip=False)
    vendor = _val("VendorName", strip=False) if has_vendor else F.lit("")
    full = F.concat(req, F.lit("|"), item, F.lit("|"), vendor)
    short = F.concat(req, F.lit("|"), item)
    return F.when(F.trim(vendor) != "", full).otherwise(short)


def _explain_on(frame: DataFrame, fn_keys: DataFrame, audit: DataFrame, tag: str) -> DataFrame:
    """Re-derive the exclusion reason from the first frame row whose
    STRICT key matches the FN key (then the short key) — the reference
    keys the lookup frame with create_composite_primary_key, whose
    fillna-first rendering is the strict builder (:1245-1270). When the
    frame has no VendorName column the reference's builder raises and it
    falls back to the robust short/full key (:1416-1420)."""
    if "VendorName" in frame.columns:
        key = strict_composite_key(
            F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")
        )
    else:
        from capex_data_pipeline_spark.functions.keys import robust_key

        key = robust_key(F.col("RequestNo"), F.col("AssetItemName"), F.lit(""))
    keyed = frame.withColumn("_strict", key).withColumn(
        "_ord", F.monotonically_increasing_id()
    )
    # audit label for the row's own (un-stripped) robust key feeds the
    # keyword loop's in-line fallback
    keyed = keyed.join(
        audit.select(
            F.col("CompositeKey").alias("_rk"), F.col("label").alias("_rk_label")
        ),
        _loop_fallback_rowkey("VendorName" in frame.columns) == F.col("_rk"),
        "left",
    )
    # persist: by_full and by_short both consume this frame, and the
    # explain CASE is the expensive part (dozens of regexes per row) —
    # without it the whole regex pass over the input runs TWICE per frame
    from capex_data_pipeline_spark.cache import persisted

    explained = (
        keyed.withColumn("_reason", explain_exclusion_reason_col(F.col("_rk_label")))
        .select("_strict", "_ord", "_reason")
        .transform(persisted)
    )

    def first_match(on: Column, out: str) -> DataFrame:
        w = Window.partitionBy("CompositeKey").orderBy(F.asc("_ord"))
        return (
            fn_keys.join(explained, on, "inner")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("CompositeKey", F.col("_reason").alias(out))
        )

    by_full = first_match(F.col("CompositeKey") == F.col("_strict"), f"_expl_{tag}_full")
    by_short = first_match(F.col("_short_ck") == F.col("_strict"), f"_expl_{tag}_short")
    return (
        fn_keys.join(by_full, "CompositeKey", "left")
        .join(by_short, "CompositeKey", "left")
        .select(
            "CompositeKey",
            F.coalesce(f"_expl_{tag}_full", f"_expl_{tag}_short").alias(f"_expl_{tag}"),
        )
    )


def enrich_false_negatives(
    false_negatives: DataFrame,
    audit_ordered: DataFrame,
    raw: DataFrame | None = None,
    reference: DataFrame | None = None,
    plan_boundary: bool | str = True,
) -> DataFrame:
    """Attach exclusion reasons to FN keys (process_capex.py:1406-1471).

    ``audit_ordered`` must carry the build_audit(keep_order_cols=True)
    columns — the prefix fallback resolves ties by the audit dict's
    insertion order (recording step, then step-frame order).

    Returns (CompositeKey, RequestNo, AssetItemName, VendorName,
    exclusion_reason, exclusion_column, exclusion_value, reason_source);
    column/value are null on the explain/unknown paths, exactly like the
    reference's string-valued reasons.

    ``plan_boundary`` (default): the FN-key frame is consumed by up to
    8 join sites here and the audit by 5, so when they arrive with a
    deep producing plan (the full pipeline tail) that subplan is
    embedded at EVERY site and the analyzer / optimizer / codegen walk
    it multiplicatively — measured 45 s → 11 s end-to-end at sf0.01.
    The boundary executes each producer once and replaces the plan
    with materialized data. ``True``/``'local'`` uses
    ``localCheckpoint()`` (eager by design; blocks live on
    executor-local storage and die with a decommissioned executor);
    on dynamic-allocation clusters pass ``plan_boundary='staging'``
    (with ``$SPARK_GRAFT_STAGING_DIR`` or ``$SPARK_GRAFT_BOUNDARY``
    configured — see :func:`cache.plan_boundary`) to stage through a
    durable parquet table instead; ``False`` disables the cut.
    """
    if plan_boundary:
        # the two eager boundary cuts are independent jobs over the
        # same persisted pipeline intermediates — submit them from two
        # driver threads so their stages interleave (Spark job
        # submission is thread-safe; concurrent materialization of a
        # shared cached partition serializes per-partition in the
        # BlockManager). Sequential submission left the cluster idle
        # during each job's single-partition tail stages.
        from concurrent.futures import ThreadPoolExecutor

        from capex_data_pipeline_spark.cache import plan_boundary as _boundary

        mode = plan_boundary if isinstance(plan_boundary, str) else None

        def _cut(df, label):
            return _boundary(df, mode=mode, eager=True, label=label)

        with ThreadPoolExecutor(max_workers=2) as ex:
            fn_fut = ex.submit(_cut, false_negatives, "fn-keys")
            au_fut = ex.submit(_cut, audit_ordered, "fn-audit")
            false_negatives = fn_fut.result()
            audit_ordered = au_fut.result()
    parts = F.split(F.col("CompositeKey"), r"\|", -1)
    fn = false_negatives.select(
        "CompositeKey",
        F.coalesce(F.try_element_at(parts, F.lit(1)), F.lit("")).alias("RequestNo"),
        F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")).alias("AssetItemName"),
        F.coalesce(F.try_element_at(parts, F.lit(3)), F.lit("")).alias("VendorName"),
        _short_key(F.col("CompositeKey")).alias("_short_ck"),
    )

    audit = audit_ordered
    a = audit.select(
        F.col("CompositeKey").alias("_ak"),
        F.col("label").alias("_a_label"),
        F.col("column").alias("_a_column"),
        F.col("value").alias("_a_value"),
        F.col("rule_order").alias("_a_order"),
        F.col("_step_ord").alias("_a_step"),
        F.col("_row_id").alias("_a_row"),
    )

    exact = a.select(
        F.col("_ak").alias("CompositeKey"),
        F.col("_a_label").alias("_x_label"),
        F.col("_a_column").alias("_x_column"),
        F.col("_a_value").alias("_x_value"),
    )
    short = a.select(
        F.col("_ak").alias("_short_ck"),
        F.col("_a_label").alias("_s_label"),
        F.col("_a_column").alias("_s_column"),
        F.col("_a_value").alias("_s_value"),
    )
    # prefix: audit keys that extend a short key by a vendor component;
    # first hit in dict-insertion order wins (:1437-1443)
    wp = Window.partitionBy("_short_ck").orderBy(
        F.asc("_a_order"), F.asc("_a_step"), F.asc("_a_row")
    )
    prefix = (
        a.withColumn("_a_short", _short_key(F.col("_ak")))
        .filter(F.col("_ak").startswith(F.concat(F.col("_a_short"), F.lit("|"))))
        .withColumnRenamed("_a_short", "_short_ck")
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            "_short_ck",
            F.col("_a_label").alias("_p_label"),
            F.col("_a_column").alias("_p_column"),
            F.col("_a_value").alias("_p_value"),
        )
    )

    out = (
        fn.join(exact, "CompositeKey", "left")
        .join(short, "_short_ck", "left")
        .join(prefix, "_short_ck", "left")
    )

    expl_cols = []
    for tag, frame in (("raw", raw), ("ref", reference)):
        if frame is not None:
            out = out.join(
                _explain_on(frame, fn.select("CompositeKey", "_short_ck"), audit, tag),
                "CompositeKey",
                "left",
            )
            expl_cols.append(f"_expl_{tag}")

    reason = F.coalesce(
        "_x_label",
        "_s_label",
        "_p_label",
        *expl_cols,
        F.lit("Unknown"),
    )
    source = (
        F.when(F.col("_x_label").isNotNull(), F.lit("audit_exact"))
        .when(F.col("_s_label").isNotNull(), F.lit("audit_short_key"))
        .when(F.col("_p_label").isNotNull(), F.lit("audit_prefix"))
    )
    for tag, label in (("raw", "explained_input"), ("ref", "explained_reference")):
        if f"_expl_{tag}" in out.columns:
            source = source.when(
                F.col(f"_expl_{tag}").isNotNull(), F.lit(label)
            )
    audit_col = F.coalesce("_x_column", "_s_column", "_p_column")
    audit_val = F.coalesce("_x_value", "_s_value", "_p_value")
    audit_hit = (
        F.col("_x_label").isNotNull()
        | F.col("_s_label").isNotNull()
        | F.col("_p_label").isNotNull()
    )
    return out.select(
        "CompositeKey",
        "RequestNo",
        "AssetItemName",
        "VendorName",
        reason.alias("exclusion_reason"),
        F.when(audit_hit, audit_col).alias("exclusion_column"),
        F.when(audit_hit, audit_val).alias("exclusion_value"),
        source.otherwise(F.lit("unknown")).alias("reason_source"),
    )
