"""Exclusion audit as a lineage DataFrame (replaces the reference's
global ``EXCLUSION_REASONS`` dict, process_capex.py:9,181-223).

Reference recording semantics (per step): a composite key is recorded
when, after the step, no row carries it any more; the recorded label is
that step's, and the value comes from the first removed row of that step
(input order). Keys are never overwritten (first write wins) — which,
combined with "only when the key fully disappears", means:

    key K is audited  ⇔  every row of K was excluded by some rule
    recording rule    =  max(rule order) over K's rows' first-match tags
    recorded row      =  first row tagged with that order, in the frame
                         order the recording step saw (the F8-F13 concat
                         permutations applied before it, then input order)

(the max because K "fully disappears" only at the last step that removes
a row of K; earlier steps see K still present and skip it.)

This is one hash aggregation over the union of excluded rows — no
driver-side state, no quadratic scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from capex_data_pipeline_spark.functions.keys import robust_key
from capex_data_pipeline_spark.operators.windows import frame_order_at

AUDIT_COLUMNS = ("CompositeKey", "rule_order", "label", "column", "value")


def _with_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "CompositeKey",
        robust_key(F.col("RequestNo"), F.col("AssetItemName"), F.col("VendorName")),
    )


def build_audit(
    excluded_frames: list[DataFrame],
    kept_after_rules: DataFrame,
    keep_order_cols: bool = False,
) -> DataFrame:
    """Collapse per-pass excluded rows into the per-key audit table.

    ``kept_after_rules`` is the frame that survived every exclusion rule
    (before the top-k window, whose removals the reference does not
    audit, process_capex.py:1006-1045): any key still present there is
    exempt from auditing.
    """
    tagged = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [
            _with_key(f).select(
                "CompositeKey",
                F.col("_excl_order").alias("rule_order"),
                F.col("_excl_label").alias("label"),
                F.col("_excl_column").alias("column"),
                F.col("_excl_value").alias("value"),
                # the frame order the recording step itself iterated —
                # splits that ran before the row's exclusion step count
                frame_order_at("_excl_order").alias("_step_ord"),
                "_row_id",
            )
            for f in excluded_frames
        ],
    )
    surviving_keys = _with_key(kept_after_rules).select("CompositeKey").distinct()
    fully_gone = tagged.join(surviving_keys, "CompositeKey", "left_anti")
    w = Window.partitionBy("CompositeKey").orderBy(
        F.desc("rule_order"), F.asc("_step_ord"), F.asc("_row_id")
    )
    cols = AUDIT_COLUMNS + (("_step_ord", "_row_id") if keep_order_cols else ())
    return (
        fully_gone.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )
