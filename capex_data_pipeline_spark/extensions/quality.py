"""Data-quality expectations over a DataFrame — the declarative
pre-flight gate (Deequ/Great-Expectations pattern, public design) a
training-data pipeline runs before accepting a snapshot: null
fractions, range bounds, accepted value sets, and key uniqueness,
each evaluated corpus-wide and reported as one row per rule.

Scale shape: every row-level rule compiles to a conditional-sum
column inside ONE hash aggregate, so an arbitrary rule set costs a
single scan and a 1-row shuffle-free partial-aggregate tree — never
one job per rule (the naive harness runs N full scans for N rules).
Uniqueness is the exception that genuinely needs a shuffle: it
aggregates on the key column and is evaluated in its own pass, one
per distinct key tuple checked.

The report is rows, not an exception — callers decide whether a
failed rule kills the run (``assert_passed``) or routes the snapshot
to quarantine. No silent caps anywhere: every rule reports the exact
violation count against the exact row count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``name`` (stable report key), ``kind``, the
    target ``column`` (or columns for uniqueness), and the violation
    predicate parameters."""

    name: str
    kind: str  # not_null | in_range | accepted_values | unique | custom
    columns: tuple[str, ...]
    params: tuple = field(default_factory=tuple)


def not_null(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null({column})", "not_null", (column,))


def in_range(
    column: str, lo: float, hi: float, name: str | None = None
) -> Rule:
    """Violation = value outside [lo, hi]. NULLs are NOT violations
    (compose with not_null to forbid them) — mirroring SQL three-valued
    logic so the two rules report disjoint defect classes."""
    lo, hi = float(lo), float(hi)
    return Rule(
        name or f"in_range({column},{lo},{hi})",
        "in_range",
        (column,),
        (lo, hi),
    )


def accepted_values(
    column: str, values: list, name: str | None = None
) -> Rule:
    """Violation = non-NULL value outside the accepted set."""
    return Rule(
        name or f"accepted_values({column})",
        "accepted_values",
        (column,),
        tuple(values),
    )


def custom(name: str, predicate_sql: str) -> Rule:
    """Violation = rows where ``predicate_sql`` (a SQL boolean
    expression over the frame's columns, e.g. ``"amount < 0 AND
    status = 'paid'"``) evaluates TRUE. SQL strings — not Column
    objects — keep the rule declarative, serializable, and
    engine-portable like the rest of the registry."""
    return Rule(name, "custom", ("",), (predicate_sql,))


def unique(*columns: str, name: str | None = None) -> Rule:
    """Violation count = rows carrying a duplicated key tuple (i.e.
    ``n_rows − n_distinct_keys`` counts the EXTRA rows; a key seen 3×
    contributes 2). NULL key components participate like values."""
    return Rule(name or f"unique({','.join(columns)})", "unique", tuple(columns))


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.columns[0])
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.params
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(list(rule.params))
    if rule.kind == "custom":
        # NULL predicate results are not violations (3VL, like in_range)
        return F.coalesce(F.expr(rule.params[0]), F.lit(False))
    raise ValueError(f"unknown row-level rule kind: {rule.kind}")


def quality_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule and return one row per rule:
    (rule, kind, n_rows, n_violations, violation_frac, passed).

    All row-level rules share ONE aggregate (single scan); each
    ``unique`` rule adds one aggregation pass on its key columns.
    ``violation_frac`` is rounded to 6 decimals; an empty input passes
    every rule (0 violations of 0 rows).
    """
    if not rules:
        raise ValueError("quality_report: rules must be non-empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("quality_report: rule names must be unique")

    row_rules = [r for r in rules if r.kind != "unique"]
    key_rules = [r for r in rules if r.kind == "unique"]

    reports = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(_violation_expr(r).cast("long")).alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        # unpivot the 1-row wide aggregate into one report row per rule
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        reports.append(
            wide.select(F.col("_n"), F.explode(pairs).alias("p")).select(
                F.col("p.rule").alias("rule"),
                F.col("p.kind").alias("kind"),
                F.col("_n").alias("n_rows"),
                F.col("p.n_violations").alias("n_violations"),
            )
        )
    for r in key_rules:
        keyed = df.agg(
            F.count(F.lit(1)).alias("_n"),
            # distinct over a null-safe struct: plain count_distinct
            # skips NULL-containing key tuples per SQL semantics, which
            # would overstate "extra rows"; a struct is never NULL so
            # every row's key participates
            F.count_distinct(
                F.struct(*[F.col(c) for c in r.columns])
            ).alias("_ds"),
        )
        reports.append(
            keyed.select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col("_ds")).alias("n_violations"),
            )
        )

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        "kind",
        "n_rows",
        "n_violations",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations") / F.col("n_rows"), 6),
        ).otherwise(F.lit(0.0)).alias("violation_frac"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def assert_passed(report: DataFrame) -> None:
    """Raise ``ValueError`` listing every failed rule (driver-side
    fetch of the rule-sized report — never the data)."""
    failed = [r for r in report.collect() if not r.passed]
    if failed:
        detail = "; ".join(
            f"{r.rule}: {r.n_violations}/{r.n_rows}" for r in failed
        )
        raise ValueError(f"quality gate failed — {detail}")
