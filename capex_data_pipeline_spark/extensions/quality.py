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
    if not columns:
        raise ValueError("unique: need at least one column")
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


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Exact per-column profile in ONE aggregate pass: row count, NULL
    count, and null-safe distinct count for every listed column.
    Integer-exact, so snapshot comparisons are engine-portable.

    The multi-distinct aggregate plans as Spark's Expand (k columns →
    k-way map-side row amplification, still a single scan + one
    partial-aggregate tree); at extreme column counts or 100 TB inputs
    swap ``approx_count_distinct`` — same plan shape minus the Expand,
    documented like the q73 percentile swap.

    Returns (column, n_rows, n_null, n_distinct) — ``n_distinct``
    counts NULL as a value (never-NULL struct, like ``unique``).
    """
    if not columns:
        raise ValueError("profile_columns: columns must be non-empty")
    if len(set(columns)) != len(columns):
        # a duplicated name would silently fan out snapshot_drift's
        # column-name join (2x2 rows per duplicate) — fail fast like
        # quality_report's duplicate-rule-name guard
        raise ValueError("profile_columns: column names must be unique")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn{i}")
        )
        aggs.append(
            F.count_distinct(F.struct(F.col(c))).alias(f"_nd{i}")
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"_nn{i}"), F.lit(0)).alias("n_null"),
                F.col(f"_nd{i}").alias("n_distinct"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return wide.select(F.col("_n"), F.explode(rows).alias("p")).select(
        F.col("p.column").alias("column"),
        F.col("_n").alias("n_rows"),
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
    )


def snapshot_drift(
    baseline: DataFrame, current: DataFrame, columns: list[str]
) -> DataFrame:
    """Schema/content drift between two snapshots of the same table —
    the data-contract monitor a pipeline runs between ingests: per
    column, row/NULL/distinct counts on both sides plus the null-rate
    shift. Catches the silent upstream regressions row-level
    expectations can't (a column going 0.1% → 40% NULL, a distinct
    blow-up from an id format change).

    Two single-scan profiles (:func:`profile_columns`) joined on the
    column name — column-count-sized frames however large the inputs.
    All counts exact; ``null_frac_delta`` rounded to 6 with the -0.0
    collapse.

    Returns (column, n_rows_base, n_rows_curr, n_null_base,
    n_null_curr, n_distinct_base, n_distinct_curr, null_frac_delta).
    """
    b = profile_columns(baseline, columns)
    c = profile_columns(current, columns)
    bf = F.col("b.n_null") / F.greatest(F.col("b.n_rows"), F.lit(1))
    cf = F.col("c.n_null") / F.greatest(F.col("c.n_rows"), F.lit(1))
    return (
        b.alias("b")
        .join(c.alias("c"), F.col("b.column") == F.col("c.column"))
        .select(
            F.col("b.column").alias("column"),
            F.col("b.n_rows").alias("n_rows_base"),
            F.col("c.n_rows").alias("n_rows_curr"),
            F.col("b.n_null").alias("n_null_base"),
            F.col("c.n_null").alias("n_null_curr"),
            F.col("b.n_distinct").alias("n_distinct_base"),
            F.col("c.n_distinct").alias("n_distinct_curr"),
            (F.round(cf - bf, 6) + F.lit(0.0)).alias("null_frac_delta"),
        )
    )


def numeric_histogram(
    df: DataFrame, value_col: str, nbins: int
) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution
    profile behind data validation and drift dashboards (a step up
    from :func:`profile_columns`'s scalar counts). Two aggregate
    passes, both single-scan and fully distributed: a 1-row min/max
    pre-pass broadcast back onto the rows (never a driver-side
    ``collect``), then one hash aggregate on the bucket index —
    ``nbins`` output rows however large the input.

    Bucket math is plain IEEE-double arithmetic
    (``floor((v - lo) / width)`` with the top edge folded into the
    last bucket), so the same rows produce the same histogram on any
    engine or partitioning. NULL values are excluded; a degenerate
    column (``min == max``) lands every row in bucket 0. Bucket edges
    are rounded to 6 decimals for the cross-engine compare, with the
    IEEE ``-0.0`` collapse.

    Returns (bucket, bucket_lo, bucket_hi, n_rows) ordered by bucket.
    Empty buckets are absent (sparse form) — a reporting layer can
    densify against ``sequence(0, nbins-1)`` if it needs zero rows.
    """
    if nbins < 1:
        raise ValueError("numeric_histogram: nbins must be >= 1")
    v = F.col(value_col).cast("double")
    vals = df.filter(v.isNotNull()).select(v.alias("_v"))
    stats = vals.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(nbins))
    bucket = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("_v") - F.col("_lo")) / width),
                F.lit(nbins - 1),
            )
        )
        .cast("int")
    )
    return (
        vals.crossJoin(F.broadcast(stats))
        .select(bucket.alias("bucket"), "_lo", "_hi")
        .groupBy("bucket", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            (
                F.round(F.col("_lo") + F.col("bucket") * width, 6)
                + F.lit(0.0)
            ).alias("bucket_lo"),
            (
                F.round(F.col("_lo") + (F.col("bucket") + 1) * width, 6)
                + F.lit(0.0)
            ).alias("bucket_hi"),
            "n_rows",
        )
        .orderBy("bucket")
    )


def benford_profile(
    df: DataFrame,
    value_col: str,
    cents: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    forensic data-quality screen for naturally-occurring amounts
    (prices, populations, file sizes): organic multiplicative data
    leads with digit d at frequency log10(1 + 1/d); fabricated or
    truncated data doesn't. Digit extraction convention: the leading
    digit of the ``cents``-quantized magnitude
    (CAST(round(|x|·10^cents) AS BIGINT) rendered as a string), so
    the classification is INTEGER/string arithmetic — identical on
    any engine, no float log10 at the decade boundaries. Zero
    magnitudes (and NULLs) are excluded; digits with no rows still
    report (n = 0).

    One map-side digit projection + one 9-cell aggregate. Returns one
    row per digit 1..9: (digit, n, frac, benford_expected, deviation)
    with deviation = frac − expected.
    """
    import math

    scale = 10 ** cents
    c = F.round(F.abs(F.col(value_col).cast("double")) * F.lit(scale)).cast(
        "long"
    )
    base = df.filter(F.col(value_col).isNotNull()).select(c.alias("_c")).filter(
        F.col("_c") > 0
    )
    digit = F.substring(F.col("_c").cast("string"), 1, 1).cast("int")
    counts = base.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = base.agg(F.count(F.lit(1)).alias("_t"))
    spark = df.sparkSession
    digits = spark.createDataFrame(
        [(d, round(math.log10(1 + 1 / d), decimals)) for d in range(1, 10)],
        "digit int, benford_expected double",
    )
    return (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0))
                / F.nullif(F.col("_t").cast("double"), F.lit(0.0)),
                decimals,
            ).alias("frac"),
            "benford_expected",
            F.round(
                F.coalesce(F.col("n"), F.lit(0))
                / F.nullif(F.col("_t").cast("double"), F.lit(0.0))
                - F.col("benford_expected"),
                decimals,
            ).alias("deviation"),
        )
    )
