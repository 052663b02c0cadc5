"""Window/sort/limit/dedup operators W1-W4 (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from capex_data_pipeline_spark.operators.projections import priority_col

TOP_K_PER_REQUEST = 5


def frame_order_at(step_sql: str | None = None) -> "F.Column":
    """The reference frame's row order as seen at a given pipeline step.

    The split-filter-union stages F8/F9/F11/F12/F13 each move their
    function's rows to the front (pd.concat([kept_subset, rest]),
    process_capex.py:540,585,633,663,693), so a step's input order is
    the composition of the permutations applied *before* it — most
    recent split outermost. Encoded as one integer; ties inside resolve
    by the ingest ``_row_id`` (original file order).

    ``step_sql`` is a SQL expression for the rule order of the observing
    step: split ``s``'s permutation counts only when ``step > s`` (a
    step removing rows at order ``s`` iterates the frame as it was
    *before* its own split). ``None`` means "after all splits" — W1's
    view. Built as ONE ``F.expr`` (a Column-tree version costs dozens
    of py4j round-trips per call, and this runs in every W1/audit plan
    build)."""
    splits = [
        (8, "RequestFunction = 'IT'", 1),
        (9, "CurrentStatus IN ('Approval in Progress', 'Sent for Approval')", 2),
        (11, "RequestFunction = 'Admin'", 4),
        (12, "RequestFunction = 'Ops'", 8),
        (13, "RequestFunction = 'Ops through IT'", 16),
    ]
    terms = []
    for order, cond, weight in splits:
        term = f"(CASE WHEN coalesce({cond}, false) THEN 0 ELSE {weight} END)"
        if step_sql is not None:
            term = f"(CASE WHEN ({step_sql}) > {order} THEN {term} ELSE 0 END)"
        terms.append(term)
    return F.expr("(" + " + ".join(terms) + ")")


def w1_frame_order() -> "F.Column":
    """The frame order the reference's W1 sees (after every split)."""
    return frame_order_at(None)


def select_representative_rows(df: DataFrame, exact_ties: bool = True) -> DataFrame:
    """W1 — keep at most 5 rows per RequestNo, highest priority first
    (process_capex.py:1006-1045). The reference's "keep all if ≤3" branch
    is subsumed: rank ≤ 5 keeps those groups whole anyway. The
    ``priority`` helper column leaks into the reference's final output
    (process_capex.py:1020, quirk register) — kept for parity.

    Tie semantics: the reference sorts each group with
    ``sort_values('priority', ascending=False)`` whose default quicksort
    is *unstable* — the rows kept among equal priorities follow numpy's
    introsort permutation, not input order. That permutation is not
    expressible as a Catalyst ordering, so:

    - ``exact_ties=True`` (default): grouped ``applyInPandas`` replays
      the identical pandas sort on each (small) group — Arrow-batched,
      shuffled once on RequestNo; bit-for-bit reference parity.
    - ``exact_ties=False``: pure window rank with deterministic
      (frame-order) tiebreak — same keys whenever priorities are
      distinct; plans as WindowGroupLimit (top-k pushed into the
      shuffle), the faster choice at scale when exact tie replication
      doesn't matter.
    """
    df = df.withColumn("priority", priority_col())
    w = Window.partitionBy("RequestNo").orderBy(
        F.desc("priority"), F.asc(w1_frame_order()), F.asc("_row_id")
    )
    ranked = df.withColumn("_rank", F.row_number().over(w))
    if not exact_ties:
        return ranked.filter(F.col("_rank") <= TOP_K_PER_REQUEST).drop("_rank")

    # Hybrid exact mode: the unstable-sort permutation only changes the
    # KEPT SET when a priority tie straddles the rank-5 boundary (rank 5
    # and rank 6 share a priority). Everywhere else the top-5 set is
    # uniquely determined by priority values, so the native rank filter
    # is bit-equivalent — only the rare straddling groups (typically
    # <<1%) pay the Arrow grouped-map replay.
    wg = Window.partitionBy("RequestNo")
    p5 = F.max(F.when(F.col("_rank") == TOP_K_PER_REQUEST, F.col("priority"))).over(wg)
    p6 = F.max(
        F.when(F.col("_rank") == TOP_K_PER_REQUEST + 1, F.col("priority"))
    ).over(wg)
    flagged = ranked.withColumn(
        "_ambiguous", p6.isNotNull() & (p5 == p6)
    )

    easy = (
        flagged.filter(~F.col("_ambiguous") & (F.col("_rank") <= TOP_K_PER_REQUEST))
        .drop("_rank", "_ambiguous")
    )

    hard = flagged.filter(F.col("_ambiguous")).drop("_rank", "_ambiguous")
    hard = hard.withColumn("_w1_ord", w1_frame_order())

    def _select(pdf):
        # reconstruct the frame order the reference's groupby saw, then
        # replay its exact (unstable) sort + head (process_capex.py:1026-1036)
        pdf = pdf.sort_values(["_w1_ord", "_row_id"], kind="stable")
        pdf = pdf.sort_values("priority", ascending=False)
        if len(pdf) > 3:
            pdf = pdf.head(min(len(pdf), TOP_K_PER_REQUEST))
        return pdf

    hard_selected = (
        hard.groupBy("RequestNo").applyInPandas(_select, schema=hard.schema).drop("_w1_ord")
    )
    return easy.unionByName(hard_selected)


def dedup_keep_first(
    df: DataFrame, subset: list[str], order_cols: list[str] | None = None
) -> DataFrame:
    """W3 — ``drop_duplicates(subset, keep='first')`` with a deterministic
    notion of "first" (process_capex.py:53). A plain ``dropDuplicates``
    keeps an arbitrary row; ordering by the ingest row id reproduces
    pandas' input-order semantics."""
    w = Window.partitionBy(*subset).orderBy(
        *[F.asc(c) for c in (order_cols or ["_row_id"])]
    )
    return (
        df.withColumn("_dedup_rn", F.row_number().over(w))
        .filter(F.col("_dedup_rn") == 1)
        .drop("_dedup_rn")
    )
