"""Round-6 graph-analytics driver queries: exact triangle counting by
degree-ordered orientation (q112) and bounded k-core peeling (q113),
both over a thresholded part co-purchase graph derived from lineitem.

Same contract as ``registry``: every entry pairs the Spark operator
with a full DuckDB oracle restating the semantics independently.

The shared graph: two parts are connected when they appear in the
same order at least ``MIN_SUPPORT`` times (count of distinct shared
orders). The within-order pair fanout is bounded by order size (a
handful of lineitems), so the edge builder never goes quadratic in a
hot key — it is the item-item co-occurrence projection every
recommender / market-basket pipeline starts from.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from capex_data_pipeline_spark.registry import _t, query

#: canonical definitions live in the LEAF module oracle_frags
#: (importable by any registry module without a cycle); re-exported
#: here under the historical names
from capex_data_pipeline_spark.oracle_frags import (  # noqa: E402
    COPURCHASE_MIN_SUPPORT as MIN_SUPPORT,
    COPURCHASE_SQL as _COPURCH,
)


def _copurchase_edges(spark, sf_dir):
    """Canonical (a < b) co-purchase edges with >= MIN_SUPPORT distinct
    shared orders — distinct by construction (groupBy on the pair).

    PERSISTED (tracked — the bench's cache reset still re-pays it per
    rep): the build is a lineitem self-join (~4 s at sf0.1, the single
    most expensive subplan of the graph family) and every consumer
    embeds the live plan in several places — connected_components'
    symmetric union alone executes its input twice, and q242/q189/q198
    additionally aggregate or split the same frame — so without the
    persist one graph query re-runs the self-join 2-4×. The frame
    itself is tiny (3.6k rows at sf0.1)."""
    from capex_data_pipeline_spark.cache import persisted
    from capex_data_pipeline_spark.sources.parquet import spread_few_splits

    # the self-join's map side fuses onto the (few-split) scan: spread
    # the 2-column projection first so both exchange writes parallelize
    # (measured 3.4 -> 2.1 s for the build at sf0.1; no-op at scale)
    li = spread_few_splits(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    x, y = li.alias("x"), li.alias("y")
    return persisted(
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") != F.col("y.l_partkey")),
        )
        .select(
            F.least(F.col("x.l_partkey"), F.col("y.l_partkey")).alias("a"),
            F.greatest(F.col("x.l_partkey"), F.col("y.l_partkey")).alias("b"),
            F.col("x.l_orderkey").alias("ok"),
        )
        .groupBy("a", "b")
        .agg(F.countDistinct("ok").alias("sup"))
        .where(F.col("sup") >= MIN_SUPPORT)
        .select("a", "b")
    )


# ------------------------------------------------ triangle counting


@query(
    "q112_triangle_count",
    f"""
    WITH pairs AS ({_COPURCH}),
    tri AS (
      SELECT p.a AS u, p.b AS v, q.b AS w
      FROM pairs p
      JOIN pairs q ON p.a = q.a AND p.b < q.b
      JOIN pairs r ON r.a = p.b AND r.b = q.b
    )
    SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([u, v, w]) AS vertex FROM tri)
    GROUP BY vertex
    ORDER BY vertex
    """,
)
def q112_triangle_count(spark, sf_dir):
    """Exact per-vertex triangle counts on the co-purchase graph
    (graph.triangle_counts, degree-ordered orientation — wedge pivots
    have O(sqrt m) out-degree, so the O(m^1.5) bound holds under any
    degree skew). The oracle enumerates each triangle once the
    lexicographic way (a < b < c over canonical edges) — a different
    enumeration order than the Spark operator's (degree, id)
    orientation, which makes the per-vertex count match a real
    cross-check rather than a restatement."""
    from capex_data_pipeline_spark.extensions.graph import triangle_counts

    edges = _copurchase_edges(spark, sf_dir)
    return triangle_counts(
        edges, src_col="a", dst_col="b", assume_canonical=True
    )


# ------------------------------------------------ bounded k-core

#: k for the registered peel
_KCORE_K = 3
#: peel rounds — fixpoint at the driver's sf0.01 gate takes 10 rounds
#: (measured); extra rounds are data no-ops, so the bound is safe at
#: smaller SFs too
_KCORE_ROUNDS = 10

#: one peel round in DuckDB SQL: keep edges whose BOTH endpoints have
#: degree >= k in the previous round's subgraph
_KCORE_ITER = f"""
  SELECT e.a, e.b FROM {{prev}} e
  WHERE e.a IN (SELECT v FROM (
          SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM {{prev}} UNION ALL SELECT b AS v FROM {{prev}}
          ) GROUP BY v) WHERE d >= {_KCORE_K})
    AND e.b IN (SELECT v FROM (
          SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM {{prev}} UNION ALL SELECT b AS v FROM {{prev}}
          ) GROUP BY v) WHERE d >= {_KCORE_K})
"""


def _kcore_sql() -> str:
    # AS MATERIALIZED: each round references the previous one 3×, so
    # inlined CTEs would expand 3^rounds-fold (and DuckDB would open
    # the base parquet thousands of times — observed as an fd blowup)
    ctes = [f"e0 AS MATERIALIZED ({_COPURCH})"]
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"e{i} AS MATERIALIZED ({_KCORE_ITER.format(prev=f'e{i - 1}')})"
        )
    last = f"e{_KCORE_ROUNDS}"
    return f"""
    WITH {', '.join(ctes)}
    SELECT v AS vertex, CAST(count(*) AS BIGINT) AS core_deg
    FROM (SELECT a AS v FROM {last} UNION ALL SELECT b AS v FROM {last})
    GROUP BY v
    ORDER BY v
    """


# ------------------------------------------------ connected components

#: propagation rounds for the registered CC query — min-label fixpoint
#: on the co-purchase graph takes 3 / 10 / 7 productive rounds at
#: sf0.001 / sf0.01 / sf0.1 (measured with a driver-side replay);
#: 12 covers all with margin, and extra rounds are data no-ops
_CC_ROUNDS = 12

#: one min-label propagation round in DuckDB SQL: each vertex's label
#: becomes the min of its own and its neighbors' previous-round labels
_CC_ITER = """
  SELECT v, min(lbl) AS lbl FROM (
    SELECT e.a AS v, l.lbl FROM sym e JOIN {prev} l ON l.v = e.b
    UNION ALL SELECT v, lbl FROM {prev}
  ) GROUP BY v
"""


def _cc_ctes() -> "list[str]":
    # AS MATERIALIZED: each round references the previous one twice
    # (neighbor join + self union) — same CTE-expansion guard as q113.
    # Shared by the q114 oracle and the q242 modularity oracle (which
    # scores this exact labeling).
    ctes = [
        f"e0 AS MATERIALIZED ({_COPURCH})",
        "sym AS MATERIALIZED (SELECT a, b FROM e0"
        " UNION ALL SELECT b AS a, a AS b FROM e0)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lbl FROM sym)",
    ]
    for i in range(1, _CC_ROUNDS + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED ({_CC_ITER.format(prev=f'l{i - 1}')})"
        )
    return ctes


def _cc_sql() -> str:
    return f"""
    WITH {', '.join(_cc_ctes())}
    SELECT v AS vertex, lbl AS component FROM l{_CC_ROUNDS}
    ORDER BY vertex
    """


@query("q114_connected_components", _cc_sql())
def q114_connected_components(spark, sf_dir):
    """Connected components of the co-purchase graph, 12 bounded
    min-label rounds (graph.connected_components — the public form of
    the loop proven inside dedup.dedup_clusters). 12 rounds reaches
    the true fixpoint at every test SF (measured: 3/10/7 productive
    rounds at sf0.001/0.01/0.1); the data-dependent ``until_fixpoint``
    mode is differential-tested against a union-find replay in
    tests/test_graph.py. The oracle unrolls all 12 propagation rounds
    as materialized CTEs, replaying every intermediate labeling."""
    from capex_data_pipeline_spark.extensions.graph import (
        connected_components,
    )

    edges = _copurchase_edges(spark, sf_dir)
    return connected_components(
        edges,
        rounds=_CC_ROUNDS,
        src_col="a",
        dst_col="b",
        assume_canonical=True,
    )


# ------------------------------------------------ bounded k-core


@query("q113_kcore", _kcore_sql())
def q113_kcore(spark, sf_dir):
    """Bounded 3-core peel of the co-purchase graph, 10 rounds
    (graph.kcore_peel): repeatedly delete vertices with degree < 3.
    10 rounds reaches the true fixpoint at the sf0.01 gate (measured;
    the ``until_fixpoint`` mode is differential-tested separately —
    data-dependent round counts can't be SQL-unrolled). The oracle
    unrolls all 10 rounds as chained CTEs, so every intermediate
    degree cut is replayed exactly."""
    from capex_data_pipeline_spark.extensions.graph import kcore_peel

    edges = _copurchase_edges(spark, sf_dir)
    return kcore_peel(
        edges,
        k=_KCORE_K,
        rounds=_KCORE_ROUNDS,
        src_col="a",
        dst_col="b",
        assume_canonical=True,
    )


# ------------------------------------------------ label propagation

#: synchronous LPA rounds for the registered query — communities on
#: the co-purchase graph stabilize within a handful of rounds; a fixed
#: bound keeps the update engine-portable (both engines replay the
#: identical deterministic rule, converged or not)
_LPA_ROUNDS = 4

#: one synchronous LPA round in DuckDB SQL: each vertex adopts the
#: most frequent label among its neighbors' previous-round labels,
#: ties to the smallest label
_LPA_ITER = """
  SELECT v, lbl FROM (
    SELECT v, lbl,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
    FROM (
      SELECT e.a AS v, l.lbl, count(*) AS c
      FROM sym e JOIN {prev} l ON l.v = e.b
      GROUP BY 1, 2
    )
  ) WHERE rn = 1
"""


def _lpa_sql() -> str:
    # AS MATERIALIZED: the same CTE-expansion guard as q113/q114
    ctes = [
        f"e0 AS MATERIALIZED ({_COPURCH})",
        "sym AS MATERIALIZED (SELECT a, b FROM e0"
        " UNION ALL SELECT b AS a, a AS b FROM e0)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lbl FROM sym)",
    ]
    for i in range(1, _LPA_ROUNDS + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED ({_LPA_ITER.format(prev=f'l{i - 1}')})"
        )
    return f"""
    WITH {', '.join(ctes)}
    SELECT v AS vertex, lbl AS community FROM l{_LPA_ROUNDS}
    ORDER BY vertex
    """


@query("q116_label_propagation", _lpa_sql())
def q116_label_propagation(spark, sf_dir):
    """Community detection on the co-purchase graph: 4 synchronous
    label-propagation rounds (graph.label_propagation — Raghavan et
    al. 2007 with a deterministic most-frequent-then-smallest-label
    rule instead of random tie-breaks, which makes the update
    engine-replayable). Per round one compact-key neighbor join and
    two map-side-combining aggregates — the argmax is min(struct(-c,
    lbl)), never a window sort. The oracle unrolls all 4 rounds as
    materialized CTEs with the row_number restatement of the same
    tie-break."""
    from capex_data_pipeline_spark.extensions.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir)
    return label_propagation(
        edges,
        rounds=_LPA_ROUNDS,
        src_col="a",
        dst_col="b",
        assume_canonical=True,
    )


# ---------------------------------------- incremental components


@query("q189_cc_incremental", _cc_sql())
def q189_cc_incremental(spark, sf_dir):
    """q114's component labeling maintained INCREMENTALLY
    (graph.cc_incremental): the co-purchase edges split into a
    "yesterday" batch (labeled from scratch) and a "today" batch
    ((a + b) % 5 == 0, ~20%) folded in via union-find on supernodes —
    new edges map to their endpoints' CURRENT labels, components run
    to fixpoint on the label-level SUPER-graph (bounded by the batch,
    not the corpus), and only merged components relabel through a
    broadcast rename map. The oracle is the full from-scratch
    recompute over ALL edges (q114's 12 unrolled rounds), so equality
    CERTIFIES the incremental path: folding batches loses nothing vs
    re-clustering history — the property that makes daily dedup
    affordable at 100 TB."""
    from capex_data_pipeline_spark.extensions.graph import (
        cc_incremental,
        connected_components,
    )

    edges = _copurchase_edges(spark, sf_dir)
    is_new = (F.col("a") + F.col("b")) % 5 == 0
    old_labels = connected_components(
        edges.filter(~is_new),
        src_col="a",
        dst_col="b",
        until_fixpoint=True,
        assume_canonical=True,
    )
    return cc_incremental(
        old_labels, edges.filter(is_new), src_col="a", dst_col="b"
    )


# ------------------------------------ persisted incremental components


@query("q198_cc_persisted_fold", _cc_sql())
def q198_cc_persisted_fold(spark, sf_dir):
    """q189's incremental fold with DURABLE state (state.save_cc_state
    / state.cc_fold_persisted): yesterday's labeling is WRITTEN as a
    parquet table bucketed on vertex, and the fold READS it back — so
    the corpus-sized state streams from its buckets and only the
    batch-sized side ever shuffles (the zero-state-Exchange property
    is plan-pinned in tests/test_state.py). The oracle is unchanged
    from q114/q189 — the full from-scratch recompute over ALL edges —
    so equality certifies that persisting state across calls loses
    nothing vs re-clustering history. This is the shape that makes a
    daily 100 TB dedup affordable: the labeling's shuffle is paid once
    at write time, and every day after costs only its batch."""
    from capex_data_pipeline_spark.extensions.graph import (
        connected_components,
    )
    from capex_data_pipeline_spark.extensions.state import (
        cc_fold_persisted,
        save_cc_state,
    )

    edges = _copurchase_edges(spark, sf_dir)
    is_new = (F.col("a") + F.col("b")) % 5 == 0
    old_labels = connected_components(
        edges.filter(~is_new),
        src_col="a",
        dst_col="b",
        until_fixpoint=True,
        assume_canonical=True,
    )
    # the "prior call": persist yesterday's labeling, bucketed on vertex
    save_cc_state(
        old_labels,
        "t_state_cc_q198",
        n_buckets=8,
        path="/root/repo/spark-warehouse/t_state_cc_q198",
    )
    # today's fold: reads the PERSISTED table, never the in-memory frame
    return cc_fold_persisted(
        spark, "t_state_cc_q198", edges.filter(is_new),
        src_col="a", dst_col="b",
    )


# ---- q242: modularity of the connected-components partition


def _q242_sql() -> str:
    return f"""
    WITH {', '.join(_cc_ctes())},
    labels AS (SELECT v, lbl FROM l{_CC_ROUNDS}),
    eint AS (
      SELECT count(*)::BIGINT AS m_edges,
             sum(CASE WHEN la.lbl = lb.lbl THEN 1 ELSE 0 END)::BIGINT
               AS e_intra
      FROM e0
      JOIN labels la ON la.v = e0.a
      JOIN labels lb ON lb.v = e0.b
    ),
    deg AS (SELECT a AS v, count(*)::BIGINT AS d FROM sym GROUP BY a),
    dc AS (
      SELECT l.lbl, sum(deg.d)::HUGEINT AS dc
      FROM deg JOIN labels l ON l.v = deg.v GROUP BY l.lbl
    )
    SELECT (SELECT count(*) FROM labels)::BIGINT AS n_vertices,
           (SELECT count(*) FROM dc)::BIGINT AS n_communities,
           eint.m_edges, eint.e_intra,
           round(eint.e_intra / nullif(eint.m_edges::DOUBLE, 0.0)
                 - (SELECT sum(dc * dc) FROM dc)::DOUBLE
                   / nullif(4.0 * eint.m_edges::DOUBLE
                            * eint.m_edges::DOUBLE, 0.0), 6)
             AS modularity
    FROM eint
    """


@query("q242_modularity", _q242_sql())
def q242_modularity(spark, sf_dir):
    """Newman modularity of the q114 connected-components partition
    over the co-purchase graph (graph.modularity): Q = Σ_c [e_c/m −
    (d_c/2m)²], collapsed algebraically to TWO integer aggregates —
    intra-community edge count and Σ_c d_c² (DECIMAL(38,0)) — so Q is
    a ratio of exactly-known integers and no per-community frame
    leaves the engine. Scores the clustering the dedup/link-analysis
    family produces against the configuration model. The oracle
    replays the full 12-round CC unroll (shared with q114's oracle)
    plus the two aggregates."""
    from capex_data_pipeline_spark.extensions.graph import (
        connected_components,
        modularity,
    )

    edges = _copurchase_edges(spark, sf_dir)
    labels = connected_components(
        edges, rounds=_CC_ROUNDS, src_col="a", dst_col="b",
        assume_canonical=True,
    )
    return modularity(edges, labels, src_col="a", dst_col="b")


# ------------------------------------------------ per-edge support


@query(
    "q261_edge_support",
    f"""
    WITH pairs AS ({_COPURCH}),
    tri AS (
      SELECT p.a AS u, p.b AS v, q.b AS w
      FROM pairs p
      JOIN pairs q ON p.a = q.a AND p.b < q.b
      JOIN pairs r ON r.a = p.b AND r.b = q.b
    ),
    sides AS (
      SELECT u AS a, v AS b FROM tri
      UNION ALL SELECT u AS a, w AS b FROM tri
      UNION ALL SELECT v AS a, w AS b FROM tri
    )
    SELECT a, b, count(*)::BIGINT AS support
    FROM sides GROUP BY 1, 2
    """,
)
def q261_edge_support(spark, sf_dir):
    """Per-EDGE triangle support on the co-purchase graph
    (graph.edge_support) — the k-truss building block: support 0 =
    bridge-like tie, support >= k-2 = k-truss membership. Same
    degree-ordered orientation and O(m^1.5) wedge bound as q112;
    the triangle frame explodes x3 onto canonical edge keys for one
    hash aggregate. The oracle enumerates triangles the
    lexicographic way (a < b < c) and credits the same three sides —
    a genuinely different enumeration order than the operator's
    (degree, id) orientation, so agreement is a cross-check."""
    from capex_data_pipeline_spark.extensions.graph import edge_support

    edges = _copurchase_edges(spark, sf_dir)
    return edge_support(
        edges, src_col="a", dst_col="b", assume_canonical=True
    )


# ------------------------------------------------ k-truss (k=3)

_KTRUSS_K = 3
#: fixed peel rounds for the registered query — fixpoint at both
#: driver SFs is 2 rounds (measured); extras are data no-ops, same
#: convention as _KCORE_ROUNDS
_KTRUSS_ROUNDS = 4


def _ktruss_round(r: int) -> str:
    """One unrolled support-peel round: lexicographic triangles on
    e{r-1}, ×3 side credit, keep edges with support >= k-2."""
    return f"""
    tri{r} AS (
      SELECT p.a AS u, p.b AS v, q.b AS w
      FROM e{r - 1} p
      JOIN e{r - 1} q ON p.a = q.a AND p.b < q.b
      JOIN e{r - 1} rr ON rr.a = p.b AND rr.b = q.b
    ),
    sup{r} AS (
      SELECT a, b, count(*)::BIGINT AS s FROM (
        SELECT u AS a, v AS b FROM tri{r}
        UNION ALL SELECT u AS a, w AS b FROM tri{r}
        UNION ALL SELECT v AS a, w AS b FROM tri{r}
      ) GROUP BY 1, 2
    ),
    e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{r - 1} e
      JOIN sup{r} s ON s.a = e.a AND s.b = e.b
      WHERE s.s >= {_KTRUSS_K - 2}
    )"""


@query(
    "q264_ktruss",
    f"""
    WITH e0 AS MATERIALIZED ({_COPURCH}),
    {','.join(_ktruss_round(r) for r in range(1, _KTRUSS_ROUNDS + 1))},
    trif AS (
      SELECT p.a AS u, p.b AS v, q.b AS w
      FROM e{_KTRUSS_ROUNDS} p
      JOIN e{_KTRUSS_ROUNDS} q ON p.a = q.a AND p.b < q.b
      JOIN e{_KTRUSS_ROUNDS} rr ON rr.a = p.b AND rr.b = q.b
    ),
    supf AS (
      SELECT a, b, count(*)::BIGINT AS s FROM (
        SELECT u AS a, v AS b FROM trif
        UNION ALL SELECT u AS a, w AS b FROM trif
        UNION ALL SELECT v AS a, w AS b FROM trif
      ) GROUP BY 1, 2
    )
    SELECT e.a, e.b, coalesce(s.s, 0)::BIGINT AS support
    FROM e{_KTRUSS_ROUNDS} e
    LEFT JOIN supf s ON s.a = e.a AND s.b = e.b
    """,
)
def q264_ktruss(spark, sf_dir):
    """3-truss of the co-purchase graph (graph.ktruss, 4 fixed peel
    rounds — fixpoint is 2 at both driver SFs, extras are data
    no-ops): iteratively delete edges in no triangle until every
    surviving edge closes one — the EDGE-cohesion community core
    (strictly stronger than q113's k-core: degree can be faked by
    stars, mutual triangles cannot). Per round one degree-ordered
    O(m^1.5) triangle pass on the SHRINKING edge set + a x3 bounded
    explode + one aggregate + a keep-filter, eager plan boundary per
    round, per-round orientation frames boundary-cut (not persisted
    — the r11 sssp rule, via edge_support(use_boundary=True)). The
    oracle unrolls all rounds lexicographically and re-credits the
    final support."""
    from capex_data_pipeline_spark.extensions.graph import ktruss

    edges = _copurchase_edges(spark, sf_dir)
    return ktruss(
        edges, k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS,
        src_col="a", dst_col="b", assume_canonical=True,
    )
