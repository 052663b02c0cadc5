"""Hand-computed pins for the round-13 operators: positional index
(build/query/fold vs the scan operators), exact incremental PPR,
Kaplan-Meier, Holt integer smoothing (incl. negative trend — the
truncating-division cross-engine contract), Theil-Sen (negative and
fractional slopes), naive Bayes counts, per-edge triangle support,
and the join-multiplicity contract."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------ positional index


def test_positional_index_matches_scan_operators(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.corpus import (
        build_positional_index,
        phrase_from_index,
        phrase_match_counts,
        proximity_from_index,
        proximity_match_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "the table has a row near the table edge"),
            (2, "row row row your boat"),
            (3, "a table value appears here; table value twice"),
            (4, "nothing relevant"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    build_positional_index(
        docs, "t_r13_posidx", path=str(tmp_path / "posidx")
    )
    # window 5 and 3 match doc 1 (positions 2/8 vs 5 — distance 3);
    # window 2 correctly matches NOTHING (both sides must agree on
    # empty too)
    for window, expect in [(5, [(1, 2, 3)]), (3, [(1, 2, 3)]), (2, [])]:
        got = sorted(
            tuple(r)
            for r in proximity_from_index(
                spark, "t_r13_posidx", "table", "row", window=window
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in proximity_match_counts(
                docs, "table", "row", window=window
            ).collect()
        )
        assert got == want == expect, (window, got, want)
    got_p = sorted(
        tuple(r)
        for r in phrase_from_index(
            spark, "t_r13_posidx", ["table", "value"]
        ).collect()
    )
    want_p = sorted(
        tuple(r)
        for r in phrase_match_counts(docs, ["table", "value"]).collect()
    )
    assert got_p == want_p == [(3, 2, 2)]
    spark.sql("DROP TABLE IF EXISTS t_r13_posidx")


def test_positional_index_fold_appends_disjoint_batch(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.corpus import (
        build_positional_index,
        proximity_from_index,
        proximity_match_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "table near row"),
            (2, "table far from anything"),
            (10, "a row by the table again"),
        ],
        "doc_id long, text string",
    )
    old, new = docs.filter("doc_id < 10"), docs.filter("doc_id >= 10")
    build_positional_index(
        old, "t_r13_posidx_fold", path=str(tmp_path / "pf"),
        mode="overwrite",
    )
    build_positional_index(
        new, "t_r13_posidx_fold", path=str(tmp_path / "pf"),
        mode="append",
    )
    got = sorted(
        tuple(r)
        for r in proximity_from_index(
            spark, "t_r13_posidx_fold", "table", "row", window=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in proximity_match_counts(
            docs, "table", "row", window=5
        ).collect()
    )
    assert got == want and {r[0] for r in got} == {1, 10}
    spark.sql("DROP TABLE IF EXISTS t_r13_posidx_fold")


# ---------------------------------------------- incremental PPR


def test_ppr_fold_matches_from_scratch(spark, tmp_path):
    """Hand graph: old edges form a path from the seed; the batch adds
    a shortcut AND a brand-new vertex (including a new seedless sink),
    exercising changed-degree, new-vertex, and frontier paths."""
    from capex_data_pipeline_spark.extensions.graph import (
        personalized_pagerank,
        ppr_trajectory,
    )
    from capex_data_pipeline_spark.extensions.state import (
        ppr_fold_persisted,
        save_ppr_graph_state,
        save_ppr_state,
    )

    old = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    new = spark.createDataFrame(
        [("a", "c"), ("d", "z"), ("z", "a")], "src string, dst string"
    )
    merged = old.unionByName(new)
    seeds = ["a"]
    traj = ppr_trajectory(old, seeds, iterations=3, assume_distinct=True)
    save_ppr_state(
        traj, "t_r13_ppr_state", n_buckets=2, path=str(tmp_path / "ppr")
    )
    save_ppr_graph_state(
        old, "t_r13_ppr_state", n_buckets=2,
        path=str(tmp_path / "pprg"), assume_distinct=True,
    )
    folded = {
        r["vertex"]: r["rank_micro"]
        for r in ppr_fold_persisted(
            spark, "t_r13_ppr_state", new, seeds, iterations=3,
            assume_distinct=True,
        ).collect()
    }
    scratch = {
        r["vertex"]: r["rank_micro"]
        for r in personalized_pagerank(
            merged, seeds, iterations=3, assume_distinct=True
        ).collect()
    }
    assert folded == scratch
    # the seed actually propagated (non-trivial case)
    assert scratch["b"] > 0 and scratch["z"] > 0
    for t in ("t_r13_ppr_state", "t_r13_ppr_state_edges",
              "t_r13_ppr_state_deg"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# -------------------------------------------------- Kaplan-Meier


def test_kaplan_meier_hand_case(spark):
    """4 users, horizon = day of last activity anywhere (2024-02-01):
    u1 active d0 only, last seen 31d before horizon -> churned dur 0;
    u2 spans 5 days, churned; u3/u4 censored (active at horizon)."""
    from capex_data_pipeline_spark.extensions.timeseries import kaplan_meier

    rows = [
        (1, _ts("2024-01-01 10:00")),
        (2, _ts("2024-01-01 09:00")), (2, _ts("2024-01-06 09:00")),
        (3, _ts("2024-01-10 09:00")), (3, _ts("2024-02-01 09:00")),
        (4, _ts("2024-02-01 08:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["duration_days"]: (
            r["n_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in kaplan_meier(df, churn_gap_days=14).collect()
    }
    # durations: u1 churned 0; u2 churned 5; u3 censored 22; u4 censored 0
    # t=0: at risk 4, d=1 (u1), censored 1 (u4) -> S = 3/4
    # t=5: at risk 2 (u2, u3), d=1 -> S = 3/4 * 1/2 = 0.375
    assert out[0] == (4, 1, 1, 0.75)
    assert out[5] == (2, 1, 0, 0.375)
    assert set(out) == {0, 5}


# ------------------------------------------- Holt integer smoothing


def test_holt_forecast_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import holt_forecast

    rows = [
        ("a", _ts("2024-01-01 00:00"), 1.00),
        ("a", _ts("2024-01-02 00:00"), 2.00),
        ("a", _ts("2024-01-03 00:00"), 3.00),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = holt_forecast(df, "k", "ts", "value", horizon=3).collect()[0]
    # cents: [100, 200, 300]; l0=100,b0=0
    # l1=(600+700)//10=130; b1=(2*30+0)//10=6
    # l2=(900+7*136)//10=185; b2=(2*55+48)//10=15
    assert (r["level_cents"], r["trend_cents"]) == (185, 15)
    assert r["forecast"] == round((185 + 3 * 15) / 100.0, 2)


def test_holt_negative_trend_truncates_like_duckdb(spark):
    """Falling series drives 2*(l_t - l_{t-1}) + 8*b negative; the
    engine must truncate toward zero exactly like DuckDB's integer
    `//` (which truncates: -7//2 = -3), pinning the cross-engine
    division contract."""
    import duckdb

    from capex_data_pipeline_spark.extensions.timeseries import holt_forecast

    rows = [
        ("a", _ts("2024-01-01 00:00"), 5.00),
        ("a", _ts("2024-01-02 00:00"), 1.00),
        ("a", _ts("2024-01-03 00:00"), 0.50),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = holt_forecast(df, "k", "ts", "value").collect()[0]
    # duckdb replay via recursive CTE — NOT list_reduce with a
    # struct-returning lambda, which miscomputes on DuckDB 1.0 (the
    # computed fields cross-contaminate when both reference acc:
    # probing {'a': L, 'b': L} returns a != b); the q257 oracle uses
    # the same recursive-CTE unroll for that reason
    got = duckdb.sql(
        """
        WITH RECURSIVE pk AS (
          SELECT [500::BIGINT, 100::BIGINT, 50::BIGINT] AS arr
        ),
        f AS (
          SELECT 1 AS i, arr, arr[1] AS l, 0::BIGINT AS b FROM pk
          UNION ALL
          SELECT i + 1, arr,
                 (3*arr[i+1] + 7*(l + b)) // 10,
                 (2*(((3*arr[i+1] + 7*(l + b)) // 10) - l) + 8*b) // 10
          FROM f WHERE i < len(arr)
        )
        SELECT l, b FROM f WHERE i = len(arr)
        """
    ).fetchone()
    assert (r["level_cents"], r["trend_cents"]) == (got[0], got[1])
    assert r["trend_cents"] < 0


def test_trunc_div_matches_duckdb_on_negatives(spark):
    import duckdb

    from capex_data_pipeline_spark.extensions.timeseries import _trunc_div

    cases = [(-7, 2), (7, 2), (-10, 3), (10, 3), (-9, 9), (0, 5)]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r["n"], r["d"]): r["q"]
        for r in df.select(
            "n", "d", _trunc_div(F.col("n"), F.col("d")).alias("q")
        ).collect()
    }
    for n, d in cases:
        want = duckdb.sql(f"SELECT {n} // {d}").fetchone()[0]
        assert got[(n, d)] == want, (n, d, got[(n, d)], want)


# ------------------------------------------------------ Theil-Sen


def test_theil_sen_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        theil_sen_trend,
    )

    # key a: days 1,2,4 with values 1.00, 3.00, 2.00 ->
    # slopes (cents*1e6/day): (200e6/1)=2e8, (100e6/3)=33333333,
    # (-100e6/2)=-5e7 -> sorted [-5e7, 33333333, 2e8], median 33333333
    rows = [
        ("a", _ts("2024-01-01 00:00"), 1.00),
        ("a", _ts("2024-01-02 00:00"), 3.00),
        ("a", _ts("2024-01-04 00:00"), 2.00),
        ("b", _ts("2024-01-01 00:00"), 1.00),
        ("b", _ts("2024-01-02 00:00"), 2.00),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["k"]: (r["n_days"], r["n_pairs"], r["slope_micro_median"])
        for r in theil_sen_trend(df, "k", "ts", "value").collect()
    }
    assert out["a"] == (3, 3, 33333333.0)
    assert out["b"] == (2, 1, 100000000.0)


# ----------------------------------------------------- naive Bayes


def test_naive_bayes_hand_counts(spark):
    from capex_data_pipeline_spark.extensions.linalg import (
        hashed_buckets,
        naive_bayes_train,
    )

    docs = spark.createDataFrame(
        [
            ("spark joins data", 1),
            ("spark shuffles", 1),
            ("plain text here", 0),
        ],
        "text string, y int",
    )
    model = naive_bayes_train(docs, "y", n_buckets=8)
    rows = model.collect()
    assert len(rows) == 16  # 8 buckets x 2 classes
    by = {(r["bucket"], r["label"]): r for r in rows}
    # the bucket holding 'spark' must be present in both positive docs
    b_spark = (
        spark.range(1)
        .select(hashed_buckets(F.lit("spark"), 8).alias("b"))
        .collect()[0]["b"][0]
    )
    r = by[(b_spark, 1)]
    assert r["n_docs"] == 2 and r["n_present"] == 2
    assert r["logp_present"] == round(math.log(3 / 4), 6)
    assert by[(b_spark, 0)]["n_docs"] == 1
    assert r["log_prior"] == round(math.log(2 / 3), 6)


# ---------------------------------------------------- edge support


def test_edge_support_hand_graph(spark):
    from capex_data_pipeline_spark.extensions.graph import edge_support

    # two triangles sharing edge (1,2): {1,2,3} and {1,2,4}; plus a
    # dangling edge (4,5) in no triangle
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (4, 5)],
        "src long, dst long",
    )
    out = {
        (r["a"], r["b"]): r["support"]
        for r in edge_support(edges).collect()
    }
    assert out == {
        (1, 2): 2, (1, 3): 1, (2, 3): 1, (1, 4): 1, (2, 4): 1,
    }


# ------------------------------------------- join multiplicity


def test_join_multiplicity_hand_case(spark):
    from capex_data_pipeline_spark.extensions.cleaning import (
        join_multiplicity_report,
    )

    parent = spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "pk long"
    )  # key 2 duplicated -> broken "1" side
    child = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "fk long"
    )
    r = join_multiplicity_report(
        [("e", parent, "pk", child, "fk")]
    ).collect()[0]
    assert r["edge"] == "e"
    assert r["n_parent_keys"] == 3
    assert r["n_dup_parent_keys"] == 1
    assert r["n_childless_keys"] == 1  # key 3
    assert r["max_fanout"] == 3
    assert r["avg_fanout"] == round(4 / 3, 6)


# ------------------------------------------------------- k-truss


def test_ktruss_hand_graph(spark):
    """K4 plus a pendant triangle chain: the 4-truss (support >= 2)
    keeps exactly the K4; the pendant triangle (support 1 edges)
    peels, and its removal must NOT cascade into the K4."""
    from capex_data_pipeline_spark.extensions.graph import ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 5), (4, 6), (5, 6)]
    edges = spark.createDataFrame(k4 + pendant, "src long, dst long")
    out = {
        (r["a"], r["b"]): r["support"]
        for r in ktruss(edges, k=4, rounds=3).collect()
    }
    assert set(out) == set(k4)
    assert all(v == 2 for v in out.values())
    # 3-truss keeps everything (every edge closes >= 1 triangle)
    out3 = ktruss(edges, k=3, until_fixpoint=True).collect()
    assert len(out3) == 9


# ------------------------------------------------ sequence pairs


def test_sequence_pairs_strict_precedence(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        sequence_pair_support,
    )

    rows = [
        # window (1, day1): view -> purchase (strict)
        (1, _ts("2024-01-01 09:00"), "view"),
        (1, _ts("2024-01-01 10:00"), "purchase"),
        # window (1, day2): purchase only
        (1, _ts("2024-01-02 10:00"), "purchase"),
        # window (2, day1): SAME instant -> counts for neither order
        (2, _ts("2024-01-01 09:00"), "view"),
        (2, _ts("2024-01-01 09:00"), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        (r["ante"], r["cons"]): (
            r["support"], r["n_ante_windows"], r["confidence"]
        )
        for r in sequence_pair_support(df).collect()
    }
    # view appears in 2 windows; view->purchase strictly in 1
    assert out == {("view", "purchase"): (1, 2, 0.5)}


# ------------------------------------------------ bitemporal


def test_bitemporal_snapshot_correction_visibility(spark):
    from capex_data_pipeline_spark.extensions.cleaning import (
        bitemporal_snapshot,
    )

    d = datetime.date
    log = spark.createDataFrame(
        [
            # key 1: base, then correction recorded later
            (1, "base", d(2024, 1, 1), d(2024, 1, 1)),
            (1, "corrected", d(2024, 1, 1), d(2024, 1, 10)),
            # key 2: new valid version effective later
            (2, "v1", d(2024, 1, 1), d(2024, 1, 1)),
            (2, "v2", d(2024, 2, 1), d(2024, 2, 1)),
        ],
        "k long, status string, valid_from date, tx_from date",
    )
    # T before the correction was recorded: must see 'base'
    snap = {
        r["k"]: r["status"]
        for r in bitemporal_snapshot(
            log, ["k"], "valid_from", "tx_from",
            d(2024, 1, 15), d(2024, 1, 5),
        ).collect()
    }
    assert snap == {1: "base", 2: "v1"}
    # T after the correction, V before v2's effect: corrected + v1
    snap2 = {
        r["k"]: r["status"]
        for r in bitemporal_snapshot(
            log, ["k"], "valid_from", "tx_from",
            d(2024, 1, 15), d(2024, 2, 15),
        ).collect()
    }
    assert snap2 == {1: "corrected", 2: "v1"}


# ------------------------------------------------ IVF fold


def test_ivf_fold_equals_from_scratch(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.similarity import (
        _arrow_topcells,
        _ivf_centers,
        ivf_query,
    )
    from capex_data_pipeline_spark.extensions.state import (
        ivf_fold_persisted,
        save_ivf_state,
    )

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    _, centers = _ivf_centers(old, "vec_id", "embedding", 4, "sample", 42)

    def assign(df):
        return df.withColumn(
            "cell",
            F.element_at(_arrow_topcells(centers, 1)(F.col("embedding")), 1),
        )

    save_ivf_state(
        assign(old), "t_r13_ivf", n_buckets=2, path=str(tmp_path / "ivf")
    )
    merged = ivf_fold_persisted(spark, "t_r13_ivf", new, centers)
    queries = emb.filter(F.col("vec_id") < 3)
    got = sorted(
        map(tuple, ivf_query(merged, centers, queries, k=5).collect())
    )
    want = sorted(
        map(tuple, ivf_query(assign(emb), centers, queries, k=5).collect())
    )
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS t_r13_ivf")


# ------------------------------------------------------- MMR


def test_mmr_prefers_diverse_over_redundant(spark):
    """Query q; candidates: a1/a2 nearly identical high-relevance,
    b different direction moderate relevance. MMR must pick a1 first
    then b (a2's redundancy penalty sinks it), where plain top-2
    would pick a1, a2."""
    from capex_data_pipeline_spark.extensions.similarity import mmr_rerank

    rows = [
        (100, [1.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.14, 0.0]),        # a1
        (2, [0.99, 0.141, 0.0]),       # a2 (near-dup of a1)
        (3, [0.7, 0.0, 0.71]),         # b (different direction)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        (r["pick_rank"], r["neighbor_id"])
        for r in mmr_rerank(
            emb,
            emb.filter(F.col("vec_id") == 100),
            k=2,
            pool=3,
            lam_tenths=5,
        ).collect()
    )
    assert out == [(1, 1), (2, 3)]


# ------------------------------------------------ rate limit


def test_rate_limit_audit_burst_and_straddle(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        rate_limit_audit,
    )

    base = _ts("2024-01-01 10:00:00")
    import datetime as dt

    rows = (
        # user 1: 3 events in 60s — compliant at limit 3?? limit=3
        # means count>=3 bursts; use limit 4 below: 3 events no burst
        [(1, base + dt.timedelta(seconds=s)) for s in (0, 10, 50)]
        # user 2: 4 events straddling a minute boundary (at :30,
        # :50, :70, :80) — a tumbling [0,60) window sees only 2+2,
        # the sliding window sees all 4 within 59s
        + [(2, base + dt.timedelta(seconds=s)) for s in (30, 50, 70, 80)]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["user_id"]: (
            r["n_events"], r["n_burst_events"], r["max_in_window"]
        )
        for r in rate_limit_audit(df, limit=4, window_seconds=60).collect()
    }
    assert out[1] == (3, 0, 3)
    assert out[2] == (4, 1, 4)


# --------------------------------------------- clamped balance


def test_clamped_balance_floor_engages(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        clamped_balance,
    )

    rows = [
        ("a", _ts("2024-01-01 10:00"), 5.00),   # +500
        ("a", _ts("2024-01-01 11:00"), -20.00),  # clamp to 0 (not -1500)
        ("a", _ts("2024-01-01 12:00"), 3.00),   # restart from 0 -> 300
        ("b", _ts("2024-01-01 10:00"), 2.00),
        ("b", _ts("2024-01-01 11:00"), -1.00),  # never clamps
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r["k"]: (r["final_cents"], r["sum_deltas_cents"], r["clamped"])
        for r in clamped_balance(df, "k", "ts", "value").collect()
    }
    assert out["a"] == (300, -1200, True)
    assert out["b"] == (100, 100, False)
