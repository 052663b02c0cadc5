"""Unit tests for extensions/analytics.py: sessionize, robust_zscore,
cohort_retention — hand-computed small cases pinning the semantics the
q82/q83/q84 oracles check at corpus scale."""

from __future__ import annotations

import datetime as dt

import pytest

from capex_data_pipeline_spark.extensions.analytics import (
    cohort_retention,
    robust_zscore,
    sessionize,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_numbering(spark):
    df = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 10:29:00")),  # 29 min → same session
            (3, "u1", _ts("2024-01-01 10:59:00")),  # exactly 30 min → SAME (> only)
            (4, "u1", _ts("2024-01-01 12:00:00")),  # 61 min → new session
            (5, "u2", _ts("2024-01-01 10:00:00")),  # other key restarts at 0
        ],
        "event_id long, user_id string, ts timestamp",
    )
    out = {
        r["event_id"]: (r["session_id"], r["is_session_start"])
        for r in sessionize(df, gap_seconds=1800, tiebreak_col="event_id").collect()
    }
    assert out == {
        1: (0, True),
        2: (0, False),
        3: (0, False),
        4: (1, True),
        5: (0, True),
    }


def test_sessionize_tie_determinism(spark):
    # two events at the key's min ts: the tiebreak column decides which
    # carries is_session_start — deterministically
    df = spark.createDataFrame(
        [(2, "u", _ts("2024-01-01 10:00:00")), (1, "u", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    out = {
        r["event_id"]: r["is_session_start"]
        for r in sessionize(df, tiebreak_col="event_id").collect()
    }
    assert out == {1: True, 2: False}


def test_robust_zscore_hand_computed(spark):
    # values 1..5 + outlier 100 for u1: median 4.5? no — [1,2,3,4,5,100]
    # median = 3.5, deviations [2.5,1.5,0.5,0.5,1.5,96.5], MAD = 1.5
    rows = [(i, "u1", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100])]
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    out = {r["event_id"]: r for r in robust_zscore(df, threshold=3.5).collect()}
    z100 = 0.6745 * (100 - 3.5) / 1.5
    assert out[5]["mzscore"] == pytest.approx(z100)
    assert out[5]["is_outlier"] is True
    assert out[0]["mzscore"] == pytest.approx(0.6745 * (1 - 3.5) / 1.5)
    assert all(not out[i]["is_outlier"] for i in range(5))


def test_robust_zscore_degenerate_mad_is_null(spark):
    # constant key: MAD = 0 → mzscore/is_outlier null, never infinity
    df = spark.createDataFrame(
        [(1, "u", 7.0), (2, "u", 7.0), (3, "u", 7.0)],
        "event_id long, user_id string, value double",
    )
    rows = robust_zscore(df).collect()
    assert all(r["mzscore"] is None and r["is_outlier"] is None for r in rows)


def test_cohort_retention_triangle(spark):
    # u1 first week W0, active W0+W2; u2 first W0, active W0 only;
    # u3 first W2, active W2. Mondays: 2024-01-01 and 2024-01-15.
    df = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00")),
            ("u1", _ts("2024-01-02 10:00:00")),  # same week, distinct'd
            ("u1", _ts("2024-01-16 10:00:00")),  # week +2
            ("u2", _ts("2024-01-03 10:00:00")),
            ("u3", _ts("2024-01-17 10:00:00")),
        ],
        "user_id string, ts timestamp",
    )
    out = {
        (str(r["cohort"]), r["period_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_retention(df, period="week").collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-15", 0): (1, 1, 1.0),
    }
    with pytest.raises(ValueError, match="unsupported period"):
        cohort_retention(df, period="fortnight")


def test_funnel_ordered_chain(spark):
    from capex_data_pipeline_spark.extensions.analytics import funnel

    rows = [
        # u1: full ordered funnel
        ("u1", "view", _ts("2024-01-01 10:00:00")),
        ("u1", "click", _ts("2024-01-01 10:05:00")),
        ("u1", "purchase", _ts("2024-01-01 10:10:00")),
        # u2: click BEFORE first view → chain breaks at step 2
        ("u2", "click", _ts("2024-01-01 09:00:00")),
        ("u2", "view", _ts("2024-01-01 10:00:00")),
        ("u2", "purchase", _ts("2024-01-01 11:00:00")),
        # u3: never viewed → not in output
        ("u3", "click", _ts("2024-01-01 10:00:00")),
        # u4: purchase outside the within-window
        ("u4", "view", _ts("2024-01-01 10:00:00")),
        ("u4", "click", _ts("2024-01-01 10:05:00")),
        ("u4", "purchase", _ts("2024-01-03 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = {
        r["user_id"]: r
        for r in funnel(
            df, ["view", "click", "purchase"], within_seconds=86400.0
        ).collect()
    }
    assert set(out) == {"u1", "u2", "u4"}
    assert out["u1"]["max_step"] == 3
    assert out["u2"]["max_step"] == 1 and out["u2"]["t2"] is None
    assert out["u4"]["max_step"] == 2 and out["u4"]["t3"] is None

    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])


def test_rolling_window_trailing_aggregates(spark):
    from capex_data_pipeline_spark.extensions.analytics import rolling_window

    df = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00"), 1.0),
            (2, "u", _ts("2024-01-01 10:30:00"), 2.0),
            (3, "u", _ts("2024-01-01 11:00:00"), 4.0),   # 10:00 still in [t-1h, t]
            (4, "u", _ts("2024-01-01 12:30:00"), 8.0),   # everything expired
            (5, "u", _ts("2024-01-01 12:30:00"), 16.0),  # timestamp peer of 4
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["rolling_n"], r["rolling_sum"], r["rolling_max"])
        for r in rolling_window(df, window_seconds=3600.0).collect()
    }
    assert out[1] == (1, 1.0, 1.0)
    assert out[2] == (2, 3.0, 2.0)
    assert out[3] == (3, 7.0, 4.0)       # inclusive lower bound
    assert out[4] == (2, 24.0, 16.0)     # RANGE peers share the frame
    assert out[5] == (2, 24.0, 16.0)


def test_scd2_intervals_merges_and_closes(spark):
    from capex_data_pipeline_spark.extensions.analytics import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00"), "A"),
            (2, "u", _ts("2024-01-01 11:00:00"), "A"),  # no change → merged
            (3, "u", _ts("2024-01-01 12:00:00"), "B"),
            (4, "u", _ts("2024-01-01 13:00:00"), "A"),  # back to A → NEW interval
            (5, "v", _ts("2024-01-01 09:00:00"), "X"),
        ],
        "event_id long, user_id string, ts timestamp, state string",
    )
    out = sorted(
        (
            r["user_id"],
            r["state"],
            r["valid_from"].isoformat(),
            r["valid_to"].isoformat() if r["valid_to"] else None,
            r["is_current"],
        )
        for r in scd2_intervals(
            df, value_col="state", tiebreak_col="event_id"
        ).collect()
    )
    assert out == [
        ("u", "A", "2024-01-01T10:00:00", "2024-01-01T12:00:00", False),
        ("u", "A", "2024-01-01T13:00:00", None, True),
        ("u", "B", "2024-01-01T12:00:00", "2024-01-01T13:00:00", False),
        ("v", "X", "2024-01-01T09:00:00", None, True),
    ]


# ------------------------------------------------- distribution drift


def test_distribution_drift_hand_computed(spark):
    import math

    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    base = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "cat string"
    )
    curr = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("c",)], "cat string"
    )
    got = {
        r.category: r
        for r in distribution_drift(base, curr, "cat", smoothing=0.5).collect()
    }
    s, k, tb, tc = 0.5, 3, 3, 4
    for cat, (nb, nc) in {"a": (2, 1), "b": (1, 2), "c": (0, 1)}.items():
        p = (nb + s) / (tb + s * k)
        q = (nc + s) / (tc + s * k)
        r = got[cat]
        assert (r.n_base, r.n_curr) == (nb, nc)
        assert r.p_base == pytest.approx(round(p, 6), abs=1e-9)
        assert r.p_curr == pytest.approx(round(q, 6), abs=1e-9)
        assert r.psi_contrib == pytest.approx(
            (q - p) * math.log(q / p), abs=2e-6
        )


def test_distribution_drift_identical_slices_near_zero(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "cat string")
    rows = distribution_drift(df, df, "cat").collect()
    assert all(r.psi_contrib == 0.0 for r in rows)
    # -0.0 must have been collapsed (cross-engine hash stability)
    assert all(str(r.psi_contrib) != "-0.0" for r in rows)


def test_distribution_drift_null_category_is_real(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    base = spark.createDataFrame([("a",), (None,)], "cat string")
    curr = spark.createDataFrame([(None,), (None,)], "cat string")
    got = {r.category: r for r in distribution_drift(base, curr, "cat").collect()}
    assert got["<null>"].n_base == 1 and got["<null>"].n_curr == 2
    assert got["a"].n_curr == 0


def test_distribution_drift_bad_smoothing_raises(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    df = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(ValueError):
        distribution_drift(df, df, "cat", smoothing=0.0)


def test_distribution_drift_nan_smoothing_raises(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    df = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(ValueError):
        distribution_drift(df, df, "cat", smoothing=float("nan"))


# --------------------------------------------------- CDC changelog


def test_apply_changelog_semantics(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        apply_changelog,
    )

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    chg = spark.createDataFrame(
        [
            (1, "a2", 10, "U"),   # overridden by version 20 below
            (1, "a3", 20, "U"),   # latest upsert wins
            (2, "x", 5, "D"),     # delete key 2
            (4, "new", 1, "U"),   # insert unseen key
        ],
        "k long, v string, version long, op string",
    )
    got = {r.k: r.v for r in apply_changelog(snap, chg, ["k"]).collect()}
    assert got == {1: "a3", 3: "c", 4: "new"}


def test_apply_changelog_delete_then_reinsert_and_validation(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        apply_changelog,
    )

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "x", 1, "D"), (1, "back", 2, "U")],
        "k long, v string, version long, op string",
    )
    got = {r.k: r.v for r in apply_changelog(snap, chg, ["k"]).collect()}
    assert got == {1: "back"}  # later upsert revives the deleted key
    bad = spark.createDataFrame(
        [(1, "x", "zz", 1, "U")],
        "k long, v string, rogue string, version long, op string",
    )
    with pytest.raises(ValueError, match="rogue"):
        apply_changelog(snap, bad, ["k"])

def test_apply_changelog_duplicate_rows_deterministic(spark):
    """Duplicate (key, version, op) change rows tie on every ordering
    column except the payload hash — the winner must be the same on
    every run/partitioning (ADVICE r5: arbitrary row_number winner)."""
    from capex_data_pipeline_spark.extensions.analytics import (
        apply_changelog,
    )

    snap = spark.createDataFrame([(9, "z")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "p", 7, "U"), (1, "q", 7, "U")],
        "k long, v string, version long, op string",
    )
    outs = set()
    for n_parts in (1, 2, 7):
        got = {
            r.k: r.v
            for r in apply_changelog(
                snap, chg.repartition(n_parts), ["k"]
            ).collect()
        }
        assert got[9] == "z"
        outs.add(got[1])
    assert len(outs) == 1  # same winner at every partitioning

    # identical duplicate snapshot rows collapse harmlessly
    dup_snap = spark.createDataFrame(
        [(5, "s"), (5, "s")], "k long, v string"
    )
    empty_chg = spark.createDataFrame(
        [], "k long, v string, version long, op string"
    )
    got = apply_changelog(dup_snap, empty_chg, ["k"]).collect()
    assert [(r.k, r.v) for r in got] == [(5, "s")]


def test_association_rules_hand_computed(spark):
    """Exact metrics on a 4-basket toy: {a,b} in 2 baskets, a alone in
    one more, c co-occurs once (below min_support)."""
    from capex_data_pipeline_spark.extensions.analytics import (
        association_rules,
    )

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"), (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket_id long, item_id string")
    got = association_rules(
        df, min_support=2, topk=10
    ).collect()
    assert len(got) == 1  # only (a, b) reaches support 2
    r = got[0]
    assert (r["item_a"], r["item_b"], r["pair_support"]) == ("a", "b", 2)
    assert (r["support_a"], r["support_b"]) == (3, 3)
    assert r["confidence_ab"] == round(2 / 3, 6)
    assert r["confidence_ba"] == round(2 / 3, 6)
    assert r["lift"] == round(2 * 4 / (3 * 3), 6)  # 0.888889
    assert r["rank"] == 1


def test_association_rules_dedups_repeated_items(spark):
    """An item listed twice in one basket counts once (DISTINCT frame)."""
    from capex_data_pipeline_spark.extensions.analytics import (
        association_rules,
    )

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket_id long, item_id string")
    r = association_rules(df, min_support=2, topk=5).collect()[0]
    assert r["pair_support"] == 2 and r["support_a"] == 2
    assert r["lift"] == round(2 * 2 / (2 * 2), 6) == 1.0


def test_association_rules_plan_and_guards(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        association_rules,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b")], "basket_id long, item_id string"
    )
    plan = (
        association_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match=">= 1"):
        association_rules(df, min_support=0)


def test_association_rules_builds_lazily(spark, monkeypatch):
    """Regression (r9): the basket total used to be an eager
    driver-side distinct().count() inside operator CONSTRUCTION; it is
    now a broadcast 1-row aggregate, so building the frame triggers no
    Spark action at all."""
    from pyspark.sql import DataFrame

    from capex_data_pipeline_spark.extensions.analytics import (
        association_rules,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")],
        "basket_id long, item_id string",
    )

    def _boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("eager action during operator build")

    for action in ("count", "collect", "toPandas", "take", "first"):
        monkeypatch.setattr(DataFrame, action, _boom)
    out = association_rules(df, min_support=2, topk=5)  # must not raise
    monkeypatch.undo()
    r = out.collect()[0]
    assert (r["item_a"], r["item_b"], r["pair_support"]) == ("a", "b", 2)
    assert r["lift"] == 1.0  # pair 2 × baskets 2 / (sup_a 2 × sup_b 2)


# ----------------------------------------------- 2-D skyline (q182)


def test_skyline2d_differential_brute_force(spark):
    """Frontier equality with the quadratic dominance definition on
    random data with planted ties (same min value, same max value,
    and full duplicate criterion pairs)."""
    import random

    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.analytics import skyline2d

    rng = random.Random(182)
    rows = [(i, rng.randint(0, 40), round(rng.uniform(0, 100), 1))
            for i in range(300)]
    rows += [(1000, 5, 99.9), (1001, 5, 99.9)]  # duplicate pair
    dominated = set()
    for i, (ia, ma, va) in enumerate(rows):
        for ib, mb, vb in rows:
            if ib != ia and mb <= ma and vb >= va and (mb < ma or vb > va):
                dominated.add(ia)
                break
    expect = {ia for ia, _, _ in rows} - dominated
    df = spark.createDataFrame(rows, "id long, m int, v double")
    got = {
        r["id"]
        for r in skyline2d(
            df, "m", "v", F.floor(F.col("m") / 7)
        ).collect()
    }
    assert got == expect


def test_skyline2d_nulls_and_single_bucket(spark):
    """NULL-criterion rows are excluded; a constant bucket (single
    partition of the prefix machinery) still yields the frontier."""
    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.analytics import skyline2d

    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 20.0), (3, 3, 15.0), (4, None, 99.0),
         (5, 2, None)],
        "id long, m int, v double",
    )
    got = {r["id"] for r in skyline2d(df, "m", "v", F.lit(0)).collect()}
    assert got == {1, 2}  # 3 dominated by 2; 4/5 excluded


# ------------------------------------- isotonic calibration (q193)


def test_isotonic_calibrate_pools_violations(spark):
    """Hand-computed PAV: a dipping middle bin pools with its
    neighbor; already-monotone bins pass through; the fit is
    non-decreasing and preserves the weighted total."""
    from capex_data_pipeline_spark.extensions.analytics import (
        isotonic_calibrate,
    )

    # bins: 0 -> 1/4, 1 -> 3/4, 2 -> 1/4 (violation), 3 -> 4/4
    rows = (
        [(0, 1)] * 1 + [(0, 0)] * 3
        + [(1, 1)] * 3 + [(1, 0)] * 1
        + [(2, 1)] * 1 + [(2, 0)] * 3
        + [(3, 1)] * 4
    )
    df = spark.createDataFrame(rows, "bin int, y int")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["rate_raw"], r["rate_fit"])
        for r in isotonic_calibrate(df, "bin", "y").collect()
    }
    # bins 1+2 pool: (3+1)/(4+4) = 0.5
    assert got[0] == (4, 1, 0.25, 0.25)
    assert got[1] == (4, 3, 0.75, 0.5)
    assert got[2] == (4, 1, 0.25, 0.5)
    assert got[3] == (4, 4, 1.0, 1.0)


def test_isotonic_calibrate_differential_random(spark):
    """Python PAV replay on random bins: cascading pools (a low bin
    arriving late pools backward through several blocks)."""
    import random

    from capex_data_pipeline_spark.extensions.analytics import (
        isotonic_calibrate,
    )

    rng = random.Random(193)
    rows = []
    for b in range(12):
        n = rng.randint(1, 30)
        p = rng.randint(0, n)
        rows += [(b, 1)] * p + [(b, 0)] * (n - p)
    df = spark.createDataFrame(rows, "bin int, y int")
    got = sorted(
        (r["bin"], r["rate_fit"])
        for r in isotonic_calibrate(df, "bin", "y").collect()
    )
    # reference PAV
    agg = {}
    for b, y in rows:
        n, p = agg.get(b, (0, 0))
        agg[b] = (n + 1, p + y)
    blocks = []
    order = sorted(agg)
    for b in order:
        n, p = agg[b]
        blocks.append([1, n, p])
        while len(blocks) >= 2 and blocks[-1][2] * blocks[-2][1] < blocks[-2][2] * blocks[-1][1]:
            s2, n2, p2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += n2
            blocks[-1][2] += p2
    expect, i = [], 0
    for span, n, p in blocks:
        for _ in range(span):
            expect.append((order[i], p / n))
            i += 1
    assert got == sorted(expect)
    fits = [f for _, f in got]
    assert all(a <= b for a, b in zip(fits, fits[1:]))  # monotone


# ----------------------------------------- per-group OLS trend (q197)


def test_group_linear_trend_differential(spark):
    """numpy-free OLS replay on crafted data: a perfect line (r2 = 1),
    a noisy group, a constant-x degenerate group (NULLs), and NULL
    exclusion."""
    from capex_data_pipeline_spark.extensions.analytics import (
        group_linear_trend,
    )

    rows = [("lin", x, 2.5 * x + 1.0) for x in range(10)]
    rows += [("noisy", x, [3.0, 7.0, 4.0, 9.0, 5.0][x % 5]) for x in range(20)]
    rows += [("const", 4, 1.0), ("const", 4, 9.0)]
    rows += [("lin", None, 5.0), ("lin", 3, None)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in group_linear_trend(df, "g", "x", "y").collect()
    }
    assert got["lin"] == (10, 2.5, 1.0, 1.0)
    assert got["const"] == (2, None, None, None)

    def ols(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        num = n * sxy - sx * sy
        slope = num / (n * sxx - sx * sx)
        inter = (sy - slope * sx) / n
        r2 = num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        return slope, inter, r2
    pts = [(x, round(y * 100)) for g, x, y in rows if g == "noisy"]
    s, i, r2 = ols(pts)
    assert got["noisy"][1] == pytest.approx(s / 100, abs=1e-6)
    assert got["noisy"][2] == pytest.approx(i / 100, abs=1e-6)
    assert got["noisy"][3] == pytest.approx(r2, abs=1e-6)
