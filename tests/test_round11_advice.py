"""Regression tests for the round-10 ADVICE.md findings, fixed in
round 11:

1. group_priority_sample must keep NULL-group rows (null-safe tau join).
2. group_linear_trend must not wrap int64 on cents-scaled y² sums
   (DECIMAL(38,0) sufficient statistics, matching DuckDB's HUGEINT).
3. exact_quantiles must validate ps before any aggregate and return an
   empty typed frame for ps=[] (and the global path is now ONE job via
   the grouped implementation).
4. asof_join nearest+tolerance arbitrates among tolerance-qualified
   candidates (pandas merge_asof semantics), pinned explicitly.
5. token_budget_allocation largest-remainder tie-break must not raise
   TypeError when a NULL group name ties with a string-named group.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_group_priority_sample_keeps_null_group(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        group_priority_sample,
    )

    rows = [(None if i % 2 == 0 else "s", f"d{i}", float(1 + i % 7))
            for i in range(40)]
    df = spark.createDataFrame(rows, "src string, doc string, w double")
    out = group_priority_sample(
        df, k=5, weight_col="w", key_col="doc", group_col="src"
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["src"], []).append(r)
    # the NULL-keyed slice must survive the tau join, k rows like any group
    assert len(by_group.get(None, [])) == 5
    assert len(by_group.get("s", [])) == 5
    # est_weight stays the max(w, tau) bound for every surviving row
    for r in out:
        assert r["est_weight"] >= r["weight"] - 1e-12


def test_group_priority_sample_small_null_group_keeps_all(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        group_priority_sample,
    )

    df = spark.createDataFrame(
        [(None, "a", 2.0), (None, "b", 3.0), ("x", "c", 1.0)],
        "src string, doc string, w double",
    )
    out = group_priority_sample(
        df, k=5, weight_col="w", key_col="doc", group_col="src"
    ).collect()
    # groups with <= k rows keep everything, est_weight == weight
    assert sorted(((r["src"] or "", r["doc"]) for r in out)) == [
        ("", "a"), ("", "b"), ("x", "c")
    ]
    for r in out:
        assert r["est_weight"] == pytest.approx(r["weight"])


def test_group_linear_trend_no_int64_wrap_on_large_y(spark):
    """y ~ 1e5 units → cents-scaled 1e7 → y² ~ 1e14 per row; at 100k
    rows Σy² ≈ 1e19 > int64 max (9.22e18). The old long-sum silently
    wrapped; the DECIMAL(38,0) accumulators must stay exact."""
    from capex_data_pipeline_spark.extensions.analytics import (
        group_linear_trend,
    )

    n = 100_000
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        (F.col("id") % 100).alias("x"),
        (F.lit(100_000.0) + (F.col("id") % 100).cast("double")).alias("y"),
    )
    row = group_linear_trend(df, "g", "x", "y").collect()[0]
    # y = 1e5 + x exactly → slope 1, intercept 1e5, r² 1
    assert row["n"] == n
    assert row["slope"] == pytest.approx(1.0, abs=1e-6)
    assert row["intercept"] == pytest.approx(100_000.0, abs=1e-3)
    assert row["r2"] == pytest.approx(1.0, abs=1e-6)


def test_exact_quantiles_empty_ps_and_validation(spark):
    from capex_data_pipeline_spark.extensions.sketches import exact_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    out = exact_quantiles(df, "x", [])
    assert out.columns == ["p", "rank", "value"]
    assert out.count() == 0
    # validation fires BEFORE any scan — even on an empty input frame
    empty = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(empty, "x", [0.0])
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(df, "x", [1.5])


def test_exact_quantiles_one_job_matches_sorted_reference(spark):
    from capex_data_pipeline_spark.extensions.sketches import exact_quantiles

    vals = [((i * 37) % 101) * 0.5 for i in range(101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.1, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["p"]: (r["rank"], r["value"])
        for r in exact_quantiles(df, "x", ps, n_buckets=8).collect()
    }
    s = sorted(vals)
    for p in ps:
        rk = math.ceil(p * len(s))
        assert got[p] == (rk, s[rk - 1])


def test_group_exact_quantiles_degenerate_group_driver_side(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        group_exact_quantiles,
    )

    rows = [("const", 7.5)] * 9 + [("vary", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        (r["g"], r["p"]): (r["rank"], r["value"])
        for r in group_exact_quantiles(df, "g", "x", [0.5, 1.0]).collect()
    }
    assert got[("const", 0.5)] == (5, 7.5)
    assert got[("const", 1.0)] == (9, 7.5)
    assert got[("vary", 0.5)] == (5, 4.0)
    assert got[("vary", 1.0)] == (10, 9.0)


def test_asof_nearest_tolerance_qualified_candidates(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    right = spark.createDataFrame(
        [("k", 4.0, "back"), ("k", 13.0, "fwd")], "k string, t double, rv string"
    )
    left = spark.createDataFrame([("k", 10.0)], "k string, t double")
    # dist_b=6, dist_f=3, tol=4 → only forward qualifies → forward wins
    m = asof_join(left, right, on="k", time_col="t", direction="nearest",
                  tolerance_seconds=4.0).collect()[0]
    assert m["rv_asof"] == "fwd"
    # tol=2 → neither qualifies → NULL
    m = asof_join(left, right, on="k", time_col="t", direction="nearest",
                  tolerance_seconds=2.0).collect()[0]
    assert m["rv_asof"] is None and m["t_asof"] is None
    # tol=10 → both qualify → nearer (forward, dist 3) wins
    m = asof_join(left, right, on="k", time_col="t", direction="nearest",
                  tolerance_seconds=10.0).collect()[0]
    assert m["rv_asof"] == "fwd"
    # mirror: backward nearer and in tolerance
    right2 = spark.createDataFrame(
        [("k", 8.0, "back"), ("k", 17.0, "fwd")], "k string, t double, rv string"
    )
    m = asof_join(left, right2, on="k", time_col="t", direction="nearest",
                  tolerance_seconds=4.0).collect()[0]
    assert m["rv_asof"] == "back"


def test_token_budget_allocation_null_group_tie(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        token_budget_allocation,
    )

    df = spark.createDataFrame(
        [(None, 100), ("b", 100)], "src string, tokens long"
    )
    # equal weights, odd budget → equal .5 remainders → tie between
    # NULL and "b"; must not raise, must sum exactly, NULL sorts first
    out = token_budget_allocation(
        df, {"b": 1}, 3, group_col="src", tokens_col="tokens",
        default_weight=1,
    ).collect()
    allocs = {r["src"]: r["alloc_tokens"] for r in out}
    assert sum(allocs.values()) == 3
    assert allocs[None] == 2 and allocs["b"] == 1


def test_next_pow2_width_integer_lookup():
    from capex_data_pipeline_spark.extensions.sketches import next_pow2_width

    assert next_pow2_width(25) == 64          # min clamp
    assert next_pow2_width(64.0) == 64
    assert next_pow2_width(64.2) == 128
    assert next_pow2_width(1000.5) == 1024
    assert next_pow2_width(10_000_000) == 1 << 20  # max clamp


def test_join_graph_profile_stats_mode_schema_and_guard(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        join_graph_profile,
    )

    a = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(20)], "k long")
    edges = [("ab", a, F.col("k"), b, F.col("k"))]
    out = join_graph_profile(
        edges, ndv={"ab": 5.0}, include_exact=False
    )
    assert out.columns == [
        "edge", "n_left", "n_right", "cms_width", "est_join_rows",
        "est_selectivity", "plan_rank",
    ]
    row = out.collect()[0]
    assert row["cms_width"] == 64
    # 5 keys, 10 x 4 per key pair product = sum 10*4*5 = 200
    assert row["est_join_rows"] >= 200
    with pytest.raises(ValueError, match="no NDV hint"):
        join_graph_profile(edges, ndv={}, include_exact=False).collect()
    # classic mode keeps the q177 schema exactly
    classic = join_graph_profile(edges)
    assert classic.columns == [
        "edge", "n_left", "n_right", "est_join_rows", "exact_join_rows",
        "overestimate", "est_selectivity", "plan_rank",
    ]


def test_golden_record_one_election_pass_for_all_mode_fields(spark):
    """r10 built one groupBy+window+join PER mode field; the melt
    rewrite elects every field in one pass — the WindowGroupLimit node
    count must not grow with the field count, and values must match
    the per-field semantics (mode, NULL a value, ties to smallest)."""
    from capex_data_pipeline_spark.extensions.dedup import golden_record

    rows = [
        (1, "a", "x", None), (1, "a", "y", "p"), (1, "b", "y", "p"),
        (2, "c", None, "q"), (2, "c", None, "q"),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, f0 string, f1 string, f2 string")

    def plan_nodes(cols):
        out = golden_record(df, "cluster_id", mode_cols=cols)
        return out._jdf.queryExecution().executedPlan().toString().count(
            "WindowGroupLimit"
        )

    assert plan_nodes(["f0"]) == plan_nodes(["f0", "f1", "f2"]) >= 1
    got = {
        r["cluster_id"]: (r["f0_mode"], r["f1_mode"], r["f2_mode"])
        for r in golden_record(
            df, "cluster_id", mode_cols=["f0", "f1", "f2"]
        ).collect()
    }
    assert got[1] == ("a", "y", "p")
    assert got[2] == ("c", "<null>", "q")
