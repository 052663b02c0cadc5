"""Regression tests for the round-11 ADVICE.md findings, fixed in
round 12:

1. cusum_changepoint must not wrap int64 forming n·P_t − t·S
   (DECIMAL(38,0) sufficient statistics, the q197/q223 convention).
2. bootstrap_mean_se must LEFT-join plain stats to the SE frame: a
   group whose every replicate drew Poisson weight 0 still emits its
   exact mean (boot_se NULL, n_replicates 0), and a single-surviving-
   replicate group reports NULL boot_se, never NaN.
3. ab_test_report must emit BOTH arm rows when one arm has zero units
   (n_units=0, NULL cvr/lift/z) instead of an empty frame.
4. sssp_bounded must not accumulate rounds+1 tracked persists — only
   the symmetric edge frame is tracked; round frames go through
   plan_boundary.
5. interval_overlap_join raises loudly on inverted intervals
   (end < start) instead of silently dropping them.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _u(seed: str, key: str, j: int) -> float:
    """Mirror analytics.bootstrap_mean_se's per-replicate uniform:
    hash_u32(key + '|' + j, seed) / 2^32."""
    h = hashlib.md5(f"{seed}|{key}|{j}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def _find_key(pred, prefix: str = "k") -> str:
    for i in range(100_000):
        k = f"{prefix}{i}"
        if pred(k):
            return k
    raise AssertionError("no key found")


def test_cusum_changepoint_survives_int64_overflow(spark):
    """n·P_t with cents-scaled values overflows bigint at ~1e19; under
    ANSI Spark the pre-fix BIGINT product raised, post-fix the
    DECIMAL(38,0) form returns the exact peak."""
    from capex_data_pipeline_spark.extensions.timeseries import (
        cusum_changepoint,
    )

    # x_i = 9e15 cents each (value 9e13 at cents=2); n=100 rows:
    # P_t <= 9e17 (fits bigint), but n*P_t <= 9e19 does not.
    n = 100
    big = 9.0e13
    rows = [(f"g", float(big * (2 if i < n // 2 else 1)), i, i)
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, v double, ts long, id long")
    out = cusum_changepoint(df, "g", "v", "ts", "id").collect()
    assert len(out) == 1
    r = out[0]
    # exact expected CUSUM peak, computed in python ints
    xs = [round(big * (2 if i < n // 2 else 1) * 100) for i in range(n)]
    s = sum(xs)
    best = max(
        abs(n * sum(xs[: t + 1]) - (t + 1) * s) for t in range(n)
    )
    expect = best / (n * 100)
    assert r["n"] == n
    assert math.isclose(r["cusum_stat"], round(expect, 6), rel_tol=1e-9)
    # the peak of a level shift at n/2 sits at the boundary
    assert r["frac_position"] == round((n // 2) / n, 6)


def test_bootstrap_se_all_zero_weight_group_still_emits(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        POISSON1_CDF,
        bootstrap_mean_se,
    )

    p0 = POISSON1_CDF[0]  # weight 0 iff u < e^-1
    kz = _find_key(
        lambda k: _u("bs", k, 0) < p0 and _u("bs", k, 1) < p0, "z"
    )
    k1 = _find_key(
        lambda k: (_u("bs", k, 0) < p0) != (_u("bs", k, 1) < p0), "o"
    )
    rows = [("g_zero", kz, 5.0), ("g_one", k1, 7.0)] + [
        ("g_norm", f"n{i}", float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {
        r["g"]: r
        for r in bootstrap_mean_se(
            df, "g", "v", "k", r=2, seed="bs"
        ).collect()
    }
    # pre-fix: g_zero vanished (inner join) and g_one got NaN boot_se
    assert out["g_zero"]["n"] == 1
    assert out["g_zero"]["mean"] == 5.0
    assert out["g_zero"]["boot_se"] is None
    assert out["g_zero"]["n_replicates"] == 0
    assert out["g_one"]["mean"] == 7.0
    assert out["g_one"]["boot_se"] is None
    assert out["g_one"]["n_replicates"] == 1
    se = out["g_norm"]["boot_se"]
    assert se is not None and not math.isnan(se) and se >= 0.0


def test_ab_test_report_empty_arm_still_reports_both_rows(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        ab_test_report,
    )

    def arm(k: str) -> int:
        h = hashlib.md5(f"ab|{k}".encode()).hexdigest()[:8]
        return int(h, 16) % 2

    units = [_find_key(lambda k: arm(k) == 0, f"u{i}_") for i in range(6)]
    df = spark.createDataFrame(
        [(u, i % 2 == 0) for i, u in enumerate(units)],
        "unit string, conv boolean",
    )
    out = {
        r["arm"]: r
        for r in ab_test_report(df, "unit", F.col("conv")).collect()
    }
    # pre-fix the inner crossJoin emptied the whole report
    assert set(out) == {0, 1}
    assert out[0]["n_units"] == 6
    assert out[0]["n_converted"] == 3
    assert out[0]["cvr"] == 0.5
    assert out[1]["n_units"] == 0
    assert out[1]["n_converted"] == 0
    assert out[1]["cvr"] is None
    assert out[1]["lift"] is None
    assert out[1]["z_stat"] is None


def test_sssp_bounded_tracks_only_the_edge_persist(spark):
    from capex_data_pipeline_spark.cache import tracked_count
    from capex_data_pipeline_spark.extensions.graph import sssp_bounded

    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(20)], "src long, dst long, w long"
    )
    before = tracked_count()
    out = sssp_bounded(edges, [0], rounds=6)
    assert out.count() == 7  # vertices 0..6 within 6 hops
    # pre-fix: rounds+1 tracked persists per invocation; post-fix only
    # the symmetric edge frame is tracked (round frames are boundaries)
    assert tracked_count() - before == 1
    dists = {r["vertex"]: r["dist"] for r in out.collect()}
    assert dists == {i: i for i in range(7)}


def test_interval_overlap_join_raises_on_inverted_interval(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("k", 1, 100, 50)], "key string, id long, s long, e long"
    )
    right = spark.createDataFrame(
        [("k", 2, 0, 200)], "key string, id long, s long, e long"
    )
    with pytest.raises(Exception, match="inverted interval"):
        interval_overlap_join(
            left, right, "key", "id", "s", "e", bin_width=10
        ).collect()
    # and the well-formed case still joins exactly
    ok = interval_overlap_join(
        right, right, "key", "id", "s", "e", bin_width=50
    ).collect()
    assert len(ok) == 1 and ok[0]["overlap"] == 200
