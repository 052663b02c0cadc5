"""Unit pins for the round-12 extension operators (q232+): hand-built
fixtures with hand-computed expectations, complementing the DuckDB
value-exact oracles."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_cohort_retention_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        cohort_retention_matrix as cohort_retention,
    )

    # week of 2024-01-01 (Mon): users 1,2 start; week of 01-08: user 3
    # starts, user 1 returns; week of 01-15: user 2 returns
    rows = [
        (1, _ts("2024-01-02 10:00")), (2, _ts("2024-01-03 10:00")),
        (1, _ts("2024-01-09 10:00")), (3, _ts("2024-01-10 10:00")),
        (2, _ts("2024-01-16 10:00")),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {
        (str(r["cohort"]), r["offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(df, "u", "ts").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)   # user 1 returned
    assert out[("2024-01-01", 2)] == (1, 2, 0.5)   # user 2 returned
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)   # user 3's cohort
    assert len(out) == 4


def test_time_weighted_average_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        time_weighted_average,
    )

    # value 10 held 1000ms, value 20 held 3000ms, last tick weightless:
    # twap = (10*1000 + 20*3000) / 4000 = 17.5
    rows = [
        ("g", 1, 10.0, _ts("2024-01-01 00:00:00")),
        ("g", 2, 20.0, _ts("2024-01-01 00:00:01")),
        ("g", 3, 99.0, _ts("2024-01-01 00:00:04")),
        ("solo", 4, 5.0, _ts("2024-01-01 00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "g string, id long, v double, ts timestamp"
    )
    out = {
        r["g"]: (r["n_obs"], r["span_ms"], r["twap"])
        for r in time_weighted_average(df, "g", "v", "ts", "id").collect()
    }
    assert out["g"] == (3, 4000, 17.5)
    # single observation: zero span, NULL twap (never a 0/0)
    assert out["solo"] == (1, 0, None)


def test_ohlc_candles_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        ohlc_candles,
    )

    rows = [
        ("s", 1, 10.0, _ts("2024-01-01 09:00")),
        ("s", 2, 30.0, _ts("2024-01-01 12:00")),
        ("s", 3, 5.0, _ts("2024-01-01 15:00")),
        ("s", 4, 20.0, _ts("2024-01-01 17:00")),
        ("s", 5, 7.0, _ts("2024-01-02 09:00")),
    ]
    df = spark.createDataFrame(
        rows, "g string, id long, v double, ts timestamp"
    )
    out = {
        str(r["period_start"])[:10]: (
            r["open"], r["high"], r["low"], r["close"], r["n_obs"]
        )
        for r in ohlc_candles(df, "g", "v", "ts", "id").collect()
    }
    assert out["2024-01-01"] == (10.0, 30.0, 5.0, 20.0, 4)
    assert out["2024-01-02"] == (7.0, 7.0, 7.0, 7.0, 1)


def test_ohlc_tie_breaks_by_id(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        ohlc_candles,
    )

    t = _ts("2024-01-01 09:00")
    df = spark.createDataFrame(
        [("s", 2, 8.0, t), ("s", 1, 3.0, t)],
        "g string, id long, v double, ts timestamp",
    )
    r = ohlc_candles(df, "g", "v", "ts", "id").collect()[0]
    assert (r["open"], r["close"]) == (3.0, 8.0)  # id order, not value


def test_fk_integrity_orphans_and_nulls(spark):
    from capex_data_pipeline_spark.extensions.cleaning import (
        referential_integrity_report,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 99), (5, 99), (6, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = referential_integrity_report(
        [("c-p", child, "fk", parent, "pk")]
    ).collect()[0]
    assert r["n_child"] == 6
    assert r["n_null_fk"] == 1
    assert r["n_orphan_keys"] == 1     # key 99
    assert r["n_orphan_rows"] == 3     # rows 3,4,5
    assert r["orphan_row_frac"] == 0.5


def _brute_mwu(a, b):
    """Reference MWU with midranks + tie-corrected z, plain Python."""
    import math
    from collections import Counter

    n_a, n_b = len(a), len(b)
    all_v = sorted(a + b)
    cnt = Counter(all_v)
    ranks, cum = {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    r_a = sum(ranks[v] for v in a)
    u = r_a - n_a * (n_a + 1) / 2
    n = n_a + n_b
    ties = sum(t**3 - t for t in cnt.values())
    var = n_a * n_b / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - n_a * n_b / 2) / math.sqrt(var) if var > 0 else None
    return u, z


def _brute_ks(a, b):
    vals = sorted(set(a + b))
    n_a, n_b = len(a), len(b)
    best = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / n_a
        fb = sum(1 for x in b if x <= v) / n_b
        best = max(best, abs(fa - fb))
    return best


def test_mann_whitney_matches_python_reference(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        mann_whitney_u,
    )

    # deterministic pseudo-random values with heavy ties
    a = [round(((i * 37) % 23) * 0.25, 2) for i in range(80)]
    b = [round(((i * 41) % 29) * 0.25 + 1.0, 2) for i in range(65)]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B", n_buckets=8).collect()[0]
    u, z = _brute_mwu(a, b)
    assert r["n_a"] == 80 and r["n_b"] == 65
    assert r["u_stat"] == round(u, 6)
    assert abs(r["z_stat"] - z) < 1e-6


def test_ks_2samp_matches_python_reference(spark):
    from capex_data_pipeline_spark.extensions.analytics import ks_2samp

    a = [round(((i * 37) % 23) * 0.25, 2) for i in range(80)]
    b = [round(((i * 41) % 29) * 0.25 + 1.0, 2) for i in range(65)]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_2samp(df, "g", "v", "A", "B", n_buckets=8).collect()[0]
    assert r["ks_stat"] == round(_brute_ks(a, b), 6)


def test_rank_tests_degenerate_cases(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        ks_2samp,
        mann_whitney_u,
    )

    # all values identical: U = na*nb/2 exactly, z NULL (zero variance),
    # KS = 0
    df = spark.createDataFrame(
        [("A", 5.0)] * 10 + [("B", 5.0)] * 7, "g string, v double"
    )
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert r["u_stat"] == 35.0
    assert r["z_stat"] is None
    k = ks_2samp(df, "g", "v", "A", "B").collect()[0]
    assert k["ks_stat"] == 0.0
    # disjoint supports: maximal separation, KS = 1, U = 0 for the
    # lower group
    df2 = spark.createDataFrame(
        [("A", 1.0)] * 6 + [("B", 9.0)] * 5, "g string, v double"
    )
    r2 = mann_whitney_u(df2, "g", "v", "A", "B").collect()[0]
    assert r2["u_stat"] == 0.0
    k2 = ks_2samp(df2, "g", "v", "A", "B").collect()[0]
    assert k2["ks_stat"] == 1.0


def test_anova_hand_case(spark):
    from capex_data_pipeline_spark.extensions.analytics import anova_oneway

    # groups {1,2,3}, {4,5,6}: SSB = 13.5, SSW = 4, F = 13.5/(4/4)=13.5
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r["k_groups"], r["n"]) == (2, 6)
    assert abs(r["f_stat"] - 13.5) < 1e-6
    assert abs(r["eta_sq"] - 13.5 / 17.5) < 1e-6
    # identical group means: F ~ 0
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)],
        "g string, v double",
    )
    assert anova_oneway(df2, "g", "v").collect()[0]["f_stat"] == 0.0


def test_autocorrelation_hand_case(spark):
    import math

    from capex_data_pipeline_spark.extensions.timeseries import (
        autocorrelation,
    )

    xs = [1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 4.0]
    rows = [("g", i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, ts long, id long, v double")
    r = autocorrelation(df, "g", "v", "ts", "id", lag=1).collect()[0]
    mu = sum(xs) / len(xs)
    num = sum((xs[i] - mu) * (xs[i - 1] - mu) for i in range(1, len(xs)))
    den = sum((x - mu) ** 2 for x in xs)
    assert r["n"] == 10 and r["n_pairs"] == 9
    assert math.isclose(r["acf"], round(num / den, 6), abs_tol=2e-6)
    # constant series: zero variance -> NULL
    dfc = spark.createDataFrame(
        [("g", i, i, 5.0) for i in range(5)],
        "g string, ts long, id long, v double",
    )
    assert autocorrelation(dfc, "g", "v", "ts", "id").collect()[0][
        "acf"
    ] is None


def test_behavior_entropy_hand_case(spark):
    import math

    from capex_data_pipeline_spark.extensions.analytics import (
        behavior_entropy,
    )

    rows = [(1, "a")] * 4 + [(1, "b")] * 4 + [(2, "a")] * 5
    df = spark.createDataFrame(rows, "u long, t string")
    out = {r["u"]: r for r in behavior_entropy(df, "u", "t").collect()}
    assert math.isclose(out[1]["entropy"], round(math.log(2), 6),
                        abs_tol=1e-6)
    assert out[1]["n_types"] == 2
    assert out[2]["entropy"] == 0.0  # single action: zero entropy


def test_heartbeat_gaps_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        heartbeat_gaps,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(seconds=10)),
        (1, t0 + datetime.timedelta(seconds=310)),   # 300s gap
        (1, t0 + datetime.timedelta(seconds=1000)),  # 690s gap
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {
        r["u"]: r
        for r in heartbeat_gaps(df, "u", "ts", gap_seconds=60).collect()
    }
    assert out[1]["n_gaps"] == 2
    assert out[1]["max_gap_sec"] == 690.0
    assert out[1]["downtime_sec"] == 990.0
    assert abs(out[1]["uptime_frac"] - (1 - 990 / 1000)) < 1e-9
    # single event: no gaps, NULL uptime (zero span)
    assert out[2]["n_gaps"] == 0
    assert out[2]["uptime_frac"] is None


def test_modularity_hand_case(spark):
    from capex_data_pipeline_spark.extensions.graph import modularity

    # two triangles joined by one bridge: the classic 2-community case
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(v, 1 if v <= 3 else 4) for v in range(1, 7)],
        "vertex long, component long",
    )
    r = modularity(edges, labels).collect()[0]
    # m=7, e_intra=6, d_c = 7 each: Q = 6/7 - 2*49/(4*49) = 6/7 - 1/2
    assert (r["n_vertices"], r["n_communities"], r["m_edges"]) == (6, 2, 7)
    assert r["e_intra"] == 6
    assert abs(r["modularity"] - (6 / 7 - 0.5)) < 1e-6
    # everything in ONE community: Q = 1 - 1 = 0 exactly
    one = spark.createDataFrame(
        [(v, 1) for v in range(1, 7)], "vertex long, component long"
    )
    assert modularity(edges, one).collect()[0]["modularity"] == 0.0


def test_interpolated_asof_hand_case(spark):
    from capex_data_pipeline_spark.extensions.asof import interpolated_asof

    t0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    right = spark.createDataFrame(
        [(1, at(0), 10.0), (1, at(100), 30.0), (2, at(50), 7.0)],
        "u long, ts timestamp, value double",
    )
    left = spark.createDataFrame(
        [
            (1, 100, at(25)),   # between anchors: 10 + 20*0.25 = 15
            (1, 101, at(100)),  # exact hit: 30
            (1, 102, at(200)),  # after last: hold 30
            (2, 103, at(10)),   # before first: hold 7
            (3, 104, at(10)),   # no anchors: NULL
        ],
        "u long, eid long, ts timestamp",
    )
    out = {
        r["eid"]: r["value_interp"]
        for r in interpolated_asof(left, right, "u", "ts", "value").collect()
    }
    assert out[100] == 15.0
    assert out[101] == 30.0
    assert out[102] == 30.0
    assert out[103] == 7.0
    assert out[104] is None


def test_stratified_split_exact_counts(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        stratified_split_exact,
    )

    rows = [(i, "a" if i < 57 else "b") for i in range(57 + 23)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_split_exact(df, "s", "k").collect()
    by = {}
    for r in out:
        by.setdefault((r["s"], r["split"]), 0)
        by[(r["s"], r["split"])] += 1
    # 57 -> quotas 45.6/5.7/5.7 -> base 45/5/5, leftover 2 to the two
    # highest remainders (.7/.7 tie -> test before val alphabetically,
    # but train .6 < .7 loses): test+1, val+1
    assert by[("a", "train")] == 45
    assert by[("a", "val")] == 6
    assert by[("a", "test")] == 6
    # 23 -> 18.4/2.3/2.3 -> base 18/2/2, leftover 1 -> highest rem .4 train
    assert by[("b", "train")] == 19
    assert by[("b", "val")] == 2
    assert by[("b", "test")] == 2
    assert sum(by.values()) == 80
    # determinism: re-running yields the identical assignment
    again = {
        (r["k"]): r["split"]
        for r in stratified_split_exact(df, "s", "k").collect()
    }
    first = {r["k"]: r["split"] for r in out}
    assert first == again


def test_personalized_pagerank_hand_properties(spark):
    from capex_data_pipeline_spark.extensions.graph import (
        pagerank,
        personalized_pagerank,
    )

    # path graph 1-2-3-4 plus isolated pair 5-6 (both directions)
    und = [(1, 2), (2, 3), (3, 4), (5, 6)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    ppr = {
        r["vertex"]: r["rank_micro"]
        for r in personalized_pagerank(
            edges, [1], iterations=3, assume_distinct=True
        ).collect()
    }
    # unreachable component holds EXACT zero; the reachable ranks are
    # the hand-unrolled 3-round integer values (mass oscillates along
    # the path at low round counts — 4 briefly outranking 3 is real)
    assert ppr[5] == 0 and ppr[6] == 0
    assert ppr == {
        1: 204187, 2: 588093, 3: 54187, 4: 153531, 5: 0, 6: 0
    }
    # uniform-seed PPR over ALL vertices == plain pagerank? no — r0
    # differs (pagerank starts everyone at 1e6); instead pin the
    # round-1 hand value: r1(2) = 0 + 850*(1e6 div 1)... seed 1 has
    # deg 1 so contrib to 2 is 1e6 -> r1(2) = 850000
    one = {
        r["vertex"]: r["rank_micro"]
        for r in personalized_pagerank(
            edges, [1], iterations=1, assume_distinct=True
        ).collect()
    }
    assert one[1] == 150000
    assert one[2] == 850000
    assert one[3] == 0
    # plain pagerank still reachable for contrast (same machinery)
    pr = {
        r["vertex"]: r["rank_micro"]
        for r in pagerank(edges, iterations=1, assume_distinct=True).collect()
    }
    assert pr[5] > 0  # plain PR gives everyone base mass


def test_proximity_match_counts_hand_case(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        proximity_match_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta target"),   # dist 4 from alpha
            (2, "alpha x x x x x x target"),        # dist 7: too far
            (3, "target alpha target"),             # two pairs, dist 1
            (4, "alpha only here"),                 # missing target
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_match_counts(
            docs, "alpha", "target", window=4
        ).collect()
    }
    assert out[1] == (1, 4)
    assert 2 not in out
    assert out[3] == (2, 1)
    assert 4 not in out and 5 not in out


def test_seasonal_anomaly_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        seasonal_anomaly_report,
    )

    # 4 Mondays with counts 10, 10, 11, 40: med=10, |40-10|=30 > 3*1
    t0 = datetime.datetime(2024, 1, 1, 9)  # a Monday
    rows = []
    for w, cnt in enumerate([10, 10, 11, 40]):
        for i in range(cnt):
            rows.append(("g", t0 + datetime.timedelta(days=7 * w,
                                                      seconds=i)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {
        str(r["day"]): (r["n"], r["med"], r["mad"], r["is_anomaly"])
        for r in seasonal_anomaly_report(df, "g", "ts").collect()
    }
    assert out["2024-01-01"] == (10, 10, 0, False)
    assert out["2024-01-15"] == (11, 10, 0, False)  # within 3*max(0,1)
    assert out["2024-01-22"] == (40, 10, 0, True)


def test_interval_coverage_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        interval_coverage,
    )

    df = spark.createDataFrame(
        [
            (1, 0, 10), (1, 5, 15), (1, 15, 20),   # one island [0,20]
            (1, 100, 110),                          # second island
            (2, 0, 5),
        ],
        "k long, s long, e long",
    )
    out = {
        r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()
    }
    assert out[1]["n_intervals"] == 4
    assert out[1]["n_islands"] == 2       # touching intervals merge
    assert out[1]["covered"] == 30        # 20 + 10
    assert out[1]["span"] == 110
    assert abs(out[1]["coverage_frac"] - 30 / 110) < 1e-6
    assert out[2]["coverage_frac"] == 1.0
    # inverted interval raises loudly
    bad = spark.createDataFrame([(1, 10, 5)], "k long, s long, e long")
    with pytest.raises(Exception, match="inverted interval"):
        interval_coverage(bad, "k", "s", "e").collect()


def test_hits_hand_case(spark):
    from capex_data_pipeline_spark.extensions.graph import hits

    # star: hub 1 points at authorities 10, 11; vertex 2 points at 10
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "src long, dst long"
    )
    out = {
        r["vertex"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(edges, iterations=2, assume_distinct=True).collect()
    }
    # authorities: 10 (in-deg 2) maxes at 1e6; 11 gets half-ish
    assert out[10][1] == 1_000_000
    assert 0 < out[11][1] < 1_000_000
    # hubs: 1 (points at both) maxes; 2 below; authorities have hub 0
    assert out[1][0] == 1_000_000
    assert 0 < out[2][0] < 1_000_000
    assert out[10][0] == 0 and out[11][0] == 0
    # pure hubs hold authority 0
    assert out[1][1] == 0 and out[2][1] == 0


def test_readability_profile_hand_case(spark):
    from capex_data_pipeline_spark.extensions.textstats import (
        readability_profile,
    )

    docs = spark.createDataFrame(
        [
            ("a", "The cat sat. The dog ran!"),   # 6 words, 2 sentences
            ("a", "Hello world"),                 # 2 words, 1 (floored)
            ("b", ""),                            # empty: all zeros
            ("b", None),
        ],
        "source string, text string",
    )
    out = {
        r["source"]: r for r in readability_profile(docs).collect()
    }
    a = out["a"]
    assert (a["n_docs"], a["words"], a["sentences"]) == (2, 8, 3)
    # vowel groups: the/cat/sat/the/dog/ran each 1 = 6; hello 2, world 1
    assert a["syllables"] == 9
    expect = 206.835 - 1.015 * (8 / 3) - 84.6 * (9 / 8)
    assert abs(a["flesch"] - round(expect, 6)) < 1e-9
    b = out["b"]
    assert (b["words"], b["sentences"], b["syllables"]) == (0, 0, 0)
    assert b["flesch"] is None
