"""Hand-computed unit tests for the round-11 operator batch: funnel,
Markov transitions, equi-depth histogram, WOE binning, K-fold target
encoding. Each pins semantics the registry oracle also certifies, plus
the edge cases the sf-data can't hit (ties, empty bins, zero-class
bins, single-fold categories)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def test_funnel_strict_after_semantics(spark):
    from capex_data_pipeline_spark.extensions.timeseries import funnel_report

    rows = [
        # u1 completes all three in order
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        # u2 clicks BEFORE viewing -> click must not count
        (2, "click", 1.0), (2, "view", 2.0),
        # u3 clicks at the SAME ts as the first view -> strict-after: no
        (3, "view", 5.0), (3, "click", 5.0),
        # u4 views only
        (4, "view", 1.0),
        # NULL user excluded
        (None, "view", 1.0), (None, "click", 2.0),
    ]
    df = spark.createDataFrame(rows, "u long, e string, t double")
    out = {
        r["step_idx"]: (r["step"], r["n_users"], r["conversion"],
                        r["drop_off"])
        for r in funnel_report(
            df, "u", "e", "t", steps=["view", "click", "purchase"]
        ).collect()
    }
    assert out[1] == ("view", 4, 1.0, 0.0)
    assert out[2] == ("click", 1, 0.25, 0.75)
    assert out[3] == ("purchase", 1, 0.25, 0.0)


def test_transition_matrix_tiebreak_and_normalization(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        transition_matrix,
    )

    rows = [
        (1, "a", 1.0, 10), (1, "b", 2.0, 11), (1, "c", 3.0, 12),
        # same ts: order falls back to id -> a(20) then b(21)
        (2, "a", 1.0, 20), (2, "b", 1.0, 21),
        (3, "a", 1.0, 30), (3, "c", 2.0, 31),
    ]
    df = spark.createDataFrame(rows, "u long, e string, t double, id long")
    got = {
        (r["event_type"], r["next_event_type"]): (r["n"], r["p"])
        for r in transition_matrix(df, "u", "e", "t", "id").collect()
    }
    # from 'a': b (u1), b (u2 via id tie-break), c (u3)
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "c")] == (1, 1.0)
    assert ("c", "a") not in got  # last events emit nothing


def test_equidepth_histogram_hand_case(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        equidepth_histogram,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["bin"]: r for r in
           equidepth_histogram(df, "x", n_bins=4).collect()}
    # cuts at ranks ceil(2), ceil(4), ceil(6) -> 2.0, 4.0, 6.0;
    # strict-below binning puts boundary rows LEFT
    assert (out[0]["lo"], out[0]["hi"], out[0]["n_rows"]) == (None, 2.0, 2)
    assert (out[1]["lo"], out[1]["hi"], out[1]["n_rows"]) == (2.0, 4.0, 2)
    assert (out[2]["lo"], out[2]["hi"], out[2]["n_rows"]) == (4.0, 6.0, 2)
    assert (out[3]["lo"], out[3]["hi"], out[3]["n_rows"]) == (6.0, None, 2)
    assert all(r["share"] == 0.25 for r in out.values())


def test_equidepth_histogram_atom_pileup(spark):
    """A heavy atom larger than a bin lands whole in one bin (strict-
    below convention) and the neighbors report empty — the 'no
    boundary can split this value' signal."""
    from capex_data_pipeline_spark.extensions.sketches import (
        equidepth_histogram,
    )

    vals = [5.0] * 9 + [1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["bin"]: r["n_rows"] for r in
           equidepth_histogram(df, "x", n_bins=2).collect()}
    # cut at rank ceil(5) = 5.0; all nine 5.0s are NOT > cut -> bin 0
    assert out[0] == 10 and out[1] == 0


def test_woe_binning_hand_case(spark):
    from capex_data_pipeline_spark.extensions.sketches import woe_binning

    # 8 rows, 2 bins; bin0 = values 1..4 (3 pos, 1 neg),
    # bin1 = 5..8 (1 pos, 3 neg); totals 4/4
    rows = [
        (1.0, 1), (2.0, 1), (3.0, 1), (4.0, 0),
        (5.0, 1), (6.0, 0), (7.0, 0), (8.0, 0),
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    out = {r["bin"]: r for r in woe_binning(
        df, "x", F.col("y") == 1, n_bins=2
    ).collect()}
    w0 = math.log((3 / 4) / (1 / 4))
    assert out[0]["n_pos"] == 3 and out[0]["n_neg"] == 1
    assert out[0]["woe"] == pytest.approx(round(w0, 6), abs=1e-9)
    assert out[0]["iv_term"] == pytest.approx(
        round((3 / 4 - 1 / 4) * w0, 6), abs=1e-9
    )
    assert out[1]["woe"] == pytest.approx(round(-w0, 6), abs=1e-9)


def test_woe_binning_zero_class_bin_is_null(spark):
    from capex_data_pipeline_spark.extensions.sketches import woe_binning

    rows = [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1), (5.0, 0), (6.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = {r["bin"]: r for r in woe_binning(
        df, "x", F.col("y") == 1, n_bins=2
    ).collect()}
    # bin 0 (1..3) has zero negatives -> NULL woe/iv, counts intact
    assert out[0]["n_pos"] == 3 and out[0]["n_neg"] == 0
    assert out[0]["woe"] is None and out[0]["iv_term"] is None


def _py_fold(key, k, seed="te"):
    return int(
        hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16
    ) % k


def test_kfold_target_encoding_no_leakage(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        kfold_target_encoding,
    )

    k = 3
    rows = [(i, "c" + str(i % 2), float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {
        (r["category"], r["fold"]): (r["n_in_fold"], r["oof_mean"])
        for r in kfold_target_encoding(
            df, "id", "cat", F.col("y"), k=k
        ).collect()
    }
    # python recompute with the same md5 folds
    for cat in ("c0", "c1"):
        members = [(i, y) for i, c, y in rows if c == cat]
        for f in range(k):
            infold = [(i, y) for i, y in members if _py_fold(i, k) == f]
            oof = [y for i, y in members if _py_fold(i, k) != f]
            want = round(sum(round(y * 100) for y in oof)
                         / 100.0 / len(oof), 6)
            n, mean = got[(cat, f)]
            assert n == len(infold)
            assert mean == pytest.approx(want, abs=1e-9)


def test_kfold_target_encoding_prior_fallback(spark):
    """A category living entirely in one fold has no out-of-fold rows
    for that fold -> the cell falls back to the GLOBAL out-of-fold
    mean instead of NULL."""
    from capex_data_pipeline_spark.extensions.corpus import (
        kfold_target_encoding,
    )

    k = 3
    # find a key whose fold is 0 and isolate category 'solo' on it
    solo_key = next(i for i in range(1000) if _py_fold(i, k) == 0)
    other = [
        (i, "bulk", 10.0) for i in range(100, 160)
    ]
    rows = [(solo_key, "solo", 99.0)] + other
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {
        (r["category"], r["fold"]): r["oof_mean"]
        for r in kfold_target_encoding(
            df, "id", "cat", F.col("y"), k=k
        ).collect()
    }
    # fold 0 for 'solo': no out-of-fold member -> global prior over
    # everything outside fold 0
    oof_all = [y for i, c, y in rows if _py_fold(i, k) != 0]
    assert got[("solo", 0)] == pytest.approx(
        round(sum(round(y * 100) for y in oof_all) / 100.0 / len(oof_all), 6),
        abs=1e-9,
    )
    # other folds see the solo row itself
    assert got[("solo", 1)] == pytest.approx(99.0, abs=1e-9)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kfold_target_encoding(df, "id", "cat", F.col("y"), k=1)


def test_string_type_profile_hand_case(spark):
    from capex_data_pipeline_spark.extensions.cleaning import (
        string_type_profile,
    )

    rows = [
        ("12", "1.5", "2024-01-02", "TRUE", None),
        ("-3", ".5", "2024-13-40", "false", ""),
        ("+0", "2", None, "True", "x"),
    ]
    df = spark.createDataFrame(
        rows, "ints string, decs string, dates string, bools string, misc string"
    )
    out = {r["column_name"]: r for r in
           string_type_profile(df, df.columns).collect()}
    assert out["ints"]["inferred_type"] == "bigint"
    assert out["ints"]["frac_int"] == 1.0
    # decimals include plain ints ('2' parses as decimal)
    assert out["decs"]["inferred_type"] == "double"
    # '2024-13-40' matches the SHAPE regex (format, not calendar) —
    # documented: this is a shape profiler, not a validator
    assert out["dates"]["inferred_type"] == "date"
    assert out["dates"]["n_null"] == 1
    assert out["bools"]["inferred_type"] == "boolean"
    assert out["misc"]["inferred_type"] == "string"
    assert out["misc"]["n_empty"] == 1


def test_scd2_history_collapses_noop_rows(spark):
    from capex_data_pipeline_spark.extensions.cleaning import scd2_history

    rows = [
        (1, "a", 1.0, 10),
        (1, "a", 2.0, 11),   # unchanged -> extends, never splits
        (1, "b", 3.0, 12),
        (1, "b", 4.0, 13),
        (1, "a", 5.0, 14),   # back to 'a' -> NEW interval
        (2, None, 1.0, 20),  # NULL state is a state
        (2, None, 2.0, 21),
        (2, "x", 3.0, 22),
    ]
    df = spark.createDataFrame(rows, "k long, st string, t double, id long")
    got = sorted(
        (
            (r["k"], r["st"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in scd2_history(
                df, "k", "t", ["st"], id_col="id"
            ).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "a", 1.0, 3.0, False),
        (1, "b", 3.0, 5.0, False),
        (1, "a", 5.0, None, True),
        (2, None, 1.0, 3.0, False),
        (2, "x", 3.0, None, True),
    ]


def test_exact_weighted_quantiles_hand_case(spark):
    from capex_data_pipeline_spark.extensions.sketches import (
        exact_weighted_quantiles,
    )

    # values 1..4 with weights 1, 1, 6, 2 -> W=10 (cents: 1000)
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 6.0), (4.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    got = {
        r["p"]: (r["wrank"], r["value"])
        for r in exact_weighted_quantiles(
            df, "v", "w", ps=[0.2, 0.5, 0.9, 1.0], n_buckets=4
        ).collect()
    }
    # cum weights (cents): 1->100, 2->200, 3->800, 4->1000
    assert got[0.2] == (200, 2.0)
    assert got[0.5] == (500, 3.0)
    assert got[0.9] == (900, 4.0)
    assert got[1.0] == (1000, 4.0)
    # zero/negative weights carry no rank
    df2 = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 1.0)], "v double, w double"
    )
    got2 = exact_weighted_quantiles(df2, "v", "w", ps=[0.5]).collect()[0]
    assert got2["value"] == 2.0
    with pytest.raises(ValueError, match="outside"):
        exact_weighted_quantiles(df, "v", "w", ps=[0.0])


def test_mutual_information_hand_cases(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        mutual_information,
    )

    # perfectly dependent: b == a -> MI == H, NMI == 1
    dep = spark.createDataFrame(
        [("x", "x")] * 2 + [("y", "y")] * 2, "a string, b string"
    )
    r = mutual_information(dep, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    # independent uniform -> MI 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(3)],
        "a string, b string",
    )
    r = mutual_information(ind, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-9)


def test_interval_overlap_join_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 10, 0, 100), (1, 11, 500, 600), (2, 12, 0, 50)],
        "k long, id long, s long, e long",
    )
    right = spark.createDataFrame(
        [(1, 20, 90, 120), (1, 21, 200, 300), (2, 22, 50, 80),
         (3, 23, 0, 100)],
        "k long, id long, s long, e long",
    )
    got = sorted(
        (r["k"], r["id_l"], r["id_r"], r["overlap"])
        for r in interval_overlap_join(
            left, right, "k", "id", "s", "e", bin_width=64
        ).collect()
    )
    # (10, 20): [0,100] x [90,120] -> overlap 10; (12, 22): touch at 50
    assert got == [(1, 10, 20, 10), (2, 12, 22, 0)]
    # pairs meeting in multiple bins appear ONCE
    wide_l = spark.createDataFrame([(1, 1, 0, 120)], "k long, id long, s long, e long")
    wide_r = spark.createDataFrame([(1, 2, 10, 110)], "k long, id long, s long, e long")
    out = interval_overlap_join(
        wide_l, wide_r, "k", "id", "s", "e", bin_width=16
    ).collect()
    assert len(out) == 1 and out[0]["overlap"] == 100
    # the loud guard fires on bin explosions
    import py4j.protocol

    huge = spark.createDataFrame([(1, 1, 0, 10_000)], "k long, id long, s long, e long")
    with pytest.raises(Exception, match="covers > |SparkRuntimeException"):
        interval_overlap_join(
            huge, wide_r, "k", "id", "s", "e", bin_width=16,
            max_bins_per_interval=8,
        ).collect()


def test_session_paths_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import session_paths

    rows = [
        # u1: one session a>b, then after a 1-hour gap a second session c
        (1, "a", "2024-01-01 10:00:00", 1),
        (1, "b", "2024-01-01 10:10:00", 2),
        (1, "c", "2024-01-01 11:30:00", 3),
        # u2: same path a>b in one session
        (2, "a", "2024-01-01 09:00:00", 4),
        (2, "b", "2024-01-01 09:05:00", 5),
    ]
    df = spark.createDataFrame(
        rows, "u long, e string, t string, id long"
    ).select("u", "e", F.col("t").cast("timestamp").alias("t"), "id")
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(df, "u", "e", "t", "id",
                               gap_seconds=1800).collect()
    }
    assert got == {"a>b": 2, "c": 1}


def test_group_embedding_diversity_identity(spark):
    from capex_data_pipeline_spark.extensions.similarity import (
        group_embedding_diversity,
    )

    # group 'dup': 3 identical vectors -> mean pairwise cos 1.0
    # group 'orth': orthogonal basis vectors -> mean pairwise cos 0.0
    # group 'solo': one vector -> NULL (no pairs)
    # zero vector excluded
    rows = [
        ("dup", [1.0, 0.0, 0.0]), ("dup", [1.0, 0.0, 0.0]),
        ("dup", [1.0, 0.0, 0.0]),
        ("orth", [1.0, 0.0, 0.0]), ("orth", [0.0, 2.0, 0.0]),
        ("orth", [0.0, 0.0, 0.5]),
        ("solo", [1.0, 1.0, 1.0]),
        ("solo", [0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<double>")
    out = {r["g"]: (r["n"], r["mean_pairwise_cos"])
           for r in group_embedding_diversity(df, "g").collect()}
    assert out["dup"] == (3, pytest.approx(1.0, abs=1e-6))
    assert out["orth"] == (3, pytest.approx(0.0, abs=1e-9))
    assert out["solo"][0] == 1 and out["solo"][1] is None


def test_group_centroid_drift_hand_case(spark):
    from capex_data_pipeline_spark.extensions.similarity import (
        group_centroid_drift,
    )

    old = spark.createDataFrame(
        [("s", [1.0, 0.0]), ("s", [1.0, 0.0]), ("m", [1.0, 0.0]),
         ("gone", [1.0, 1.0])],
        "g string, embedding array<double>",
    )
    new = spark.createDataFrame(
        [("s", [2.0, 0.0]), ("m", [0.0, 3.0])],
        "g string, embedding array<double>",
    )
    out = {r["g"]: (r["n_old"], r["n_new"], r["centroid_cos"])
           for r in group_centroid_drift(old, new, "g").collect()}
    assert out["s"] == (2, 1, pytest.approx(1.0, abs=1e-9))   # same dir
    assert out["m"] == (1, 1, pytest.approx(0.0, abs=1e-9))   # rotated 90°
    assert "gone" not in out  # inner join: drift needs both snapshots


def test_robust_scale_hand_case(spark):
    from capex_data_pipeline_spark.extensions.analytics import robust_scale

    # group g: values 1..5 -> q1=2 (rank ceil(1.25)), med=3, q3=4; IQR 2
    rows = [("g", float(i)) for i in range(1, 6)] + [("flat", 7.0)] * 3
    df = spark.createDataFrame(rows, "k string, v double")
    out = {(r["k"], r["v"]): r["scaled"]
           for r in robust_scale(df, "k", "v").collect()}
    assert out[("g", 1.0)] == pytest.approx(-1.0, abs=1e-9)
    assert out[("g", 3.0)] == pytest.approx(0.0, abs=1e-9)
    assert out[("g", 5.0)] == pytest.approx(1.0, abs=1e-9)
    # degenerate spread -> NULL, never a divide-by-zero inf
    assert out[("flat", 7.0)] is None


def test_benford_profile_hand_case(spark):
    from capex_data_pipeline_spark.extensions.quality import benford_profile

    # cents-quantized magnitudes: 1.0 -> 100 (digit 1), 0.25 -> 25 (2),
    # -9.5 -> 950 (9), 0.0 excluded, NULL excluded
    df = spark.createDataFrame(
        [(1.0,), (0.25,), (-9.5,), (0.0,), (None,)], "x double"
    )
    out = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    assert len(out) == 9  # every digit reports, empty ones n=0
    assert out[1]["n"] == 1 and out[2]["n"] == 1 and out[9]["n"] == 1
    assert out[3]["n"] == 0
    assert out[1]["benford_expected"] == pytest.approx(0.30103, abs=1e-5)
    assert out[1]["frac"] == pytest.approx(round(1 / 3, 6), abs=1e-9)


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    from capex_data_pipeline_spark.sources.orc import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -0.25), (3, "c", None)],
        "id long, s string, v double",
    )
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p, "id long, s string, v double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_dedup_adjusted_size_cross_source_copies(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        dedup_adjusted_size,
    )

    rows = [
        ("a", "one two three"),          # 3 tokens, unique
        ("a", "dup text here"),          # 3 tokens, x3 (2 in a, 1 in b)
        ("a", "dup text here"),
        ("b", "dup text here"),
        ("b", "four"),                   # 1 token, unique
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           dedup_adjusted_size(df, "source", "text").collect()}
    assert out["a"]["raw_tokens"] == 9
    # a: 3 (unique) + 2 * 3/3 (two copies of a x3 dup) = 5
    assert out["a"]["effective_tokens"] == pytest.approx(5.0, abs=1e-9)
    assert out["b"]["effective_tokens"] == pytest.approx(2.0, abs=1e-9)
    # effective sizes sum to the global deduped total (3 + 3 + 1)
    total = sum(r["effective_tokens"] for r in out.values())
    assert total == pytest.approx(7.0, abs=1e-9)


def test_bootstrap_mean_se_sanity(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        bootstrap_mean_se,
    )

    import statistics as st

    rows = [("g", i, float(i % 10)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = bootstrap_mean_se(df, "g", "v", "id", r=16).collect()[0]
    assert out["n"] == 400
    assert out["mean"] == pytest.approx(4.5, abs=1e-9)
    # SE of the mean of 400 uniform-ish values: sigma/sqrt(n) ~ 0.144;
    # the bootstrap estimate should land in a generous neighborhood
    sigma = st.pstdev([i % 10 for i in range(400)])
    assert 0.3 * sigma / 20 < out["boot_se"] < 3 * sigma / 20
    assert out["n_replicates"] == 16
    with pytest.raises(ValueError, match="r must be"):
        bootstrap_mean_se(df, "g", "v", "id", r=1)


def test_ab_test_report_hand_case(spark):
    from capex_data_pipeline_spark.extensions.analytics import ab_test_report

    # units convert iff flagged on ANY row; arms from md5(user)
    rows = []
    for u in range(40):
        rows.append((u, u % 3 == 0))   # ~1/3 convert
        rows.append((u, False))        # extra non-converting row per unit
    df = spark.createDataFrame(rows, "u long, c boolean")
    out = {r["arm"]: r for r in
           ab_test_report(df, "u", F.col("c")).collect()}
    assert set(out) == {0, 1}
    assert out[0]["lift"] is None and out[0]["z_stat"] is None
    n0, c0 = out[0]["n_units"], out[0]["n_converted"]
    n1, c1 = out[1]["n_units"], out[1]["n_converted"]
    assert n0 + n1 == 40 and c0 + c1 == 14  # 0,3,...,39 -> 14 units
    p = (c0 + c1) / 80 * 2  # pooled
    lift = c1 / n1 - c0 / n0
    assert out[1]["lift"] == pytest.approx(round(lift, 6), abs=1e-9)
    # degenerate experiment (everyone converts) -> NULL z, not an error
    allconv = spark.createDataFrame(
        [(u, True) for u in range(10)], "u long, c boolean"
    )
    deg = {r["arm"]: r for r in
           ab_test_report(allconv, "u", F.col("c")).collect()}
    assert deg[1]["z_stat"] is None


def test_cusum_changepoint_hand_case(spark):
    from capex_data_pipeline_spark.extensions.timeseries import (
        cusum_changepoint,
    )

    # level shift after t=4: [0,0,0,0,10,10,10,10]; mean 5 -> CUSUM
    # peaks at t=4 with |sum(0-5)*4| = 20 (peak accumulated deviation)
    rows = [("g", float(t), t, 0.0 if t <= 4 else 10.0)
            for t in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, t double, id long, v double")
    r = cusum_changepoint(df, "g", "v", "t", "id").collect()[0]
    assert r["n"] == 8
    assert r["cusum_stat"] == pytest.approx(20.0, abs=1e-9)
    assert r["changepoint_ts"] == 4.0
    assert r["frac_position"] == pytest.approx(0.5, abs=1e-9)


def test_correlation_matrix_hand_case(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        correlation_matrix,
    )

    rows = [(float(i), float(2 * i), float(-i), 7.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-9)
    assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-9)
    # constant column: zero variance -> NULL, not inf
    assert out[("a", "d")] is None
    assert len(out) == 6
    with pytest.raises(ValueError, match="at least 2"):
        correlation_matrix(df, ["a"])


def test_chi_square_independence_hand_cases(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        chi_square_independence,
    )

    # perfectly dependent 2x2: chi2 == n, V == 1
    dep = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    r = chi_square_independence(dep, "a", "b").collect()[0]
    assert r["dof"] == 1
    assert r["chi2"] == pytest.approx(10.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    # the dependent case has UNOBSERVED cells (x,v)/(y,u): their
    # expected mass rode in via the closed-form correction
    assert r["n_cells"] == 2
    # independent uniform -> chi2 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(3)],
        "a string, b string",
    )
    r = chi_square_independence(ind, "a", "b").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_gini_coefficient_hand_cases(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        gini_coefficient,
    )

    # perfect equality
    eq = spark.createDataFrame([(5.0,)] * 10, "v double")
    assert gini_coefficient(eq, "v").collect()[0]["gini"] == 0.0
    # one holder owns everything among n=10: G = (n-1)/n = 0.9
    conc = spark.createDataFrame([(0.0,)] * 9 + [(100.0,)], "v double")
    r = gini_coefficient(conc, "v").collect()[0]
    assert r["gini"] == pytest.approx(0.9, abs=1e-9)
    assert r["total"] == pytest.approx(100.0)
    # linear ladder 1..n: G = (n-1)/(3n) -> python exact check incl.
    # tie-block invariance across buckets
    vals = [float(i % 7 + 1) for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = sorted(int(round(v * 100)) for v in vals)
    n, tot = len(s), sum(s)
    t = sum((i + 1) * x for i, x in enumerate(s))
    want = round(2.0 * t / (float(n) * float(tot)) - (n + 1) / float(n), 6)
    assert gini_coefficient(df, "v", n_buckets=4).collect()[0][
        "gini"
    ] == pytest.approx(want, abs=1e-9)
    with pytest.raises(ValueError, match="negative"):
        gini_coefficient(
            spark.createDataFrame([(-1.0,)], "v double"), "v"
        )


def test_sssp_bounded_hand_graph(spark):
    from capex_data_pipeline_spark.extensions.graph import sssp_bounded

    # 1-2 (w1), 2-3 (w1), 1-3 (w5): shortest 1->3 is via 2 (2 < 5);
    # 3-4 (w2): dist 4 = 4; 5-6 unreachable from seed 1
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 2), (5, 6, 1)],
        "a long, b long, w long",
    )
    got = {
        r["vertex"]: r["dist"]
        for r in sssp_bounded(
            edges, sources=[1], rounds=4,
            src_col="a", dst_col="b", weight_col="w",
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 4}
    # bounded rounds: with rounds=1 vertex 3 only has the direct w5 path
    got1 = {
        r["vertex"]: r["dist"]
        for r in sssp_bounded(
            edges, sources=[1], rounds=1,
            src_col="a", dst_col="b", weight_col="w",
        ).collect()
    }
    assert got1 == {1: 0, 2: 1, 3: 5}
    with pytest.raises(ValueError, match="sources"):
        sssp_bounded(edges, sources=[], rounds=2,
                     src_col="a", dst_col="b", weight_col="w")


def test_rolling_active_users_hand_case(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        rolling_active_users,
    )

    rows = [
        (1, "2024-01-01"), (2, "2024-01-01"),
        (1, "2024-01-02"),
        (3, "2024-01-05"),
        (1, "2024-01-05"), (1, "2024-01-05"),  # same-day dup collapses
    ]
    df = spark.createDataFrame(rows, "u long, d string").select(
        "u", F.col("d").cast("timestamp").alias("ts")
    )
    out = {str(r["day"]): r for r in rolling_active_users(
        df, "u", "ts", window_days=3
    ).collect()}
    # day 1: dau 2, window {d1} actives = {1,2} -> 2
    assert (out["2024-01-01"]["dau"], out["2024-01-01"]["rolling_au"]) == (2, 2)
    assert out["2024-01-01"]["full_window"] is False
    # day 2: dau 1; window d-2..d2 actives {1,2} -> 2
    assert (out["2024-01-02"]["dau"], out["2024-01-02"]["rolling_au"]) == (1, 2)
    # day 5: dau 2 (users 1,3); window d3..d5 = only d5 activity -> 2
    assert (out["2024-01-05"]["dau"], out["2024-01-05"]["rolling_au"]) == (2, 2)
    assert out["2024-01-05"]["full_window"] is True
    # days with no activity (Jan 3/4) emit no rows
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-05"}
