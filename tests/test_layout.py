"""Z-order layout operators (extensions/layout.py): bit-exact Morton
key replay, guards, the plan shape (one 1-row stats broadcast + range
exchange), and the QUANTITATIVE locality claim — z-ordered partitions
have tighter per-partition bounding boxes in BOTH dimensions than a
single-column sort."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.extensions.layout import (
    zorder_repartition,
    zorder_values,
)


def _grid_df(spark, n=41):
    """A full 2-D grid: the worst case for 1-D sorts (every x-slice
    spans all of y)."""
    return spark.range(n * n).select(
        F.col("id"),
        (F.col("id") % n).cast("double").alias("x"),
        (F.col("id") / n).cast("long").cast("double").alias("y"),
    )


def _py_z(x, y, lo_x, hi_x, lo_y, hi_y, bits=8):
    top = (1 << bits) - 1

    def scale(v, lo, hi):
        span = hi - lo if hi > lo else 1.0
        return max(0, min(int(math.floor((v - lo) / span * float(top))), top))

    xi, yi = scale(x, lo_x, hi_x), scale(y, lo_y, hi_y)
    z = 0
    for b in range(bits):
        z += ((xi >> b) & 1) << (b * 2)
        z += ((yi >> b) & 1) << (b * 2 + 1)
    return z


def test_zorder_values_bit_exact_replay(spark):
    df = _grid_df(spark, n=17)
    got = {
        r["id"]: r["zvalue"]
        for r in zorder_values(df, ["x", "y"], bits=8).collect()
    }
    for r in df.collect():
        assert got[r["id"]] == _py_z(r["x"], r["y"], 0.0, 16.0, 0.0, 16.0)


def test_zorder_values_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, None, 5.0), (3, 3.0, 5.0)],
        "id long, x double, y double",
    )
    got = {
        r["id"]: r["zvalue"]
        for r in zorder_values(df, ["x", "y"], bits=4).collect()
    }
    assert got[2] == 0  # NULL clusters at the origin
    # constant y contributes 0 bits; x=min -> 0, x=max -> interleave of 15
    assert got[1] == 0
    assert got[3] == sum(1 << (b * 2) for b in range(4))


def test_zorder_guards(spark):
    df = _grid_df(spark, n=3)
    with pytest.raises(ValueError, match="non-empty"):
        zorder_values(df, [])
    with pytest.raises(ValueError, match="60"):
        zorder_values(df, ["x", "y"], bits=31)


def test_zorder_plan_one_stats_broadcast_and_range_exchange(spark):
    df = _grid_df(spark, n=11)
    plan = (
        zorder_repartition(df, ["x", "y"], n_partitions=4, bits=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the 1-row stats frame joins as the intended broadcast nested
    # loop (the q87/q105 totals pattern); nothing else may
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" in plan.lower()


def test_zorder_locality_beats_single_column_sort(spark):
    """The measurable claim behind the operator: range-partition a
    full 2-D grid into k slices by z-value vs by x alone, and compare
    the summed per-partition extent of the OTHER dimension (y). The
    x-sort leaves every partition spanning ALL of y; the z-order cuts
    that extent by ~sqrt-of-partitions — this is exactly what makes
    min/max file stats prune y-predicates after a z-order write."""
    n, parts = 41, 16
    df = _grid_df(spark, n=n)

    def y_extent(frame):
        ext = (
            frame.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg((F.max("y") - F.min("y")).alias("e"))
            .agg(F.sum("e").alias("s"))
            .collect()[0]["s"]
        )
        return float(ext)

    zparts = zorder_repartition(df, ["x", "y"], n_partitions=parts, bits=8)
    xparts = df.repartitionByRange(parts, "x")
    z_ext, x_ext = y_extent(zparts), y_extent(xparts)
    # x-sorted slices each span ~all of y: total ≈ parts * (n-1).
    # z-order keeps squarish tiles: total ≈ parts * (n/sqrt(parts)).
    assert x_ext > 0.8 * parts * (n - 1)
    assert z_ext < 0.5 * x_ext, (z_ext, x_ext)


def test_rendezvous_shards_matches_brute_force_and_hrw_property(spark):
    """Engine routing equals the plain-Python HRW argmax for every
    key, and a key moves under 16 -> 17 shards IFF the new shard wins
    it (the consistent-routing property, checked key-by-key)."""
    import hashlib

    from capex_data_pipeline_spark.extensions.layout import (
        rendezvous_shards,
    )

    keys = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")

    def hrw(key, n):
        return max(
            range(n),
            key=lambda s: (
                hashlib.md5(f"{s}|{key}".encode()).hexdigest(),
                s,
            ),
        )

    want_before = {k: hrw(k, 16) for k in keys}
    want_after = {k: hrw(k, 17) for k in keys}
    rows = rendezvous_shards(df, F.col("k"), 16, 17).collect()
    got_counts = {r["shard"]: (r["n_keys"], r["n_moved"]) for r in rows}
    from collections import Counter

    exp_counts = Counter(want_before.values())
    exp_moved = Counter(
        want_before[k]
        for k in keys
        if want_before[k] != want_after[k]
    )
    assert {s: c[0] for s, c in got_counts.items()} == dict(exp_counts)
    assert {s: c[1] for s, c in got_counts.items() if c[1]} == dict(exp_moved)
    # every mover went to the NEW shard — nothing reshuffles internally
    assert all(
        want_after[k] == 16
        for k in keys
        if want_before[k] != want_after[k]
    )
    # ~1/17 of keys move (loose band)
    n_moved = sum(c[1] for c in got_counts.values())
    assert 5 <= n_moved <= 80
    with pytest.raises(ValueError, match="n_shards"):
        rendezvous_shards(df, F.col("k"), 0)


def test_weighted_rendezvous_share_tracks_capacity(spark):
    """On a 4000-key universe, a weight-2 shard must carry ~2x the
    keys of a weight-1 shard (weighted-HRW's defining property),
    within a loose band."""
    from capex_data_pipeline_spark.extensions.layout import (
        rendezvous_shards_weighted,
    )

    df = spark.range(4000).select(F.col("id").alias("k"))
    rows = rendezvous_shards_weighted(
        df, F.col("k"),
        weights=[1.0, 1.0, 2.0, 2.0],
        weights_after=[1.0, 1.0, 2.0, 2.0, 2.0],
    ).collect()
    share = {r["shard"]: r["share"] for r in rows}
    # expected: 1/6, 1/6, 2/6, 2/6
    assert 0.10 <= share[0] <= 0.23 and 0.10 <= share[1] <= 0.23
    assert 0.26 <= share[2] <= 0.40 and 0.26 <= share[3] <= 0.40
    assert {r["shard"]: r["weight"] for r in rows} == {
        0: 1.0, 1: 1.0, 2: 2.0, 3: 2.0
    }


def test_weighted_rendezvous_removal_moves_only_removed_shard(spark):
    """Shrink: zeroing one shard's weight must move exactly that
    shard's keys (every surviving shard's score is untouched), and a
    pure grow moves keys ONLY into the new shard."""
    from capex_data_pipeline_spark.extensions.layout import (
        rendezvous_shards_weighted,
    )

    df = spark.range(1500).select(F.col("id").alias("k"))
    w = [1.0, 2.0, 1.0, 1.0, 2.0]
    rows = rendezvous_shards_weighted(
        df, F.col("k"), weights=w,
        weights_after=[1.0, 2.0, 1.0, 0.0, 2.0],
    ).collect()
    for r in rows:
        assert r["moved_frac"] == (1.0 if r["shard"] == 3 else 0.0), r
    # grow by one shard: movers exist, and only departures (no
    # reshuffle among survivors) — total moved ~ new shard's share
    rows2 = rendezvous_shards_weighted(
        df, F.col("k"), weights=w, weights_after=w + [2.0],
    ).collect()
    moved = sum(r["n_moved"] for r in rows2)
    assert 0 < moved < 700  # ~2/9 of 1500 expected, loose band
    with pytest.raises(ValueError, match="weights"):
        rendezvous_shards_weighted(df, F.col("k"), [], [1.0])
    with pytest.raises(ValueError, match="weight > 0"):
        rendezvous_shards_weighted(df, F.col("k"), [0.0], [1.0])


def test_zonemap_skip_report_sound_and_ranks_layouts(spark):
    """On a synthetic 2-D grid: (1) skipping is SOUND — hits live only
    in unskipped buckets, so rows_matching is layout-invariant and
    rows_skipped + matching never exceeds total; (2) the z-order
    layout skips strictly more than insertion order for a 2-D box;
    (3) a bucket straddling the box is not skipped."""
    from capex_data_pipeline_spark.extensions.layout import (
        zonemap_skip_report,
        zorder_values,
    )

    n = 1600
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 40).cast("double").alias("x"),
        (F.col("id") / 40).cast("int").cast("double").alias("y"),
    )
    pa, pb = (10.0, 14.0), (10.0, 14.0)

    def rep(frame, key, name):
        return zonemap_skip_report(
            frame, "x", "y", key, name, pa, pb, n_buckets=16
        ).collect()[0]

    r_uns = rep(df, F.col("rid"), "unsorted")
    zv = zorder_values(df, ["x", "y"], bits=8)
    r_z = rep(zv, F.col("zvalue"), "zorder")
    want_hits = 25  # 5x5 box on the 40x40 grid
    assert r_uns["rows_matching"] == want_hits
    assert r_z["rows_matching"] == want_hits
    assert r_uns["rows_total"] == n and r_z["rows_total"] == n
    assert r_z["rows_skipped"] + want_hits <= n
    assert r_z["skip_frac"] > r_uns["skip_frac"]
    assert r_z["n_skipped_buckets"] > 0
    with pytest.raises(ValueError, match="n_buckets"):
        zonemap_skip_report(df, "x", "y", F.col("rid"), "u", pa, pb,
                            n_buckets=0)
