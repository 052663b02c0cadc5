"""Unit + differential tests for engine-portable Lloyd's k-means
(extensions/similarity.kmeans_lloyd): hand-separable blobs, a
driver-side Python replay of the exact semantics (md5 init, rounded
distances with cluster tie-break, rounded means, empty-cluster
retention), rounds=0 init-assignment mode, and argument guards.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from capex_data_pipeline_spark.extensions.similarity import kmeans_lloyd


def _vec_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


# ------------------------------------------------ Python replay


def _py_kmeans(rows, k, rounds, decimals=6):
    """Driver-side replay of kmeans_lloyd's exact semantics."""
    pts = [(i, [float(x) for x in v]) for i, v in rows if v]
    seeds = sorted(pts, key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0]))[:k]
    centers = [list(v) for _, v in seeds]

    def assign():
        out = {}
        for i, v in pts:
            best = None
            for c, cv in enumerate(centers):
                acc = 0.0
                for x, y in zip(v, cv):
                    acc += (x - y) * (x - y)
                d = round(acc, decimals)
                if best is None or (d, c) < best[:2]:
                    best = (d, c)
            out[i] = (best[1], best[0])
        return out

    for _ in range(rounds):
        a = assign()
        sums = {}
        for i, v in pts:
            c = a[i][0]
            s, n = sums.get(c, ([0.0] * len(v), 0))
            sums[c] = ([x + y for x, y in zip(s, v)], n + 1)
        for c, (s, n) in sums.items():
            centers[c] = [round(x / n, decimals) + 0.0 for x in s]
    return assign()


# ------------------------------------------------ tests


def test_kmeans_separable_blobs(spark):
    """Two well-separated 2-D blobs, k=2: members of the same blob land
    in the same cluster and different blobs differ, regardless of which
    seed md5-sorts first."""
    blob_a = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
    blob_b = [(i + 10, [100.0 + i * 0.01, 100.0]) for i in range(5)]
    out = kmeans_lloyd(
        _vec_df(spark, blob_a + blob_b), k=2, rounds=3
    ).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    a_clusters = {got[i] for i, _ in blob_a}
    b_clusters = {got[i] for i, _ in blob_b}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_kmeans_differential_random(spark):
    """Random vectors vs the driver-side replay: assignment, cluster,
    and rounded distance all match bit-for-bit."""
    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
        for i in range(60)
    ]
    for k, rounds in [(3, 0), (4, 2), (5, 4)]:
        exp = _py_kmeans(rows, k=k, rounds=rounds)
        out = kmeans_lloyd(_vec_df(spark, rows), k=k, rounds=rounds).collect()
        got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out}
        assert got == exp, f"mismatch at k={k} rounds={rounds}"


def test_kmeans_empty_cluster_keeps_center(spark):
    """Identical seed vectors: the tie-break sends every point to the
    lower cluster index, the other cluster goes empty and must KEEP its
    previous center (not crash, not NaN)."""
    rows = [(i, [1.0, 1.0]) for i in range(6)]
    out = kmeans_lloyd(_vec_df(spark, rows), k=2, rounds=3).collect()
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist"] == 0.0 for r in out)


def test_kmeans_rounds_zero_is_init_assignment(spark):
    """rounds=0 assigns against the raw md5-sample seeds — the seeds
    themselves sit at distance 0 of their own cluster."""
    rng = random.Random(1)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(20)]
    out = kmeans_lloyd(_vec_df(spark, rows), k=4, rounds=0).collect()
    zero = [r for r in out if r["dist"] == 0.0]
    assert len(zero) >= 4  # the four seeds at least


def test_kmeans_skips_null_and_empty_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, []), (4, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_lloyd(df, k=2, rounds=1).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 4]


def test_kmeans_argument_guards(spark):
    df = _vec_df(spark, [(1, [1.0]), (2, [2.0])])
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=2, rounds=-1)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=5, rounds=1)  # only 2 seedable vectors
