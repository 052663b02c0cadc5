"""Durable incremental state (extensions/state.py): the persist-and-
fold layer for q198 (CC labels) and q199 (stats cells).

Two properties pinned here:
1. CORRECTNESS — a fold that reads persisted state equals the full
   from-scratch recompute (the same certificate q189/q184 carry, now
   across a disk round-trip).
2. PLAN — the state side of every fold join/aggregate has ZERO
   Exchange: the corpus-sized state streams from its buckets; only
   batch-sized frames shuffle. This is the 100 TB economics the
   persistence exists for.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _depth(line: str) -> int:
    m = re.search(r"[A-Za-z*(]", line)
    return m.start() if m is not None else len(line)


def _assert_state_scans_shuffle_free(plan: str, needle: str) -> int:
    """Every scan of the state table must reach its nearest Join
    ancestor without passing through an Exchange — i.e. the state side
    of the fold join never shuffles. Returns the number of state scans
    checked (must be > 0 for the assertion to mean anything)."""
    lines = plan.splitlines()
    scan_idx = [
        i for i, ln in enumerate(lines)
        if "Scan parquet" in ln and needle in ln
    ]
    assert scan_idx, f"no scans of {needle} in plan:\n{plan}"
    for i in scan_idx:
        cur = _depth(lines[i])
        for j in range(i - 1, -1, -1):
            dj = _depth(lines[j])
            if dj < cur:
                cur = dj
                # state-sized data ends at the first join OR the first
                # FINAL aggregate (a non-partial HashAggregate reduces
                # the state to a sketch-sized frame; what shuffles
                # above it is cells, not state)
                if "Join" in lines[j] or (
                    "HashAggregate" in lines[j]
                    and "partial_" not in lines[j]
                ):
                    break
                # a shuffle moves state rows over the network; a
                # BroadcastExchange of a batch-sized DERIVED frame does
                # not (and at 100 TB the state itself is never
                # broadcast-eligible — the pin tests force SMJ)
                assert not (
                    "Exchange" in lines[j]
                    and "BroadcastExchange" not in lines[j]
                ), (
                    f"state-side shuffle Exchange above scan:\n{lines[j]}\n"
                    f"full plan:\n{plan}"
                )
    return len(scan_idx)


# ------------------------------------------------------------------ CC


@pytest.fixture()
def cc_state(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.graph import (
        connected_components,
    )
    from capex_data_pipeline_spark.extensions.state import save_cc_state
    from capex_data_pipeline_spark.sources.bucketed import drop_table

    day0 = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "src long, dst long"
    )
    labels = connected_components(
        day0, until_fixpoint=True, assume_canonical=True
    )
    save_cc_state(
        labels, "t_cc_state_test", n_buckets=8,
        path=str(tmp_path / "cc_state"),
    )
    yield "t_cc_state_test"
    drop_table(spark, "t_cc_state_test")
    drop_table(spark, "t_cc_state_test2")


def test_cc_fold_persisted_matches_full_recompute(spark, cc_state):
    from capex_data_pipeline_spark.extensions.graph import (
        connected_components,
    )
    from capex_data_pipeline_spark.extensions.state import cc_fold_persisted

    new_edges = spark.createDataFrame(
        [(2, 3), (7, 8)], "src long, dst long"
    )
    folded = {
        (r["vertex"], r["component"])
        for r in cc_fold_persisted(spark, cc_state, new_edges).collect()
    }
    all_edges = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 3), (7, 8)], "src long, dst long"
    )
    full = {
        (r["vertex"], r["component"])
        for r in connected_components(
            all_edges, until_fixpoint=True, assume_canonical=True
        ).collect()
    }
    assert folded == full
    assert folded == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (7, 7), (8, 7)
    }


def test_cc_fold_state_side_never_shuffles(spark, cc_state):
    from capex_data_pipeline_spark.extensions.state import cc_fold_persisted

    new_edges = spark.createDataFrame(
        [(2, 3), (7, 8)], "src long, dst long"
    )
    # at test scale Spark would broadcast the tiny state table, which
    # proves nothing about 100 TB; force the sort-merge path so the
    # bucketed layout is what carries the no-shuffle property
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(cc_fold_persisted(spark, cc_state, new_edges))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # relabel join + seen-vertex anti join: the state parquet scans in
    # the final plan never sit below a shuffle (the endpoint label
    # lookups are materialized inside the fixpoint loop and are pinned
    # separately below)
    n = _assert_state_scans_shuffle_free(plan, "t_cc_state_test")
    assert n >= 2, plan


def test_cc_state_label_lookup_shuffle_free(spark, cc_state):
    """The endpoint label lookup (new_edges joined to the labeling on
    vertex — the la/lb shape inside cc_incremental) streams the state
    from its buckets even through a rename: zero state-side shuffle."""
    new_edges = spark.createDataFrame(
        [(2, 3), (7, 8)], "src long, dst long"
    )
    la = spark.table(cc_state).select(
        F.col("vertex").alias("_va"), F.col("component").alias("_la")
    )
    probe = new_edges.select(F.col("src").alias("_va"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(probe.join(la, "_va", "left"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    _assert_state_scans_shuffle_free(plan, "t_cc_state_test")


def test_cc_fold_save_as_roundtrip(spark, cc_state, tmp_path):
    """Day-over-day loop: fold day1, write back, fold day2 from the
    written state — labels stay the global min member ids."""
    from capex_data_pipeline_spark.extensions.state import cc_fold_persisted

    day1 = spark.createDataFrame([(2, 3)], "src long, dst long")
    cc_fold_persisted(
        spark, cc_state, day1, save_as="t_cc_state_test2",
        save_path=str(tmp_path / "cc_state2"), n_buckets=8,
    )
    day2 = spark.createDataFrame([(4, 5)], "src long, dst long")
    out = {
        (r["vertex"], r["component"])
        for r in cc_fold_persisted(spark, "t_cc_state_test2", day2).collect()
    }
    assert out == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1)
    }


# --------------------------------------------------------------- stats


@pytest.fixture()
def stats_state(spark, tmp_path):
    from capex_data_pipeline_spark.extensions.state import save_stats_cells
    from capex_data_pipeline_spark.sources.bucketed import drop_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    history = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    save_stats_cells(
        history,
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
        partition=F.date_trunc("day", F.col("o_orderdate")),
        table="t_stats_state_test",
        b=6,
        n_buckets=8,
        path=str(tmp_path / "stats_state"),
    )
    yield "t_stats_state_test"
    drop_table(spark, "t_stats_state_test")


def test_stats_fold_state_only_has_zero_exchange(spark, stats_state):
    """With no new batch, the whole fold — history-cell merge plus
    finalize — satisfies every distribution from the bucketed scan:
    the plan contains NO Exchange at all."""
    from capex_data_pipeline_spark.extensions.state import (
        stats_fold_persisted,
    )

    df = stats_fold_persisted(spark, stats_state)
    assert "Exchange" not in _plan(df), _plan(df)
    assert df.count() == 3


def test_stats_fold_matches_direct_scan(spark, stats_state):
    """Persisted-history + new-batch fold == direct whole-table stats
    (sketch-only columns), value for value."""
    from capex_data_pipeline_spark.extensions.sketches import table_stats
    from capex_data_pipeline_spark.extensions.state import (
        stats_fold_persisted,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    today = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    assert today.count() > 0  # the fold must actually fold something
    folded = {
        r["column_name"]: (
            r["n_rows"], r["n_null"], r["null_frac"], r["avg_len"],
            r["ndv_est"],
        )
        for r in stats_fold_persisted(
            spark, stats_state, new_df=today, cols=cols
        ).collect()
    }
    direct = {
        r["column_name"]: (
            r["n_rows"], r["n_null"], r["null_frac"], r["avg_len"],
            r["ndv_est"],
        )
        for r in table_stats(orders, cols).collect()
    }
    assert folded == direct


def test_stats_fold_with_batch_state_side_shuffle_free(spark, stats_state):
    from capex_data_pipeline_spark.extensions.state import (
        stats_fold_persisted,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    today = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            stats_fold_persisted(
                spark, stats_state, new_df=today,
                cols=["o_orderkey", "o_orderstatus", "o_totalprice"],
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    _assert_state_scans_shuffle_free(plan, "t_stats_state_test")


def test_save_stats_cells_append_mode(spark, tmp_path):
    """Two days persisted by separate append calls fold identically to
    one combined write — the on-disk state is day-incremental."""
    from capex_data_pipeline_spark.extensions.sketches import table_stats
    from capex_data_pipeline_spark.extensions.state import (
        save_stats_cells,
        stats_fold_persisted,
    )
    from capex_data_pipeline_spark.sources.bucketed import drop_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cols = ["o_orderstatus", "o_totalprice"]
    d1 = orders.filter(F.col("o_orderdate") < F.lit("1995-01-01"))
    d2 = orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01"))
    part = F.date_trunc("day", F.col("o_orderdate"))
    try:
        save_stats_cells(
            d1, cols, partition=part, table="t_stats_append_test",
            n_buckets=8, path=str(tmp_path / "append_state"),
        )
        save_stats_cells(
            d2, cols, partition=part, table="t_stats_append_test",
            n_buckets=8, path=str(tmp_path / "append_state"),
            mode="append",
        )
        folded = {
            r["column_name"]: (r["n_rows"], r["ndv_est"])
            for r in stats_fold_persisted(
                spark, "t_stats_append_test"
            ).collect()
        }
        direct = {
            r["column_name"]: (r["n_rows"], r["ndv_est"])
            for r in table_stats(orders, cols).collect()
        }
        assert folded == direct
    finally:
        drop_table(spark, "t_stats_append_test")
