"""Unit tests for extensions/timeseries.py (range_join, resample_ffill)
and the round-7 cleaning additions (crossdoc_line_stats,
normalize_unicode).  range_join is differentially checked against the
naive theta-join formulation — same results, radically different plan.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.extensions.cleaning import (
    crossdoc_line_stats,
    normalize_unicode,
)
from capex_data_pipeline_spark.extensions.timeseries import (
    range_join,
    resample_ffill,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    """Small event set with boundary times sitting exactly on bin
    edges for the [-3600, 0] window (width 3600)."""
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), 10.0),
            (2, "u1", _ts("2024-01-01 11:30:00"), 20.0),
            (3, "u2", _ts("2024-01-01 10:00:00"), 30.0),
            (4, "u3", _ts("2024-01-01 09:00:00"), 40.0),
        ],
        "lid long, user string, ts timestamp, lval double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:00:00"), 1.0),   # exactly -3600 for lid=1
            ("u1", _ts("2024-01-01 09:59:59"), 2.0),
            ("u1", _ts("2024-01-01 10:00:00"), 3.0),   # exactly 0 for lid=1
            ("u1", _ts("2024-01-01 10:00:01"), 4.0),   # outside lid=1
            ("u2", _ts("2024-01-01 08:59:59"), 5.0),   # just outside lid=3
            ("u9", _ts("2024-01-01 10:00:00"), 6.0),   # key with no left
        ],
        "user string, ts timestamp, rval double",
    )
    return left, right


def _naive(left, right, lower, upper):
    l, r = left.alias("l"), right.alias("r")
    d = F.col("r.ts").cast("double") - F.col("l.ts").cast("double")
    return (
        l.join(r, (F.col("l.user") == F.col("r.user")), "inner")
        .filter((d >= lower) & (d <= upper))
        .select("l.lid", F.col("r.rval").alias("rval_r"))
    )


def test_range_join_inner_matches_naive_theta_join(ev):
    left, right = ev
    got = sorted(
        range_join(left, right, on="user", lower=-3600, upper=0)
        .select("lid", "rval_r")
        .collect()
    )
    want = sorted(_naive(left, right, -3600, 0).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # boundary semantics pinned explicitly: lid=1 matches -3600 and 0
    lid1 = sorted(v for (k, v) in [tuple(r) for r in got] if k == 1)
    assert lid1 == [1.0, 2.0, 3.0]


def test_range_join_asymmetric_window_matches_naive(ev):
    left, right = ev
    # forward-looking window [0, 1800]
    got = sorted(
        tuple(r)
        for r in range_join(left, right, on="user", lower=0, upper=1800)
        .select("lid", "rval_r")
        .collect()
    )
    want = sorted(tuple(r) for r in _naive(left, right, 0, 1800).collect())
    assert got == want


def test_range_join_left_keeps_matchless_rows(ev):
    left, right = ev
    out = range_join(left, right, on="user", lower=-3600, upper=0, how="left")
    rows = {tuple(r) for r in out.select("lid", "rval_r").collect()}
    # matchless: lid=2 (u1 11:30, window [10:30,11:30] empty), lid=3
    # (u2's candidate is 1s outside), lid=4 (u3 has no right rows)
    inner = {
        tuple(r)
        for r in range_join(left, right, on="user", lower=-3600, upper=0)
        .select("lid", "rval_r")
        .collect()
    }
    assert rows == inner | {(2, None), (3, None), (4, None)}


def test_range_join_plan_is_equi_join(ev):
    left, right = ev
    plan = (
        range_join(left, right, on="user", lower=-3600, upper=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_rejects_bad_window(ev):
    left, right = ev
    with pytest.raises(ValueError, match="upper > lower"):
        range_join(left, right, on="user", lower=0, upper=0)


def test_resample_ffill_grid_and_fill(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:10:00"), 1.0),
            ("a", _ts("2024-01-01 00:50:00"), 2.0),  # same cell, later → wins
            ("a", _ts("2024-01-01 03:10:00"), 9.0),  # 2 empty cells between
            ("b", _ts("2024-01-01 05:00:00"), 7.0),  # single-obs key
        ],
        "k string, ts timestamp, value double",
    )
    out = resample_ffill(df, on="k", step_seconds=3600)
    rows = {
        (r["k"], r["cell_ts"].isoformat(), r["n_obs"], r["value_last"], r["filled"])
        for r in out.collect()
    }
    assert rows == {
        ("a", "2024-01-01T00:00:00", 2, 2.0, False),
        ("a", "2024-01-01T01:00:00", 0, 2.0, True),
        ("a", "2024-01-01T02:00:00", 0, 2.0, True),
        ("a", "2024-01-01T03:00:00", 1, 9.0, False),
        ("b", "2024-01-01T05:00:00", 1, 7.0, False),
    }


def test_resample_ffill_span_guard(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 1.0), ("a", _ts("2024-03-01 00:00:00"), 2.0)],
        "k string, ts timestamp, value double",
    )
    out = resample_ffill(df, on="k", step_seconds=3600, max_span_steps=100)
    with pytest.raises(Exception, match="spans more than"):
        out.collect()  # lazy guard: fires at execution, inside the plan


def test_crossdoc_line_stats_removes_shared_boilerplate(spark):
    footer = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta\n{footer}\nunique one"),
            (2, f"epsilon zeta eta theta\n{footer}"),
            (3, "totally unrelated prose here\nshort"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in crossdoc_line_stats(docs, min_docs=2, min_line_chars=8).collect()
    }
    assert out[1]["cleaned"] == "alpha beta gamma delta\nunique one"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["cleaned"] == "epsilon zeta eta theta"
    assert out[3]["n_removed"] == 0
    # 'short' is < min_line_chars: exempt even if repeated
    docs2 = spark.createDataFrame(
        [(1, "short"), (2, "short")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r for r in crossdoc_line_stats(docs2).collect()}
    assert out2[1]["n_removed"] == 0 and out2[1]["cleaned"] == "short"


def test_crossdoc_line_stats_preserves_order_and_within_doc_dups(spark):
    # a line repeated WITHIN one doc only is not cross-doc boilerplate
    docs = spark.createDataFrame(
        [(1, "repeated line here\nmiddle content x\nrepeated line here")],
        "doc_id long, text string",
    )
    r = crossdoc_line_stats(docs, min_docs=2).collect()[0]
    assert r["n_removed"] == 0
    assert r["cleaned"] == "repeated line here\nmiddle content x\nrepeated line here"


def test_normalize_unicode_nfc(spark):
    decomposed = "cafe\u0301"  # e + COMBINING ACUTE
    composed = "caf\u00e9"      # precomposed
    docs = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, "ascii only"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_unicode(docs).collect()}
    assert out[1]["text_norm"] == composed
    assert out[1]["changed"] is True
    assert (out[1]["n_chars_before"], out[1]["n_chars_after"]) == (5, 4)
    assert out[2]["changed"] is False
    assert out[3]["changed"] is False
    assert out[4]["text_norm"] == "" and out[4]["changed"] is False
    with pytest.raises(ValueError, match="unknown form"):
        normalize_unicode(docs, form="NFX")


def test_range_join_compound_key(spark):
    """Compound-key range join matches the naive theta join on both
    key columns."""
    left = spark.createDataFrame(
        [
            (1, "u1", "a", _ts("2024-01-01 10:00:00")),
            (2, "u1", "b", _ts("2024-01-01 10:00:00")),
        ],
        "lid long, user string, site string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", "a", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", "b", _ts("2024-01-01 09:40:00"), 2.0),
            ("u1", "a", _ts("2024-01-01 08:00:00"), 3.0),  # outside window
            ("u2", "a", _ts("2024-01-01 09:45:00"), 4.0),  # wrong user
        ],
        "user string, site string, ts timestamp, rval double",
    )
    got = sorted(
        tuple(r)
        for r in range_join(
            left, right, on=["user", "site"], lower=-3600, upper=0
        )
        .select("lid", "rval_r")
        .collect()
    )
    assert got == [(1, 1.0), (2, 2.0)]


def test_asof_join_compound_key(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u1", "a", _ts("2024-01-01 10:00:00"))],
        "lid long, user string, site string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", "a", _ts("2024-01-01 09:00:00"), 1.0),
            ("u1", "b", _ts("2024-01-01 09:59:00"), 2.0),  # wrong site, newer
        ],
        "user string, site string, ts timestamp, rv double",
    )
    rows = asof_join(left, right, on=["user", "site"]).collect()
    assert len(rows) == 1
    assert rows[0]["rv_asof"] == 1.0  # site-b row must not leak in


def test_range_join_differential_random(spark):
    """Seeded-random differential: range_join (binned) vs the naive
    theta join over 3 window shapes on dense random event data —
    including windows that straddle many bins and exact-boundary
    collisions (integer-second times)."""
    import random

    rng = random.Random(20260814)
    users = [f"u{i}" for i in range(12)]
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, rng.choice(users), base + dt.timedelta(seconds=rng.randrange(0, 7200)))
        for i in range(250)
    ]
    rrows = [
        (rng.choice(users), base + dt.timedelta(seconds=rng.randrange(0, 7200)),
         float(i))
        for i in range(250)
    ]
    left = spark.createDataFrame(lrows, "lid long, user string, ts timestamp")
    right = spark.createDataFrame(rrows, "user string, ts timestamp, rval double")
    for lo, hi in ((-600, 0), (-1800, 1800), (30, 90)):
        got = sorted(
            tuple(r)
            for r in range_join(left, right, on="user", lower=lo, upper=hi)
            .select("lid", "rval_r")
            .collect()
        )
        want = sorted(tuple(r) for r in _naive(left, right, lo, hi).collect())
        assert got == want, (lo, hi, len(got), len(want))


def test_crossdoc_line_stats_differential_random(spark):
    """Seeded-random differential vs a pure-Python reference: random
    docs assembled from a small line pool (guaranteed cross-doc
    collisions), random short/empty lines mixed in."""
    import random

    rng = random.Random(7)
    pool = [f"shared line number {i} with words" for i in range(12)]
    docs = []
    for d in range(60):
        lines = [
            rng.choice(
                [rng.choice(pool), f"uniq {d}-{i} content line", "hi", ""]
            )
            for i in range(rng.randrange(1, 8))
        ]
        docs.append((d, "\n".join(lines)))

    MIN_DOCS, MIN_CHARS = 2, 8
    # python reference
    from collections import defaultdict

    line_docs = defaultdict(set)
    for d, text in docs:
        for ln in text.split("\n"):
            key = ln.strip()
            if len(key) >= MIN_CHARS:
                line_docs[key].add(d)
    boiler = {k for k, v in line_docs.items() if len(v) >= MIN_DOCS}
    want = {}
    for d, text in docs:
        kept, removed = [], 0
        for ln in text.split("\n"):
            if ln.strip() in boiler and len(ln.strip()) >= MIN_CHARS:
                removed += 1
            else:
                kept.append(ln)
        want[d] = ("\n".join(kept), len(text.split("\n")), removed)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cleaned"], r["n_lines"], r["n_removed"])
        for r in crossdoc_line_stats(
            df, min_docs=MIN_DOCS, min_line_chars=MIN_CHARS
        ).collect()
    }
    assert got == want


def test_sessionize_differential_random(spark):
    """Seeded-random differential vs a pure-Python sessionizer."""
    import random

    from capex_data_pipeline_spark.extensions.analytics import sessionize

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, f"u{rng.randrange(8)}",
         base + dt.timedelta(seconds=rng.randrange(0, 36000)))
        for i in range(400)
    ]
    GAP = 900
    from collections import defaultdict

    per = defaultdict(list)
    for i, u, t in rows:
        per[u].append((t, i))
    want = {}
    for u, evs in per.items():
        evs.sort()
        sid, prev = -1, None
        for t, i in evs:
            if prev is None or (t - prev).total_seconds() > GAP:
                sid += 1
                want[i] = (sid, True)
            else:
                want[i] = (sid, False)
            prev = t
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    got = {
        r["event_id"]: (r["session_id"], r["is_session_start"])
        for r in sessionize(
            df, gap_seconds=GAP, tiebreak_col="event_id"
        ).collect()
    }
    # ties at identical (user, ts): python sorts by (t, i) = same tiebreak
    assert got == want


def test_global_running_sum_matches_naive_window(spark):
    """Two-phase prefix sum == the naive global window on every row,
    including NULL values (count as 0), ties broken by the id, and
    multi-bucket layouts (buckets must refine the order)."""
    import datetime as dt

    from capex_data_pipeline_spark.extensions.timeseries import (
        global_running_sum,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i // 40), 3, i % 40),
         None if i % 17 == 0 else round(0.01 * i * (-1 if i % 5 == 0 else 1), 2))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {
        r["event_id"]: r["running_total"]
        for r in global_running_sum(
            df, F.col("value"), ["ts", "event_id"],
            bucket=F.date_trunc("day", F.col("ts")),
        ).collect()
    }
    # naive: sequential integer-cents fold in (ts, id) order
    acc, want = 0, {}
    for eid, ts, v in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += int(round(v * 100)) if v is not None else 0
        want[eid] = acc / 100.0
    assert got == want
    with pytest.raises(ValueError, match="order_by"):
        global_running_sum(df, F.col("value"), [], bucket=F.lit(1))


def test_global_running_sum_plan_has_no_global_window(spark):
    """The window must be PARTITIONED (by the bucket), never global —
    the whole point of the two-phase construction."""
    import datetime as dt

    from capex_data_pipeline_spark.extensions.timeseries import (
        global_running_sum,
    )

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i % 3), float(i)) for i in range(30)],
        "event_id long, ts timestamp, value double",
    )
    out = global_running_sum(
        df, F.col("value"), ["ts", "event_id"],
        bucket=F.date_trunc("day", F.col("ts")),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        # partition spec present: the spec must carry more than the
        # ordering + frame (an unpartitioned window lists only those)
        assert "_bk" in m.group(1), plan
