"""Seeded random-differential tests for the round-8 operators: each
Spark result is compared against a small plain-Python reference on
randomized inputs (the q95-q99 oracles pin fixed corpora; these pin
the semantics across input shapes the fixtures don't reach)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

VOCAB = ["hash", "join", "scan", "sort", "merge", "row", "batch", "x1", "y2"]


def _rand_docs(rng, n):
    out = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.08:
            out.append((i, None))
        elif kind < 0.16:
            out.append((i, rng.choice(["", "  ", "?!.,", "\n\t"])))
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 30))]
            out.append((i, " ".join(words)))
    return out


@pytest.mark.parametrize("seed", [20260814, 3, 77])
def test_bm25_differential_random(spark, seed):
    from capex_data_pipeline_spark.extensions.corpus import bm25_topk
    from tests.test_corpus import _bm25_ref

    rng = random.Random(seed)
    rows = _rand_docs(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "sort", "x1"]
    # k large enough to keep every matching doc: compare the FULL set
    got = {
        r.doc_id: (r.n_matched_terms, r.score)
        for r in bm25_topk(docs, terms, k=1000).collect()
    }
    import re

    corpus = {
        i: re.sub(r"[^a-z0-9]+", " ", (t or "").lower()).split()
        for i, t in rows
    }
    want = _bm25_ref(corpus, terms)
    assert set(got) == set(want)
    for d, (m, s) in want.items():
        assert got[d][0] == m, d
        assert got[d][1] == pytest.approx(s, abs=2e-6), d


def test_distribution_drift_differential_random(spark):
    from capex_data_pipeline_spark.extensions.analytics import (
        distribution_drift,
    )

    rng = random.Random(7)
    cats = ["a", "b", "c", "d", None]
    base = [(rng.choice(cats),) for _ in range(80)]
    curr = [(rng.choice(cats[:3]),) for _ in range(50)]  # shifted mix
    bdf = spark.createDataFrame(base, "cat string")
    cdf = spark.createDataFrame(curr, "cat string")
    got = {
        r.category: (r.n_base, r.n_curr, r.p_base, r.p_curr, r.psi_contrib)
        for r in distribution_drift(bdf, cdf, "cat", smoothing=0.5).collect()
    }

    def counts(rows):
        d = {}
        for (c,) in rows:
            k = c if c is not None else "<null>"
            d[k] = d.get(k, 0) + 1
        return d

    nb, nc = counts(base), counts(curr)
    union = set(nb) | set(nc)
    k, tb, tc = len(union), len(base), len(curr)
    assert set(got) == union
    total_psi = 0.0
    for cat in union:
        p = (nb.get(cat, 0) + 0.5) / (tb + 0.5 * k)
        q = (nc.get(cat, 0) + 0.5) / (tc + 0.5 * k)
        contrib = (q - p) * math.log(q / p)
        total_psi += contrib
        assert got[cat][0] == nb.get(cat, 0) and got[cat][1] == nc.get(cat, 0)
        assert got[cat][4] == pytest.approx(contrib, abs=2e-6), cat
    # the shifted mix must actually register as drift
    assert total_psi > 0.01


def test_char_entropy_differential_random(spark):
    from capex_data_pipeline_spark.extensions.textstats import (
        add_char_entropy,
    )

    rng = random.Random(99)
    rows = []
    for i in range(60):
        n = rng.randint(0, 40)
        rows.append(
            (i, "".join(rng.choice("abC1 .!?xyz\n") for _ in range(n)))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars_norm, r.n_distinct_chars, r.entropy_nats)
        for r in add_char_entropy(df, "text").collect()
    }

    def ref(text):
        import re

        norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
        if not norm:
            return (0, 0, None)
        cnt = {}
        for ch in norm:
            cnt[ch] = cnt.get(ch, 0) + 1
        n = len(norm)
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        return (n, len(cnt), h)

    for i, text in rows:
        n, d, h = ref(text)
        assert got[i][0] == n and got[i][1] == d, i
        if h is None:
            assert got[i][2] is None, i
        else:
            assert got[i][2] == pytest.approx(h, abs=2e-6), i


@pytest.mark.parametrize("seed", [41, 8, 123])
def test_pagerank_differential_random(spark, seed):
    from capex_data_pipeline_spark.extensions.graph import pagerank

    rng = random.Random(seed)
    edges = {(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)}
    edges = [(a, b) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.rank_micro for r in pagerank(df, iterations=4).collect()
    }

    # exact integer reference
    verts = sorted({v for e in edges for v in e})
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    r = {v: 1_000_000 for v in verts}
    for _ in range(4):
        s = {v: 0 for v in verts}
        for a, b in edges:
            s[b] += r[a] // out_deg[a]
        r = {v: 150_000 + (850 * s[v]) // 1000 for v in verts}
    assert got == r


def test_quality_report_differential_random(spark):
    from capex_data_pipeline_spark.extensions.quality import (
        accepted_values,
        custom,
        in_range,
        not_null,
        quality_report,
        unique,
    )

    rng = random.Random(5)
    rows = [
        (
            rng.choice([None, rng.randint(0, 9)]),
            rng.choice([None, rng.uniform(-50, 150)]),
            rng.choice([None, "a", "b", "zz"]),
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, amount double, status string")
    got = {
        r.rule: r.n_violations
        for r in quality_report(
            df,
            [
                not_null("id"),
                in_range("amount", 0, 100),
                accepted_values("status", ["a", "b"]),
                unique("id"),
                unique("id", "status"),
                custom("big_a", "amount > 120 AND status = 'a'"),
            ],
        ).collect()
    }
    assert got["not_null(id)"] == sum(1 for r in rows if r[0] is None)
    assert got["in_range(amount,0.0,100.0)"] == sum(
        1 for r in rows if r[1] is not None and not (0 <= r[1] <= 100)
    )
    assert got["accepted_values(status)"] == sum(
        1 for r in rows if r[2] is not None and r[2] not in ("a", "b")
    )
    assert got["unique(id)"] == len(rows) - len({r[0] for r in rows})
    assert got["unique(id,status)"] == len(rows) - len(
        {(r[0], r[2]) for r in rows}
    )
    assert got["big_a"] == sum(
        1 for r in rows if r[1] is not None and r[1] > 120 and r[2] == "a"
    )


@pytest.mark.parametrize("seed", [11, 202])
def test_apply_changelog_differential_random(spark, seed):
    from capex_data_pipeline_spark.extensions.analytics import (
        apply_changelog,
    )

    rng = random.Random(seed)
    snap_rows = [(k, f"s{k}") for k in range(30) if rng.random() < 0.7]
    chg_rows = []
    versions = list(range(1, 60))
    rng.shuffle(versions)
    for i in range(40):
        chg_rows.append(
            (
                rng.randint(0, 39),          # keys beyond snapshot too
                f"c{i}",
                versions[i],                  # unique versions
                "D" if rng.random() < 0.25 else "U",
            )
        )
    snap = spark.createDataFrame(snap_rows, "k long, v string")
    chg = spark.createDataFrame(chg_rows, "k long, v string, version long, op string")
    got = {r.k: r.v for r in apply_changelog(snap, chg, ["k"]).collect()}

    # dict replay: latest change per key wins; D drops; else snapshot
    latest = {}
    for k, v, ver, op in chg_rows:
        if k not in latest or ver > latest[k][0]:
            latest[k] = (ver, v, op)
    want = {}
    for k, v in snap_rows:
        want[k] = v
    for k, (ver, v, op) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@pytest.mark.parametrize("seed", [20260814, 11])
def test_numeric_histogram_differential_random(spark, seed):
    """Histogram vs a plain-Python reference on random doubles with
    NULLs: identical bucket indices, edges (to 6 dp) and counts."""
    from capex_data_pipeline_spark.extensions.quality import numeric_histogram

    rng = random.Random(seed)
    vals = [
        None if rng.random() < 0.1 else rng.uniform(-50, 150)
        for _ in range(200)
    ]
    nbins = rng.choice([3, 7, 16])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r.bucket: (r.bucket_lo, r.bucket_hi, r.n_rows)
        for r in numeric_histogram(df, "v", nbins).collect()
    }

    present = [v for v in vals if v is not None]
    lo, hi = min(present), max(present)
    width = (hi - lo) / nbins
    ref: dict[int, int] = {}
    for v in present:
        b = 0 if hi == lo else min(int(math.floor((v - lo) / width)), nbins - 1)
        ref[b] = ref.get(b, 0) + 1
    assert set(got) == set(ref)
    for b, n in ref.items():
        blo, bhi, bn = got[b]
        assert bn == n
        assert blo == round(lo + b * width, 6) + 0.0
        assert bhi == round(lo + (b + 1) * width, 6) + 0.0


@pytest.mark.parametrize("seed", [20260814, 5])
def test_split_leakage_differential_random(spark, seed):
    """assign_split + split_leakage_report vs a plain-Python replay of
    the md5 hash assignment and the multi-split fingerprint audit on a
    random corpus with planted cross-group duplicates."""
    import hashlib

    from capex_data_pipeline_spark.extensions.corpus import (
        assign_split,
        split_leakage_report,
    )

    rng = random.Random(seed)
    rows = []
    for i in range(150):
        grp = f"g{rng.randint(0, 24)}" if rng.random() > 0.05 else None
        # ~25% duplicates drawn from a tiny shared pool, rest unique
        fp = f"dup{rng.randint(0, 5)}" if rng.random() < 0.25 else f"u{i}"
        rows.append((i, grp, fp))
    df = spark.createDataFrame(rows, "id long, grp string, fp string")
    splits = [("train", 0.7), ("val", 0.2), ("test", 0.1)]
    got = {
        r.split: (r.n_rows, r.n_leaked_rows)
        for r in split_leakage_report(
            assign_split(df, "grp", splits), "split", "fp"
        ).collect()
    }

    def ref_split(grp):
        key = "<null>" if grp is None else grp
        h = int(hashlib.md5(f"s0|{key}".encode()).hexdigest()[:8], 16) / 2**32
        return "train" if h < 0.7 else ("val" if h < 0.9 else "test")

    assigned = [(ref_split(g), fp) for _, g, fp in rows]
    multi = {
        fp
        for fp in {f for _, f in assigned}
        if len({s for s, f in assigned if f == fp}) > 1
    }
    ref: dict[str, list[int]] = {}
    for s, fp in assigned:
        ref.setdefault(s, [0, 0])
        ref[s][0] += 1
        ref[s][1] += 1 if fp in multi else 0
    assert got == {s: tuple(v) for s, v in ref.items()}
