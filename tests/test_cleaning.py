"""Corpus-cleaning operators: PII redaction, URL/domain extraction,
line filtering, repetition metrics (extensions/cleaning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.extensions import cleaning as CL


def _one(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


# ---------------------------------------------------------------- PII


def test_pii_stats_counts_each_class(spark):
    text = (
        "mail a@b.com and c.d+e@f.co.uk, ip 10.0.0.1, "
        "call +91-998-877-6655, card 4111 1111 1111 1111."
    )
    row = (
        _one(spark, text)
        .select(*[v.alias(k) for k, v in CL.pii_stats(F.col("text")).items()])
        .first()
    )
    assert (row.n_email, row.n_ipv4, row.n_phone, row.n_id_run) == (2, 1, 1, 1)


def test_redact_pii_replaces_in_documented_order(spark):
    text = "a@b.com 10.0.0.1 +1-555-123-4567 4111 1111 1111 1111"
    out = _one(spark, text).select(CL.redact_pii(F.col("text")).alias("r")).first().r
    assert out == "<EMAIL> <IP> <PHONE> <ID>"


def test_redact_pii_no_matches_is_identity_and_null_is_empty(spark):
    assert (
        _one(spark, "clean text only").select(CL.redact_pii(F.col("text")).alias("r")).first().r
        == "clean text only"
    )
    assert _one(spark, None).select(CL.redact_pii(F.col("text")).alias("r")).first().r == ""


def test_phone_requires_plus_prefix_so_bare_runs_stay(spark):
    # a bare 10-digit run is NOT phone-shaped here (avoids swallowing ids)
    row = (
        _one(spark, "ref 555-123-4567 vs +1-555-123-4567")
        .select(CL.pii_stats(F.col("text"))["n_phone"].alias("n"))
        .first()
    )
    assert row.n == 1


# ---------------------------------------------------------------- URLs


def test_extract_urls_trims_trailing_sentence_punct(spark):
    text = "see https://www.Example.com/a/b. or (http://x.org/p)!"
    urls = _one(spark, text).select(CL.extract_urls(F.col("text")).alias("u")).first().u
    assert urls == ["https://www.Example.com/a/b", "http://x.org/p"]


def test_url_host_lowercases_and_strips_www(spark):
    hosts = (
        _one(spark, "x")
        .select(
            CL.url_host(F.lit("https://www.Example.com/a")).alias("a"),
            CL.url_host(F.lit("http://Sub.Site.org:8080/p")).alias("b"),
        )
        .first()
    )
    assert (hosts.a, hosts.b) == ("example.com", "sub.site.org")


def test_domain_stats_counts_urls_and_distinct_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a https://a.com/x b https://a.com/y"),
            (2, "c https://www.a.com/z d http://b.org/w"),
            (3, "no urls here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.domain: (r.n_urls, r.n_docs) for r in CL.domain_stats(df).collect()}
    assert rows == {"a.com": (3, 2), "b.org": (1, 1)}


# ---------------------------------------------------------------- lines


def _clean(spark, text, **kw):
    s = CL.clean_lines(F.col("text"), **kw)
    return (
        _one(spark, text)
        .select(s["cleaned"].alias("c"), s["n_lines"].alias("nl"), s["n_kept"].alias("nk"))
        .first()
    )


def test_clean_lines_min_words_and_first_occurrence_dedup(spark):
    text = "one two three\nshort\nzz top line\none two three\nlast full line"
    r = _clean(spark, text, min_words=3, dedup_lines=True)
    # 'short' dropped (<3 words); duplicate 'one two three' keeps FIRST slot
    assert r.c == "one two three\nzz top line\nlast full line"
    assert (r.nl, r.nk) == (5, 3)


def test_clean_lines_terminal_punct_policy(spark):
    text = "a proper sentence.\nno terminal punct\nanother good one!"
    r = _clean(spark, text, min_words=2, require_terminal_punct=True)
    assert r.c == "a proper sentence.\nanother good one!"


def test_clean_lines_empty_and_null(spark):
    r = _clean(spark, "", min_words=1)
    assert (r.c, r.nk) == ("", 0)
    r = _clean(spark, None, min_words=1)
    assert (r.c, r.nk) == ("", 0)


def test_clean_lines_no_dedup_keeps_repeats(spark):
    text = "menu item here\nmenu item here"
    r = _clean(spark, text, min_words=3, dedup_lines=False)
    assert r.c == "menu item here\nmenu item here"


# ------------------------------------------------------- repetition


def _metrics(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in CL.repetition_metrics(df).collect()}


def test_repetition_metrics_hand_computed(spark):
    m = _metrics(spark, [(1, "a b a b a")])
    r = m[1]
    # words: a×3 b×2 → top 3/5; bigrams: "a b"×2 "b a"×2 → top 2/4
    assert r.top_word_frac == pytest.approx(0.6)
    assert r.top_bigram_frac == pytest.approx(0.5)
    # one line, count 1 → no duplicate lines
    assert r.dup_line_frac == 0.0 and r.dup_line_char_frac == 0.0


def test_repetition_metrics_duplicate_lines(spark):
    m = _metrics(spark, [(1, "dup line\ndup line\nunique longer line")])
    r = m[1]
    # 3 non-empty lines, 2 are the duplicated one
    assert r.dup_line_frac == pytest.approx(2 / 3)
    dup_chars = 2 * len("dup line")
    total = dup_chars + len("unique longer line")
    assert r.dup_line_char_frac == pytest.approx(round(dup_chars / total, 6))


def test_repetition_metrics_empty_docs_survive_with_zeros(spark):
    m = _metrics(spark, [(1, ""), (2, None), (3, "word")])
    assert m[1].top_word_frac == 0.0 and m[2].top_bigram_frac == 0.0
    # single word: top_word 1/1, no bigrams
    assert m[3].top_word_frac == 1.0 and m[3].top_bigram_frac == 0.0


def test_repetition_metrics_case_and_punct_normalized(spark):
    # "The the, THE." normalizes to the×3
    m = _metrics(spark, [(1, "The the, THE.")])
    assert m[1].top_word_frac == 1.0


# ------------------------------------------------- semantic dedup


def _semdedup_reference(vecs, n_clusters, threshold):
    """Plain-Python restatement of the SemDeDup rule for differential
    testing: md5-sampled centers, cosine assignment, keeper rank by
    (centroid_sim asc, id asc), remove on sim >= threshold to any
    better-ranked cluster mate."""
    import hashlib
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    centers = [vecs[i] for i in ids[:n_clusters]]
    assigned = {}
    for i, v in vecs.items():
        sims = [(-cos(v, c), ci) for ci, c in enumerate(centers)]
        negcos, cell = min(sims)
        assigned[i] = (cell, round(-negcos, 6))
    removed = set()
    for cl in set(c for c, _ in assigned.values()):
        members = sorted(
            (i for i in vecs if assigned[i][0] == cl),
            key=lambda i: (assigned[i][1], i),
        )
        for bi, b in enumerate(members):
            for a in members[:bi]:
                if round(cos(vecs[a], vecs[b]), 6) >= threshold:
                    removed.add(b)
                    break
    return assigned, removed


def _run_semdedup(spark, vecs, **kw):
    from capex_data_pipeline_spark.extensions.semdedup import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    return {r.vec_id: r for r in semantic_dedup(df, **kw).collect()}


def test_semantic_dedup_marks_planted_duplicates(spark):
    # 0/1 nearly parallel (dup pair), 2 orthogonal, 3 anti-parallel
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.995, 0.1, 0.0],
        2: [0.0, 1.0, 0.0],
        3: [-1.0, 0.0, 0.0],
    }
    out = _run_semdedup(spark, vecs, n_clusters=1, threshold=0.9)
    assigned, removed = _semdedup_reference(vecs, 1, 0.9)
    assert {i for i, r in out.items() if r.removed} == removed
    # exactly one of the planted pair is removed, the others survive
    assert len({0, 1} & removed) == 1 and not {2, 3} & removed


def test_semantic_dedup_pseudo_greedy_chain(spark):
    import math

    # a chain a~b, b~c with cos(a,c) below threshold: the pseudo-greedy
    # rule removes everything ranked after a similar predecessor
    ang = [0.0, 0.25, 0.5]  # radians; cos(0, 0.25)=0.969, cos(0, 0.5)=0.878
    vecs = {i: [math.cos(t), math.sin(t)] for i, t in enumerate(ang)}
    out = _run_semdedup(spark, vecs, n_clusters=1, threshold=0.9)
    assigned, removed = _semdedup_reference(vecs, 1, 0.9)
    assert {i for i, r in out.items() if r.removed} == removed
    assert 1 <= len(removed) <= 2  # at least the middle's neighbor goes


def test_semantic_dedup_matches_python_reference_on_random(spark):
    import random

    rng = random.Random(7)
    vecs = {
        i: [rng.gauss(0, 1) for _ in range(8)] for i in range(60)
    }
    out = _run_semdedup(spark, vecs, n_clusters=4, threshold=0.6)
    assigned, removed = _semdedup_reference(
        {i: [float(f32(x)) for x in v] for i, v in vecs.items()}, 4, 0.6
    )
    assert {i for i, r in out.items() if r.removed} == removed
    for i, r in out.items():
        assert (r.cluster, r.centroid_sim) == assigned[i]


def f32(x):
    """Round-trip through float32 (the array<float> column narrows the
    test vectors exactly as parquet would)."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def test_semantic_dedup_kmeans_mode_runs(spark):
    import random

    rng = random.Random(3)
    vecs = {i: [rng.gauss(0, 1) for _ in range(4)] for i in range(40)}
    out = _run_semdedup(spark, vecs, n_clusters=3, threshold=0.95, centers_mode="kmeans")
    assert len(out) == 40
    assert all(0 <= r.cluster < 3 for r in out.values())


def test_semantic_dedup_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match="centers_mode"):
        _run_semdedup(spark, {0: [1.0, 0.0]}, n_clusters=1, centers_mode="bogus")


def test_semantic_dedup_max_cluster_size_cap(spark):
    """A deliberately degenerate quantizer (n_clusters=1 puts every
    vector in one hot cluster) with the cap below the cluster size:
    the pair join must be skipped for that cluster — every row passes
    through removed=false — and cap_stats reports the exact excluded
    bucket/row counts (VERDICT r5's promised-but-missing parameter)."""
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.995, 0.1, 0.0],   # near-dup of 0 — removed WITHOUT the cap
        2: [0.0, 1.0, 0.0],
        3: [-1.0, 0.0, 0.0],
    }
    # uncapped baseline: the planted pair loses one member
    base = _run_semdedup(spark, vecs, n_clusters=1, threshold=0.9)
    assert sum(r.removed for r in base.values()) == 1

    stats = {}
    out = _run_semdedup(
        spark, vecs, n_clusters=1, threshold=0.9,
        max_cluster_size=3, cap_stats=stats,
    )
    assert len(out) == 4  # every vector still present in the output
    assert not any(r.removed for r in out.values())
    assert stats == {"excluded_buckets": 1, "excluded_rows": 4}
    # assignment columns unaffected by the cap
    for i in vecs:
        assert (out[i].cluster, out[i].centroid_sim) == (
            base[i].cluster, base[i].centroid_sim,
        )

    # cap ABOVE the cluster size is a no-op with zeroed stats
    stats2 = {}
    same = _run_semdedup(
        spark, vecs, n_clusters=1, threshold=0.9,
        max_cluster_size=10, cap_stats=stats2,
    )
    assert {i for i, r in same.items() if r.removed} == {
        i for i, r in base.items() if r.removed
    }
    assert stats2 == {"excluded_buckets": 0, "excluded_rows": 0}


# ---------------------------------------------------- as-of join


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (2, 150, 30.0), (3, 50, 40.0)],
        "k long, t long, lv double",
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 100, 2.0), (1, 180, 3.0), (2, 149, 4.0), (2, 151, 5.0)],
        "k long, t long, rv double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    left, right = _asof_frames(spark)
    out = {(r.k, r.t): (r.rv_asof, r.t_asof)
           for r in asof_join(left, right, on="k", time_col="t").collect()}
    assert out[(1, 100)] == (2.0, 100)   # equal time matches (inclusive)
    assert out[(1, 200)] == (3.0, 180)   # latest preceding, not first
    assert out[(2, 150)] == (4.0, 149)   # 151 is in the future → skipped
    assert out[(3, 50)] == (None, None)  # no right rows for key 3


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    left, right = _asof_frames(spark)
    out = {(r.k, r.t): r.rv_asof
           for r in asof_join(left, right, on="k", time_col="t",
                              tolerance_seconds=5).collect()}
    assert out[(1, 100)] == 2.0    # exact-time match is 0 old
    assert out[(1, 200)] is None   # 180 is 20 > 5 stale
    assert out[(2, 150)] == 4.0    # 1 old


def test_asof_join_rejects_output_column_clash(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    left, right = _asof_frames(spark)
    with pytest.raises(ValueError, match="rv_asof"):
        asof_join(left.withColumn("rv_asof", F.lit(0)), right, on="k", time_col="t")


def test_asof_join_explicit_value_cols_subset(spark):
    from capex_data_pipeline_spark.extensions.asof import asof_join

    left, right = _asof_frames(spark)
    right2 = right.withColumn("extra", F.lit("x"))
    out = asof_join(left, right2, on="k", time_col="t", value_cols=["rv"])
    assert "extra_asof" not in out.columns and "rv_asof" in out.columns


def test_id_run_matches_bare_and_separated(spark):
    """ID_RUN covers both documented shapes: 4-digit separated groups
    (12/16 digits) AND bare 13-19 digit runs; 20+ digit runs and
    12-digit bare runs stay unmatched."""
    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.cleaning import pii_stats, redact_pii

    rows = [
        (1, "pay 4111 1111 1111 1111 now"),   # separated 16
        (2, "pay 4111111111111111 now"),      # bare 16
        (3, "id 1234567890123 ok"),           # bare 13 (min)
        (4, "n 123456789012 x"),              # bare 12 → no match
        (5, "n 123456789012345678901 x"),     # 21 digits → no match
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r["i"]: (r["n_id_run"], r["red"])
        for r in df.select(
            "i",
            pii_stats(F.col("t"))["n_id_run"].alias("n_id_run"),
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert out[1] == (1, "pay <ID> now")
    assert out[2] == (1, "pay <ID> now")
    assert out[3] == (1, "id <ID> ok")
    assert out[4][0] == 0 and out[5][0] == 0


def test_mixture_sample_null_group_is_sampled(spark):
    """NULL group values are a real group: they receive a fraction and
    can appear in the output (previously silently dropped)."""
    from capex_data_pipeline_spark.extensions.corpus import mixture_sample

    rows = [(i, "en" if i % 2 == 0 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, group_col="lang", key_col="doc_id", budget=120)
    got = out.collect()
    langs = {r["lang"] for r in got}
    assert None in langs and "en" in langs
    # both groups have 100 rows -> equal fractions; null side non-empty
    n_null = sum(1 for r in got if r["lang"] is None)
    assert n_null > 20


def test_canonical_url_rules(spark):
    """Every canonicalization rule, hand-checked: case, www, default
    vs explicit ports, fragments, trailing slashes, tracking-param
    removal, query sorting, bare-host and no-query forms."""
    from capex_data_pipeline_spark.extensions.cleaning import canonical_url

    cases = {
        "https://WWW.Example.COM:443/path/2/": "https://example.com/path/2",
        "https://www.example.com/path/2?utm_source=x&b=2&a=1":
            "https://example.com/path/2?a=1&b=2",
        "https://example.com/path/2?a=1&b=2#frag":
            "https://example.com/path/2?a=1&b=2",
        "http://www.example.com:80/path/2?b=2&a=1&gclid=zz":
            "http://example.com/path/2?a=1&b=2",
        "https://example.com:8443/Other?z=9":
            "https://example.com:8443/Other?z=9",  # non-default port kept
        "https://example.com": "https://example.com",
        "http://example.com/a//?utm_campaign=x&fbclid=1":
            "http://example.com/a",  # all params tracking → no '?'
        "HTTPS://example.com/A?ref=h&Z=1&a=2":
            "https://example.com/A?Z=1&a=2",  # ASCII sort: Z < a
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    assert got == cases


# ------------------- near-dup-safe (cluster-keyed) train/val/test split


def test_cluster_safe_split_no_straddling_pairs(spark):
    """The construction guarantee: near-dup pairs NEVER straddle the
    split boundary (every member of a cluster shares the cluster-id
    hash), while a doc-id-keyed split on the same corpus does let
    pairs straddle."""
    from capex_data_pipeline_spark.extensions.corpus import assign_split
    from capex_data_pipeline_spark.extensions.dedup import (
        cluster_safe_split,
        minhash_near_dups,
    )

    dup = "the same long duplicated document body repeated verbatim here"
    docs = spark.createDataFrame(
        [(i, dup) for i in range(40)]
        + [(100 + i, f"unique doc {i} about topic {i * 7} entirely") for i in range(20)],
        "doc_id long, text string",
    )
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    sp = cluster_safe_split(docs, splits)
    rows = sp.collect()
    assert len(rows) == 60
    by_id = {r["doc_id"]: r["split"] for r in rows}
    # all 40 near-dups share one cluster -> one split
    assert len({by_id[i] for i in range(40)}) == 1
    pairs = minhash_near_dups(docs, num_hashes=8, bands=4, threshold=0.5)
    strad = (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"),
                      F.col("split").alias("_sa")), "id_a")
        .join(sp.select(F.col("doc_id").alias("id_b"),
                        F.col("split").alias("_sb")), "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
        .count()
    )
    assert strad == 0
    # the naive doc-id split DOES straddle this corpus (the bug the
    # operator exists to prevent)
    naive = assign_split(docs.select("doc_id"), "doc_id", splits)
    nstrad = (
        pairs.join(naive.select(F.col("doc_id").alias("id_a"),
                                F.col("split").alias("_sa")), "id_a")
        .join(naive.select(F.col("doc_id").alias("id_b"),
                           F.col("split").alias("_sb")), "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
        .count()
    )
    assert nstrad > 0


def test_cluster_safe_split_covers_singletons(spark):
    from capex_data_pipeline_spark.extensions.dedup import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"singleton document number {i} with its own words {i*3}")
         for i in range(10)],
        "doc_id long, text string",
    )
    rows = cluster_safe_split(docs, [("train", 0.5), ("test", 0.5)]).collect()
    assert len(rows) == 10  # total coverage
    assert all(r["cluster_id"] == r["doc_id"] for r in rows)  # own cluster


def test_asof_join_forward_and_nearest(spark):
    """Direction semantics on a hand grid: forward takes the earliest
    at-or-after match, nearest takes the closer side with exact ties
    preferring backward; tolerance applies to the chosen match."""
    from pyspark.sql import functions as F  # noqa: F401

    from capex_data_pipeline_spark.extensions.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0), (1, 25.0), (2, 5.0)], "k long, t double"
    )
    right = spark.createDataFrame(
        [(1, 8.0, "b8"), (1, 12.0, "f12"), (1, 40.0, "f40"),
         (2, 90.0, "far")],
        "k long, t double, rv string",
    )
    fwd = {
        (r["k"], r["t"]): (r["rv_asof"], r["t_asof"])
        for r in asof_join(
            left, right, on="k", time_col="t", direction="forward"
        ).collect()
    }
    # t=10 -> earliest >= 10 is 12; t=25 -> 40; k2 t=5 -> 90
    assert fwd[(1, 10.0)] == ("f12", 12.0)
    assert fwd[(1, 25.0)] == ("f40", 40.0)
    assert fwd[(2, 5.0)] == ("far", 90.0)

    near = {
        (r["k"], r["t"]): (r["rv_asof"], r["t_asof"])
        for r in asof_join(
            left, right, on="k", time_col="t", direction="nearest"
        ).collect()
    }
    # t=10: |10-8|=2 vs |12-10|=2 -> tie -> backward (8)
    assert near[(1, 10.0)] == ("b8", 8.0)
    # t=25: backward 12 (d=13) vs forward 40 (d=15) -> 12
    assert near[(1, 25.0)] == ("f12", 12.0)
    assert near[(2, 5.0)] == ("far", 90.0)

    tol = {
        (r["k"], r["t"]): r["rv_asof"]
        for r in asof_join(
            left, right, on="k", time_col="t",
            direction="nearest", tolerance_seconds=13.0,
        ).collect()
    }
    assert tol[(2, 5.0)] is None  # 85 away > 13
    assert tol[(1, 25.0)] == "f12"

    import pytest as _pt

    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", time_col="t", direction="sideways")
