"""Corpus-prep operators: deterministic chunking + hash sampling.
Cross-engine value checks live in the q44/q45 oracles; these pin the
boundary math and the determinism/subset properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.extensions.corpus import (
    chunk_documents,
    hash_sample,
    sample_hash,
    stratified_hash_sample,
)


def test_chunk_boundaries_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 3: ceil((10-1)/3) = 3 chunks at offsets 0, 3, 6
    assert [(r.chunk_idx, r.n_tokens, r.chunk_text) for r in rows] == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]


def test_chunk_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "only three words"),       # shorter than a chunk -> 1 chunk
            (2, ""),                        # empty -> no chunks
            (3, "   "),                     # whitespace-only -> no chunks
            (4, None),                      # null -> no chunks
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert [(r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text) for r in rows] == [
        (1, 0, 3, "only three words")
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r.k for r in hash_sample(df, 0.3, "k").collect()}
    b = {r.k for r in hash_sample(df, 0.3, "k").collect()}
    assert a == b  # same keys + seed -> same sample, always
    small = {r.k for r in hash_sample(df, 0.1, "k").collect()}
    assert small <= a  # thresholds nest: a 10% sample is inside the 30%
    assert 0 < len(small) < len(a) < 500
    # a different seed decorrelates
    c = {r.k for r in hash_sample(df, 0.3, "k", seed="other").collect()}
    assert c != a


def test_stratified_hash_sample_fractions(spark):
    df = spark.createDataFrame(
        [(i, "keep_all" if i % 3 == 0 else ("half" if i % 3 == 1 else "drop"))
         for i in range(300)],
        "k long, s string",
    )
    out = stratified_hash_sample(
        df, {"keep_all": 1.0, "half": 0.5}, strata_col="s", key_col="k",
        default_fraction=0.0,
    ).collect()
    by_s: dict[str, int] = {}
    for r in out:
        by_s[r.s] = by_s.get(r.s, 0) + 1
    assert by_s.get("keep_all") == 100      # fraction 1.0 keeps everything
    assert "drop" not in by_s                # default 0.0 drops the rest
    assert 20 <= by_s.get("half", 0) <= 80   # ~50 of 100, loose bound


def test_chunk_handles_newline_whitespace(spark):
    """trim() only strips ASCII spaces: docs ending in newlines (nearly
    all real documents) must not grow phantom '' tokens, and docs that
    are only tabs/newlines must produce no chunks."""
    docs = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\n\n"), (3, "\t a\tb \n")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in rows}
    assert got == {(1, 0): (2, "hello world"), (3, 0): (2, "a b")}


def test_hash_sample_keeps_null_keys_deterministically(spark):
    """A NULL sampling key must get a deterministic decision (sentinel
    hash), not be silently dropped — fraction 1.0 keeps every row."""
    df = spark.createDataFrame([(1,), (None,)], "k long")
    assert hash_sample(df, 1.0, "k").count() == 2
    # and the null-key decision is stable across calls
    n1 = hash_sample(df, 0.5, "k").count()
    n2 = hash_sample(df, 0.5, "k").count()
    assert n1 == n2


def test_pack_chunks_layout(spark):
    """Concat-then-split semantics within one shard: pack_id = bin of
    the chunk's first token, pack_pos = offset inside that pack, laid
    out in (doc, chunk) order."""
    from capex_data_pipeline_spark.extensions.corpus import pack_chunks

    chunks = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 10), (2, 0, 10), (2, 1, 3)],
        "doc_id long, chunk_idx int, n_tokens int",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.shard, r.pack_id, r.pack_pos)
        for r in pack_chunks(chunks, seq_len=16, n_shards=1).collect()
    }
    # single shard: cumulative starts 0, 10, 20, 30 over capacity 16
    assert out == {
        (1, 0): (0, 0, 0),
        (1, 1): (0, 0, 10),
        (2, 0): (0, 1, 4),
        (2, 1): (0, 1, 14),
    }


def test_pack_chunks_shard_cohesion(spark):
    """All chunks of a doc land in one md5-derived shard, and the
    shard routing is deterministic across calls."""
    from capex_data_pipeline_spark.extensions.corpus import pack_chunks

    chunks = spark.createDataFrame(
        [(d, i, 5) for d in range(30) for i in range(3)],
        "doc_id long, chunk_idx int, n_tokens int",
    )
    rows = pack_chunks(chunks, seq_len=64, n_shards=4).collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.shard)
    assert all(len(s) == 1 for s in by_doc.values())
    assert len({next(iter(s)) for s in by_doc.values()}) > 1  # really shards
    rows2 = pack_chunks(chunks, seq_len=64, n_shards=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_contamination_check_flags_quoting_docs(spark):
    """A corpus doc quoting >= min_overlap benchmark 3-grams is flagged;
    clean docs report zero overlap; counts are exact."""
    from capex_data_pipeline_spark.extensions.corpus import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "he said the quick brown fox jumps high today"),  # quotes 3
            (2, "completely unrelated text about spark engines"),
            (3, "the quick brown fox jumps over the lazy dog verbatim"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_overlapping, r.contaminated)
        for r in contamination_check(corpus, bench, k=3, min_overlap=3).collect()
    }
    # doc 1 shares exactly: 'the quick brown', 'quick brown fox',
    # 'brown fox jumps'
    assert got[1] == (3, True)
    assert got[2] == (0, False)
    assert got[3][0] >= 6 and got[3][1]  # near-verbatim quote
    assert set(got) == {1, 2, 3}


def test_contamination_join_broadcasts(spark):
    """The benchmark shingle set must broadcast: the corpus side never
    shuffles for the membership check."""
    from capex_data_pipeline_spark.extensions.corpus import contamination_check

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    corpus = spark.createDataFrame([(2, "a b c e")], "doc_id long, text string")
    plan = contamination_check(
        corpus, bench
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contamination_ignores_degenerate_empty_shingle(spark):
    """An empty/whitespace/punctuation-only benchmark row must not mark
    empty corpus docs contaminated (the k-gram helper yields a
    whole-text '' shingle for sub-k docs, which both sides drop), and
    zero-token docs report n_shingles = 0."""
    from capex_data_pipeline_spark.extensions.corpus import contamination_check

    bench = spark.createDataFrame(
        [(100, ""), (101, "!!! ???"), (102, "real benchmark content here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real benchmark content here now")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_overlapping, r.contaminated)
        for r in contamination_check(corpus, bench, k=3, min_overlap=1).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (0, 0, False)
    assert got[3] == (0, 0, False)
    assert got[4][1] >= 2 and got[4][2]  # genuine shared 3-grams still flag


def test_pack_chunks_rejects_reserved_output_columns(spark):
    """Repacking pack_chunks output without dropping its columns would
    silently produce ambiguous references; the contract errors early."""
    from capex_data_pipeline_spark.extensions.corpus import pack_chunks

    chunks = spark.createDataFrame(
        [(1, 0, 10)], "doc_id long, chunk_idx int, n_tokens int"
    )
    packed = pack_chunks(chunks, seq_len=16, n_shards=1)
    with pytest.raises(ValueError, match="already carries"):
        pack_chunks(packed, seq_len=32, n_shards=1)
    # the documented path: drop the layout columns, then repack freely
    repacked = pack_chunks(
        packed.drop("shard", "pack_id", "pack_pos"), seq_len=32, n_shards=1
    )
    assert repacked.count() == 1


def test_group_sample_exact_n_and_deterministic(spark):
    """Exactly n per group (whole group when smaller), deterministic
    across calls, and n-nesting: the 3-sample is inside the 5-sample."""
    from capex_data_pipeline_spark.extensions.corpus import group_sample

    df = spark.createDataFrame(
        [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(2)],
        "k long, g string",
    )
    s5 = {(r.k, r.g) for r in group_sample(df, 5, "g", "k").collect()}
    assert sum(1 for _, g in s5 if g == "big") == 5
    assert sum(1 for _, g in s5 if g == "small") == 2  # whole small group
    s5b = {(r.k, r.g) for r in group_sample(df, 5, "g", "k").collect()}
    assert s5 == s5b
    s3 = {(r.k, r.g) for r in group_sample(df, 3, "g", "k").collect()}
    assert s3 <= s5  # ranks nest


def test_group_sample_plans_window_group_limit(spark):
    """row_number <= n must push into the shuffle as WindowGroupLimit."""
    from capex_data_pipeline_spark.extensions.corpus import group_sample

    df = spark.createDataFrame([(1, "a")], "k long, g string")
    plan = group_sample(df, 5, "g", "k")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_term_stats_counts(spark):
    """doc_freq counts distinct docs, collection_freq total occurrences,
    normalization lowercases and strips punctuation, min_doc_freq
    prunes the tail."""
    from capex_data_pipeline_spark.extensions.corpus import term_stats

    docs = spark.createDataFrame(
        [
            (1, "Spark spark SPARK! engine"),
            (2, "spark engine engine"),
            (3, "unrelated words"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.term: (r.doc_freq, r.collection_freq)
        for r in term_stats(docs).collect()
    }
    assert got["spark"] == (2, 4)
    assert got["engine"] == (2, 3)
    assert got["unrelated"] == (1, 1)
    pruned = {r.term for r in term_stats(docs, min_doc_freq=2).collect()}
    assert pruned == {"spark", "engine"}


# ---------------------------------------------------- tf-idf + mixture


def test_tfidf_topk_hand_computed(spark):
    import math

    from capex_data_pipeline_spark.extensions.corpus import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.term): r for r in tfidf_topk(docs, k=2).collect()}
    # apple: tf=2 in doc1, df=1; idf = ln(4/2)+1
    r = rows[(1, "apple")]
    assert (r.tf, r.df) == (2, 1)
    assert r.weight == round(2 * (math.log(4 / 2) + 1), 6)
    assert r.rank == 1
    # banana in doc1: tf=1, df=2 → lower weight, rank 2
    assert rows[(1, "banana")].rank == 2


def test_tfidf_topk_k_bounds_and_tie_break(spark):
    from capex_data_pipeline_spark.extensions.corpus import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "x y z w v u t s")], "doc_id long, text string"
    )
    rows = tfidf_topk(docs, k=3).collect()
    # all terms tie on weight → alphabetical order decides
    assert [r.term for r in sorted(rows, key=lambda r: r.rank)] == ["s", "t", "u"]
    assert len(rows) == 3


def test_mixture_sample_rebalances_and_is_deterministic(spark):
    from capex_data_pipeline_spark.extensions.corpus import mixture_sample

    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = mixture_sample(df, group_col="grp", key_col="doc_id", alpha=0.5, budget=200)
    counts = {r.grp: r.cnt for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    # alpha=0.5 targets sqrt-proportional shares: 800/200 input (4:1)
    # becomes sqrt(800):sqrt(200) = 2:1 in expectation
    assert counts["big"] / counts["small"] == pytest.approx(2.0, rel=0.35)
    # deterministic: second run keeps the identical set
    again = mixture_sample(df, group_col="grp", key_col="doc_id", alpha=0.5, budget=200)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_sample_small_group_keeps_everything(spark):
    from capex_data_pipeline_spark.extensions.corpus import mixture_sample

    rows = [(i, "big" if i < 500 else "tiny") for i in range(505)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = mixture_sample(df, group_col="grp", key_col="doc_id", alpha=0.0, budget=400)
    counts = {r.grp: r.cnt for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    # alpha=0 → uniform target 200 per group; 'tiny' has only 5 rows →
    # fraction capped at 1.0, all kept
    assert counts["tiny"] == 5
    kept_frac = {r.grp: r.keep_frac for r in out.select("grp", "keep_frac").distinct().collect()}
    assert kept_frac["tiny"] == 1.0


# ------------------------------------- LM likelihood + DSIR weights


def test_unigram_logprob_hand_computed(spark):
    import math

    from capex_data_pipeline_spark.extensions.corpus import unigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # model: a×2 b×2 c×1, T=5, V=3 → denom = 5 + 0.5*4 = 7
    rows = {r.doc_id: r for r in unigram_logprob_score(docs).collect()}
    p = {"a": 2.5 / 7, "b": 2.5 / 7, "c": 1.5 / 7}
    exp1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
    exp2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
    assert rows[1].avg_nll == pytest.approx(round(exp1, 6))
    assert rows[2].avg_nll == pytest.approx(round(exp2, 6))
    assert (rows[1].n_tokens, rows[2].n_tokens) == (3, 2)


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_logprob_score

    docs = spark.createDataFrame(
        [(i, "common words here") for i in range(9)] + [(9, "zzyzx qwfp")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.avg_nll for r in unigram_logprob_score(docs).collect()}
    assert rows[9] > rows[0]  # hapax-only doc is most surprising


def test_unigram_logprob_excludes_empty_docs(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "some text"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert [r.doc_id for r in unigram_logprob_score(docs).collect()] == [1]


def test_importance_weights_favor_target_like_docs(spark):
    from capex_data_pipeline_spark.extensions.corpus import importance_weights

    corpus = spark.createDataFrame(
        [(1, "finance stocks bonds"), (2, "cats dogs pets"),
         (3, "finance bonds yield"), (4, "random words here")],
        "doc_id long, text string",
    )
    target = corpus.filter("doc_id IN (1, 3)")  # the 'finance' domain
    rows = {r.doc_id: r.avg_loglift for r in importance_weights(corpus, target).collect()}
    # finance docs look like the target; pet/random docs do not
    assert rows[1] > rows[2] and rows[3] > rows[4]
    assert rows[1] > 0 > rows[2]


def test_importance_weights_cover_all_corpus_tokens(spark):
    from capex_data_pipeline_spark.extensions.corpus import importance_weights

    corpus = spark.createDataFrame(
        [(1, "only corpus words"), (2, "target style text")],
        "doc_id long, text string",
    )
    target = corpus.filter("doc_id = 2")
    rows = importance_weights(corpus, target).collect()
    # doc 1's tokens never appear in the target — smoothing keeps the
    # ratio finite and every doc scored
    assert sorted(r.doc_id for r in rows) == [1, 2]
    assert all(r.avg_loglift is not None for r in rows)


def test_weighted_sample_properties(spark):
    """A-ES weighted sampling: exact-n per draw, determinism,
    zero/negative/null weights excluded, and heavy weights win far
    more often than light ones (statistical sanity on one fixed
    seed-keyed draw over many keys)."""
    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.corpus import weighted_sample

    rows = [(i, "heavy" if i % 2 == 0 else "light", 100.0 if i % 2 == 0 else 1.0)
            for i in range(400)]
    rows += [(1000, "zero", 0.0), (1001, "neg", -5.0), (1002, "null", None)]
    df = spark.createDataFrame(rows, "k long, cls string, w double")

    out1 = weighted_sample(df, n=50, weight_col="w", key_col="k")
    out2 = weighted_sample(df, n=50, weight_col="w", key_col="k")
    ids1 = sorted(r["k"] for r in out1.collect())
    ids2 = sorted(r["k"] for r in out2.collect())
    assert ids1 == ids2 and len(ids1) == 50          # deterministic, exact n
    assert not {1000, 1001, 1002} & set(ids1)        # non-positive excluded
    n_heavy = sum(1 for i in ids1 if i % 2 == 0)
    assert n_heavy >= 40  # 100:1 weights → heavy dominates the draw

    # grouped: exactly n per group, small groups keep everything
    g = weighted_sample(
        df.filter("w > 0"), n=10, weight_col="w", key_col="k", group_col="cls"
    )
    from collections import Counter

    per = Counter(r["cls"] for r in g.collect())
    assert per == {"heavy": 10, "light": 10}

    with pytest.raises(ValueError, match="_es_key"):
        weighted_sample(
            df.withColumn("_es_key", F.lit(1.0)), n=5, weight_col="w", key_col="k"
        )


def test_bigram_pmi_hand_computed(spark):
    """'x y' always adjacent (positive PMI, strong collocation) vs
    'a b' never adjacent in a corpus where both words are common —
    verify against hand-computed log2 ratios."""
    import math

    from capex_data_pipeline_spark.extensions.corpus import bigram_pmi

    # 6 docs of "x y", so: unigrams x:6 y:6 (T=12), bigram (x,y):6 (B=6)
    docs = [(i, "x y") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in bigram_pmi(df, min_pair_count=5).collect()}
    assert set(out) == {("x", "y")}
    want = math.log2((6 / 6) / ((6 / 12) * (6 / 12)))  # = 2.0
    assert out[("x", "y")]["pmi"] == pytest.approx(want)
    assert out[("x", "y")]["pair_count"] == 6

    # below min_pair_count → pruned
    assert bigram_pmi(df, min_pair_count=7).count() == 0


# ------------------------------------------------------------- BM25


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Plain-Python BM25 over {doc_id: [tokens]} for differential checks."""
    import math

    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    out = {}
    for d, toks in docs.items():
        score, matched = 0.0, 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if matched:
            out[d] = (matched, round(score, 6))
    return out


def test_bm25_hand_computed(spark):
    from capex_data_pipeline_spark.extensions.corpus import bm25_topk

    corpus = {
        1: "spark join hash join".split(),
        2: "hash table scan".split(),
        3: "filter sort merge".split(),
        4: [],  # empty doc still counts toward N and avgdl
    }
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matched_terms, r.score)
        for r in bm25_topk(docs, ["join", "hash"], k=10).collect()
    }
    want = _bm25_ref(corpus, ["join", "hash"])
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6)


def test_bm25_rank_and_k_bound(spark):
    from capex_data_pipeline_spark.extensions.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(i, "join " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["join"], k=3).collect()
    assert len(rows) == 3
    assert [r.rank for r in rows] == [1, 2, 3]
    # saturation: more occurrences still scores higher, so doc 5 leads —
    # but longer docs are length-penalized; with uniform term density the
    # ordering is by tf. Here text is pure repetition: tf grows with i
    # while dl grows identically, so ranking is deterministic by score
    # then doc_id; just assert scores are non-increasing with rank.
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_query_raises(spark):
    from capex_data_pipeline_spark.extensions.corpus import bm25_topk

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_normalizes_query_terms(spark):
    from capex_data_pipeline_spark.extensions.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(1, "hash join nested loop"), (2, "sort merge")],
        "doc_id long, text string",
    )
    # "Hash-Join" must match via its normalized tokens, not vanish
    rows = bm25_topk(docs, ["Hash-Join"], k=5).collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].n_matched_terms == 2
    # terms that normalize to nothing raise instead of silently matching 0
    with pytest.raises(ValueError):
        bm25_topk(docs, ["?!", "--"])


def test_bpe_pair_counts_hand_computed(spark):
    from capex_data_pipeline_spark.extensions.corpus import bpe_pair_counts

    # vocab: "ab" x3 (docs), "abc" x1, "z" x1 (no pairs)
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "AB! z")], "doc_id long, text string"
    )
    got = {
        (r.s1, r.s2): r.pair_count
        for r in bpe_pair_counts(docs).collect()
    }
    # ab: freq 3 -> (a,b)+3 ; abc: freq 1 -> (a,b)+1, (b,c)+1
    assert got == {("a", "b"): 4, ("b", "c"): 1}
    # min_count prunes
    got2 = {
        (r.s1, r.s2): r.pair_count
        for r in bpe_pair_counts(docs, min_count=2).collect()
    }
    assert got2 == {("a", "b"): 4}


def test_assign_split_group_coherent_and_total(spark):
    """Every row of one group lands in the same split (the leakage-
    safety property), coverage is total, the assignment is
    deterministic across calls, and bad fraction specs are rejected."""
    from capex_data_pipeline_spark.extensions.corpus import assign_split

    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(70)], "id long, grp string"
    )
    out = assign_split(df, "grp", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    rows = out.collect()
    assert len(rows) == 70
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_grp.values())  # group-coherent
    assert {r.split for r in rows} <= {"train", "val", "test"}
    again = {
        (r.id, r.split)
        for r in assign_split(
            df, "grp", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
        ).collect()
    }
    assert again == {(r.id, r.split) for r in rows}  # deterministic
    with pytest.raises(ValueError, match="sum to 1.0"):
        assign_split(df, "grp", [("a", 0.8), ("b", 0.1)])
    with pytest.raises(ValueError, match="at least 2"):
        assign_split(df, "grp", [("a", 1.0)])
    with pytest.raises(ValueError, match="unique"):
        assign_split(df, "grp", [("a", 0.5), ("a", 0.5)])
    with pytest.raises(ValueError, match="carries"):
        assign_split(out, "grp", [("a", 0.5), ("b", 0.5)])


def test_split_leakage_report_hand_built(spark):
    """Hand-built leakage: fingerprint 'x' spans train+test (both
    sides' rows flagged), 'y' stays within train (clean), NULL
    fingerprints count in n_rows but never as leaked."""
    from capex_data_pipeline_spark.extensions.corpus import split_leakage_report

    df = spark.createDataFrame(
        [
            ("train", "x"),
            ("train", "x"),
            ("test", "x"),
            ("train", "y"),
            ("train", "y"),
            ("val", "z"),
            ("val", None),
            ("test", None),
        ],
        "split string, fp string",
    )
    rep = {r.split: r for r in split_leakage_report(df, "split", "fp").collect()}
    assert rep["train"].n_rows == 4 and rep["train"].n_leaked_rows == 2
    assert rep["test"].n_rows == 2 and rep["test"].n_leaked_rows == 1
    assert rep["val"].n_rows == 2 and rep["val"].n_leaked_rows == 0


def test_split_leakage_report_null_split_row(spark):
    """A NULL split value is reported as its own row with a correct
    leaked count (tag-before-aggregate — no join key has to match
    NULL), and a NULL-split <-> named-split duplicate counts as a
    leak on both sides."""
    from capex_data_pipeline_spark.extensions.corpus import split_leakage_report

    df = spark.createDataFrame(
        [(None, "x"), ("train", "x"), (None, "solo")],
        "split string, fp string",
    )
    rep = {
        r.split: (r.n_rows, r.n_leaked_rows)
        for r in split_leakage_report(df, "split", "fp").collect()
    }
    assert rep[None] == (2, 1)
    assert rep["train"] == (1, 1)

def test_assign_split_bounds_exact_to_stated_fractions(spark):
    """fsum bounds: the 0.7/0.2/0.1 boundary sits at exactly 0.9, so
    an external replay writing the literal 0.9 agrees to the last ulp
    (ADVICE r5: repeated addition gave 0.8999999999999999)."""
    from capex_data_pipeline_spark.extensions.corpus import (
        _cumulative_bound,
        assign_split,
    )

    assert _cumulative_bound([0.7, 0.2]) == 0.9
    assert 0.7 + 0.2 != 0.9  # the defect the helper exists to avoid
    assert _cumulative_bound([0.1] * 7) == 0.7
    df = spark.range(200).select(
        F.concat(F.lit("g"), F.col("id")).alias("g")
    )
    out = assign_split(
        df, "g", [("train", 0.7), ("val", 0.2), ("test", 0.1)]
    )
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 200

# ------------------------------------------------- BPE apply / encode


def _bpe_merge_all_reference(word, merges):
    """Independent replay of the textbook formulation: walk merges in
    rank order, each applied to ALL its occurrences left-to-right —
    validates bpe_encode_word's leftmost-lowest-rank loop against the
    other public algorithm shape."""
    syms = list(word)
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_word_matches_merge_all_formulation():
    import random

    from capex_data_pipeline_spark.extensions.corpus import bpe_encode_word

    rng = random.Random(5)
    # random merge table grown over a tiny alphabet so merges chain
    alphabet = list("abcd")
    merges, grown = [], list(alphabet)
    for _ in range(12):
        a, b = rng.choice(grown), rng.choice(grown)
        if (a, b) not in merges:
            merges.append((a, b))
            grown.append(a + b)
    ranks = {p: i for i, p in enumerate(merges)}
    for _ in range(300):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        assert bpe_encode_word(w, ranks) == _bpe_merge_all_reference(w, merges)


def test_bpe_encode_end_to_end(spark):
    from capex_data_pipeline_spark.extensions.corpus import bpe_encode

    merges = [("t", "h"), ("th", "e"), ("e", "r"), ("h", "e")]
    df = spark.createDataFrame(
        [(1, "the there her"), (2, ""), (3, None), (4, "Xy, THE!")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bpe_tokens, r.bpe_text)
        for r in bpe_encode(df, merges).collect()
    }
    # 'the'→[the]; 'there'→[the,r,e]; 'her'→(e,r) outranks (h,e)→[h,er]
    assert got[1] == (6, "the the r e h er")
    assert got[2] == (0, "")          # empty doc still present
    assert got[3] == (0, "")          # NULL doc still present
    assert got[4] == (3, "x y the")   # normalization feeds the encoder


def test_bpe_encode_guards(spark):
    from capex_data_pipeline_spark.extensions.corpus import bpe_encode

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bpe_encode(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        bpe_encode(df, [("a", "b"), ("a", "b")])


def _py_bpe_train(freqs: dict, n_merges: int):
    """Independent plain-Python BPE trainer (Sennrich formulation)."""
    from collections import Counter

    sy = {w: list(w) for w in freqs}
    merges = []
    for r in range(1, n_merges + 1):
        c = Counter()
        for w, f in freqs.items():
            s = sy[w]
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += f
        if not c:
            break
        (a, b), cnt = sorted(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((r, a, b, cnt))
        for w in sy:
            s, out, i = sy[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sy[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    import random

    from capex_data_pipeline_spark.extensions.corpus import bpe_train

    rng = random.Random(9)
    vocab = {}
    for _ in range(40):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
        vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
    text = " ".join(w for w, f in sorted(vocab.items()) for _ in range(f))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.rank, r.s1, r.s2, r.pair_count)
        for r in bpe_train(df, n_merges=10).collect()
    ]
    assert got == _py_bpe_train(vocab, 10)


def test_bpe_train_feeds_encode_and_guards(spark):
    from capex_data_pipeline_spark.extensions.corpus import (
        bpe_encode,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "the the the the the there there her her her then")],
        "doc_id long, text string",
    )
    learned = bpe_train(df, n_merges=4).collect()
    assert [(r.s1, r.s2) for r in learned] == [
        ("h", "e"), ("t", "he"), ("he", "r"), ("r", "e"),
    ]
    enc = bpe_encode(df, [(r.s1, r.s2) for r in learned]).collect()[0]
    # 'the'→the, 'there'→the+re, 'her'→her, 'then'→the+n
    assert enc.bpe_text.split(" ").count("the") == 8
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


# ------------------------- unigram-LM (SentencePiece-style) training


def _unigram_reference(texts, vocab_size=8, rounds=2, max_piece_len=4):
    """Independent enumeration-based Viterbi-EM reference: NO dynamic
    programming — every segmentation of every word is enumerated and
    the min over (cost, '|'-joined path) picked, exactly mirroring the
    q145 oracle's recursive CTE. Returns {piece: (count, prob)} plus
    the rank order."""
    import math
    import re

    words: dict = {}
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split():
            if w and len(w) <= 16:
                words[w] = words.get(w, 0) + 1

    def all_segs(word, pieces):
        if word == "":
            return [(0.0, "")]
        out = []
        for plen in range(1, min(max_piece_len, len(word)) + 1):
            head = word[:plen]
            if head not in pieces:
                continue
            for c, p in all_segs(word[plen:], pieces):
                out.append((pieces[head] + c, "|" + head + p))
        return out

    seed: dict = {}
    for w, f in words.items():
        for s in range(len(w)):
            for l in range(1, max_piece_len + 1):
                if s + l <= len(w):
                    seed[w[s : s + l]] = seed.get(w[s : s + l], 0) + f
    tot = sum(seed.values())
    costs = {p: round(-math.log(c / tot), 6) for p, c in seed.items()}
    counts = None
    for _ in range(rounds):
        counts = {}
        for w, f in words.items():
            _, path = min(all_segs(w, costs))
            for piece in path[1:].split("|"):
                counts[piece] = counts.get(piece, 0) + f
        ctot = sum(counts.values())
        costs = {p: round(-math.log(c / ctot), 6) for p, c in counts.items()}
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(ranked[:vocab_size])
    # coverage singles from the SEED frame (EM count when present,
    # else seed count) — the r9 prune semantics
    kept.update(
        {p: counts.get(p, c) for p, c in seed.items() if len(p) == 1}
    )
    ktot = sum(kept.values())
    return {
        p: (i + 1, c, round(c / ktot, 6))
        for i, (p, c) in enumerate(
            sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }


def test_unigram_best_segmentation_picks_min_cost():
    from capex_data_pipeline_spark.extensions.corpus import (
        unigram_best_segmentation,
    )

    costs = {"a": 1.0, "b": 1.0, "ab": 1.5, "abc": 10.0, "c": 1.0}
    # 'ab'+'c' (2.5) beats 'a'+'b'+'c' (3.0) and 'abc' (10.0)
    assert unigram_best_segmentation("abc", costs) == "|ab|c"
    # uncoverable word -> None
    assert unigram_best_segmentation("xyz", costs) is None
    assert unigram_best_segmentation("", costs) == ""


def test_unigram_best_segmentation_tie_breaks_on_path_string():
    from capex_data_pipeline_spark.extensions.corpus import (
        unigram_best_segmentation,
    )

    # '|a|a' vs '|aa': equal cost 2.0; byte-compare picks '|aa'
    # ('a' (0x61) < '|' (0x7c) at position 2)
    costs = {"a": 1.0, "aa": 2.0}
    assert unigram_best_segmentation("aa", costs) == "|aa"


def test_unigram_train_differential_vs_enumeration_reference(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_train

    texts = [
        "spark spark sparkle parking sparse park",
        "remark marker marking spark park parse",
        "sparse sparkle remark marker spark!",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["piece"]: (r["rank"], r["count"], r["prob"])
        for r in unigram_train(docs, vocab_size=8, rounds=2).collect()
    }
    assert got == _unigram_reference(texts, vocab_size=8, rounds=2)


def test_unigram_train_learns_repeated_subwords(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_train

    docs = spark.createDataFrame(
        [(i, "tokenization tokenizer tokenize untoken") for i in range(5)],
        "doc_id long, text string",
    )
    pieces = {
        r["piece"] for r in unigram_train(docs, vocab_size=6).collect()
    }
    assert "toke" in pieces  # the shared 4-gram dominates the model


def test_unigram_train_single_char_coverage_survives_prune(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_train

    # the rare word 'q' is covered only by its single-char piece;
    # vocab_size=1 keeps just the dominant 'aaaa', but the coverage
    # rule retains EVERY corpus single char (seed-frame singles, the
    # SentencePiece guarantee) — including 'a', whose occurrences are
    # all absorbed by the 'aaaa' piece on the best paths
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa aaaa q")], "doc_id long, text string"
    )
    rows = unigram_train(docs, vocab_size=1, rounds=1).collect()
    pieces = {r["piece"] for r in rows}
    assert pieces == {"aaaa", "a", "q"}
    # probabilities renormalize over the kept set
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-4


def test_unigram_train_coverage_when_covering_piece_is_pruned(spark):
    """Regression (r9): a char covered by a multi-char piece on every
    best path drops out of the EM counts; if that piece then misses
    the top-vocab_size cut, the old prune (singles from EM counts)
    lost the char and unigram_encode emitted <unk> for a TRAINING
    word.  Singles now come from the seed frame, so 'a'/'x' survive
    with their seed counts and "ax" stays segmentable."""
    from capex_data_pipeline_spark.extensions.corpus import (
        unigram_encode,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(0, "ax")] + [(i, "bb") for i in range(1, 40)],
        "doc_id long, text string",
    )
    model = unigram_train(docs, vocab_size=1, rounds=2)
    rows = model.collect()
    pieces = {r["piece"]: r["count"] for r in rows}
    # top-1 is 'b' (EM count 78); 'a' and 'x' re-added from the seed
    assert set(pieces) == {"b", "a", "x"}
    assert pieces["a"] == 1 and pieces["x"] == 1
    enc = unigram_encode(
        docs, {r["piece"]: 1.0 for r in rows}, max_piece_len=4
    )
    texts = {r["doc_id"]: r["piece_text"] for r in enc.collect()}
    assert texts[0] == "a x"  # not '<unk>'


def test_unigram_train_guards(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_train

    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rounds"):
        unigram_train(docs, rounds=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_train(docs, max_piece_len=0)


def test_unigram_encode_roundtrip_with_trained_model(spark):
    """Encoding the training corpus under its own trained model covers
    every word (single-char coverage -> no '<unk>') and reassembles in
    word order."""
    import math

    from capex_data_pipeline_spark.extensions.corpus import (
        unigram_encode,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(0, "tokenize tokenizer"), (1, "tokenize again"), (2, None)],
        "doc_id long, text string",
    )
    model = {
        r["piece"]: round(-math.log(r["prob"]), 6)
        for r in unigram_train(docs, vocab_size=8, rounds=2).collect()
    }
    out = {
        r["doc_id"]: (r["n_pieces"], r["piece_text"])
        for r in unigram_encode(docs, model).collect()
    }
    assert out[2] == (0, "")  # NULL doc
    for n, txt in (out[0], out[1]):
        assert n >= 2 and "<unk>" not in txt
        # pieces re-concatenate to the normalized text
    assert out[0][1].replace(" ", "") == "tokenizetokenizer"
    assert out[1][1].replace(" ", "") == "tokenizeagain"


def test_unigram_encode_unk_fallback_and_guard(spark):
    from capex_data_pipeline_spark.extensions.corpus import unigram_encode

    docs = spark.createDataFrame(
        [(0, "ab zz")], "doc_id long, text string"
    )
    out = unigram_encode(docs, {"a": 1.0, "b": 1.0}).collect()[0]
    # 'ab' -> a b; 'zz' uncoverable -> single '<unk>' piece
    assert out["piece_text"] == "a b <unk>"
    assert out["n_pieces"] == 3
    with pytest.raises(ValueError, match="non-empty"):
        unigram_encode(docs, {})


def test_unigram_segmentation_properties_hypothesis():
    """Property check over random words and random piece models: the
    DP's path always reconstructs the word exactly, never costs more
    than the all-single-chars fallback, and is deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from capex_data_pipeline_spark.extensions.corpus import (
        unigram_best_segmentation,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet="abcd", min_size=1, max_size=12),
        extra=st.dictionaries(
            st.text(alphabet="abcd", min_size=2, max_size=4),
            st.floats(0.1, 10.0, allow_nan=False),
            max_size=8,
        ),
        char_cost=st.floats(0.5, 5.0, allow_nan=False),
    )
    def check(word, extra, char_cost):
        costs = {c: char_cost for c in "abcd"}
        costs.update(extra)
        path = unigram_best_segmentation(word, costs, max_piece_len=4)
        assert path is not None
        pieces = path[1:].split("|")
        assert "".join(pieces) == word  # reconstruction
        total = sum(costs[p] for p in pieces)
        fallback = sum(costs[c] for c in word)
        assert total <= fallback + 1e-9  # never worse than single chars
        assert path == unigram_best_segmentation(word, costs, 4)

    check()


def test_tokenizer_fertility_hand_computed(spark):
    """Model {ab, a, b, c}: 'abab' -> 2 pieces, 'abc' -> 2 ('ab'+'c'
    beats 'a'+'b'+'c' on cost), 'zz' -> uncoverable -> 1 unk piece."""
    from capex_data_pipeline_spark.extensions.corpus import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(1, "abab abc", "s1"), (2, "zz abab", "s2")],
        "doc_id long, text string, source string",
    )
    pieces = {"ab": 1.0, "a": 2.0, "b": 2.0, "c": 2.0}
    rows = {
        r["source"]: r
        for r in tokenizer_fertility(docs, pieces, by="source").collect()
    }
    s1 = rows["s1"]  # abab (2 pieces) + abc (2 pieces)
    assert (s1["n_words"], s1["n_pieces"], s1["unk_words"]) == (2, 4, 0)
    assert s1["fertility"] == 2.0
    assert s1["chars_per_piece"] == round(7 / 4, 6)
    s2 = rows["s2"]  # zz -> unk (1 piece), abab -> 2
    assert (s2["n_words"], s2["n_pieces"], s2["unk_words"]) == (2, 3, 1)
    with pytest.raises(ValueError, match="non-empty"):
        tokenizer_fertility(docs, {})


def test_build_postings_hand_computed(spark):
    """Digest pins the full delta-encoded stream: docs sorted, gaps on
    the doc axis, 0-based positions sorted within doc."""
    import hashlib

    from capex_data_pipeline_spark.extensions.corpus import build_postings

    docs = spark.createDataFrame(
        [
            (3, "b a b"),      # 'b' at pos 0,2; 'a' at 1
            (10, "a a"),       # 'a' at 0,1
            (1, "c"),
        ],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in build_postings(docs, topk=10).collect()}
    a = rows["a"]
    assert (a["df"], a["cf"]) == (2, 3)
    # doc-sorted: (3, "1") then (10, "0,1"); deltas 3-0=3, 10-3=7
    enc_a = "3:1;7:0,1"
    assert a["n_bytes"] == len(enc_a)
    assert a["digest"] == hashlib.md5(enc_a.encode()).hexdigest()
    b = rows["b"]
    assert (b["df"], b["cf"]) == (1, 2)
    assert b["digest"] == hashlib.md5(b"3:0,2").hexdigest()
    assert rows["c"]["digest"] == hashlib.md5(b"1:0").hexdigest()
    with pytest.raises(ValueError, match="topk"):
        build_postings(docs, topk=0)


# ---------------------------------------------- priority sampling (q180)


def _py_priority(key, weight, seed="pr"):
    import hashlib

    h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16)
    return weight / ((h + 1) / 2**32)


def test_priority_sample_matches_python_reference(spark):
    """Sample membership, priorities, tau, and est_weight all equal an
    independent Python replay of Duffield-Lund-Thorup priority
    sampling over the same md5 hash."""
    from capex_data_pipeline_spark.extensions.corpus import priority_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    ref = sorted(
        ((kid, w, _py_priority(kid, w)) for kid, w in rows),
        key=lambda t: (-t[2], t[0]),
    )
    k = 10
    tau = ref[k][2]
    expect = {
        kid: (w, p, max(w, tau)) for kid, w, p in ref[:k]
    }
    df = spark.createDataFrame(rows, "id long, w double")
    got = {
        r["id"]: (r["weight"], r["priority"], r["est_weight"])
        for r in priority_sample(df, k=k, weight_col="w", key_col="id").collect()
    }
    assert set(got) == set(expect)
    for kid, (w, p, e) in expect.items():
        gw, gp, ge = got[kid]
        assert gw == w and gp == pytest.approx(p, rel=1e-12)
        assert ge == pytest.approx(e, rel=1e-12)
    # estimator floor: every est_weight >= tau (max(w, tau) >= tau)
    assert all(ge >= tau * (1 - 1e-12) for _, _, ge in got.values())


def test_priority_sample_small_population_and_bad_weights(spark):
    """N <= k keeps every positive-weight row with est_weight == w
    (tau = 0); zero/negative/NULL weights are excluded."""
    from capex_data_pipeline_spark.extensions.corpus import priority_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.5)],
        "id long, w double",
    )
    got = {
        r["id"]: (r["weight"], r["est_weight"])
        for r in priority_sample(df, k=10, weight_col="w", key_col="id").collect()
    }
    assert got == {1: (5.0, 5.0), 5: (2.5, 2.5)}


def test_group_priority_sample_per_group_reference(spark):
    """Per-group membership, per-group tau, and est_weight against the
    Python DLT replay; small groups keep everything with tau 0."""
    from capex_data_pipeline_spark.extensions.corpus import (
        group_priority_sample,
    )

    rows = [(f"g{i % 3}", i, float(1 + i % 9)) for i in range(90)]
    rows += [("tiny", 900, 4.0), ("tiny", 901, 2.0)]
    k = 5
    by_group = {}
    for g, kid, w in rows:
        by_group.setdefault(g, []).append((kid, w, _py_priority(kid, w)))
    expect = {}
    for g, members in by_group.items():
        members.sort(key=lambda t: (-t[2], t[0]))
        tau = members[k][2] if len(members) > k else 0.0
        for kid, w, p in members[:k]:
            expect[(g, kid)] = (w, p, max(w, tau))
    df = spark.createDataFrame(rows, "g string, id long, w double")
    got = {
        (r["g"], r["id"]): (r["weight"], r["priority"], r["est_weight"])
        for r in group_priority_sample(
            df, k=k, weight_col="w", key_col="id", group_col="g"
        ).collect()
    }
    assert set(got) == set(expect)
    for kk, (w, p, e) in expect.items():
        gw, gp, ge = got[kk]
        assert gw == w and gp == pytest.approx(p, rel=1e-12)
        assert ge == pytest.approx(e, rel=1e-12)


# ------------------------------- token budget allocation (q195)


def test_token_budget_largest_remainder(spark):
    """Hamilton allocation: floors + remainder-ranked leftovers, sums
    exactly to the budget; zero-weight sources get nothing; epochs
    flags over-subscribed sources; empty-available source divides to
    NULL."""
    from capex_data_pipeline_spark.extensions.corpus import (
        token_budget_allocation,
    )

    rows = (
        [("a", 10)] * 3 + [("b", 50)] * 2 + [("c", 1)] + [("d", 0)]
    )
    df = spark.createDataFrame(rows, "source string, tokens long")
    # weights a=2 b=1 c=1 (d default 0); budget 10 -> quotas 5, 2.5, 2.5
    # floors 5,2,2 -> leftover 1 -> remainder tie 0.5/0.5 -> 'b' wins
    got = {
        r["source"]: (
            r["available_tokens"], r["weight"], r["quota_raw"],
            r["alloc_tokens"], r["epochs"],
        )
        for r in token_budget_allocation(
            df, {"a": 2, "b": 1, "c": 1}, 10
        ).collect()
    }
    assert got["a"] == (30, 2, 5.0, 5, round(5 / 30, 6))
    assert got["b"] == (100, 1, 2.5, 3, round(3 / 100, 6))
    assert got["c"] == (1, 1, 2.5, 2, 2.0)  # 2 epochs of a tiny source
    assert got["d"] == (0, 0, 0.0, 0, None)
    assert sum(v[3] for v in got.values()) == 10

    import pytest as _pt

    with _pt.raises(ValueError):
        token_budget_allocation(df, {"a": -1}, 10)
    with _pt.raises(ValueError):
        token_budget_allocation(df, {"a": 1}, -5)
