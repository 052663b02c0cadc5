"""Text-analysis operators: deterministic unit semantics (cross-engine
value equality is covered by the q40-q43 oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capex_data_pipeline_spark.extensions.dedup import embedding_near_dups
from capex_data_pipeline_spark.extensions.textstats import (
    bpe_ish_token_count,
    lang_id,
    quality_metrics,
    rolling_fingerprint_expr,
    whitespace_token_count,
    word_count,
)


def _one(spark, text, col_builder):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_builder(F.col("text")).alias("v")).collect()[0].v


def test_token_counts(spark):
    t = "Hello, world!  It's 42 degrees."
    assert _one(spark, t, whitespace_token_count) == 5
    assert _one(spark, t, word_count) == 5  # Hello world It's 42 degrees
    # BPE-ish: contractions split, punctuation runs grouped
    assert _one(spark, t, bpe_ish_token_count) >= 8
    assert _one(spark, "", whitespace_token_count) == 0
    assert _one(spark, None, whitespace_token_count) == 0


def test_lang_id_markers(spark):
    cases = {
        "the cat and the dog of the house is big": "en",
        "der hund und die katze ist nicht da": "de",
        "le chat et la maison est pas grande": "fr",
        "el gato y los perros es como siempre": "es",
        "xyzzy plugh": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r.text: r.l for r in df.select("text", lang_id(F.col("text")).alias("l")).collect()}
    assert got == cases


def test_quality_score_bounds(spark):
    good = "the quick brown fox jumps over the lazy dog in a calm meadow"
    bad = "!!!! ???? ;;;; ::::"
    df = spark.createDataFrame([(good,), (bad,)], "text string")
    m = quality_metrics(F.col("text"))
    rows = {r.text: r for r in df.select("text", m["quality_score"].alias("q"),
                                         m["punct_ratio"].alias("p")).collect()}
    assert rows[good].q == 1.0
    assert rows[bad].q <= 0.5
    assert rows[bad].p > 0.5


def test_rolling_fingerprint_local_edit_invariance(spark):
    base = " ".join(f"w{i}" for i in range(40))
    edited_tail = base.rsplit(" ", 1)[0] + " CHANGED"
    df = spark.createDataFrame([(0, base), (1, base), (2, edited_tail)], "id long, text string")
    fps = {r.id: r.fp for r in df.select("id", rolling_fingerprint_expr("text").alias("fp")).collect()}
    assert fps[0] == fps[1]
    # a tail edit usually leaves the minimal shingle untouched — but at
    # minimum the fingerprint stays deterministic and non-null
    assert fps[2] is not None and len(fps[2]) == 32


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (1, [0.999, 0.01, 0.0], 1),   # near-dup of 0
        (2, [0.0, 1.0, 0.0], 1),      # orthogonal
        (3, [1.0, 0.0, 0.0], 2),      # identical to 0 but other block
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dups(
            df, block_col="label", threshold=0.95, dim=3
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert not any(2 in p or 3 in p for p in pairs)

    # without the block constraint the identical cross-block pair appears
    # (candidates come from the SRP buckets alone)
    global_pairs = {
        (r.id_a, r.id_b) for r in embedding_near_dups(df, threshold=0.95, dim=3).collect()
    }
    assert (0, 3) in global_pairs


def test_sketch_swaps_stay_within_documented_error(spark):
    """q73 documents percentile -> percentile_approx and A4 documents
    countDistinct -> approx_count_distinct as the 100 TB swaps (single-
    pass mergeable sketches). Pin that the swapped estimators actually
    land near the exact answers on the corpus, so the documented claim
    stays true as data or Spark versions move."""
    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.sources.parquet import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    row = docs.agg(
        F.expr("percentile(n_chars, 0.9)").alias("p90_exact"),
        F.expr("percentile_approx(n_chars, 0.9, 10000)").alias("p90_sketch"),
        F.countDistinct("text").alias("nd_exact"),
        F.expr("approx_count_distinct(text, 0.02)").alias("nd_sketch"),
    ).collect()[0]
    # t-digest at accuracy 10000 on 500 rows: within 2% of exact
    assert abs(row["p90_sketch"] - row["p90_exact"]) <= 0.02 * row["p90_exact"]
    # HLL++ at rsd 2%: within 3 x rsd of the exact distinct count
    assert abs(row["nd_sketch"] - row["nd_exact"]) <= 0.06 * row["nd_exact"]


def test_hashed_linear_score_exact_and_map_only(spark):
    """Hand-compute the hashed-bucket score for a 2-word doc and pin
    that the whole scoring pass is map-only (no Exchange)."""
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from capex_data_pipeline_spark.extensions.textstats import (
        hashed_linear_score,
    )

    w = [((i * 7) % 21) - 10 for i in range(16)]

    def bucket(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 16

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    cols = hashed_linear_score(F.col("text"), w)
    out = df.select(
        "doc_id",
        cols["score_milli"].alias("s"),
        cols["n_terms"].alias("n"),
    )
    got = {r["doc_id"]: (r["s"], r["n"]) for r in out.collect()}
    assert got[1] == (w[bucket("alpha")] + w[bucket("beta")], 2)
    assert got[2] == (0, 0) and got[3] == (0, 0)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # model scoring is a pure projection

    with pytest.raises(ValueError, match="n_buckets"):
        hashed_linear_score(F.col("text"), w, n_buckets=8)


# --------------------------------------------------- character entropy


def _entropy_cols(spark, texts):
    from capex_data_pipeline_spark.extensions.textstats import char_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cols = char_entropy(F.col("text"))
    return {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            cols["n_chars_norm"].alias("n"),
            cols["n_distinct_chars"].alias("d"),
            cols["entropy_nats"].alias("h"),
        ).collect()
    }


def test_char_entropy_uniform_and_degenerate(spark):
    import math

    got = _entropy_cols(spark, ["abcd", "aaaa", "", "?!,."])
    assert got[0].h == pytest.approx(math.log(4), abs=2e-6)
    assert got[0].n == 4 and got[0].d == 4
    # single-symbol text: zero entropy, and not IEEE -0.0
    assert got[1].h == 0.0 and str(got[1].h) != "-0.0"
    # empty + punctuation-only normalize to '' -> entropy undefined
    assert got[2].h is None and got[2].n == 0
    assert got[3].h is None and got[3].n == 0


def test_char_entropy_hand_computed_mixed(spark):
    import math

    # "A.b!" normalizes to "a b": counts {a:1, ' ':1, b:1} -> ln(3)
    # "aab" -> {a:2, b:1}: ln(3) - (2 ln 2)/3
    got = _entropy_cols(spark, ["A.b!", "aab"])
    assert got[0].n == 3 and got[0].d == 3
    assert got[0].h == pytest.approx(math.log(3), abs=2e-6)
    assert got[1].h == pytest.approx(
        math.log(3) - (2 * math.log(2)) / 3, abs=2e-6
    )


def test_char_entropy_null_text(spark):
    got = _entropy_cols(spark, [None])
    assert got[0].h is None and got[0].n == 0 and got[0].d == 0


def test_char_entropy_arrow_matches_native_fold(spark):
    """The Arrow fast path (add_char_entropy) and the native fold
    (char_entropy_struct) are the same operator: pin equality on a
    corpus covering empty/null/punct-only/repeated/mixed docs plus the
    real sf0.001 documents table."""
    from capex_data_pipeline_spark.extensions.textstats import (
        add_char_entropy,
        char_entropy_struct,
    )
    from capex_data_pipeline_spark.sources.parquet import read_table

    synth = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "?!,."),
            (3, "aaaa"),
            (4, "A.b!"),
            (5, "The quick brown fox 123 -- jumps!"),
        ],
        "doc_id long, text string",
    )
    real = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    for df in (synth, real):
        native = {
            r.doc_id: (r.n_chars_norm, r.n_distinct_chars, r.entropy_nats)
            for r in df.select(
                "doc_id", char_entropy_struct(F.col("text")).alias("_e")
            ).select("doc_id", "_e.n_chars_norm", "_e.n_distinct_chars",
                     "_e.entropy_nats").collect()
        }
        arrow = {
            r.doc_id: (r.n_chars_norm, r.n_distinct_chars, r.entropy_nats)
            for r in add_char_entropy(df, "text")
            .select("doc_id", "n_chars_norm", "n_distinct_chars",
                    "entropy_nats")
            .collect()
        }
        assert set(native) == set(arrow)
        for d in native:
            assert native[d][:2] == arrow[d][:2], d
            a, b = native[d][2], arrow[d][2]
            assert (a is None) == (b is None), d
            if a is not None:
                assert a == pytest.approx(b, abs=2e-6), d


def test_curriculum_buckets_quartiles_and_ties(spark):
    """Exact quartile thresholds over 1..8: q25/50/75 = 2.75/4.5/6.25;
    strictly-greater fold puts values at/below a threshold in the
    lower bucket; NULL scores keep a NULL bucket."""
    from capex_data_pipeline_spark.extensions.textstats import (
        curriculum_buckets,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)] + [(99, None)],
        "doc_id long, s double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in curriculum_buckets(df, "s", n_buckets=4).collect()
    }
    assert got == {
        1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3, 99: None
    }


def test_curriculum_buckets_equal_scores_single_bucket(spark):
    """A constant score column: all thresholds equal the score, the
    strict > fold sends everything to bucket 0."""
    from capex_data_pipeline_spark.extensions.textstats import (
        curriculum_buckets,
    )

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)], "doc_id long, s double"
    )
    rows = curriculum_buckets(df, "s", n_buckets=3).collect()
    assert {r["bucket"] for r in rows} == {0}


def test_curriculum_buckets_plan_and_guard(spark):
    """No global sort / single-partition window: the thresholds are
    one keyless aggregate broadcast back (BroadcastNestedLoopJoin of
    a 1-row frame, the q105 pattern)."""
    from capex_data_pipeline_spark.extensions.textstats import (
        curriculum_buckets,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "doc_id long, s double"
    )
    plan = (
        curriculum_buckets(df, "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="n_buckets"):
        curriculum_buckets(df, "s", n_buckets=1)


# ------------------------------------------ RAKE keywords (q191)


def test_rake_keywords_hand_computed(spark):
    """Classic RAKE arithmetic on a crafted corpus where 'the' and 'of'
    dominate (become data-derived stopwords) and a repeated two-word
    phrase outscores singletons via the degree term."""
    from capex_data_pipeline_spark.extensions.textstats import rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "the deep learning of the deep learning"),
            (2, "the deep learning of models"),
            (3, "of the sky of"),
        ],
        "doc_id long, text string",
    )
    # word counts: the=4, of=4, deep=3, learning=3, models=1, sky=1
    # stopwords (top-2): 'of' and 'the'
    out = {
        r["phrase"]: (r["n_words"], r["n_occurrences"], r["score"])
        for r in rake_keywords(
            docs, "text", "doc_id", n_stopwords=2, k=10
        ).collect()
    }
    # phrases: 'deep learning' x3, 'models' x1, 'sky' x1
    # deg(deep)=deg(learning)=6, freq=3 -> score 2.0 each
    # 'deep learning' = 4.0; models = 1.0; sky = 1.0
    assert out["deep learning"] == (2, 3, 4.0)
    assert out["models"] == (1, 1, 1.0)
    assert out["sky"] == (1, 1, 1.0)
    assert len(out) == 3


def test_rake_keywords_empty_and_all_stop(spark):
    """Docs that are empty or dissolve entirely into stopwords yield
    no phrases; k bounds the report."""
    from capex_data_pipeline_spark.extensions.textstats import rake_keywords

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, ""), (3, None), (4, "a b a b c")],
        "doc_id long, text string",
    )
    # counts: a=5, b=3, c=1 -> stopwords(top-2) = {a, b}
    out = rake_keywords(docs, "text", "doc_id", n_stopwords=2, k=1).collect()
    assert [(r["phrase"], r["score"]) for r in out] == [("c", 1.0)]
