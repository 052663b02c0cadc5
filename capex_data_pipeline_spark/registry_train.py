"""Round-7 model-training and retrieval-composition driver queries:
hashed logistic-regression training (q129) and friends.

Same contract as ``registry``: every entry pairs the Spark operator
with a full DuckDB oracle restating the semantics independently —
iterative operators unroll their rounds in MATERIALIZED CTEs exactly
like q99/q113/q115/q117.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from capex_data_pipeline_spark.registry import _t, query

#: normalized word-token list, DuckDB side (same normalization as
#: registry_ml._WORDS_ML / extensions.dedup.normalized_text)
_WORDS_TR = (
    "list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)

# ------------------------------------- q129: logistic-regression training

#: registered shape — 3 full-batch GD rounds over 64 md5 buckets with
#: lr=1.0; the label is "document mentions the word 'spark'", which a
#: hashed bag-of-words model CAN actually learn (the bucket holding
#: 'spark' takes a positive weight), so the trained model is a real
#: classifier, not noise
_TRAIN_ROUNDS = 3
_TRAIN_BUCKETS = 64
_TRAIN_LABEL_WORD = "spark"

#: per-doc md5 feature buckets, DuckDB side (binary presence, sorted
#: so the sequential weight fold is order-identical cross-engine)
_BUCKETS_SQL = (
    "list_sort(list_distinct(list_transform(ws, wd -> "
    "CAST(('0x' || substr(md5(wd), 1, 8)) AS BIGINT) "
    f"% {_TRAIN_BUCKETS})))"
)


def _logreg_round(r: int) -> str:
    """One unrolled GD round: residuals from w{r-1}, one bucket-key
    gradient aggregate (bias rides bucket -1), engine-rounded update."""
    prev = f"w{r - 1}"
    return f"""
    g{r} AS MATERIALIZED (
      SELECT k,
             round(sum(r_) / (SELECT n FROM nn), 6) + 0.0 AS g
      FROM (
        SELECT unnest(list_concat(d.bs, [CAST(-1 AS BIGINT)])) AS k,
               round(1.0 / (1.0 + exp(-round(
                 (CASE WHEN len(d.bs) = 0 THEN 0.0
                  ELSE round(list_reduce(
                         list_transform(d.bs, kk -> w.wv[CAST(kk AS INT) + 1]),
                         (a, b) -> a + b), 6) + 0.0 END) + w.b, 6)))
               , 6) + 0.0 - d.y AS r_
        FROM docs d, {prev} w
      ) GROUP BY 1
    ),
    w{r} AS MATERIALIZED (
      SELECT (SELECT list(round(w.wv[CAST(t.k AS INT) + 1]
                                - 1.0 * coalesce(g.g, 0.0), 6) + 0.0
                          ORDER BY t.k)
              FROM range(0, {_TRAIN_BUCKETS}) t(k)
              LEFT JOIN g{r} g ON g.k = t.k
              CROSS JOIN {prev} w) AS wv,
             (SELECT round(w.b - 1.0 * coalesce(
                       (SELECT g FROM g{r} WHERE k = -1), 0.0), 6) + 0.0
              FROM {prev} w) AS b
    )"""


def _logreg_sql() -> str:
    zeros = ", ".join(["0.0"] * _TRAIN_BUCKETS)
    ctes = [
        f"""docs AS MATERIALIZED (
      SELECT {_BUCKETS_SQL} AS bs,
             CAST(list_contains(ws, '{_TRAIN_LABEL_WORD}') AS INT) AS y
      FROM (SELECT {_WORDS_TR} AS ws FROM documents)
    )""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs)",
        f"w0 AS (SELECT [{zeros}]::DOUBLE[] AS wv, 0.0 AS b)",
    ]
    ctes += [_logreg_round(r).strip() for r in range(1, _TRAIN_ROUNDS + 1)]
    last = f"w{_TRAIN_ROUNDS}"
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(t.k AS INT) AS feature,
           w.wv[CAST(t.k AS INT) + 1] AS weight,
           CAST(round(w.wv[CAST(t.k AS INT) + 1] * 1000, 0) AS BIGINT)
             AS weight_milli
    FROM range(0, {_TRAIN_BUCKETS}) t(k), {last} w
    UNION ALL
    SELECT -1, w.b, CAST(round(w.b * 1000, 0) AS BIGINT) FROM {last} w
    """


@query("q129_logreg_train", _logreg_sql())
def q129_logreg_train(spark, sf_dir):
    """Hashed bag-of-words logistic-regression TRAINING
    (linalg.logreg_train, 3 full-batch GD rounds, 64 buckets): the
    training half of the fastText/DCLM quality-classifier pipeline
    whose inference half is q89 — the returned milli-unit weights plug
    straight into textstats.hashed_linear_score. Per round the corpus
    pays one map-only sigmoid-scoring pass (weights as plan literals)
    plus ONE 65-group gradient aggregate with map-side partials; the
    model rides the driver as 65 doubles. The label ("doc mentions
    'spark'") is engine-derived, so the whole train loop is
    re-derivable: the oracle replays tokenization, md5 bucketing, all
    3 rounds of residuals/gradients/updates, and the milli-unit
    quantization in unrolled MATERIALIZED CTEs."""
    from capex_data_pipeline_spark.extensions.dedup import normalized_text
    from capex_data_pipeline_spark.extensions.linalg import logreg_train

    docs = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(normalized_text(F.col("text")), " "), lambda s: s != ""
    )
    labeled = docs.select(
        "text",
        F.array_contains(words, _TRAIN_LABEL_WORD).cast("int").alias("y"),
    )
    return logreg_train(
        labeled,
        label_col="y",
        text_col="text",
        n_buckets=_TRAIN_BUCKETS,
        rounds=_TRAIN_ROUNDS,
        lr=1.0,
    )

# --------------------------------- q130: trigram perplexity filter


@query(
    "q130_trigram_perplexity",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_WORDS_TR} AS ws FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM toks WHERE len(ws) >= 3)
    ),
    c3 AS (
      SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
      FROM tri GROUP BY 1, 2, 3
    ),
    c2 AS (
      SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2 FROM c3 GROUP BY 1, 2
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
      FROM (SELECT unnest(ws) AS w FROM toks)
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_trigrams,
             round(-avg(ln((c3.c3 + 0.5) / (c2.c2 + 0.5 * vocab.v))), 6)
               + 0.0 AS avg_nll
      FROM tri t
      JOIN c3 USING (w1, w2, w3)
      JOIN c2 USING (w1, w2), vocab
      GROUP BY 1
    )
    SELECT doc_id, n_trigrams, avg_nll,
           round(exp(avg_nll), 6) + 0.0 AS ppl
    FROM scored
    """,
)
def q130_trigram_perplexity(spark, sf_dir):
    """CCNet/KenLM-style perplexity filtering
    (corpus.trigram_perplexity): every document scored by mean
    negative log-likelihood under the corpus's own add-0.5-smoothed
    trigram LM. One tokenize pass builds a persisted (id, trigram)
    frame that feeds BOTH the count aggregates and the scoring joins
    (compact word-triple keys), then one per-document aggregate; V is
    a plan literal. avg_nll is rounded before the exp so both engines
    exponentiate identical inputs. The oracle replays counts, the
    smoothed probability, and both aggregates in plain SQL."""
    from capex_data_pipeline_spark.extensions.corpus import (
        trigram_perplexity,
    )

    return trigram_perplexity(_t(spark, sf_dir, "documents"))
