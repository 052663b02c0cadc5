"""Round-7 ML-adjacent driver queries: engine-portable PCA power
iteration (q117), trigram language modeling (q118), Bloom-filter
decontamination (q119), HTML main-text/link extraction (q120), and
product-quantization ANN (q121).

Same contract as ``registry``: every entry pairs the Spark operator
with a full DuckDB oracle restating the semantics independently —
iterative operators unroll their rounds in MATERIALIZED CTEs exactly
like q99/q113/q115.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from capex_data_pipeline_spark.registry import _t, query

# ------------------------------------------------ q117: PCA power iteration

#: registered shape — enough rounds that the direction visibly moves
#: off the uniform init at every SF, small enough the unrolled oracle
#: stays readable
_PCA_ROUNDS = 4

#: shared projection fold: round(sequential (x-mu)·v fold, 6) + 0.0,
#: the same IEEE op order as the engine's 0.0-seeded F.aggregate
_PCA_PROJ = """
  round(list_reduce(list_transform(range(1, len(p.v) + 1),
        i -> (p.v[i] - m.mv[i]) * w.vv[i]), (a, b) -> a + b), 6) + 0.0
"""

#: one per-dim update step: t_d = round(avg(s·(x_d-μ_d)), 6) + 0.0
_PCA_T = """
  SELECT e.dim AS dim, round(avg(s * (e.x - m.mv[e.dim + 1])), 6) + 0.0 AS t
  FROM (SELECT s, unnest(list_transform(range(1, len(v) + 1),
               i -> {{'dim': i - 1, 'x': v[i]}})) AS e FROM s{r}), mu m
  GROUP BY 1
"""


def _pca_sql() -> str:
    ctes = [
        """pts0 AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
    )""",
        "dd AS (SELECT min(len(v)) AS d FROM pts0)",
        """pts AS MATERIALIZED (
      SELECT p.vec_id, p.v FROM pts0 p, dd WHERE len(p.v) = dd.d
    )""",
        """mu AS MATERIALIZED (
      SELECT list(m ORDER BY dim) AS mv FROM (
        SELECT e.dim AS dim, round(avg(e.x), 6) + 0.0 AS m
        FROM (SELECT unnest(list_transform(range(1, len(v) + 1),
                     i -> {'dim': i - 1, 'x': v[i]})) AS e FROM pts)
        GROUP BY 1)
    )""",
        """v0 AS (
      SELECT list_transform(mv, x -> round(1.0 / sqrt(len(mv)), 6)) AS vv
      FROM mu
    )""",
    ]
    for r in range(1, _PCA_ROUNDS + 1):
        ctes.append(
            f"""s{r} AS MATERIALIZED (
      SELECT p.vec_id, p.v, {_PCA_PROJ} AS s
      FROM pts p, mu m, v{r - 1} w
    )"""
        )
        ctes.append(f"t{r} AS MATERIALIZED ({_PCA_T.format(r=r)})")
        ctes.append(
            f"n{r} AS (SELECT round(sqrt(sum(t * t)), 6) AS nn FROM t{r})"
        )
        ctes.append(
            f"""v{r} AS (
      SELECT list(coalesce(round(t / nullif(nn, 0.0), 6) + 0.0,
                           w.vv[dim + 1]) ORDER BY dim) AS vv
      FROM t{r}, n{r}, v{r - 1} w
    )"""
        )
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT p.vec_id, {_PCA_PROJ} AS score "
        f"FROM pts p, mu m, v{_PCA_ROUNDS} w"
    )


@query("q117_pca_projection", _pca_sql())
def q117_pca_projection(spark, sf_dir):
    """Top-principal-component projection via power iteration
    (linalg.pca_power_projection, 4 rounds): per round a map-only
    scalar projection s = (x-μ)·v against plan-literal μ/v plus ONE
    d-group per-dimension mean aggregate — the covariance matrix is
    never formed (O(n·d) per round, not O(n·d²)), and the model rides
    the driver as d doubles, the same scale shape as q115's k-means.
    The oracle re-derives the mean, the deterministic 1/√d init, all 4
    projection/update/normalize rounds, and the final scores
    value-exact in unrolled MATERIALIZED CTEs."""
    from capex_data_pipeline_spark.extensions.linalg import (
        pca_power_projection,
    )

    return pca_power_projection(
        _t(spark, sf_dir, "embeddings"), rounds=_PCA_ROUNDS
    )

# ------------------------------------------------ q118: trigram LM

#: normalized word-token list, DuckDB side (same normalization as
#: registry_search._WORDS_SRCH / extensions.dedup.normalized_text)
_WORDS_ML = (
    "list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)

_LM_MIN_CONTEXT = 5
_LM_TOPK = 3


@query(
    "q118_trigram_lm",
    f"""
    WITH toks AS MATERIALIZED (SELECT {_WORDS_ML} AS ws FROM documents),
    tri AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
      FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i
            FROM toks WHERE len(ws) >= 3)
    ),
    c3 AS (
      SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS tri_count
      FROM tri GROUP BY 1, 2, 3
    ),
    c2 AS (
      SELECT w1, w2, CAST(sum(tri_count) AS BIGINT) AS ctx_count
      FROM c3 GROUP BY 1, 2
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT unnest(ws) AS w FROM toks)
    ),
    ranked AS (
      SELECT c3.w1, c3.w2, c3.w3, tri_count, ctx_count,
             round((tri_count + 0.5) / (ctx_count + 0.5 * v), 6) AS prob,
             CAST(row_number() OVER (
               PARTITION BY c3.w1, c3.w2
               ORDER BY tri_count DESC, c3.w3 ASC) AS INT) AS rank
      FROM c3 JOIN c2 USING (w1, w2), vocab
      WHERE ctx_count >= {_LM_MIN_CONTEXT}
    )
    SELECT * FROM ranked WHERE rank <= {_LM_TOPK}
    """,
)
def q118_trigram_lm(spark, sf_dir):
    """Trigram language model with add-0.5 smoothing
    (corpus.trigram_lm_topk): KenLM-style count collection — trigrams
    built map-side from each document's token array (no token-row
    window, no self-join), ONE hash aggregate on compact (w1,w2,w3)
    keys, context counts and top-3 ranking on the already-tiny counts
    frame. The CCNet-style precursor to perplexity filtering. The
    oracle re-derives counts, smoothing, and ranks in plain SQL."""
    from capex_data_pipeline_spark.extensions.corpus import trigram_lm_topk

    return trigram_lm_topk(
        _t(spark, sf_dir, "documents"),
        min_context=_LM_MIN_CONTEXT,
        topk=_LM_TOPK,
    )

# ------------------------------------------------ q119: Bloom decontamination

#: DuckDB-side word 3-gram shingles (identical to registry_ext._SHINGLES)
_SHINGLES_ML = f"""
  list_distinct(CASE WHEN len({_WORDS_ML}) < 3
    THEN [array_to_string({_WORDS_ML}, ' ')]
    ELSE list_transform(range(1, len({_WORDS_ML}) - 1),
                        i -> array_to_string(({_WORDS_ML})[i:i+2], ' '))
  END)
"""

_BLOOM_M = 1 << 18
_BLOOM_K = 3
_BLOOM_MIN_OVERLAP = 5

#: Bloom position j of shingle s, DuckDB side (60-bit md5 prefix mod m)
_BLOOM_POS = (
    "CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || s), 1, 15)) "
    f"AS BIGINT) % {_BLOOM_M}"
)


@query(
    "q119_bloom_contamination",
    f"""
    WITH bench AS (
      SELECT DISTINCT s
      FROM (SELECT unnest(list_filter({_SHINGLES_ML}, x -> x <> '')) AS s
            FROM documents WHERE source = 'src0')
    ),
    hj AS (SELECT unnest(range(0, {_BLOOM_K})) AS j),
    pos AS (SELECT DISTINCT {_BLOOM_POS} AS p FROM bench, hj),
    corpus AS (
      SELECT doc_id, list_filter({_SHINGLES_ML}, x -> x <> '') AS shs
      FROM documents WHERE source <> 'src0'
    ),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM corpus),
    hits AS (
      SELECT e.doc_id, e.s, count(pos.p) AS nh
      FROM (SELECT doc_id, s, {_BLOOM_POS} AS p FROM ex, hj) e
      LEFT JOIN pos USING (p)
      GROUP BY 1, 2
    ),
    perdoc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(CASE WHEN nh = {_BLOOM_K} THEN 1 END) AS BIGINT)
               AS n_flagged
      FROM hits GROUP BY 1
    )
    SELECT c.doc_id,
           coalesce(n_shingles, 0) AS n_shingles,
           coalesce(n_flagged, 0) AS n_flagged,
           coalesce(n_flagged, 0) >= {_BLOOM_MIN_OVERLAP} AS contaminated
    FROM corpus c LEFT JOIN perdoc USING (doc_id)
    """,
)
def q119_bloom_contamination(spark, sf_dir):
    """Bloom-filter decontamination (corpus.bloom_contamination,
    m=2^18 bits, 3 md5 hashes): q47's semantics when the benchmark
    digest set is too big to broadcast exactly — the bitset broadcast
    is capped at a CONSTANT (≤ m positions) regardless of benchmark
    size, false negatives impossible, false positives engine-portable
    (deterministic md5 positions). The oracle re-derives the filter —
    including any collisions — bit-for-bit in SQL."""
    from capex_data_pipeline_spark.extensions.corpus import (
        bloom_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    return bloom_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        k=3,
        m_bits=_BLOOM_M,
        n_hashes=_BLOOM_K,
        min_overlap=_BLOOM_MIN_OVERLAP,
    )
