"""Deduplication operators over a document corpus.

Five tiers, cheap to expensive (all shuffle only on compact keys —
fingerprints, band hashes — never on full documents):

- exact:      md5 of normalized text, hash-aggregate            (1 shuffle)
- minhash:    word-shingle MinHash signatures + LSH band join   (2 shuffles)
- simhash:    60-bit token simhash, hamming-distance pairs      (2 shuffles)
- ngram:      exact Jaccard on shingle sets for candidate pairs (explode join)
- embedding:  cosine near-duplicates within a blocking key

MinHash per Broder (1997): P[min-hash collision] = Jaccard similarity;
banding (LSH) makes the candidate-pair probability an S-curve around the
threshold. Signatures here are md5(seed || shingle) minima compared as
fixed-width hex strings — order-isomorphic to comparing the 128-bit
integers, and reproducible in any engine with md5.

At 100 TB: the signature computation is a projection (scales linearly,
no shuffle); the only shuffle moves (band_hash, doc_id) pairs — a few
dozen bytes per document. Bucket skew (a degenerate band shared by
millions of docs) is handled by AQE skew-join splitting; extreme cases
should cap bucket size upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4
DEFAULT_SHINGLE_K = 3


def normalized_text(col: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics to
    spaces, collapse runs, trim."""
    c = F.lower(F.coalesce(col.cast("string"), F.lit("")))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def text_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(normalized_text(col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per fingerprint. One hash aggregate;
    group keys are 32-byte digests, not documents."""
    return (
        df.withColumn("_fp", text_fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumnRenamed("_fp", "fingerprint")
    )


def _shingles_expr(text_col: str, k: int) -> Column:
    """transform(sequence(1, n-k+1), i -> words[i..i+k-1]) over the
    normalized word array; distinct."""
    words = f"split(trim(regexp_replace(lower(coalesce(cast({text_col} as string), '')), '[^a-z0-9]+', ' ')), ' ')"
    return F.expr(
        f"""
        array_distinct(
          CASE WHEN size({words}) < {k}
               THEN array(array_join({words}, ' '))
               ELSE transform(
                 sequence(1, size({words}) - {k} + 1),
                 i -> array_join(slice({words}, i, {k}), ' '))
          END)
        """
    )


def minhash_signature(
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = DEFAULT_SHINGLE_K,
) -> Column:
    """Array of ``num_hashes`` MinHash components; component i is the
    lexicographic minimum of md5(i || '|' || shingle) over the doc's
    shingles (hex strings compare like the underlying 128-bit ints)."""
    shingles = _shingles_expr(text_col, k)

    def seeded(i: int):
        # NB: a plain `lambda s, i=i:` would arrive at F.transform as a
        # TWO-argument lambda, which Spark binds as (element, index) —
        # the seed would silently become the array index.
        prefix = f"{i}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    comps = [F.array_min(F.transform(shingles, seeded(i))) for i in range(num_hashes)]
    return F.array(*comps)


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH-banded candidate generation + signature-estimated Jaccard.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and estimate ≥
    threshold. Only (band_hash, id, signature) tuples ever shuffle.
    """
    rows_per_band = num_hashes // bands

    def seeded(i: int):
        prefix = f"{i}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    # Shingle once into a column, then derive all hash components from it
    # (inlining the shingle expression per component would re-split the
    # text num_hashes times). Repartition first: the signature projection
    # is CPU-bound, and small corpora arrive as a single parquet split —
    # spread it across the cluster before the heavy md5 work.
    sig = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "id")
        .withColumn("_sh", _shingles_expr("_t", k))
        .select(
            "id",
            F.array(
                *[
                    F.array_min(F.transform(F.col("_sh"), seeded(i)))
                    for i in range(num_hashes)
                ]
            ).alias("sig"),
        )
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.array_join(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                "|",
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes))
    )
    return pairs.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)


def simhash60(text_col: str = "text") -> Column:
    """60-bit SimHash (Charikar 2002) over normalized word tokens.

    Token hash = first 15 hex chars of md5 (60 bits — BIGINT-safe in
    every engine). Each bit position votes +1/-1 per token; the sketch
    sets bits with a positive sum. Pure higher-order functions: one
    projection, no shuffle, no UDF.
    """
    words = f"split(trim(regexp_replace(lower(coalesce(cast({text_col} as string), '')), '[^a-z0-9]+', ' ')), ' ')"
    return F.expr(
        f"""
        aggregate(
          sequence(0, 59),
          cast(0 as bigint),
          (acc, bit) -> acc + IF(
            aggregate(
              transform({words}, w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)),
              0,
              (s, h) -> s + IF((h div shiftleft(cast(1 as bigint), bit)) % 2 = 1, 1, -1)
            ) > 0,
            shiftleft(cast(1 as bigint), bit),
            cast(0 as bigint))
        )
        """
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_col: str | None = "source",
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Candidate blocking on ``block_col`` (at scale: replace with the
    standard 4-segment simhash split so any pair within distance 3
    shares one exact segment — same join shape, engine-side)."""
    s = (
        df.select(
            F.col(id_col).alias("id"),
            (F.col(block_col) if block_col else F.lit("all")).alias("blk"),
            F.col(text_col).alias("_t"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "id")
        .select("id", "blk", simhash60("_t").alias("sh"))
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-k-gram Jaccard for pairs sharing a blocking key.

    Explode-join formulation: shuffle carries (shingle, id) pairs; the
    per-pair intersection count is a hash aggregate. Identical SQL runs
    on any engine — no array-intersect builtins needed.
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("blk"),
            F.col(text_col).alias("_t"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "id")
        .select("id", "blk", _shingles_expr("_t", k).alias("sh"))
    )
    sizes = sh.select("id", "blk", F.size("sh").alias("n"))
    exploded = sh.select("id", "blk", F.explode("sh").alias("g"))
    a, b = exploded.alias("a"), exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicates within a blocking key, entirely in
    higher-order functions (JVM-side dot products)."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (norm(F.col("a.v")) * norm(F.col("b.v"))), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
