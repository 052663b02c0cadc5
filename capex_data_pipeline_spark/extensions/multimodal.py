"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, partition-sized Arrow batches,
``mapInPandas`` signatures, deterministic feature shapes — is real and
tested. The actual media decode is INJECTABLE: pass ``decode_media``
any ``bytes -> (width, height, n_frames, features)`` callable (e.g. a
Pillow wrapper) and it runs inside the Arrow batches. The container
has no image/audio libraries, so without a decoder the call raises
NotImplementedError; ``fake=True`` selects the built-in deterministic
fake decoder (byte statistics standing in for pixels), which exercises
the identical plumbing.

At scale: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
metadata-only queries never touch payload bytes thanks to Parquet
column pruning — keep payloads in their own column, filter on metadata
first.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from the documents corpus: payload
    = utf-8 bytes of the text (a stand-in blob), metadata derived
    JVM-side (no Python in this path)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("sha"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: byte statistics standing in for pixel
    data. Real decoders (Pillow/ffmpeg/soundfile) drop into this exact
    spot with the same signature."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    n_frames = 1 + (n % 4)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = payload[i::FEATURE_DIM]
        feats.append(round(sum(chunk) / (len(chunk) or 1) / 255.0, 6))
    return width, height, n_frames, feats


#: the decoder contract: payload bytes -> (width, height, n_frames,
#: features[FEATURE_DIM]). Real decoders (Pillow/ffmpeg/soundfile) wrap
#: into this signature; the callable must be picklable (module-level
#: function or functools.partial), since it ships to executors.
Decoder = "Callable[[bytes], tuple[int, int, int, list[float]]]"


def decode_media(
    media: DataFrame,
    fake: bool = False,
    decoder=None,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow-batched; one
    Python worker per partition, vectorized within each batch).

    The decode step is injectable: pass ``decoder`` — any callable
    ``bytes -> (width, height, n_frames, features)`` — and it runs
    inside the Arrow batches with no engine changes (a user with Pillow
    plugs in ``lambda``-free module function without forking).
    ``fake=True`` selects the built-in deterministic ``_fake_decode``
    (byte statistics standing in for pixels — the plumbing-test
    instance of the same contract). With neither, the call raises
    NotImplementedError at executor time: this container ships no media
    libraries.
    """
    decode = decoder if decoder is not None else (_fake_decode if fake else None)

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode is None:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present "
                    "in this environment; pass decoder=<callable> to inject one "
                    "or fake=True for the deterministic plumbing-test decoder"
                )
            out = {
                "media_id": [],
                "mime": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "features": [],
            }
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                w, h, nf, feats = decode(bytes(payload or b""))
                out["media_id"].append(mid)
                out["mime"].append(mime)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (posexplode of a frame-index sequence — JVM-side)."""
    return decoded.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("pos", "frame_idx"),
    ).select("media_id", "frame_idx")
