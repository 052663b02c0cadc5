"""Perceptual image hashing + multimodal near-dup tests: grayscale
extraction from genuine BMP/PNG container bytes, dHash/aHash semantics
(hand-computed grids, brightness/scale invariance), the 64-bit
pigeonhole pairing (two's-complement hashes through the logical-shift
segment split), and the image_near_dups composition end-to-end through
mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest

from capex_data_pipeline_spark.extensions.multimodal import (
    _resize_area,
    ahash_bits,
    char_grid_pixelizer,
    dhash_bits,
    documents_as_media,
    gray_pixels,
    image_hashes,
    image_near_dups,
)
from test_extensions import _make_bmp, _make_png


# ------------------------------------------------ grayscale extraction


def test_gray_pixels_bmp_values_and_row_order():
    """24-bpp BMP: gray = channel mean, rows flipped from the
    container's bottom-up order to image order."""
    # pixel_fn(x, y) runs y=0 first, which lands at the BOTTOM of the
    # image; gray_pixels must return image order (top row first)
    payload, _ = _make_bmp(3, 2, lambda x, y: (x * 30, x * 30, x * 30 + y * 3))
    g = gray_pixels(payload)
    assert g.shape == (2, 3)
    # image top row = pixel_fn y=1: mean(b,g,r) = x*30 + 1
    assert g[0].tolist() == [1.0, 31.0, 61.0]
    assert g[1].tolist() == [0.0, 30.0, 60.0]


def test_gray_pixels_bmp_top_down():
    import struct

    payload, _ = _make_bmp(3, 2, lambda x, y: (y * 10, y * 10, y * 10))
    td = bytearray(payload)
    struct.pack_into("<i", td, 22, -2)  # negative height = top-down
    g = gray_pixels(bytes(td))
    assert g[0].tolist() == [0.0, 0.0, 0.0]
    assert g[1].tolist() == [10.0, 10.0, 10.0]


def test_gray_pixels_png_gray_rgb_rgba():
    rows = [bytes([10, 20, 30]), bytes([40, 50, 60])]
    g = gray_pixels(_make_png(3, 2, rows, color=0))
    assert g.tolist() == [[10, 20, 30], [40, 50, 60]]
    # RGB: gray = channel mean
    rgb = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 0, 0, 0])]
    g2 = gray_pixels(_make_png(2, 2, rgb, color=2))
    assert g2.tolist() == [[20.0, 50.0], [80.0, 0.0]]
    # RGBA: alpha ignored
    rgba = [bytes([10, 20, 30, 255, 40, 50, 60, 0])]
    g3 = gray_pixels(_make_png(2, 1, rgba, color=6))
    assert g3.tolist() == [[20.0, 50.0]]


def test_gray_pixels_rejects_palette_and_unknown():
    pal = [bytes([0, 1])]
    png = _make_png(2, 1, pal, color=3, depth=8, palette=bytes(range(6)))
    with pytest.raises(ValueError, match="palette"):
        gray_pixels(png)
    with pytest.raises(ValueError, match="container"):
        gray_pixels(b"GIF89a....")


# ------------------------------------------------------- hash semantics


def test_dhash_monotone_gradients():
    mono = np.tile(np.arange(9, dtype=float), (8, 1))
    assert dhash_bits(mono) == -1  # all 64 bits set, two's complement
    assert dhash_bits(mono, n_bits=60) == (1 << 60) - 1
    assert dhash_bits(np.ascontiguousarray(mono[:, ::-1])) == 0


def test_dhash_brightness_and_scale_invariance():
    rng = np.random.default_rng(42)
    base = rng.integers(0, 200, size=(32, 36)).astype(float)
    h0 = dhash_bits(base)
    assert dhash_bits(base + 40.0) == h0  # uniform brightness shift
    # 2x nearest-neighbor upscale: every 8x9 box mean doubles uniformly
    up = np.kron(base, np.ones((2, 2)))
    assert dhash_bits(up) == h0


def test_ahash_half_bright_grid():
    half = np.zeros((8, 8))
    half[:, 4:] = 255.0
    expected = 0
    for b in range(64):
        if b % 8 >= 4:
            expected |= 1 << b
    expected -= 1 << 64  # bit 63 set -> negative long
    assert ahash_bits(half) == expected


def test_resize_area_identity_and_means():
    g = np.arange(72, dtype=float).reshape(8, 9)
    assert _resize_area(g, 8, 9).tolist() == g.tolist()
    # 2x2 -> 1x1 is the plain mean
    assert _resize_area(np.array([[1.0, 3.0], [5.0, 7.0]]), 1, 1)[0, 0] == 4.0


def test_char_grid_pixelizer_exact_code_points():
    g = char_grid_pixelizer(b"abc")
    assert g.shape == (8, 9)
    assert g[0][:4].tolist() == [97.0, 98.0, 99.0, 0.0]
    assert g[7].tolist() == [0.0] * 9


# ------------------------------------- pigeonhole pairing over 64 bits


def test_hamming_near_dups_two_complement_64bit(spark):
    """Hashes with bit 63 set (negative longs) must pair correctly:
    the segment split uses the LOGICAL shift, so the sign bit cannot
    smear across segments."""
    from capex_data_pipeline_spark.extensions.dedup import hamming_near_dups

    base = (1 << 63) | (1 << 62) | 0xABCDEF
    rows = [
        (1, base - (1 << 64)),             # negative long
        (2, (base ^ 0b101) - (1 << 64)),   # hamming 2 from id 1
        (3, (base ^ 0xFF) - (1 << 64)),    # hamming 8 — out of range
        (4, 0x123456789),                  # positive, unrelated
    ]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dups(
            df, "phash", id_col="media_id", n_bits=64, max_hamming=3
        ).collect()
    }
    assert got == {(1, 2, 2)}


def test_hamming_near_dups_exact_match_64bit(spark):
    """Regression (r9): max_hamming=0 with n_bits=64 made the segment
    width 64, whose mask (1<<64)-1 overflows LongType at plan build.
    The single segment is now a direct equality join on the sketch."""
    from capex_data_pipeline_spark.extensions.dedup import hamming_near_dups

    neg = (1 << 63) | 0xCAFE
    rows = [
        (1, neg - (1 << 64)),
        (2, neg - (1 << 64)),    # identical -> pairs at hamming 0
        (3, (neg ^ 1) - (1 << 64)),  # hamming 1 -> excluded
        (4, 42),
        (5, 42),
    ]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dups(
            df, "phash", id_col="media_id", n_bits=64, max_hamming=0
        ).collect()
    }
    assert got == {(1, 2, 0), (4, 5, 0)}


def test_simhash_near_dups_unchanged_by_refactor(spark):
    """The shared pigeonhole extraction must not change text simhash
    results: identical texts pair at hamming 0."""
    from capex_data_pipeline_spark.extensions.dedup import simhash_near_dups

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    assert got == {(1, 2, 0)}


# --------------------------------------------- end-to-end compositions


def _bmp_media_df(spark):
    """Three images: #1 and #2 same content at different scales (near
    dups), #3 different content."""
    grad = lambda x, y: (x * 7, x * 7, x * 7)  # noqa: E731
    p1, _ = _make_bmp(18, 16, grad)
    p2, _ = _make_bmp(36, 32, lambda x, y: grad(x // 2, y // 2))
    p3, _ = _make_bmp(18, 16, lambda x, y: (250 - x * 9, 10, (x * y) % 251))
    return spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2)), (3, bytearray(p3))],
        "media_id long, payload binary",
    )


def test_image_hashes_mapinpandas(spark):
    media = _bmp_media_df(spark)
    rows = {r["media_id"]: r["phash"] for r in image_hashes(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == rows[2]  # scale-invariant
    assert rows[1] != rows[3]


def test_image_near_dups_end_to_end(spark):
    media = _bmp_media_df(spark)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(media, max_hamming=3).collect()
    }
    assert got == {(1, 2, 0)}
    # ahash variant agrees on this corpus
    got_a = {
        (r["id_a"], r["id_b"])
        for r in image_near_dups(media, kind="ahash", max_hamming=3).collect()
    }
    assert got_a == {(1, 2)}
    with pytest.raises(ValueError, match="kind"):
        image_near_dups(media, kind="phash9000")


def test_image_near_dups_plan_is_equi_join(spark):
    plan = (
        image_near_dups(_bmp_media_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_char_grid_q144_shape_matches_text_dups(spark):
    """The registered q144 instance: identical texts -> hamming 0."""
    docs = spark.createDataFrame(
        [
            (1, "spark is a unified analytics engine for large-scale data"),
            (2, "spark is a unified analytics engine for large-scale data"),
            (3, "entirely unrelated words that hash somewhere different!!"),
        ],
        "doc_id long, text string",
    )
    media = documents_as_media(docs)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(
            media, pixelizer=char_grid_pixelizer, n_bits=60, max_hamming=3
        ).collect()
    }
    assert got == {(1, 2, 0)}


def test_image_cluster_composition(spark):
    """Pairs -> connected components -> canonical keeper, over media:
    the two scaled copies cluster together with the lower id as
    keeper; the distinct image is a singleton."""
    from capex_data_pipeline_spark.extensions.dedup import dedup_clusters

    media = _bmp_media_df(spark)
    pairs = image_near_dups(media, max_hamming=3)
    got = {
        r["media_id"]: (r["cluster_id"], r["cluster_size"], r["is_keeper"])
        for r in dedup_clusters(
            pairs, corpus=media.select("media_id"), id_col="media_id"
        ).collect()
    }
    assert got == {
        1: (1, 2, True),
        2: (1, 2, False),
        3: (3, 1, True),
    }


def test_image_hashes_multi_matches_single_passes(spark):
    """One decode pass, both families: the (dhash, ahash) columns must
    equal the per-kind image_hashes outputs exactly."""
    from capex_data_pipeline_spark.extensions.multimodal import (
        char_grid_pixelizer,
        documents_as_media,
        image_hashes,
        image_hashes_multi,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "completely different content right here ok then"),
         (3, "")],
        "doc_id long, text string",
    )
    media = documents_as_media(docs)
    multi = {
        r["media_id"]: (r["dhash"], r["ahash"])
        for r in image_hashes_multi(
            media, pixelizer=char_grid_pixelizer, n_bits=60
        ).collect()
    }
    dh = {
        r["media_id"]: r["phash"]
        for r in image_hashes(
            media, pixelizer=char_grid_pixelizer, kind="dhash", n_bits=60
        ).collect()
    }
    ah = {
        r["media_id"]: r["phash"]
        for r in image_hashes(
            media, pixelizer=char_grid_pixelizer, kind="ahash", n_bits=60
        ).collect()
    }
    assert multi == {k: (dh[k], ah[k]) for k in dh}


def test_image_hash_agreement_identical_payloads(spark):
    """Identical payloads agree at distance 0 in BOTH families —
    ahash_within == n_pairs and mean aHash hamming 0."""
    from capex_data_pipeline_spark.extensions.multimodal import (
        char_grid_pixelizer,
        documents_as_media,
        image_hash_agreement,
    )

    docs = spark.createDataFrame(
        [(i, "the same page content every time") for i in range(4)]
        + [(99, "something else entirely different")],
        "doc_id long, text string",
    )
    out = image_hash_agreement(
        documents_as_media(docs),
        pixelizer=char_grid_pixelizer,
        n_bits=60,
        max_hamming=3,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dhash_hamming"] == 0 and r["n_pairs"] == 6  # C(4,2)
    assert r["ahash_within"] == 6
    assert r["mean_ahash_hamming"] == 0.0
    assert r["max_ahash_hamming"] == 0
