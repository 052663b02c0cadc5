"""Differential tests for the baseline JPEG decoder
(extensions/multimodal.decode_jpeg): an INDEPENDENT in-test encoder
(own zig-zag derivation, own canonical-code assignment, own forward
DCT written as explicit cosine loops) produces genuine baseline JPEG
streams — gray and color, 4:4:4 and 4:2:0, with and without restart
intervals — and the decoder must reconstruct them: bit-near-exactly
vs the test's own dequantize+IDCT replay, and within quantization
tolerance vs the source pixels.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from capex_data_pipeline_spark.extensions.multimodal import (
    _jpeg_pixels,
    decode_jpeg,
    stdlib_decode,
)

# ---------------------------------------------------------------- encoder
# Everything below is test-local and written independently of the
# decoder: the zig-zag order is derived by a diagonal walk (the decoder
# embeds the spec's literal table), the Huffman codes are assigned by
# the canonical algorithm from (bits, values), and the forward DCT is
# explicit cosine loops (the decoder uses a matrix-product IDCT).

#: Annex K luminance quantization table (natural row-major order)
_QTBL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

#: Annex K DC luminance Huffman spec (16 length counts, then values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

#: Annex K AC luminance Huffman spec
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order():
    """Independent derivation: walk anti-diagonals, alternating
    direction — NOT the decoder's literal table."""
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        if s % 2:
            diag.reverse()
        order.extend(diag)
    return [r * 8 + c for r, c in order]


_ZZ = _zigzag_order()


def _canonical_codes(bits, vals):
    """{symbol: (code, length)} by the canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _fdct(block):
    """Forward 8x8 DCT as explicit cosine loops (independent of the
    decoder's matrix form)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1.0 / math.sqrt(2) if u == 0 else 1.0
            cv = 1.0 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)  # pad with 1-bits per spec


def _encode_coef_block(w, zz_coefs, pred):
    """Huffman-encode one quantized block given in zig-zag order;
    returns the new DC predictor."""
    dc = int(zz_coefs[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    code, ln = _DC_CODES[size]
    w.bits(code, ln)
    if size:
        w.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = [k for k in range(1, 64) if zz_coefs[k]]
    last = nz[-1] if nz else 0
    for k in range(1, last + 1):
        v = int(zz_coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]  # ZRL
            w.bits(code, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        code, ln = _AC_CODES[(run << 4) | size]
        w.bits(code, ln)
        w.bits(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = _AC_CODES[0x00]  # EOB
        w.bits(code, ln)
    return dc


def _quantized_plane_blocks(plane, q):
    """Pad plane to 8-multiples (edge replicate), DCT+quantize each
    block; returns dict (by, bx) -> zig-zag int coefficient array."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    out = {}
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_fdct(blk) / q.reshape(8, 8)).astype(int)
            out[(by, bx)] = coef.reshape(-1)[_ZZ]
    return out


def encode_jpeg(img, subsample=False, restart_interval=0, qscale=0.25):
    """Minimal baseline JPEG encoder: gray (h, w) or RGB (h, w, 3)
    uint8 input; 4:4:4 or (subsample=True) 4:2:0; optional restart
    markers. All components share quant table 0 and the luminance
    Huffman tables (legal, and common in real encoders)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.clip(np.round(_QTBL * qscale), 1, 255)

    if gray:
        planes = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    blocks = []
    for p, (hf, vf) in zip(planes, samp):
        # pad the plane to its MCU-aligned size before blocking
        tw, th = 8 * hf * mcux, 8 * vf * mcuy
        ph, pw = p.shape
        p = np.pad(p, ((0, th - ph), (0, tw - pw)), mode="edge")
        blocks.append(_quantized_plane_blocks(p, q))

    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = q.reshape(-1)[_ZZ].astype(int)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(zz_q.tolist())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (hf, vf) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (hf << 4) | vf, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += struct.pack(">BB", i + 1, 0x00)
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    pred = [0] * nc
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            wtr = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci, (hf, vf) in enumerate(samp):
            for by in range(vf):
                for bx in range(hf):
                    zzc = blocks[ci][(my * vf + by, mx * hf + bx)]
                    pred[ci] = _encode_coef_block(wtr, zzc, pred[ci])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out), blocks, q, samp, (mcux, mcuy)


def _idct_replay(zz_coefs, q):
    """Test-side dequantize + IDCT + level shift: explicit cosine
    loops again (independent of the decoder's matrix IDCT)."""
    deq = np.zeros(64)
    deq[_ZZ] = zz_coefs * q.reshape(-1)[_ZZ]
    deq = deq.reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1.0 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1.0 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * deq[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = 0.25 * s + 128.0
    return out


def _gradient_gray(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.clip(
        np.round(96 + 40 * np.sin(xx / 7.0) + 50 * yy / max(h - 1, 1)),
        0, 255,
    ).astype(np.uint8)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 60 * np.sin(xx / 9.0)
    g = 100 + 80 * yy / max(h - 1, 1)
    b = 90 + 50 * np.cos((xx + yy) / 11.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------- tests


def test_jpeg_gray_bit_near_exact_vs_replay():
    """Gray 16x16: decoder output must match the test's OWN
    dequantize+IDCT replay of the quantized coefficients to within 1
    grey level (matrix-IDCT vs loop-IDCT last-ulp rounding only)."""
    src = _gradient_gray(16, 16)
    payload, blocks, q, _, _ = encode_jpeg(src)
    got = _jpeg_pixels(payload)
    assert got.shape == (16, 16, 1)
    exp = np.zeros((16, 16))
    for (by, bx), zzc in blocks[0].items():
        exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_replay(zzc, q)
    exp = np.clip(np.round(exp), 0, 255)
    assert np.abs(got[:, :, 0].astype(int) - exp.astype(int)).max() <= 1


def test_jpeg_gray_close_to_source():
    """Quantization at qscale=0.25 keeps a smooth image within a few
    grey levels of the source."""
    src = _gradient_gray(24, 33)  # non-multiples of 8: crop path
    payload, *_ = encode_jpeg(src)
    got = _jpeg_pixels(payload)
    assert got.shape == (24, 33, 1)
    err = np.abs(got[:, :, 0].astype(int) - src.astype(int))
    assert err.mean() < 3 and err.max() < 25


def test_jpeg_color_444_close_to_source():
    src = _gradient_rgb(17, 26)
    payload, *_ = encode_jpeg(src)
    got = _jpeg_pixels(payload)
    assert got.shape == (17, 26, 3)
    err = np.abs(got.astype(int) - src.astype(int))
    assert err.mean() < 4 and err.max() < 40


def test_jpeg_color_420_subsampled_close_to_source():
    """4:2:0: two-pixel chroma cells on a smooth image stay close;
    exercises the multi-block MCU interleave + upsample path."""
    src = _gradient_rgb(24, 32)
    payload, *_ = encode_jpeg(src, subsample=True)
    got = _jpeg_pixels(payload)
    assert got.shape == (24, 32, 3)
    err = np.abs(got.astype(int) - src.astype(int))
    assert err.mean() < 5 and err.max() < 48


def test_jpeg_restart_markers_change_nothing():
    """DRI + RSTn segmentation re-codes the same coefficients: the
    decode must be IDENTICAL to the unsegmented stream's."""
    src = _gradient_gray(16, 40)  # 10 MCUs
    plain, *_ = encode_jpeg(src)
    restarted, *_ = encode_jpeg(src, restart_interval=3)
    assert b"\xff\xdd" in restarted and restarted != plain
    assert np.array_equal(_jpeg_pixels(plain), _jpeg_pixels(restarted))


def test_jpeg_decode_feature_contract():
    """decode_jpeg wraps pixels into the (w, h, n_frames, features)
    decoder contract with FEATURE_DIM bin means in [0, 1]."""
    from capex_data_pipeline_spark.extensions.multimodal import FEATURE_DIM

    src = _gradient_rgb(16, 24)
    payload, *_ = encode_jpeg(src)
    w, h, n_frames, feats = decode_jpeg(payload)
    assert (w, h, n_frames) == (24, 16, 1)
    assert len(feats) == FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_jpeg_dispatch_and_rejections():
    src = _gradient_gray(8, 8)
    payload, *_ = encode_jpeg(src)
    assert stdlib_decode(payload)[:2] == (8, 8)
    with pytest.raises(ValueError, match="SOI"):
        _jpeg_pixels(b"\x00\x01" + payload[2:])
    # flip SOF0 -> SOF2 (progressive): loud rejection, not garbage
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        _jpeg_pixels(prog)
    with pytest.raises(ValueError):
        _jpeg_pixels(payload[:40])  # truncated mid-segment


def test_jpeg_e2e_through_mapinpandas(spark):
    """Real JPEG bytes through the decode_media mapInPandas stage —
    the same e2e shape the BMP/PNG/WAV decoders are pinned with."""
    from capex_data_pipeline_spark.extensions.multimodal import decode_media

    imgs = {
        1: encode_jpeg(_gradient_gray(16, 16))[0],
        2: encode_jpeg(_gradient_rgb(24, 32), subsample=True)[0],
    }
    media = spark.createDataFrame(
        [(k, "image/jpeg", bytearray(v)) for k, v in imgs.items()],
        "media_id long, mime string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in decode_media(media, decoder=stdlib_decode).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (16, 16)
    assert (rows[2]["width"], rows[2]["height"]) == (32, 24)
    assert all(len(r["features"]) == 16 for r in rows.values())
