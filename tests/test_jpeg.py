"""Baseline-JPEG codec tests (pagerank_spark/operators/jpeg.py).

Matched-bug defence: the encoder's matrix DCT and the decoder's
basis-tensor IDCT are verified to be mutual inverses directly; the
entropy layer gets a HAND-BUILT single-block bitstream (not produced
by the encoder) whose decode is computed from the spec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pagerank_spark.operators.jpeg import (
    _DCT_A,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QUANT_LUM,
    ZIGZAG,
    _build_huffman_codes,
    _idct2,
    _quality_scale,
    decode_jpeg,
    encode_jpeg,
)


def test_idct_inverts_dct_independent_formulations():
    rng = np.random.RandomState(1)
    for _ in range(5):
        block = rng.uniform(-128, 127, (8, 8))
        coeffs = _DCT_A @ block @ _DCT_A.T
        back = _idct2(coeffs)
        assert np.abs(back - block).max() < 1e-9


def test_zigzag_is_the_spec_permutation():
    # derive the spec's zigzag independently: walk anti-diagonals,
    # alternating direction, starting rightward from (0,0)
    want = []
    for s in range(15):
        cells = [
            (y, s - y)
            for y in range(max(0, s - 7), min(7, s) + 1)
        ]
        if s % 2 == 0:
            cells.reverse()  # even diagonals run bottom-left -> top-right
        want.extend(y * 8 + x for y, x in cells)
    assert ZIGZAG.tolist() == want


def test_quality_scaling_ijg():
    assert (_quality_scale(QUANT_LUM, 50) == QUANT_LUM).all()
    assert (_quality_scale(QUANT_LUM, 100) == 1).all()
    q10 = _quality_scale(QUANT_LUM, 10)
    assert (q10 >= QUANT_LUM).all() and q10.max() <= 255


def test_hand_built_dc_only_stream_decodes_to_constant():
    # Single 8x8 grayscale block, all AC zero, DC chosen so the
    # dequantized DC = q*dc and the spatial value = q*dc/8 + 128.
    dc_codes = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    qtab = np.ones(64, dtype=np.uint8)  # identity quant
    dc = 40  # -> constant 40/8 + 128 = 133
    t = dc.bit_length()
    code, length = dc_codes[t]
    acc, nbits = code, length
    acc = (acc << t) | dc
    nbits += t
    eob_code, eob_len = (0b1010, 4)  # AC lum EOB from the spec table
    acc = (acc << eob_len) | eob_code
    nbits += eob_len
    pad = (8 - nbits % 8) % 8
    acc = (acc << pad) | ((1 << pad) - 1)
    nbits += pad
    entropy = acc.to_bytes(nbits // 8, "big")

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, b"\x00" + bytes(qtab))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    from pagerank_spark.operators.jpeg import AC_LUM_BITS, AC_LUM_VALS

    seg(0xC4, bytes([0x00] + DC_LUM_BITS) + bytes(DC_LUM_VALS))
    seg(0xC4, bytes([0x10] + AC_LUM_BITS) + bytes(AC_LUM_VALS))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out.extend(entropy)
    out.extend(b"\xff\xd9")

    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 8, 3)
    assert (img == 133).all()


def test_roundtrip_quality_error_bounds():
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)
    err95 = np.abs(
        decode_jpeg(encode_jpeg(rgb, 95)).astype(int) - rgb.astype(int)
    )
    assert err95.mean() < 1.5
    err50 = np.abs(
        decode_jpeg(encode_jpeg(rgb, 50)).astype(int) - rgb.astype(int)
    )
    assert err95.mean() <= err50.mean()  # quality monotonicity


def test_roundtrip_gray_constant_exact():
    img = np.full((8, 8), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (out == 200).all()


def test_roundtrip_odd_dims_and_restart_markers():
    rng = np.random.RandomState(3)
    odd = rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, 90)).shape == (13, 21, 3)
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([xx * 3, yy * 4, xx + yy], axis=2).astype(np.uint8)
    with_rst = encode_jpeg(smooth, 90, restart_interval=3)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    err = np.abs(
        decode_jpeg(with_rst).astype(int) - smooth.astype(int)
    )
    assert err.mean() < 2.0


def test_unsupported_features_rejected():
    smooth = np.full((8, 8, 3), 100, dtype=np.uint8)
    good = encode_jpeg(smooth, 90)
    # progressive SOF2 must be rejected
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_jpeg_through_spark_decode_image(spark):
    from pagerank_spark.operators import multimodal

    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([xx * 5, yy * 7, xx + yy], axis=2).astype(np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(rgb, 95))),
        (2, bytearray(encode_jpeg(rgb, 95)[:60])),  # truncated -> error
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    out = {r["media_id"]: r for r in multimodal.decode_image(media).collect()}
    assert out[1]["format"] == "jpeg"
    assert (out[1]["width"], out[1]["height"]) == (w, h)
    assert out[1]["mean_r"] == pytest.approx(
        float(rgb[:, :, 0].mean()), abs=1.0
    )
    assert out[2]["format"] == "error"
