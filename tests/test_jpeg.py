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
    # a BASELINE stream merely relabeled SOF2 is not valid progressive:
    # its full-band interleaved SOS violates the progressive scan rules
    # (DC scans carry Se=0), so it still rejects — with the
    # progressive-specific error now that SOF2 itself is supported
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(prog)
    # lossless (SOF3) and arithmetic (SOF9) remain rejected
    for marker in (b"\xff\xc3", b"\xff\xc9"):
        with pytest.raises(ValueError):
            decode_jpeg(good.replace(b"\xff\xc0", marker, 1))
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


# ---- progressive JPEG (round 11) ------------------------------------


def test_progressive_equals_baseline_exact():
    # The validation scheme that unlocks progressive support: the
    # progressive encoder reorganizes the SAME quantized coefficients
    # into six scan kinds (interleaved DC first at Al=1, split-band AC
    # first scans, table-free DC refinement, AC refinement), and the
    # decoder must reproduce them bit-for-bit through that entirely
    # different entropy structure — so decoded pixels must equal the
    # independently-validated baseline path EXACTLY, not within PSNR.
    import numpy as np

    from pagerank_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(3)
    shapes = [(24, 32, 3), (17, 23, 3), (8, 8, 3), (16, 16)]
    for shape in shapes:
        if len(shape) == 2:
            arr = rng.randint(0, 256, shape).astype(np.uint8)
        else:
            y, x = np.mgrid[0 : shape[0], 0 : shape[1]]
            base = np.stack(
                [(x + y) % 200, (2 * x) % 200, (3 * y) % 200], axis=2
            )
            arr = np.clip(
                base + rng.randint(0, 20, shape), 0, 255
            ).astype(np.uint8)
        for q in (90, 75):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_progressive(arr, quality=q)),
                decode_jpeg(encode_jpeg(arr, quality=q)),
            ), (shape, q)
    # pure noise (worst case for runs/ZRL/refinement bit density)
    noise = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(noise, quality=85)),
        decode_jpeg(encode_jpeg(noise, quality=85)),
    )


def _tiny_table():
    from pagerank_spark.operators.jpeg import (
        _build_huffman_codes,
        _build_huffman_decoder,
    )

    # Kraft-exact toy table carrying the EOBn symbols the in-repo
    # encoder never emits (it flushes EOB0 per block): 1 two-bit +
    # 6 three-bit codes.
    bits = [0, 1, 6] + [0] * 13
    vals = [0x00, 0x10, 0x20, 0x01, 0x11, 0x21, 0xF0]
    return (
        _build_huffman_codes(bits, vals),
        _build_huffman_decoder(bits, vals),
    )


def test_progressive_ac_first_eobn_hand_stream():
    # EOB2 with two extra bits 00 => eobrun covers exactly 3 whole
    # blocks; a late-change/off-by-one implementation either misparses
    # the following ZRL or places the -1 in the wrong block.
    import numpy as np

    from pagerank_spark.operators.jpeg import (
        _ac_first_block_decode,
        _BitReader,
        _BitWriter,
    )

    enc, dec = _tiny_table()
    w = _BitWriter()
    c, l = enc[0x21]
    w.write(c, l)
    w.write(1, 1)  # block0: +1 at k=3 (run 2 from ss=1)
    c, l = enc[0x20]
    w.write(c, l)
    w.write(0b00, 2)  # EOB2 -> eobrun (1<<2)-1 + 0 = 3
    c, l = enc[0xF0]
    w.write(c, l)  # block4: ZRL
    c, l = enc[0x11]
    w.write(c, l)
    w.write(0, 1)  # -1 at k=18
    c, l = enc[0x00]
    w.write(c, l)  # EOB0
    w.pad_to_byte()
    data = bytes(w.out) + b"\xff\xd9"

    rows = [np.zeros(64, dtype=np.int64) for _ in range(5)]
    r = _BitReader(data, 0)
    eobrun = 0
    for u in range(5):
        eobrun = _ac_first_block_decode(r, rows[u], dec, 1, 63, 0, eobrun)
    assert rows[0][3] == 1
    assert all(rows[u].sum() == 0 for u in (1, 2, 3))
    assert rows[4][18] == -1
    assert eobrun == 0


def test_progressive_ac_refine_eobrun_hand_stream():
    # Refinement semantics inside an EOB run: history coefficients
    # (always even at the previous approximation level) consume one
    # correction bit each; a set bit adds ±1<<Al toward the sign, and
    # the (coef & p1) guard makes re-corrections no-ops.
    import numpy as np

    from pagerank_spark.operators.jpeg import (
        _ac_refine_block_decode,
        _BitReader,
        _BitWriter,
    )

    enc, dec = _tiny_table()
    w = _BitWriter()
    c, l = enc[0x10]
    w.write(c, l)
    w.write(0, 1)  # EOB1 + extra bit 0 -> eobrun = 2
    w.write(1, 1)  # block0 k2 (+2 -> +3)
    w.write(0, 1)  # block0 k5 (-4 stays)
    w.write(1, 1)  # block1 k7 (-2 -> -3)
    w.pad_to_byte()
    data = bytes(w.out) + b"\xff\xd9"
    b0 = np.zeros(64, dtype=np.int64)
    b0[2], b0[5] = 2, -4
    b1 = np.zeros(64, dtype=np.int64)
    b1[7] = -2
    r = _BitReader(data, 0)
    eobrun = _ac_refine_block_decode(r, b0, dec, 1, 63, 0, 0)
    eobrun = _ac_refine_block_decode(r, b1, dec, 1, 63, 0, eobrun)
    assert (b0[2], b0[5], b1[7], eobrun) == (3, -4, -3, 0)


def test_progressive_rejections():
    import numpy as np
    import pytest

    from pagerank_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    buf = encode_jpeg_progressive(arr)
    # truncated scans / garbage still raise ValueError, never crash
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(buf[:40])
    # flip SOF2 to SOF9 (arithmetic): rejected
    i = buf.index(b"\xff\xc2")
    bad = buf[:i] + b"\xff\xc9" + buf[i + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(bad)
