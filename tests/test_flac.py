"""FLAC codec: round-trips, hand-built decoder paths, poison streams.

The encoder emits only mono FIXED-subframe / partition-order-0 / rice
(4-bit) streams, so every other decoder path — LPC, stereo
decorrelation, wasted bits, rice2, escaped partitions, partition order
> 0, constant/verbatim subframes, blocksize/sample-rate/sample-size
header codes — is exercised here by hand-BUILT streams (a test-local
writer assembles arbitrary frames). CRC-8/CRC-16 are cross-checked
against independent table-driven implementations, and MD5 against
hashlib directly.
"""

from __future__ import annotations

import hashlib

import pytest

from pagerank_spark.operators.flac import (
    _BitWriter,
    _FIXED_COEFFS,
    _utf8_decode_number,
    _utf8_encode_number,
    _BitReader,
    _zigzag,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


# ---------------------------------------------------------------------------
# independent CRC formulations (table-driven; the module's are bitwise)
# ---------------------------------------------------------------------------

_T8 = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _T8.append(_c)

_T16 = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _T16.append(_c)


def crc8_table(data: bytes) -> int:
    c = 0
    for b in data:
        c = _T8[c ^ b]
    return c


def crc16_table(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _T16[((c >> 8) ^ b) & 0xFF]
    return c


def test_crc_cross_formulations():
    for payload in (b"", b"\x00", b"123456789", bytes(range(256)) * 3):
        assert crc8(payload) == crc8_table(payload)
        assert crc16(payload) == crc16_table(payload)


# ---------------------------------------------------------------------------
# a test-local stream builder for arbitrary frames
# ---------------------------------------------------------------------------


def build_stream(frames: list[bytes], sample_rate=8000, channels=1,
                 bps=16, total=0, md5=b"\x00" * 16, block_size=16):
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo
    for f in frames:
        out += f
    return bytes(out)


def frame_header(block_size, frame_no=0, ch_code=0b0000, ss_code=0b100,
                 sr_code=0b0000, bs_code=0b0111):
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(bs_code, 4)
    w.write(sr_code, 4)
    w.write(ch_code, 4)
    w.write(ss_code, 3)
    w.write(0, 1)
    hdr = w.bytes() + _utf8_encode_number(frame_no)
    if bs_code == 0b0111:
        hdr += (block_size - 1).to_bytes(2, "big")
    elif bs_code == 0b0110:
        hdr += bytes([block_size - 1])
    hdr += bytes([crc8(hdr)])
    return hdr


def finish_frame(header: bytes, body: _BitWriter) -> bytes:
    body.align()
    f = header + body.bytes()
    return f + crc16(f).to_bytes(2, "big")


def write_verbatim(body, samples, bps=16):
    body.write(0, 1)
    body.write(0b000001, 6)
    body.write(0, 1)
    for s in samples:
        body.write(s & ((1 << bps) - 1), bps)


def write_rice_residual(body, resid, k, porder=0, method=0, order=0,
                        block_size=None):
    body.write(method, 2)
    body.write(porder, 4)
    pbits = 4 if method == 0 else 5
    n_part = 1 << porder
    idx = 0
    for part in range(n_part):
        n = (block_size >> porder) - (order if part == 0 else 0)
        body.write(k, pbits)
        for _ in range(n):
            u = _zigzag(resid[idx]); idx += 1
            body.write_unary(u >> k)
            body.write(u & ((1 << k) - 1), k)


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_waveform_and_blocks():
    for mid, bs in [(0, 576), (7, 192), (123, 1000)]:
        samples = [((13 * mid + 37 * i) % 65536) - 32768 for i in range(2000)]
        st = decode_flac(encode_flac(samples, 8000, 16, bs))
        assert st.samples[0] == samples
        assert st.md5_ok is True
        assert st.n_frames == -(-2000 // bs)


def test_roundtrip_constant_and_random():
    import random

    st = decode_flac(encode_flac([-7] * 300, 44100, 16, 128))
    assert st.samples[0] == [-7] * 300 and st.md5_ok
    rng = random.Random(9)
    noise = [rng.randint(-32768, 32767) for _ in range(700)]
    st = decode_flac(encode_flac(noise, 16000, 16, 256))
    assert st.samples[0] == noise and st.md5_ok


def test_roundtrip_every_fixed_order():
    """Signals whose best fixed predictor is each order 0..4."""
    sigs = {
        0: [100, -100] * 50,                      # white-ish
        1: [5] * 60 + [6] * 40,                   # near-constant steps
        2: [2 * i for i in range(100)],           # linear ramp
        3: [i * i for i in range(100)],           # quadratic
        4: [i * i * i // 50 for i in range(100)], # cubic-ish
    }
    for sig in sigs.values():
        st = decode_flac(encode_flac(sig, 8000, 16, 50))
        assert st.samples[0] == sig and st.md5_ok


# ---------------------------------------------------------------------------
# hand-built decoder paths the encoder never emits
# ---------------------------------------------------------------------------


def test_lpc_subframe():
    """LPC order 2, precision 4, shift 1: x[n] = (3·x[n-1] − 1·x[n-2])
    >> 1 + resid — built by running the predictor forward by hand."""
    warm = [10, 14]
    resid = [3, -2, 5, 0, 1, -4]
    coefs = [3, -1]
    samples = list(warm)
    for rr in resid:
        pred = (coefs[0] * samples[-1] + coefs[1] * samples[-2]) >> 1
        samples.append(pred + rr)
    bs = len(samples)
    hdr = frame_header(bs)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000 | (2 - 1), 6)  # LPC order 2
    body.write(0, 1)
    for s in warm:
        body.write(s & 0xFFFF, 16)
    body.write(4 - 1, 4)   # qlp precision 4
    body.write(1, 5)       # shift 1
    for c in coefs:
        body.write(c & 0xF, 4)
    write_rice_residual(body, resid, k=2, order=2, block_size=bs)
    blob = build_stream([finish_frame(hdr, body)], block_size=bs)
    st = decode_flac(blob)
    assert st.samples[0] == samples


def _stereo_stream(ch_code, ch0, ch1, bps0, bps1, block_size):
    hdr = frame_header(block_size, ch_code=ch_code)
    body = _BitWriter()
    write_verbatim(body, ch0, bps0)
    write_verbatim(body, ch1, bps1)
    return build_stream(
        [finish_frame(hdr, body)], channels=2, block_size=block_size
    )


def test_stereo_independent_and_decorrelated():
    left = [100, -200, 300, -400]
    right = [90, -210, 310, -390]
    side = [l - r for l, r in zip(left, right)]

    st = decode_flac(_stereo_stream(0b0001, left, right, 16, 16, 4))
    assert st.samples == [left, right]

    # left-side: ch1 = side, 17 bits
    st = decode_flac(_stereo_stream(0b1000, left, side, 16, 17, 4))
    assert st.samples == [left, right]

    # right-side: ch0 = side, 17 bits
    st = decode_flac(_stereo_stream(0b1001, side, right, 17, 16, 4))
    assert st.samples == [left, right]

    # mid-side: mid = (l+r)>>1, side 17 bits
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    st = decode_flac(_stereo_stream(0b1010, mid, side, 16, 17, 4))
    assert st.samples == [left, right]


def test_wasted_bits():
    """Samples all divisible by 4 → 2 wasted bits, subframe coded at
    bps−2 and shifted back up on output."""
    vals = [4, -8, 12, 16]
    hdr = frame_header(4)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b000001, 6)  # VERBATIM
    body.write(1, 1)         # wasted flag
    body.write_unary(1)      # unary 1 → wasted = 2
    for v in vals:
        body.write((v >> 2) & 0x3FFF, 14)
    st = decode_flac(build_stream([finish_frame(hdr, body)], block_size=4))
    assert st.samples[0] == vals


def test_rice2_and_partitions_and_escape():
    """FIXED order 1 with rice2 (5-bit params), partition order 2, and
    one escaped partition of raw 7-bit residuals."""
    bs = 16
    warm = [50]
    resid = [1, -2, 3, -4, 5, -6, 7, 8, -9, 10, -11, 12, 13, -14, 15]
    samples = list(warm)
    for rr in resid:
        samples.append(samples[-1] + rr)
    hdr = frame_header(bs)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001000 | 1, 6)  # FIXED order 1
    body.write(0, 1)
    body.write(warm[0] & 0xFFFF, 16)
    body.write(0b01, 2)   # rice2
    body.write(2, 4)      # partition order 2 → 4 partitions of 4
    idx = 0
    for part in range(4):
        n = 4 - (1 if part == 0 else 0)
        if part == 2:
            body.write(0b11111, 5)  # escape
            body.write(7, 5)        # 7-bit raw residuals
            for _ in range(n):
                body.write(resid[idx] & 0x7F, 7)
                idx += 1
        else:
            body.write(3, 5)
            for _ in range(n):
                u = _zigzag(resid[idx]); idx += 1
                body.write_unary(u >> 3)
                body.write(u & 7, 3)
    st = decode_flac(build_stream([finish_frame(hdr, body)], block_size=bs))
    assert st.samples[0] == samples


def test_header_code_paths():
    """8-bit blocksize code, coded sample rate, coded sample size, and
    a skipped PADDING metadata block before the audio."""
    vals = [1, 2, 3, 4, 5]
    hdr = frame_header(
        5, bs_code=0b0110, sr_code=0b0100, ss_code=0b100
    )
    body = _BitWriter()
    write_verbatim(body, vals)
    blob = bytearray(build_stream([finish_frame(hdr, body)], block_size=5))
    # splice a PADDING block (type 1) between STREAMINFO and frames:
    # un-set STREAMINFO's last flag, insert padding with last flag
    si_hdr = 4
    blob[si_hdr] = blob[si_hdr] & 0x7F
    pad = bytes([0x80 | 1]) + (3).to_bytes(3, "big") + b"\x00" * 3
    blob = bytes(blob[: si_hdr + 4 + 34]) + pad + bytes(blob[si_hdr + 4 + 34:])
    st = decode_flac(blob)
    assert st.samples[0] == vals
    assert st.sample_rate == 8000  # sr_code 0b0100 == STREAMINFO's 8 kHz


def test_utf8_frame_numbers():
    for n in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 31),
              (1 << 36) - 1]:
        enc = _utf8_encode_number(n)
        assert _utf8_decode_number(_BitReader(enc)) == n
    with pytest.raises(ValueError):
        _utf8_encode_number(1 << 36)


def test_fixed_coefficients_are_binomial():
    import math

    for o, coefs in _FIXED_COEFFS.items():
        assert coefs == [
            (-1) ** j * math.comb(o, j + 1) for j in range(o)
        ]


# ---------------------------------------------------------------------------
# poison / desync
# ---------------------------------------------------------------------------


def _good_blob():
    return bytearray(
        encode_flac([((37 * i) % 65536) - 32768 for i in range(500)],
                    8000, 16, 200)
    )


def test_poison_bad_magic():
    b = _good_blob()
    b[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        decode_flac(bytes(b))


def test_poison_truncation():
    b = _good_blob()
    with pytest.raises(ValueError):
        decode_flac(bytes(b[: len(b) // 2]))
    with pytest.raises(ValueError):
        decode_flac(bytes(b[:20]))


def test_poison_header_crc():
    b = _good_blob()
    # first frame begins right after fLaC(4) + header(4) + STREAMINFO(34)
    frame0 = 42
    b[frame0 + 4] ^= 0x01  # flip a header bit (blocksize raw field)
    with pytest.raises(ValueError, match="CRC-8|sync|reserved|blocksize"):
        decode_flac(bytes(b))


def test_poison_frame_crc16():
    b = _good_blob()
    b[-1] ^= 0x01  # last frame's CRC-16 low byte
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(b))


def test_poison_md5_mismatch_detected():
    b = _good_blob()
    # corrupt one MD5 byte inside STREAMINFO (bytes 8+18 .. 8+34)
    b[8 + 20] ^= 0xFF
    st = decode_flac(bytes(b))
    assert st.md5_ok is False


def test_poison_desync_between_frames():
    b = _good_blob()
    # overwrite the second frame's sync byte
    rest = bytes(b[42 + 1:])
    # find the next 0xFF that starts a frame (sync high byte)
    off = rest.index(b"\xff")
    b[42 + 1 + off] = 0x00
    with pytest.raises(ValueError):
        decode_flac(bytes(b))


def test_encoder_range_check():
    with pytest.raises(ValueError):
        encode_flac([40000], 8000, 16, 16)


def test_md5_is_hashlib_of_pcm():
    samples = [1, -2, 3, -4]
    blob = encode_flac(samples, 8000, 16, 4)
    pcm = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    assert hashlib.md5(pcm).digest() == blob[8 + 18 : 8 + 34]
