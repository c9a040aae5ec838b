"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no codec libraries.

Scope (honest partial, validated by tests):

- ``decode_jpeg``: baseline sequential DCT (SOF0) AND progressive DCT
  (SOF2, round 11 — spectral selection, successive approximation, EOB
  runs, refinement scans), 8-bit precision, grayscale (1 component)
  or YCbCr 4:4:4 (3 components, all sampling factors 1×1), Huffman
  entropy coding, restart markers, byte stuffing. Arithmetic coding,
  12-bit, hierarchical, and subsampled chroma are rejected with
  ``ValueError``.
- ``encode_jpeg``: the matching baseline encoder (4:4:4, standard
  Annex-K quantization and Huffman tables, IJG quality scaling,
  optional restart interval) used to synthesize genuine bitstreams
  for round-trip validation and the q138 oracle query.
- ``encode_jpeg_progressive``: the same quantized coefficients
  reorganized into a six-scan progressive script (interleaved DC
  first at Al=1, split-band AC first scans, table-free DC refinement
  bits, AC refinement) — the progressive validation anchor: decoded
  output must equal the independently-validated baseline path
  EXACTLY, because both carry identical coefficients.

Defence against matched encoder/decoder bugs: the two sides use
DIFFERENT transform formulations — the encoder computes the forward
DCT as the matrix product ``A·block·Aᵀ``, the decoder reconstructs
via an explicit 4-D basis-function tensor contraction — and the
entropy layer is validated by spec-level unit tests (category coding,
zigzag order, a hand-computed single-block stream) in addition to
round-trip PSNR on random and formula images.

All constants below are from the public JPEG specification (ITU-T
T.81 Annex K): the example luminance/chrominance quantization tables
and the "typical" Huffman tables every baseline encoder ships.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

QUANT_LUM = np.array(
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
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Standard Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Forward 8-point DCT-II matrix (encoder side)."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_DCT_A = _dct_matrix()

# Decoder-side inverse transform: explicit basis-function tensor
# (deliberately NOT the transpose-matrix route the encoder takes, so a
# transposition/normalization bug on either side breaks round trips).
_IDCT_BASIS = np.zeros((8, 8, 8, 8))
for _u in range(8):
    for _v in range(8):
        _cu = np.sqrt(0.125) if _u == 0 else 0.5
        _cv = np.sqrt(0.125) if _v == 0 else 0.5
        for _x in range(8):
            for _y in range(8):
                _IDCT_BASIS[_u, _v, _x, _y] = (
                    _cu
                    * _cv
                    * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
                    * np.cos((2 * _y + 1) * _v * np.pi / 16.0)
                )


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    return np.einsum("uv,uvxy->xy", coeffs, _IDCT_BASIS)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex-K table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length)."""
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


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for MSB-first sequential decoding."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    """JPEG magnitude category: bits needed for |v| (0 for v == 0)."""
    return int(v).bit_length() if v != 0 else 0


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-padding per spec


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_rst(self) -> None:
        """At a restart: drop padding bits, consume the RST marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1  # skip stray padding (defensive)
        assert 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """DECODE_EXTEND: map t-bit magnitude value to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Encoder


def _encode_block(
    writer: _BitWriter,
    qcoef: np.ndarray,
    pred_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = qcoef.ravel()[ZIGZAG]
    diff = int(zz[0]) - pred_dc
    t = _category(abs(diff))
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        writer.write(v, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        t = _category(abs(v))
        code, length = ac_codes[(run << 4) | t]
        writer.write(code, length)
        bits = v if v >= 0 else v + (1 << t) - 1
        writer.write(bits, t)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Baseline 4:4:4 JPEG encoder (grayscale for 2-D input)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if gray:
        comps = [arr.reshape(arr.shape[0], arr.shape[1]).astype(np.float64)]
    else:
        rgb = arr[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    h, w = comps[0].shape
    qt = [_quality_scale(QUANT_LUM, quality), _quality_scale(QUANT_CHROM, quality)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for tid, table in enumerate(qt[: 1 if gray else 2]):
        seg(0xDB, bytes([tid]) + bytes(int(x) for x in table.ravel()[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        tq = 0 if cid == 1 else 1
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling
    seg(0xC0, sof)
    huff = [
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
    ]
    if not gray:
        huff += [
            (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
            (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
        ]
    for tc_th, bits, vals in huff:
        seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tbl = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, tbl])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_lum = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chrom = _build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chrom = _build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bh, bw = -(-h // 8), -(-w // 8)
    padded = []
    for comp in comps:
        p = np.empty((bh * 8, bw * 8))
        p[:h, :w] = comp
        p[h:, :w] = comp[-1:, :]  # edge replicate
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p - 128.0)

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.pad_to_byte()
                out.extend(writer.out)
                writer = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]))
                preds = [0] * ncomp
            for ci in range(ncomp):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coeffs = _DCT_A @ block @ _DCT_A.T
                table = qt[0] if ci == 0 else qt[1]
                q = np.round(coeffs / table).astype(np.int64)
                preds[ci] = _encode_block(
                    writer,
                    q,
                    preds[ci],
                    dc_lum if ci == 0 else dc_chrom,
                    ac_lum if ci == 0 else ac_chrom,
                )
            mcu += 1
    writer.pad_to_byte()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (or grayscale) JPEG to (H, W, 3) uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    while i < len(buf):
        if buf[i] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (length,) = struct.unpack_from(">H", buf, i + 2)
        payload = buf[i + 4 : i + 2 + length]
        i += 2 + length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                raw = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = raw
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                table = _build_huffman_decoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # progressive: its own multi-scan path
            return _decode_jpeg_progressive(buf)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only sequential (SOF0) / progressive (SOF2)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cid, tbl = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tbl >> 4, tbl & 0xF))
            break  # i already points at the entropy-coded data
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    nc = len(comps)
    tq_of = {cid: tq for cid, tq in comps}

    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(nc)]
    reader = _BitReader(buf, i)
    preds = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.align_and_consume_rst()
                preds = [0] * nc
            for ci, (cid, td, ta) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                try:
                    t = reader.decode_symbol(huff_dc[td])
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(huff_ac[ta])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                except _RestartMarker:
                    raise ValueError("unexpected restart marker")
                coeffs = np.zeros(64, dtype=np.float64)
                coeffs[ZIGZAG] = zz * qt[tq_of[cid]].ravel()[ZIGZAG]
                block = _idct2(coeffs.reshape(8, 8)) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1

    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2), spectral selection + successive approximation
#
# Validation scheme (the reason progressive was previously rejected —
# "no trusted vectors" — no longer applies): the progressive path is
# pinned COEFFICIENT-EXACT against the independently-validated baseline
# path. Both encoders quantize identical coefficients; the progressive
# decoder must reproduce them bit-for-bit through a completely
# different entropy structure (multi-scan bands, EOB runs, refinement
# bits), so `decode(encode_progressive(x)) == decode(encode(x))`
# EXACTLY — any scan-layer bug desyncs the stream or perturbs
# coefficients and breaks the equality. The refinement/EOB-run helpers
# are additionally unit-tested on hand-built bitstreams.


def _ac_first_block_decode(reader, row, huff, ss, se, al, eobrun):
    """AC first scan for one block's band [ss, se] at level ``al``;
    returns the updated EOB run (blocks wholly inside an EOB run have
    no coded data)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(huff)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("progressive AC run overflow")
        row[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block_decode(reader, row, huff, ss, se, al, eobrun):
    """AC refinement scan (the successive-approximation correction
    pass, libjpeg decode_mcu_AC_refine structure): newly-nonzero
    coefficients arrive as ±1<<al, every zero-history skip reads a
    correction bit for each already-nonzero coefficient crossed, and
    EOB-run blocks still consume correction bits for the rest of the
    band. Returns the updated EOB run."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if reader.read_bit():
            if (row[k] & p1) == 0:
                row[k] += p1 if row[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(huff)
            r, s = rs >> 4, rs & 0xF
            if s:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            while k <= se:
                if row[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if s:
                            row[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if row[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_progressive(buf: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) 4:4:4/grayscale JPEG: accumulate
    per-block zigzag coefficients across every scan, then dequantize
    + IDCT once at the end."""
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef = None  # per component: list of per-block zigzag int arrays
    preds_frame: dict = {}

    def entropy_end(pos: int) -> int:
        # next real marker: skip stuffed 0x00, RSTn, and 0xFF fill bytes
        while pos + 1 < len(buf):
            if (
                buf[pos] == 0xFF
                and buf[pos + 1] not in (0x00, 0xFF)
                and not (0xD0 <= buf[pos + 1] <= 0xD7)
            ):
                return pos
            pos += 1
        raise ValueError("unterminated scan")

    while i + 1 < len(buf):
        if buf[i] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (length,) = struct.unpack_from(">H", buf, i + 2)
        payload = buf[i + 4 : i + 2 + length]
        i += 2 + length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                raw = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = raw
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = (
                    _build_huffman_decoder(bits, vals)
                )
                p += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
            bh, bw = -(-h // 8), -(-w // 8)
            coef = [
                np.zeros((bh * bw, 64), dtype=np.int64) for _ in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB):
            raise ValueError("mixed/unsupported frame type in progressive")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            h, w, comps = frame
            bh, bw = -(-h // 8), -(-w // 8)
            cid_index = {cid: idx for idx, (cid, _) in enumerate(comps)}
            ns = payload[0]
            scan = []
            for c in range(ns):
                cid, tbl = payload[1 + 2 * c : 3 + 2 * c]
                scan.append((cid_index[cid], tbl >> 4, tbl & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            reader = _BitReader(buf, i)
            n_units = bh * bw
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                preds = [0] * len(comps)
                for u in range(n_units):
                    if restart_interval and u and u % restart_interval == 0:
                        reader.align_and_consume_rst()
                        preds = [0] * len(comps)
                    for ci, td, _ta in scan:
                        if ah == 0:
                            t = reader.decode_symbol(huff_dc[td])
                            diff = (
                                _extend(reader.read_bits(t), t) if t else 0
                            )
                            preds[ci] += diff
                            coef[ci][u][0] = preds[ci] << al
                        else:
                            if reader.read_bit():
                                coef[ci][u][0] |= 1 << al
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be 1-component")
                ci, _td, ta = scan[0]
                eobrun = 0
                for u in range(n_units):
                    if restart_interval and u and u % restart_interval == 0:
                        reader.align_and_consume_rst()
                        eobrun = 0
                    if ah == 0:
                        eobrun = _ac_first_block_decode(
                            reader, coef[ci][u], huff_ac[ta], ss, se, al,
                            eobrun,
                        )
                    else:
                        eobrun = _ac_refine_block_decode(
                            reader, coef[ci][u], huff_ac[ta], ss, se, al,
                            eobrun,
                        )
            i = entropy_end(reader.pos)
        else:
            pass  # APPn/COM: skip

    if frame is None or coef is None:
        raise ValueError("missing SOF2/scan data")
    h, w, comps = frame
    bh, bw = -(-h // 8), -(-w // 8)
    nc = len(comps)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(nc)]
    for ci, (cid, tq) in enumerate(comps):
        table = qt[tq].ravel()[ZIGZAG]
        for u in range(bh * bw):
            by, bx = divmod(u, bw)
            coeffs = np.zeros(64, dtype=np.float64)
            coeffs[ZIGZAG] = coef[ci][u] * table
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _idct2(coeffs.reshape(8, 8)) + 128.0
            )
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _emit_ac_first_block(writer, zz, ac_codes, ss, se, al):
    """AC first scan, one block's band at level ``al``: magnitude
    point transform truncates toward ZERO (T.81 G.1.2.2), runs of 16
    as ZRL, per-block EOB0 (no cross-block EOB-run aggregation — a
    spec-legal encoder choice that keeps every emitted symbol inside
    the Annex-K tables; the DECODER handles EOBn via its own
    hand-built-stream unit tests)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = abs(v) >> al
        vals.append(mag if v >= 0 else -mag)
    last_nz = -1
    for idx, v in enumerate(vals):
        if v != 0:
            last_nz = idx
    run = 0
    for idx in range(last_nz + 1):
        v = vals[idx]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        t = _category(abs(v))
        code, length = ac_codes[(run << 4) | t]
        writer.write(code, length)
        bits = v if v >= 0 else v + (1 << t) - 1
        writer.write(bits, t)
        run = 0
    if last_nz < se - ss:
        code, length = ac_codes[0x00]
        writer.write(code, length)


def _emit_ac_refine_block(writer, zz, ac_codes, ss, se, al):
    """AC refinement scan, one block (libjpeg encode_mcu_AC_refine
    structure, EOB flushed per block): newly-nonzero coefficients emit
    (run<<4|1) + sign, already-nonzero history coefficients buffer one
    correction bit each, appended after the next symbol."""
    absv = []
    for k in range(ss, se + 1):
        absv.append(abs(int(zz[k])) >> al)
    eob_idx = -1
    for idx, t in enumerate(absv):
        if t == 1:
            eob_idx = idx
    run = 0
    pending: list[int] = []

    def flush_pending():
        for bit in pending:
            writer.write(bit, 1)
        pending.clear()

    for idx in range(len(absv)):
        t = absv[idx]
        if t == 0:
            run += 1
            continue
        if t > 1:
            # history coefficient: buffer its correction bit
            pending.append(t & 1)
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            flush_pending()
            run -= 16
        code, length = ac_codes[(run << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[ss + idx]) >= 0 else 0, 1)
        flush_pending()
        run = 0
    if run > 0 or pending:
        code, length = ac_codes[0x00]
        writer.write(code, length)
        flush_pending()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """Progressive 4:4:4 (grayscale for 2-D input) JPEG encoder: the
    SAME quantized coefficients as ``encode_jpeg`` reorganized into a
    six-kind scan script that exercises every progressive feature the
    decoder implements — interleaved DC first (Al=1), split-band AC
    first scans (1–5 then 6–63, Al=1) per component, a table-free DC
    refinement bit pass, and the AC refinement pass (Ah=1→Al=0).
    ``decode_jpeg(encode_jpeg_progressive(x)) ==
    decode_jpeg(encode_jpeg(x))`` exactly."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if gray:
        comps = [arr.reshape(arr.shape[0], arr.shape[1]).astype(np.float64)]
    else:
        rgb = arr[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    h, w = comps[0].shape
    ncomp = len(comps)
    qts = [
        _quality_scale(QUANT_LUM, quality),
        _quality_scale(QUANT_CHROM, quality),
    ]

    bh, bw = -(-h // 8), -(-w // 8)
    zz_coefs = []
    for ci, comp in enumerate(comps):
        p = np.empty((bh * 8, bw * 8))
        p[:h, :w] = comp
        p[h:, :w] = comp[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        p -= 128.0
        table = qts[0] if ci == 0 else qts[1]
        rows = np.empty((bh * bw, 64), dtype=np.int64)
        for u in range(bh * bw):
            by, bx = divmod(u, bw)
            block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.round((_DCT_A @ block @ _DCT_A.T) / table).astype(
                np.int64
            )
            rows[u] = q.ravel()[ZIGZAG]
        zz_coefs.append(rows)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for tid, table in enumerate(qts[: 1 if gray else 2]):
        seg(0xDB, bytes([tid]) + bytes(int(x) for x in table.ravel()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(0xC2, sof)
    huff = [
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
    ]
    if not gray:
        huff += [
            (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
            (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
        ]
    for tc_th, bits, vals in huff:
        seg(0xC4, bytes([tc_th] + bits) + bytes(vals))

    dc_codes = [
        _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS),
        _build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    ac_codes = [
        _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS),
        _build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    ]
    n_units = bh * bw

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int):
        p = bytes([len(scan_comps)])
        for ci in scan_comps:
            cid = ci + 1
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            p += bytes([cid, (td << 4) | ta])
        p += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, p)

    # scan 1: interleaved DC first at Al=1
    sos(list(range(ncomp)), 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * ncomp
    for u in range(n_units):
        for ci in range(ncomp):
            v = int(zz_coefs[ci][u][0]) >> 1  # DC point transform: shift
            diff = v - preds[ci]
            preds[ci] = v
            t = _category(abs(diff))
            code, length = dc_codes[0 if ci == 0 else 1][t]
            writer.write(code, length)
            if t:
                bits = diff if diff >= 0 else diff + (1 << t) - 1
                writer.write(bits, t)
    writer.pad_to_byte()
    out.extend(writer.out)

    # scans 2..: split-band AC first per component at Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            sos([ci], ss, se, 0, 1)
            writer = _BitWriter()
            codes = ac_codes[0 if ci == 0 else 1]
            for u in range(n_units):
                _emit_ac_first_block(
                    writer, zz_coefs[ci][u], codes, ss, se, 1
                )
            writer.pad_to_byte()
            out.extend(writer.out)

    # DC refinement: one raw bit per block per component (no tables)
    sos(list(range(ncomp)), 0, 0, 1, 0)
    writer = _BitWriter()
    for u in range(n_units):
        for ci in range(ncomp):
            writer.write(int(zz_coefs[ci][u][0]) & 1, 1)
    writer.pad_to_byte()
    out.extend(writer.out)

    # AC refinement per component (Ah=1 -> Al=0)
    for ci in range(ncomp):
        sos([ci], 1, 63, 1, 0)
        writer = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for u in range(n_units):
            _emit_ac_refine_block(writer, zz_coefs[ci][u], codes, 1, 63, 0)
        writer.pad_to_byte()
        out.extend(writer.out)

    out.extend(b"\xff\xd9")
    return bytes(out)
