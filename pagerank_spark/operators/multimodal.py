"""Multimodal (image/audio/video) column plumbing for training pipelines.

The reference has no media surface; this is the extension tier from the
build brief: media travel as opaque ``binary`` payload columns with
typed metadata, and per-item decode / feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas`` — the only sane
shape at 100 TB (no driver materialization, vectorized Python batches,
schema declared up front so Catalyst can prune around the UDF).

Codec status: ``decode_image`` is a REAL decoder for FOUR formats
with no codec libraries — binary P6 PPM and uncompressed 24-bit BMP
(pure header+raster, numpy), 8-bit gray/RGB/RGBA non-interlaced PNG
(stdlib ``zlib`` inflate + per-row reverse of the five scanline
filters), and baseline sequential JPEG (``operators/jpeg.py``: full
Huffman entropy decode, dequantize, independent-formulation IDCT,
YCbCr→RGB, restart markers; 4:4:4 and grayscale — progressive and
subsampled chroma are rejected, they would need trusted vectors this
environment cannot produce) — with per-channel stats and
nearest-neighbor thumbnailing. q114/q137 verify the lossless decoders
against a closed-form SQL oracle; q138 pins the lossy JPEG path with
within-tolerance booleans the oracle sets TRUE. Audio/video container
formats (MP3/MP4) remain stubbed behind ``decode_media`` /
``extract_features`` (deterministic payload statistics and
pseudo-embeddings): swapping ffmpeg in is a local change inside the
batch loop. The Spark-side plumbing — binary schema, Arrow batch
iteration, output schema, partition preservation — is real and tested
throughout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, "
    "mean_byte DOUBLE, digest STRING"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = "media_id BIGINT, feature ARRAY<FLOAT>"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the ``documents`` fixture as a media table.

    (media_id, kind, payload BINARY) — UTF-8 text bytes stand in for an
    encoded image/audio blob, giving the binary pipeline a deterministic,
    oracle-checkable input without shipping media fixtures.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/utf-8").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stub over ``mapInPandas``: per-payload size/stat/digest.

    A real decoder (PIL image open, audio resample, …) replaces the body
    of ``stats`` only; batch iteration, schema, and distribution are the
    production shape. Arrow moves each partition to Python in vectorized
    record batches — never row-at-a-time.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: sum(b) / len(b) if len(b) else 0.0
                    ),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(stats, schema=DECODE_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding per payload.

    Stands in for a vision/audio encoder: md5-seeded, so identical bytes
    yield identical vectors on any executor (required for dedup joins
    downstream). Output is the engine's standard ``array<float>`` column,
    directly consumable by ``similarity.ann_*`` and
    ``dedup.embedding_neardup_pairs``.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["payload"]:
                h = hashlib.md5(bytes(b)).digest()
                vecs.append([(h[i % 16] - 127.5) / 127.5 for i in range(dim)])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": vecs}
            )

    return media.mapInPandas(features, schema=FEATURE_SCHEMA)


IMAGE_DECODE_SCHEMA = (
    "media_id BIGINT, format STRING, width INT, height INT, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, thumb ARRAY<DOUBLE>"
)

IMAGE_EMBED_SCHEMA = "media_id BIGINT, embedding ARRAY<FLOAT>"


def image_embedding(media: DataFrame, grid: int = 4) -> DataFrame:
    """REAL image embeddings from decoded pixels: each payload decodes
    (PPM/BMP/PNG/JPEG — same dispatch as ``decode_image``), converts
    to grayscale, block-averages onto a ``grid``×``grid`` raster, and
    L2-normalizes the flattened vector — the classic tiny-thumbnail
    perceptual descriptor. Output is the engine's standard
    ``array<float>`` embedding column, directly consumable by
    ``similarity.ann_*`` and ``dedup.embedding_neardup_pairs``, so the
    decode → featurize → ANN/near-dup pipeline runs on actual pixels
    end-to-end (no external vision model). Undecodable payloads are
    dropped (poison must not kill a corpus job); block edges use the
    same integer split as ``decode_image``'s thumbnail so a PPM/PNG
    pair with identical pixels embeds identically.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as np

        from pagerank_spark.operators.jpeg import decode_jpeg

        def decode(b: bytes):
            if b[:2] == b"P6":
                return _decode_ppm(b)
            if b[:2] == b"BM":
                return _decode_bmp(b)
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                return _decode_png(b)
            if b[:2] == b"\xff\xd8":
                return decode_jpeg(b)
            raise ValueError("unknown magic")

        for pdf in batches:
            ids, vecs = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode(bytes(b))
                except (ValueError, _zlib.error, _struct.error, IndexError):
                    continue
                gray = arr.mean(axis=2, dtype=np.float64)
                h, w = gray.shape
                ye = (np.arange(grid + 1) * h) // grid
                xe = (np.arange(grid + 1) * w) // grid
                cells = np.empty(grid * grid)
                for gy in range(grid):
                    for gx in range(grid):
                        cells[gy * grid + gx] = gray[
                            ye[gy] : ye[gy + 1], xe[gx] : xe[gx + 1]
                        ].mean()
                norm = float(np.sqrt((cells * cells).sum()))
                if norm > 0:
                    cells = cells / norm
                ids.append(mid)
                vecs.append([float(v) for v in cells])
            if ids:  # an empty frame's float64 columns break the
                # Arrow cast to list<float>; yielding nothing is fine
                yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.mapInPandas(embed, schema=IMAGE_EMBED_SCHEMA)


def _decode_ppm(buf: bytes):
    """Real P6 (binary PPM) decoder in numpy: header parse + raster
    reshape. Returns an (H, W, 3) uint8 array."""
    import re

    import numpy as np

    m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", buf)
    if not m:
        raise ValueError("not a binary P6 PPM")
    w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = buf[m.end() : m.end() + w * h * 3]
    if len(raster) < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp(buf: bytes):
    """Real uncompressed 24-bit BMP decoder in numpy: BITMAPINFOHEADER
    parse, 4-byte row padding, bottom-up BGR → top-down RGB."""
    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24bpp BMP supported")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(buf[off : off + stride * h], dtype=np.uint8)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def _decode_png(buf: bytes):
    """Real PNG decoder for the common cases — 8-bit grayscale (color
    type 0), RGB (2), and RGBA (6), non-interlaced — using only stdlib
    ``zlib`` and numpy: chunk walk, IDAT inflate, then per-row reverse
    of the five scanline filters (None/Sub/Up/Average/Paeth). Alpha is
    dropped and grayscale replicated so the output is always an
    (H, W, 3) uint8 array like the PPM/BMP decoders. Palette,
    16-bit, and Adam7-interlaced images are rejected (ValueError) and
    surface as format="error" rows."""
    import numpy as np
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, w = 8, None
    idat = bytearray()
    while i + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[i : i + 4])
        ctype = buf[i + 4 : i + 8]
        data = buf[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError("only 8-bit PNG supported")
            if color not in (0, 2, 6):
                raise ValueError("palette/alpha-gray PNG not supported")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            ch = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    raw = raw[: h * (stride + 1)].reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, cur = int(filters[y]), rows[y].copy()
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left pixel
            line = cur
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line
        prev = out[y]
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]  # RGBA -> RGB


def encode_png(arr, compress_level: int = 6) -> bytes:
    """Minimal RGB PNG encoder (filter 0 rows + one zlib stream) — the
    synthesis side for round-tripping the decoder on closed-form
    pixels; stdlib-only like the decoder."""
    import numpy as np
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster, compress_level))
        + chunk(b"IEND", b"")
    )


def decode_image(media: DataFrame, thumb_size: int = 2) -> DataFrame:
    """REAL image decode over ``mapInPandas`` (no codec libraries
    needed: P6 PPM and uncompressed 24-bit BMP are pure header+raster
    formats, decoded with numpy). Per image: dimensions, per-channel
    means, and a ``thumb_size``×``thumb_size`` nearest-neighbor
    grayscale thumbnail (row-major array<double>) — the
    decode → stat → downsample shape of a vision-pipeline ingest step.

    Values round to 6dp so a closed-form oracle over synthetic images
    can value-match the decoder bit-for-bit (q114). Unsupported or
    corrupt payloads surface as format="error" rows with NULL stats
    rather than failing the batch — at corpus scale a poison payload
    must never kill the job.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import struct as _struct
        import zlib as _zlib

        import numpy as np

        def r6(x: float) -> float:
            # Half-UP at 6dp for non-negative values — Python's round()
            # is half-EVEN, but Spark's ROUND and DuckDB's round are
            # half-up/away, and exact .5 ties are reachable here (pixel
            # means are rationals with power-of-two denominators).
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            out = {
                "media_id": [], "format": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "thumb": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                try:
                    if b[:2] == b"P6":
                        arr, fmt = _decode_ppm(b), "ppm"
                    elif b[:2] == b"BM":
                        arr, fmt = _decode_bmp(b), "bmp"
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        arr, fmt = _decode_png(b), "png"
                    elif b[:2] == b"\xff\xd8":
                        from pagerank_spark.operators.jpeg import decode_jpeg

                        arr, fmt = decode_jpeg(b), "jpeg"
                    else:
                        raise ValueError("unknown magic")
                except (ValueError, _zlib.error, _struct.error, IndexError):
                    # poison payload -> error row, never a dead job
                    # (IndexError: truncated JPEG entropy data)
                    out["media_id"].append(mid)
                    out["format"].append("error")
                    for k in ("width", "height", "mean_r", "mean_g",
                              "mean_b", "thumb"):
                        out[k].append(None)
                    continue
                h, w = arr.shape[:2]
                means = arr.reshape(-1, 3).mean(axis=0)
                ys = (np.arange(thumb_size) * h) // thumb_size
                xs = (np.arange(thumb_size) * w) // thumb_size
                th = arr[np.ix_(ys, xs)].mean(axis=2, dtype=np.float64)
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(r6(float(means[0])))
                out["mean_g"].append(r6(float(means[1])))
                out["mean_b"].append(r6(float(means[2])))
                out["thumb"].append(
                    [r6(float(v)) for v in th.ravel()]
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=IMAGE_DECODE_SCHEMA)


def synthesize_ppm_media(
    ids: DataFrame, id_col: str = "media_id",
    width: int = 64, height: int = 48,
) -> DataFrame:
    """Deterministic synthetic P6 image per id: pixel (x, y) channel c
    is ``(7·id + 3·x + 5·y + 11·c) mod 256`` — a formula a SQL oracle
    can integrate in closed form, so the REAL decoder's output is
    verifiable against an independent computation (q114). Payload built
    vectorized in numpy per Arrow batch."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        )
        base = 3 * x + 5 * y + 11 * c
        header_tail = f" {width} {height} 255\n".encode()
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                arr = ((7 * int(mid) + base) % 256).astype("uint8")
                payloads.append(b"P6" + header_tail + arr.tobytes())
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


def synthesize_jpeg_media(
    ids: DataFrame, id_col: str = "media_id",
    width: int = 64, height: int = 48, quality: int = 95,
) -> DataFrame:
    """Deterministic synthetic RGB JPEG per id — a SMOOTH per-channel
    gradient (``(7·id + 3·x + 5·y + 11·c) mod 256`` is full of modular
    wrap cliffs that JPEG rings on, so the JPEG fixture uses
    ``(7·id + x + y + 40·c) mod 256`` scaled into a wrap-free ramp:
    closed-form integrable AND compression-friendly). Decoded stats
    land within a small tolerance of the closed form — what q138's
    boolean oracle pins."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pagerank_spark.operators.jpeg import encode_jpeg

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        )
        # wrap-free ramp: values stay inside [0, 255] per image
        base = x + y + 40 * c
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                offset = (7 * int(mid)) % 100
                arr = np.clip(offset + base, 0, 255).astype("uint8")
                payloads.append(encode_jpeg(arr, quality=quality))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


def synthesize_png_media(
    ids: DataFrame, id_col: str = "media_id",
    width: int = 64, height: int = 48,
) -> DataFrame:
    """Deterministic synthetic RGB PNG per id — the SAME pixel formula
    as ``synthesize_ppm_media`` (``(7·id + 3·x + 5·y + 11·c) mod
    256``), so the identical closed-form oracle verifies the PNG
    decode path end-to-end through a real zlib stream (q137)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        )
        base = 3 * x + 5 * y + 11 * c
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                arr = ((7 * int(mid) + base) % 256).astype("uint8")
                payloads.append(encode_png(arr))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


AUDIO_DECODE_SCHEMA = (
    "media_id BIGINT, format STRING, sample_rate INT, n_channels INT, "
    "n_samples BIGINT, duration_s DOUBLE, rms DOUBLE, peak INT"
)


def _decode_wav(buf: bytes):
    """Real RIFF/WAVE PCM decoder in numpy: chunk walk, fmt parse,
    16-bit little-endian samples. Returns (rate, channels, int16 array
    of shape (n_frames, channels))."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError("only PCM WAV supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(
        data[: len(data) // (2 * channels) * 2 * channels], dtype="<i2"
    ).reshape(-1, channels)
    return rate, channels, samples


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode over ``mapInPandas`` (16-bit PCM WAV — a pure
    header+samples format, no codec library needed). Per clip: rate,
    channel count, frame count, duration, RMS amplitude, and absolute
    peak — the triage stats an audio-ingest pipeline computes before
    expensive transcription. Poison payloads become format="error"
    rows. rms/duration round half-up at 6dp for the closed-form oracle
    (q115); sqrt is IEEE-correctly-rounded so both engines agree
    bit-for-bit on identical integer sums."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        def r6(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            out = {
                "media_id": [], "format": [], "sample_rate": [],
                "n_channels": [], "n_samples": [], "duration_s": [],
                "rms": [], "peak": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, ch, samples = _decode_wav(bytes(b))
                except ValueError:
                    out["media_id"].append(mid)
                    out["format"].append("error")
                    for k in ("sample_rate", "n_channels", "n_samples",
                              "duration_s", "rms", "peak"):
                        out[k].append(None)
                    continue
                n = samples.shape[0]
                flat = samples.astype(np.int64).ravel()
                mean_sq = float((flat * flat).sum()) / max(len(flat), 1)
                out["media_id"].append(mid)
                out["format"].append("wav")
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_s"].append(r6(n / rate))
                out["rms"].append(r6(math.sqrt(mean_sq)))
                out["peak"].append(int(np.abs(flat).max()) if len(flat) else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=AUDIO_DECODE_SCHEMA)


def synthesize_wav_media(
    ids: DataFrame, id_col: str = "media_id",
    n_samples: int = 2000, rate: int = 8000,
) -> DataFrame:
    """Deterministic synthetic mono 16-bit PCM WAV per id: sample i is
    ``((13·id + 37·i) mod 65536) − 32768`` — integrable in closed form
    by a SQL oracle (q115), like the synthetic PPMs."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(n_samples, dtype=np.int64)
        data_size = n_samples * 2
        header = (
            b"RIFF" + (36 + data_size).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + data_size.to_bytes(4, "little")
        )
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                wave = ((13 * int(mid) + 37 * i) % 65536 - 32768).astype(
                    "<i2"
                )
                payloads.append(header + wave.tobytes())
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "payload": payloads}
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="media_id BIGINT, payload BINARY"
    )


def frame_sample_plan(
    media_meta: DataFrame,
    fps_col: str = "fps",
    duration_col: str = "duration_s",
    every_s: float = 1.0,
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame timestamp).

    Pure Catalyst (sequence + explode) — the expensive decode of each
    sampled frame would then run through ``decode_media``-style
    mapInPandas on the exploded plan, already partitioned by media_id.
    """
    n_samples = F.greatest(
        (F.col(duration_col) / F.lit(every_s)).cast("int"), F.lit(1)
    )
    return (
        media_meta.select(
            "media_id",
            F.col(fps_col).cast("double").alias("__fps"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_samples - 1),
                    lambda i: i * F.lit(every_s),
                )
            ).alias("sample_ts"),
        )
        .select(
            "media_id",
            "sample_ts",
            (F.col("sample_ts") * F.col("__fps")).cast("long").alias(
                "frame_index"
            ),
        )
    )


def synthesize_ppm_variant_media(
    df: DataFrame,
    id_col: str = "media_id",
    group_col: str = "grp",
    variant_col: str = "variant",
    width: int = 64,
    height: int = 48,
) -> DataFrame:
    """Deterministic synthetic P6 image per id with PLANTED NEAR-DUP
    structure — the fixture for perceptual-hash dedup (q221): images
    sharing ``group_col`` share a base pattern, and ``variant_col``
    ``r > 0`` perturbs only a small corner region, so same-group
    images hash within a few bits of each other while groups differ
    wholesale. Pixel (x, y) channel c of group g is

        v = (11·(g+1)·(x+1) + 2·y + 7·c) mod 256
        if r > 0 and x < 2·r and y < 6:  v = (v + 128) mod 256

    — integer arithmetic end to end, so a SQL oracle reproduces every
    pixel exactly (q221's twin integrates this over generate_series
    and never sees the bytes)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        )
        header_tail = f" {width} {height} 255\n".encode()
        for pdf in batches:
            payloads = []
            for mid, g, r in zip(
                pdf[id_col], pdf[group_col], pdf[variant_col]
            ):
                arr = (11 * (int(g) + 1) * (x + 1) + 2 * y + 7 * c) % 256
                if int(r) > 0:
                    mask = (x < 2 * int(r)) & (y < 6)
                    arr = np.where(mask, (arr + 128) % 256, arr)
                payloads.append(
                    b"P6" + header_tail + arr.astype("uint8").tobytes()
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(group_col).cast("long").alias(group_col),
        F.col(variant_col).cast("long").alias(variant_col),
    ).mapInPandas(synth, schema=f"{id_col} BIGINT, payload BINARY")


AHASH_SCHEMA = (
    "media_id BIGINT, b0 BIGINT, b1 BIGINT, b2 BIGINT, b3 BIGINT"
)


def ahash_image(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over REAL decode:
    decode the payload (PPM/BMP/PNG/JPEG, same dispatch as
    ``decode_image``), sum channels to an integer grayscale, pool into
    a ``grid``×``grid`` block grid, and set bit ``by·grid + bx`` iff
    the block's mean exceeds the image mean. Every comparison is
    INTEGER (``block_sum · total_pixels > total_sum · block_pixels``)
    — no float thresholds, so the 64 bits are bit-identical in any
    engine that sees the same pixels, which is what lets a SQL oracle
    verify the hash without decoding bytes.

    The 64 bits return as four 16-bit band integers ``b0..b3`` (bits
    ``16j..16j+15`` in ``bj``) — already in the banded layout
    ``hamming_near_dup_pairs`` buckets on (pigeonhole: two hashes
    within Hamming distance 3 agree on at least one of 4 bands).
    Poison payloads yield NULL bands, never a dead job.
    """

    if not 1 <= grid <= 8:
        raise ValueError(
            f"ahash_image: grid in [1, 8] (the banded layout carries "
            f"grid^2 <= 64 bits in four 16-bit bands), got {grid}"
        )

    def hash_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                try:
                    if b[:2] == b"P6":
                        arr = _decode_ppm(b)
                    elif b[:2] == b"BM":
                        arr = _decode_bmp(b)
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        arr = _decode_png(b)
                    elif b[:2] == b"\xff\xd8":
                        from pagerank_spark.operators.jpeg import decode_jpeg

                        arr = decode_jpeg(b)
                    else:
                        raise ValueError("unknown magic")
                except (ValueError, _zlib.error, _struct.error, IndexError):
                    out["media_id"].append(mid)
                    for k in ("b0", "b1", "b2", "b3"):
                        out[k].append(None)
                    continue
                gray = arr.astype(np.int64).sum(axis=2)  # (H, W) int
                h, w = gray.shape
                ye = (np.arange(grid + 1) * h) // grid
                xe = (np.arange(grid + 1) * w) // grid
                total = int(gray.sum())
                npix = h * w
                bands = [0, 0, 0, 0]
                for by in range(grid):
                    for bx in range(grid):
                        blk = gray[ye[by]:ye[by + 1], xe[bx]:xe[bx + 1]]
                        if int(blk.sum()) * npix > total * blk.size:
                            i = by * grid + bx
                            bands[i // 16] |= 1 << (i % 16)
                out["media_id"].append(mid)
                for j in range(4):
                    out[f"b{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return media.mapInPandas(hash_batch, schema=AHASH_SCHEMA)


def hamming_near_dup_pairs(
    hashes: DataFrame,
    max_dist: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join over aHash
    fingerprints: the 64-bit hash travels as 4 × 16-bit bands, and by
    pigeonhole any two hashes within Hamming distance ``bands − 1``
    (3 for 4 bands) agree EXACTLY on at least one band — so candidate
    generation is an equi-join on ``(band_index, band_value)``, never
    an all-pairs distance scan, and the exact Hamming distance
    (``Σ bit_count(bj ⊕ bj')``, JVM-side) filters candidates after.
    The same LSH-band shape as MinHash dedup, specialized to Hamming
    space. Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    ``max_dist`` above ``bands − 1`` would need coarser bands to stay
    recall-exact — rejected rather than silently lossy.
    """
    if not 0 <= max_dist <= 3:
        raise ValueError(
            f"hamming_near_dup_pairs: max_dist in [0, 3] for 4 bands, "
            f"got {max_dist}"
        )
    hs = hashes.where(F.col("b0").isNotNull())
    long = hs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band", "value"
        ),
    )
    cand = (
        long.alias("l")
        .join(
            long.select(
                F.col("id").alias("id_b"), "band", "value"
            ).alias("r"),
            on=["band", "value"],
        )
        .where(F.col("l.id") < F.col("id_b"))
        .select(F.col("l.id").alias("id_a"), "id_b")
        .distinct()
    )
    a = hs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
    )
    b = hs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"b{j}").alias(f"bb{j}") for j in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}")))
        for j in range(4)
    )
    return (
        cand.join(a, on="id_a")
        .join(b, on="id_b")
        .select(
            "id_a", "id_b", ham.cast("long").alias("hamming")
        )
        .where(F.col("hamming") <= max_dist)
    )


IMAGE_RESIZE_SCHEMA = (
    "media_id BIGINT, format STRING, y INT, x INT, "
    "r DOUBLE, g DOUBLE, b DOUBLE"
)


def resize_image(
    media: DataFrame, out_w: int = 16, out_h: int = 12
) -> DataFrame:
    """Box-average (area) resize over ``mapInPandas`` — the standard
    antialiasing downsample of a vision-pipeline preprocessing step
    (nearest-neighbor, which ``decode_image``'s thumbnail uses, drops
    3/4+ of the signal; area averaging integrates every source pixel
    exactly once). One output row per (media_id, y, x) target pixel
    with per-channel block means rounded to 6dp — the relational shape
    an oracle can hash and downstream ops can join; the array form is
    one ``collect_list`` away.

    Source dimensions must be DIVISIBLE by the target dimensions: the
    block means are then rationals with a power-of-two-free fixed
    denominator (bw·bh), exact at 6dp on every engine — the SURVEY
    §5.3 determinism rule. A fractional-box resize would need
    engine-specific float edge weights. Failure rows never fail the
    batch, and the two causes are DISTINGUISHABLE (r9 ADVICE: a
    misconfigured out_w/out_h used to be indistinguishable from a
    poisoned corpus): undecodable payloads surface as format="error",
    non-divisible dimensions as format="dims" — a corpus that comes
    back all-"dims" is a caller bug, not bad data.

    Scale shape: pure per-row Arrow-batched compute, no shuffle at
    all — partition-parallel over however many executors hold the
    payload column.
    """
    if out_w < 1 or out_h < 1:
        # validate driver-side: a zero target would otherwise raise
        # ZeroDivisionError inside every executor task
        raise ValueError(
            f"resize_image: out_w/out_h >= 1, got {out_w}x{out_h}"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import struct as _struct
        import zlib as _zlib

        import numpy as np

        def r6(x: float) -> float:
            # Half-UP at 6dp, matching Spark/DuckDB ROUND (see
            # decode_image).
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            out = {
                "media_id": [], "format": [], "y": [], "x": [],
                "r": [], "g": [], "b": [],
            }

            def error_row(mid, reason="error"):
                out["media_id"].append(mid)
                out["format"].append(reason)
                for k in ("y", "x", "r", "g", "b"):
                    out[k].append(None)

            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(buf)
                try:
                    if buf[:2] == b"P6":
                        arr, fmt = _decode_ppm(buf), "ppm"
                    elif buf[:2] == b"BM":
                        arr, fmt = _decode_bmp(buf), "bmp"
                    elif buf[:8] == b"\x89PNG\r\n\x1a\n":
                        arr, fmt = _decode_png(buf), "png"
                    elif buf[:2] == b"\xff\xd8":
                        from pagerank_spark.operators.jpeg import (
                            decode_jpeg,
                        )

                        arr, fmt = decode_jpeg(buf), "jpeg"
                    else:
                        raise ValueError("unknown magic")
                except (ValueError, _zlib.error, _struct.error, IndexError):
                    error_row(mid)
                    continue
                h, w = arr.shape[:2]
                if h % out_h != 0 or w % out_w != 0:
                    error_row(mid, reason="dims")
                    continue
                bh, bw = h // out_h, w // out_w
                blocks = arr.reshape(
                    out_h, bh, out_w, bw, 3
                ).mean(axis=(1, 3), dtype=np.float64)
                for yo in range(out_h):
                    for xo in range(out_w):
                        out["media_id"].append(mid)
                        out["format"].append(fmt)
                        out["y"].append(yo)
                        out["x"].append(xo)
                        out["r"].append(r6(float(blocks[yo, xo, 0])))
                        out["g"].append(r6(float(blocks[yo, xo, 1])))
                        out["b"].append(r6(float(blocks[yo, xo, 2])))
            yield pd.DataFrame(out)

    return media.mapInPandas(resize, schema=IMAGE_RESIZE_SCHEMA)
