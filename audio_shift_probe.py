#!/usr/bin/env python
"""Audio fingerprint time-shift robustness (round-14 verdict #6).

``audio_blockprint`` is GAIN-invariant by construction (both sides of
every block-energy comparison scale by c²; pytest-pinned) but its
time-block grid is anchored at sample 0, so a time SHIFT slides
content across block boundaries and flips energy bits. This probe
QUANTIFIES that sensitivity so users read the fingerprint as an
exact-ish near-dup signal (same master, re-containered / re-gained /
re-encoded lossless), NOT a Shazam-style alignment-robust fingerprint.

Method: N deterministic pseudo-random clips (64 blocks × 128
samples, the blockprint grid); for each shift δ the clip is rotated
by δ samples (energy content identical — only alignment changes) and
fingerprinted. Recall@δ = fraction of clips whose rotated copy stays
within the q264 detection bound (Hamming ≤ 3, the banded-join
pigeonhole); the mean Hamming distance is recorded alongside.

Expected shape (asserted loosely): recall ≈ 1 at δ = 1 sample
(sub-1% of a block barely moves block energies), decaying as δ
approaches the 128-sample block length; δ = one full block is a
circular shift of the 64-bit pattern by one position, whose Hamming
distance equals the pattern's transition count — far above 3 for
noise-profile clips, so recall ≈ 0. Merges an
``audio_shift_robustness`` section into MEDIA_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CLIPS = int(os.environ.get("SPARK_GRAFT_SHIFT_PROBE_CLIPS", 2000))
N_BLOCKS = 64
BLOCK_LEN = 128
N_SAMPLES = N_BLOCKS * BLOCK_LEN
SHIFTS = [1, 8, 32, 64, 128]
MAX_DIST = 3  # the q264 banded-join detection bound


def synth_shifted(spark, n_clips: int):
    """(media_id, shift) → WAV payload of the clip rotated by shift
    samples. media_id encodes (clip, shift): media_id = clip * 1000 +
    shift_index; shift_index 0 is the unshifted base."""
    import pandas as pd
    from pyspark.sql import functions as F

    ids = spark.range(n_clips).select(
        F.col("id").alias("clip"),
        F.explode(
            F.array(*[F.lit(i) for i in range(len(SHIFTS) + 1)])
        ).alias("si"),
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(N_SAMPLES, dtype=np.int64)
        b = i // BLOCK_LEN
        rate = 8000
        data_size = N_SAMPLES * 2
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
            out_ids, payloads = [], []
            for clip, si in zip(pdf["clip"], pdf["si"]):
                h = (
                    np.uint64((int(clip) + 1) * 2654435761)
                    ^ (b.astype(np.uint64) * np.uint64(3266489917))
                ) * np.uint64(0x9E3779B97F4A7C15)
                amp = 256 * (
                    1
                    + ((h >> np.uint64(33)) % np.uint64(128)).astype(
                        np.int64
                    )
                )
                wave = (9973 * i) % (2 * amp) - amp
                if int(si) > 0:
                    wave = np.roll(wave, SHIFTS[int(si) - 1])
                out_ids.append(int(clip) * 1000 + int(si))
                payloads.append(header + wave.astype("<i2").tobytes())
            yield pd.DataFrame({"media_id": out_ids, "payload": payloads})

    return ids.mapInPandas(synth, schema="media_id BIGINT, payload BINARY")


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.multimodal import audio_blockprint
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="audio-shift-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    fp = audio_blockprint(synth_shifted(spark, N_CLIPS)).select(
        (F.col("media_id") / 1000).cast("long").alias("clip"),
        (F.col("media_id") % 1000).cast("int").alias("si"),
        "b0", "b1", "b2", "b3",
    ).persist()
    n_rows = fp.count()
    sec_fp = round(time.time() - t0, 3)
    assert n_rows == N_CLIPS * (len(SHIFTS) + 1)

    base = fp.where(F.col("si") == 0).select(
        "clip",
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    dist = sum(
        F.bit_count(
            F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")).cast("long")
        )
        for i in range(4)
    )
    per_shift = (
        fp.where(F.col("si") > 0)
        .join(base, on="clip")
        .groupBy("si")
        .agg(
            F.avg((dist <= MAX_DIST).cast("double")).alias("recall"),
            F.avg(dist).alias("mean_hamming"),
        )
        .collect()
    )
    shifts = {}
    for r in sorted(per_shift, key=lambda r: r["si"]):
        shifts[str(SHIFTS[r["si"] - 1])] = {
            "recall_at_dist3": round(float(r["recall"]), 4),
            "mean_hamming": round(float(r["mean_hamming"]), 2),
        }
    fp.unpersist()

    out = {
        "n_clips": N_CLIPS,
        "n_blocks": N_BLOCKS,
        "block_len_samples": BLOCK_LEN,
        "max_dist": MAX_DIST,
        "sec_fingerprint": sec_fp,
        "by_shift_samples": shifts,
        "note": (
            "rotation by delta samples; recall is vs the q264 banded "
            "Hamming<=3 bound — exact-ish near-dup signal, not an "
            "alignment-robust fingerprint"
        ),
    }

    # shape asserts: near-perfect at 1-sample shift, near-dead at a
    # full-block shift, monotone-ish in between
    assert shifts["1"]["recall_at_dist3"] >= 0.95, shifts
    assert shifts["128"]["recall_at_dist3"] <= 0.2, shifts
    assert (
        shifts["1"]["mean_hamming"] <= shifts["128"]["mean_hamming"]
    ), shifts

    path = os.path.join(REPO, "MEDIA_PROBE.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged["audio_shift_robustness"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"audio_shift_robustness": out}))
    spark.stop()


if __name__ == "__main__":
    main()
