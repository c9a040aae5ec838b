#!/usr/bin/env python
"""Multimodal tier scale probe (round-10): the only extension tier
without a growth artifact. Two claims measured at 2× corpus:

1. decode+hash is PER-ROW Arrow compute — ``ahash_image`` over
   synthesized 64×48 P6 images (real decoder, real integer pooling)
   costs ~linear in the image count (the plan carries zero exchanges;
   the probe measures the constant).
2. the banded Hamming pair join stays CANDIDATE-bounded — with one
   4-variant near-dup group per 4 images, pair-join cost tracks the
   true pair population (~linear), never the all-pairs square.

Corpus note: the q221 fixture generator's linear-ramp patterns
collapse to ~256 distinct bases mod 256, so at probe scale most
"different" groups are literally the same image — a true-dup-saturated
corpus where quadratic PAIR OUTPUT is the correct answer, not a join
defect. The probe therefore synthesizes HIGH-ENTROPY per-group noise
patterns (multiplicative-hash pixels): distinct groups sit ~32 bits
apart in Hamming space, so the only true near-dups are the planted
same-group variants (corner perturbation, a few pooled blocks). Band
collisions between random 16-bit band values appear at rate 2^-16 —
the documented saturation behavior of 4×16 banding; the exact Hamming
filter removes them, and at 2× corpus the candidate term grows 4× on
a 2^-16 constant while the true-pair term grows 2× — the asserted
combined slope < 3.0 covers both.

Asserted: every image hashes (no error rows), ≥ 90% of planted groups
emit at least one pair, every emitted pair is same-group (noise
patterns make cross-group Hamming ≤ 3 essentially impossible), and
both cost slopes at 2× stay < 3.0.

Writes MEDIA_PROBE.json. ~2-4 min; run per-round, not in bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_IMAGES = int(os.environ.get("SPARK_GRAFT_MEDIA_PROBE_IMAGES", 100_000))
W, H = 64, 48

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")



def release_session_state(spark) -> None:
    """Blocking release of every persistent RDD + caches + a GC kick
    between measurements — the ORDER_PROBE/bench lesson: a finished
    scale's resident blocks and old-gen garbage otherwise tax the NEXT
    scale's synth/decode wall by multiples (phantom slope)."""
    import gc

    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def synth_noise_media(ids):
    """(media_id, grp, variant) → P6 payloads: per-group pseudo-random
    pixels via multiplicative hashing (high entropy — distinct groups
    are wholesale-different), variant r > 0 shifts a 2r×6 corner by
    128 like the library generator."""
    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(H, dtype=np.uint64),
            np.arange(W, dtype=np.uint64),
            np.arange(3, dtype=np.uint64),
            indexing="ij",
        )
        mix = (
            x * np.uint64(2246822519)
            ^ y * np.uint64(3266489917)
            ^ c * np.uint64(668265263)
        )
        header_tail = f" {W} {H} 255\n".encode()
        for pdf in batches:
            payloads = []
            for g, r in zip(pdf["grp"], pdf["variant"]):
                h = (
                    np.uint64((int(g) + 1) * 2654435761)
                    ^ mix
                ) * np.uint64(0x9E3779B97F4A7C15)
                arr = ((h >> np.uint64(33)) % np.uint64(256)).astype(
                    "uint8"
                )
                if int(r) > 0:
                    m = (x < np.uint64(2 * int(r))) & (y < np.uint64(6))
                    arr = np.where(m, (arr + 128) % 256, arr).astype(
                        "uint8"
                    )
                payloads.append(b"P6" + header_tail + arr.tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return ids.mapInPandas(synth, schema="media_id BIGINT, payload BINARY")




def synth_noise_audio(ids, n_samples=2048, n_blocks=64, flac=False):
    """(media_id, grp, variant) → audio payloads: per-(group, block)
    pseudo-random amplitudes via multiplicative hashing (high entropy —
    distinct groups are wholesale-different in energy profile; the
    library generator's (11·(g+1)·(b+1)) mod 128 amplitudes repeat
    every 128 groups, which at probe scale would alias groups exactly
    like the image ramp). Variant r > 0 re-amplifies blocks b < r."""
    import pandas as pd

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pagerank_spark.operators.flac import encode_flac

        i = np.arange(n_samples, dtype=np.int64)
        b = i * n_blocks // n_samples
        rate = 8000
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
            for g, r in zip(pdf["grp"], pdf["variant"]):
                h = (
                    np.uint64((int(g) + 1) * 2654435761)
                    ^ (b.astype(np.uint64) * np.uint64(3266489917))
                ) * np.uint64(0x9E3779B97F4A7C15)
                amp = 256 * (1 + ((h >> np.uint64(33)) % np.uint64(128)).astype(np.int64))
                if int(r) > 0:
                    amp = np.where(b < int(r), 256 * (1 + (amp // 256 - 1 + 64) % 128), amp)
                wave = (9973 * i) % (2 * amp) - amp
                if flac:
                    payloads.append(encode_flac([int(s) for s in wave], rate, 16, 576))
                else:
                    payloads.append(header + wave.astype("<i2").tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    return ids.mapInPandas(synth, schema="media_id BIGINT, payload BINARY")


def audio_axis(spark, results, base_clips, flac=False, tag="audio_wav"):
    """Same two claims as the image axis, over the audio fingerprint:
    per-clip linear decode+fingerprint, candidate-bounded pair join;
    planted same-group recall with high-entropy cross-group profiles."""
    from pyspark.sql import functions as F

    from pagerank_spark.operators.multimodal import (
        audio_blockprint,
        hamming_near_dup_pairs,
    )

    for scale, n in (("1x", base_clips), ("2x", 2 * base_clips)):
        ids = spark.range(n).select(
            F.col("id").alias("media_id"),
            (F.col("id") / 4).cast("long").alias("grp"),
            (F.col("id") % 4).alias("variant"),
        )
        media = synth_noise_audio(ids, flac=flac)

        t0 = time.perf_counter()
        hashes = audio_blockprint(media).persist()
        n_hashed = hashes.where(F.col("b0").isNotNull()).count()
        t_hash = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        pairs = hamming_near_dup_pairs(hashes, max_dist=3)
        agg = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(
                    (F.col("id_a") / 4).cast("long")
                    == (F.col("id_b") / 4).cast("long"),
                    1,
                ).otherwise(0)
            ).alias("same_group"),
            F.countDistinct(
                (F.col("id_a") / 4).cast("long")
            ).alias("groups_with_pair"),
        ).collect()[0]
        t_pairs = round(time.perf_counter() - t0, 2)
        hashes.unpersist()
        release_session_state(spark)

        n_groups = n // 4
        results[f"{tag}_{scale}"] = {
            "n_clips": n,
            "decode_fp_sec": t_hash,
            "pair_join_sec": t_pairs,
            "n_pairs": agg["n_pairs"],
            "same_group_pairs": agg["same_group"],
            "groups_with_pair": agg["groups_with_pair"],
            "n_groups": n_groups,
        }
        assert n_hashed == n, (n_hashed, n)
        assert agg["same_group"] == agg["n_pairs"], results[f"{tag}_{scale}"]
        assert agg["groups_with_pair"] >= 0.9 * n_groups, results[f"{tag}_{scale}"]
    slope_fp = round(
        results[f"{tag}_2x"]["decode_fp_sec"]
        / max(0.01, results[f"{tag}_1x"]["decode_fp_sec"]), 2)
    slope_pairs = round(
        results[f"{tag}_2x"]["pair_join_sec"]
        / max(0.01, results[f"{tag}_1x"]["pair_join_sec"]), 2)
    return slope_fp, slope_pairs


def image_axis(spark, results):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.multimodal import (
        ahash_image,
        hamming_near_dup_pairs,
    )

    for scale, n in (("1x", BASE_IMAGES), ("2x", 2 * BASE_IMAGES)):
        ids = spark.range(n).select(
            F.col("id").alias("media_id"),
            (F.col("id") / 4).cast("long").alias("grp"),
            (F.col("id") % 4).alias("variant"),
        )
        media = synth_noise_media(ids)

        t0 = time.perf_counter()
        hashes = ahash_image(media).persist()
        n_hashed = hashes.where(F.col("b0").isNotNull()).count()
        t_hash = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        pairs = hamming_near_dup_pairs(hashes, max_dist=3)
        agg = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(
                    (F.col("id_a") / 4).cast("long")
                    == (F.col("id_b") / 4).cast("long"),
                    1,
                ).otherwise(0)
            ).alias("same_group"),
            F.countDistinct(
                (F.col("id_a") / 4).cast("long")
            ).alias("groups_with_pair"),
        ).collect()[0]
        t_pairs = round(time.perf_counter() - t0, 2)
        hashes.unpersist()
        release_session_state(spark)

        n_groups = n // 4
        results[scale] = {
            "n_images": n,
            "decode_hash_sec": t_hash,
            "pair_join_sec": t_pairs,
            "n_pairs": agg["n_pairs"],
            "same_group_pairs": agg["same_group"],
            "groups_with_pair": agg["groups_with_pair"],
            "n_groups": n_groups,
        }
        assert n_hashed == n, (n_hashed, n)
        assert agg["same_group"] == agg["n_pairs"], results[scale]
        assert agg["groups_with_pair"] >= 0.9 * n_groups, results[scale]

    return results


def _run_axis(axis: str) -> None:
    """One axis per process: measured back-to-back in one session, a
    finished axis's residual JVM state (old-gen garbage from ~GB-scale
    Arrow payload churn) taxed the NEXT axis's wall by up to 11x — the
    ORDER_PROBE phantom-slope lesson at session scale. Stages:
    `images` / `wav` / `flac`, then `finalize` merges /tmp partials."""
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name=f"media-probe-{axis}")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    base_audio = int(
        os.environ.get("SPARK_GRAFT_MEDIA_PROBE_CLIPS", 50_000)
    )
    if axis == "images":
        image_axis(spark, results)
    elif axis == "wav":
        audio_axis(spark, results, base_audio, flac=False, tag="audio_wav")
    elif axis == "flac":
        audio_axis(
            spark, results, max(500, base_audio // 25), flac=True,
            tag="audio_flac",
        )
    with open(f"/tmp/media_probe_{axis}.json", "w") as f:
        json.dump(results, f)
    print(json.dumps(results))
    spark.stop()


def main() -> None:
    results: dict[str, dict] = {}
    for axis in ("images", "wav", "flac"):
        results.update(json.load(open(f"/tmp/media_probe_{axis}.json")))

    def slope(tag, field):
        return round(
            results[f"{tag}2x"][field]
            / max(0.01, results[f"{tag}1x"][field]),
            2,
        )

    hash_slope = slope("", "decode_hash_sec")
    pair_slope = slope("", "pair_join_sec")
    wav_fp_slope = slope("audio_wav_", "decode_fp_sec")
    wav_pair_slope = slope("audio_wav_", "pair_join_sec")
    flac_fp_slope = slope("audio_flac_", "decode_fp_sec")
    flac_pair_slope = slope("audio_flac_", "pair_join_sec")

    out = {
        "metric": "media_probe_2x_slopes",
        "decode_hash_slope": hash_slope,
        "pair_join_slope": pair_slope,
        "audio_wav_fp_slope": wav_fp_slope,
        "audio_wav_pair_slope": wav_pair_slope,
        "audio_flac_fp_slope": flac_fp_slope,
        "audio_flac_pair_slope": flac_pair_slope,
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "MEDIA_PROBE.json"), "w") as f:
        f.write(line + "\n")
    assert hash_slope < 3.0, f"superlinear decode+hash: {hash_slope}"
    assert pair_slope < 3.0, f"superlinear banded pair join: {pair_slope}"
    for name, s in (
        ("audio wav fp", wav_fp_slope), ("audio wav pairs", wav_pair_slope),
        ("audio flac fp", flac_fp_slope), ("audio flac pairs", flac_pair_slope),
    ):
        assert s < 3.0, f"superlinear {name}: {s}"


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("images", "wav", "flac"):
        _run_axis(sys.argv[1])
    else:
        main()
