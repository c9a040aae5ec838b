"""Multimodal (image/audio/video) column plumbing for training pipelines.

The reference has no media surface; this is the extension tier from the
build brief: media travel as opaque ``binary`` payload columns with
typed metadata, and per-item decode / feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas`` — the only sane
shape at 100 TB (no driver materialization, vectorized Python batches,
schema declared up front so Catalyst can prune around the UDF).

The actual codec step is STUBBED: image/audio libraries are not in this
environment, so ``decode_media`` computes deterministic payload
statistics (exactly reproducible in SQL for the oracle gate) and
``extract_features`` derives a deterministic pseudo-embedding from the
bytes. The Spark-side plumbing — binary schema, Arrow batch iteration,
output schema, partition preservation — is real and tested; swapping in
PIL/ffmpeg is a local change inside the batch loop.
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
