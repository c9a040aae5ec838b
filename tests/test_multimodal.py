"""Multimodal binary-column plumbing: schema, determinism, batch shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_spark.io import load_table
from pagerank_spark.operators import multimodal
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return multimodal.documents_as_media(docs).persist()


def test_media_schema_is_binary(media):
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_id"] == "bigint"


def test_decode_media_stats_match_python(spark, media):
    decoded = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(decoded) == set(src)
    for mid, payload in src.items():
        row = decoded[mid]
        assert row["n_bytes"] == len(payload)
        assert row["mean_byte"] == pytest.approx(sum(payload) / len(payload))
        assert row["digest"] == hashlib.md5(payload).hexdigest()


def test_extract_features_deterministic_and_shaped(spark, media):
    a = {r["media_id"]: r["feature"] for r in
         multimodal.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in
         multimodal.extract_features(media.repartition(7)).collect()}
    assert a == b  # identical across partitionings/executors
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)


def test_features_feed_similarity_ops(spark, media):
    # The stub embedding is a first-class array<float>: the ANN operator
    # consumes it directly (identical payloads → cosine 1 neighbors).
    from pagerank_spark.operators.similarity import ann_topk_bruteforce

    feats = multimodal.extract_features(media)
    out = ann_topk_bruteforce(
        feats, feats.limit(3), k=2, id_col="media_id", vec_col="feature"
    )
    assert out.count() == 6  # 3 queries × top-2


def test_frame_sample_plan(spark):
    meta = spark.createDataFrame(
        [(1, 30.0, 3.5), (2, 24.0, 0.2)], ["media_id", "fps", "duration_s"]
    )
    rows = multimodal.frame_sample_plan(meta, every_s=1.0).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(
            (r["sample_ts"], r["frame_index"])
        )
    assert by_media[1] == [(0.0, 0), (1.0, 30), (2.0, 60)]
    assert by_media[2] == [(0.0, 0)]  # at least one sample
