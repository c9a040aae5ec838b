"""transformWithStateInPandas: typed state must converge to the batch fold."""

from __future__ import annotations

import os

import pytest

from pagerank_spark.io import load_table
from pagerank_spark.streaming import read_event_stream
from pagerank_spark.streaming.stateful2 import (
    HAS_TWS,
    HAS_TWS_RUNTIME,
    ROCKSDB_PROVIDER,
    user_profile_batch,
    user_profile_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not HAS_TWS, reason="transformWithStateInPandas requires Spark >= 4.0"
)


@pytest.fixture()
def event_dir(spark, tmp_path):
    out = str(tmp_path / "events_tws")
    load_table(spark, SF_DIR, "events").repartition(3).write.parquet(out)
    return out


def _as_dict(rows):
    return {
        r["user_id"]: (
            r["n_events"], r["sum_value"], r["top_values"], r["type_counts"]
        )
        for r in rows
    }


def test_batch_twin_matches_sql(spark, event_dir):
    from pyspark.sql import functions as F

    batch = spark.read.parquet(event_dir)
    got = _as_dict(user_profile_batch(batch).collect())
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert got[u][1] == pytest.approx(want[u][1], abs=1e-6)
        # top_values holds at most TOP_K formatted values, sorted desc
        vals = [float(x) for x in got[u][2].split(",") if x]
        assert vals == sorted(vals, reverse=True)
        assert len(vals) <= 3


@pytest.mark.skipif(
    not HAS_TWS_RUNTIME,
    reason="typed-state API client needs google.protobuf (not in this env)",
)
def test_tws_stream_converges_to_batch(spark, event_dir):
    batch_profiles = _as_dict(
        user_profile_batch(spark.read.parquet(event_dir)).collect()
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, ROCKSDB_PROVIDER)
    try:
        stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
        q = (
            user_profile_stream(stream)
            .writeStream.format("memory")
            .queryName("tws_profile_test")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM tws_profile_test").collect()
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)

    # One update per (user, micro-batch); the row with the max n_events
    # per user is the converged profile == the batch fold.
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            final[r["user_id"]] = (
                r["n_events"], r["sum_value"], r["top_values"], r["type_counts"]
            )

    assert set(final) == set(batch_profiles)
    for u, want in batch_profiles.items():
        got = final[u]
        assert got[0] == want[0]
        assert got[1] == pytest.approx(want[1], abs=1e-2)
        assert got[2] == want[2]
        assert got[3] == want[3]
