#!/usr/bin/env python
"""LOGREG_PROBE.json — scale evidence for q253's distributed trainer.

Two growth axes, measured on a synthetic corpus built by replicating
the sf0.01 documents with fresh ids (so token distributions stay
realistic while N scales):

- **corpus axis**: total training time at 100k vs 200k docs, fixed 4
  rounds. Expected ~2× (each round is one pass over the cached feature
  relation + one dim-sized gradient); super-linear growth would mean
  the round plan is re-shuffling the big relation.
- **rounds axis**: 2 vs 8 rounds at 100k docs. The marginal cost per
  extra round must be flat (driver-held weights → zero lineage
  compounding; a growing plan would make late rounds progressively
  slower — the classic iterative-lineage failure the VertexLoop
  discipline exists to prevent, achieved here by construction).

Also records the per-round time series of the 8-round run (first vs
last round ratio ≈ 1.0 is the lineage-flatness signature) and the
trained scorer's separation on a planted token signal.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, replication: int):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return (
        docs.select(
            "doc_id", "text",
            F.explode(
                F.sequence(F.lit(0), F.lit(replication - 1))
            ).alias("rep"),
        )
        .select(
            (F.col("doc_id") * replication + F.col("rep")).alias("doc_id"),
            "text",
        )
    )


def train_timed(spark, corpus, rounds):
    from pagerank_spark.operators.classifier import (
        hashed_token_features,
        logreg_train,
    )
    from pagerank_spark.functions import word_tokens

    feats = hashed_token_features(
        corpus, n_features=1024, normalize=True
    )
    labels = corpus.select(
        "doc_id",
        F.array_contains(word_tokens(F.lower(F.col("text"))), "vector")
        .cast("double")
        .alias("y"),
    )
    t0 = time.perf_counter()
    model = logreg_train(
        feats, labels, rounds=rounds, lr=1.0, track_loss=True
    )
    return time.perf_counter() - t0, model


def main() -> None:
    from pagerank_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # corpus axis at two scales: 100k/200k (overhead-dominated on
    # local[32] — the sub-1 slope shows fixed costs, not work, dominate
    # there) and 1M/2M (~80M/160M feature rows — compute-dominated,
    # where the slope is the real growth exponent)
    t100k, _ = train_timed(spark, build_corpus(spark, 200), rounds=4)
    t200k, _ = train_timed(spark, build_corpus(spark, 400), rounds=4)
    out["train4_100k_sec"] = round(t100k, 3)
    out["train4_200k_sec"] = round(t200k, 3)
    out["corpus_2x_slope_100k"] = round(t200k / t100k, 3)
    t1m, _ = train_timed(spark, build_corpus(spark, 2000), rounds=4)
    t2m, _ = train_timed(spark, build_corpus(spark, 4000), rounds=4)
    out["train4_1m_sec"] = round(t1m, 3)
    out["train4_2m_sec"] = round(t2m, 3)
    out["corpus_2x_slope_1m"] = round(t2m / t1m, 3)

    # rounds axis at 100k docs
    t2, _ = train_timed(spark, build_corpus(spark, 200), rounds=2)
    t8, m8 = train_timed(spark, build_corpus(spark, 200), rounds=8)
    out["train2_100k_sec"] = round(t2, 3)
    out["train8_100k_sec"] = round(t8, 3)
    out["marginal_round_sec"] = round((t8 - t2) / 6, 3)
    out["rounds_4x_slope"] = round(t8 / t2, 3)
    out["loss_first"] = round(m8.losses[0], 6)
    out["loss_last"] = round(m8.losses[-1], 6)
    assert m8.losses[-1] < m8.losses[0], "training must reduce loss"

    with open("/root/repo/LOGREG_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
