#!/usr/bin/env python
"""SemDeDup-tier scale probe (round-6 verdict #7): run
``semantic_dedup`` on synthetic embedding corpora with PLANTED
semantic copies at two sizes and record the scaling slope plus
planted-copy recall — the evidence that the cluster-bounded pair work
((n/k)² per cluster, k grown with the corpus) stays ~linear end-to-end
and actually finds the near-duplicates, matching DEDUP_PROBE.json's
shape for the MinHash tier.

Corpus (deterministic, no RNG): 256 hash-formula topic centers on the
unit-ish sphere in 16 dims; doc d = center(topic(d)) + 0.45·noise(d),
so same-topic non-copies sit near cosine ~0.83 — well under the 0.98
threshold — while every 10th doc is its predecessor plus 0.05·noise
(cosine ~0.999, above threshold iff both land in the same k-means
cluster). Planted population: ~N/10 drops.

Also records the k-trade at fixed N (k=32 vs k=64): larger codebooks
cost more assignment work (n×k broadcast join) but shrink the
quadratic pair term (n²/k) — the measured trade the operator's
docstring claims.

Prints ONE JSON line and writes SEMDEDUP_PROBE.json. Capacity probe,
not a latency headline — not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_PROBE_DOCS", 50_000))
DIM = 16
TOPICS = 256
THRESHOLD = 0.98


def synth_embeddings(spark, n_docs: int):
    """(vec_id, embedding): doc d = topic_center + 0.45·noise; docs with
    id % 10 == 1 are their predecessor + 0.05·noise instead."""
    from pyspark.sql import functions as F

    def unit(seed_col, j, scale):
        # component j of a hash-formula vector in [-scale, scale]
        return (
            (F.pmod(F.hash(seed_col, F.lit(j)), F.lit(2001)) - 1000)
            / 1000.0
            * scale
        )

    is_copy = F.col("id") % 10 == 1
    src = F.when(is_copy, F.col("id") - 1).otherwise(F.col("id"))
    topic = F.pmod(F.hash(src, F.lit("t")), F.lit(TOPICS))
    comps = []
    for j in range(DIM):
        center = unit(topic, j, 1.0)
        base_noise = unit(src, j + 1000, 0.45)
        copy_jitter = F.when(is_copy, unit(F.col("id"), j + 2000, 0.05)).otherwise(
            F.lit(0.0)
        )
        comps.append(center + base_noise + copy_jitter)
    return spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.array(*comps).alias("embedding"),
    )


def run(spark, n_docs: int, k: int) -> dict:
    from pagerank_spark.operators.similarity import semantic_dedup

    corpus = synth_embeddings(spark, n_docs).persist()
    corpus.count()
    t0 = time.perf_counter()
    out = semantic_dedup(
        corpus, k=k, iterations=2, threshold=THRESHOLD
    ).persist()
    n_dropped = out.where("NOT keep").count()
    wall = round(time.perf_counter() - t0, 2)
    planted = n_docs // 10
    # recall: planted copies (id % 10 == 1) flagged keep=false
    recalled = out.where("NOT keep AND vec_id % 10 = 1").count()
    out.unpersist()
    corpus.unpersist()
    return {
        "n_docs": n_docs,
        "k": k,
        "sec": wall,
        "n_dropped": n_dropped,
        "planted_copies": planted,
        "recalled": recalled,
        "recall": round(recalled / planted, 4),
    }


def main() -> None:
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    r1 = run(spark, BASE_DOCS, k=64)
    r2 = run(spark, 2 * BASE_DOCS, k=128)  # k grows with the corpus
    k_half = run(spark, BASE_DOCS, k=32)  # the k vs (n/k)^2 trade row

    for r in (r1, r2):
        assert r["recall"] >= 0.9, f"planted-copy recall too low: {r}"
        # false drops bounded: same-topic non-copies sit ~0.83 cosine
        assert r["n_dropped"] <= 1.15 * r["planted_copies"], r

    slope = round(r2["sec"] / max(r1["sec"], 0.01), 2)
    out = {
        "metric": "semdedup_probe_2x_slope",
        "value": slope,
        "unit": "ratio",
        "threshold": THRESHOLD,
        "dim": DIM,
        "runs": {"1x_k64": r1, "2x_k128": r2, "1x_k32": k_half},
        "k_trade_sec": {"k32": k_half["sec"], "k64": r1["sec"]},
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "SEMDEDUP_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    # all-pairs would be slope ~4; cluster-bounded with k ∝ n stays
    # near 2 (linear) plus the codebook assignment's n×k growth.
    assert slope < 3.2, f"superlinear semdedup scaling: {slope}"


if __name__ == "__main__":
    main()
