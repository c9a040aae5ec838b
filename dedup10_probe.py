#!/usr/bin/env python
"""Dedup pipeline one decade up (round-8 verdict #6): the full
MinHash→LSH→verify→cluster path at 1M and 2M documents — 10× the
corpus `DEDUP_PROBE.json` tops out at (100k/200k) — to confirm the
measured subquadratic ratios hold where shuffle volume starts to
matter (40M/80M exploded shingle rows, the regime the 10M-edge
`scale_probe.py` covers for the graph tier).

Same corpus generator, planted-pair population, and assertions as
``dedup_probe.py`` (deterministic hash tokens, every 10th doc a
near-copy at 3-shingle Jaccard ~0.81, recall ≥ 0.8, no false-positive
blowup, 2× cost slope < 3.2). At 2M docs the cluster step crosses the
1M-pair driver union-find gate only if pair count does — with ~200k
planted pairs it stays on the driver path, exercising the same
size-gate decision the operator makes in production.

Writes DEDUP10_PROBE.json. Slow (~5-10 min) — run per-round, not in
bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP10_PROBE_DOCS", 1_000_000))

# local[32] packs all 32 tasks into ONE JVM, so the default 8g heap
# gives each task ~150 MB of execution memory — the 2M-doc pass
# (80M exploded shingle rows in flight) dies with
# UNABLE_TO_ACQUIRE_MEMORY there, measured. A real cluster sizes
# executor memory per core; the single-JVM probe equivalent is a
# bigger driver heap. Respect an explicit override.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    from dedup_probe import synth_corpus
    from pagerank_spark.operators.dedup import (
        minhash_neardup_pairs,
        neardup_clusters,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="dedup10-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for scale, n_docs in (("1x", BASE_DOCS), ("2x", 2 * BASE_DOCS)):
        corpus = synth_corpus(spark, n_docs).persist()
        corpus.count()

        t0 = time.perf_counter()
        n_pairs = minhash_neardup_pairs(corpus, threshold=0.5).count()
        t_pairs = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        clusters = neardup_clusters(corpus, threshold=0.5)
        n_kept = clusters.where("doc_id = canonical_id").count()
        t_clusters = round(time.perf_counter() - t0, 2)
        corpus.unpersist()

        planted = n_docs // 10
        results[scale] = {
            "n_docs": n_docs,
            "pairs_sec": t_pairs,
            "clusters_sec": t_clusters,
            "n_pairs": n_pairs,
            "n_representatives": n_kept,
            "planted_pairs": planted,
        }
        assert n_pairs >= 0.8 * planted, (n_pairs, planted)
        assert n_pairs <= 1.05 * planted, (n_pairs, planted)
        assert n_kept >= n_docs - n_pairs, (n_kept, n_docs)

    slope = round(
        (results["2x"]["pairs_sec"] + results["2x"]["clusters_sec"])
        / max(
            0.01,
            results["1x"]["pairs_sec"] + results["1x"]["clusters_sec"],
        ),
        2,
    )
    out = {
        "metric": "dedup10_probe_2x_slope",
        "value": slope,
        "unit": "ratio",
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "DEDUP10_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    assert slope < 3.2, f"superlinear dedup scaling at 1M docs: {slope}"


if __name__ == "__main__":
    main()
