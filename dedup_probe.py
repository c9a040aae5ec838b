#!/usr/bin/env python
"""Dedup-tier scale probe: run the MinHash+LSH near-dup pipeline (pair
finding AND cluster canonicalization) on synthetic corpora at two
sizes and record the scaling slope — the evidence that the LSH path's
cost grows ~linearly with corpus size (band-bucket joins + candidate-
scoped verification), not quadratically like all-pairs comparison.

The corpus is deterministic (hash-formula tokens, no RNG): each base
document is 40 tokens drawn from a 5000-word vocabulary by
murmur3(doc_id, position); every 10th document is a near-copy of its
predecessor with its last 4 tokens perturbed (3-shingle Jaccard
~0.81 — above the 0.5 threshold), giving a known planted near-dup
population of ~N/10 pairs whose recovery (recall >= 0.8, no
false-positive blowup) the probe asserts alongside the timings.

Prints ONE JSON line and writes DEDUP_PROBE.json. Like
``scale_probe.py``, this is a capacity/scaling probe, not a latency
headline — it is not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP_PROBE_DOCS", 100_000))
VOCAB = 5_000
DOC_LEN = 40


def synth_corpus(spark, n_docs: int):
    """(doc_id, text): deterministic token streams; doc 10k+1 is a
    near-copy of doc 10k (last 4 of 40 tokens differ)."""
    from pyspark.sql import functions as F

    base = F.when(
        F.col("id") % 10 == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    # Token at position p of doc d: w{murmur3(d, p) % VOCAB}. The hash
    # must be NONLINEAR in (d, p): any affine formula makes the corpus
    # windows of one periodic global stream, where every doc pair
    # shares nearly all shingles at some offset (measured: 5k docs
    # collapsed to 28 clusters). The copy keeps positions 1..36 of its
    # source and perturbs 37..40.
    tok = lambda d, p: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.hash(d, p), F.lit(VOCAB)).cast("string")
    )
    cols = []
    for p in range(1, DOC_LEN + 1):
        src_doc = base if p <= DOC_LEN - 4 else F.col("id")
        cols.append(tok(src_doc, F.lit(p)))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
    )


def main() -> None:
    from pagerank_spark.operators.dedup import (
        minhash_neardup_pairs,
        neardup_clusters,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for scale, n_docs in (("1x", BASE_DOCS), ("2x", 2 * BASE_DOCS)):
        corpus = synth_corpus(spark, n_docs).persist()
        corpus.count()

        t0 = time.perf_counter()
        pairs = minhash_neardup_pairs(corpus, threshold=0.5)
        n_pairs = pairs.count()
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
        # LSH is probabilistic: planted pairs sit at J ~ 0.81 (34 of
        # 42 union shingles), where the band config detects ~0.85-0.9
        # of pairs — assert recall >= 0.8 and no false-positive
        # blowup (hash tokens make accidental near-dups ~impossible).
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
        "metric": "dedup_probe_2x_slope",
        "value": slope,
        "unit": "ratio",
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "DEDUP_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    # A quadratic all-pairs core would show slope ~4; the LSH path
    # should stay near 2 (linear) plus fixed overheads.
    assert slope < 3.2, f"superlinear dedup scaling: {slope}"


if __name__ == "__main__":
    main()
