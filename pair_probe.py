#!/usr/bin/env python
"""Raw pair-operator growth probe (round-8 verdict #4): the
inverted-index pair family (``jaccard_pairs`` / ``containment_pairs``)
measured on an ADVERSARIAL hot-shingle corpus — every document carries
3 stopword tokens shared by the whole corpus, so the uncapped
self-join's intersection relation is Θ(N²) by construction (every doc
pair co-occurs in a hot bucket). Three plans over identical corpora at
1× and 2×:

- ``uncapped``   — containment_pairs, no df cap: the scale hazard the
  round-8 verdict flagged; its 2× cost slope should approach 4
  (quadratic), the measured DEMONSTRATION of why it is no longer a
  declared plan.
- ``capped``     — max_doc_freq=100 drops the hot shingles before the
  self-join (normal tokens sit at df ~18-36, far under the cap); the
  slope should fall back toward ~2 with planted recall intact, the
  measured effect of the cap knob.
- ``candidates`` — MinHash-LSH banded candidates feeding the
  containment verifier, the plan q187 declares since round 9; slope
  should also stay subquadratic.
- ``jaccard_capped`` — same capped core through ``jaccard_pairs``
  (shared inverted-index machinery, recorded for completeness).

Corpus: deterministic (no RNG) hash-formula tokens as in
``dedup_probe.py`` — 30 tokens from a 10000-word vocab per doc, every
10th doc a near-copy of its predecessor with the last 4 tokens
perturbed (unigram containment ~0.87, above the 0.8 threshold), plus
the 3 corpus-wide hot tokens. Planted pairs = N/10; hot-only overlap
is 3/33 ≈ 0.09, far below threshold, so output stays planted-only
while the UNCAPPED plan's intermediate work explodes — exactly the
"tiny answer, quadratic plan" failure mode.

Prints ONE JSON line and writes PAIR_PROBE.json. Capacity/evidence
probe, not a latency headline — not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_PAIR_PROBE_DOCS", 6_000))
VOCAB = 10_000
DOC_LEN = 30
N_HOT = 3
CAP = 100


def synth_corpus(spark, n_docs: int):
    """(doc_id, text): dedup_probe's nonlinear hash-token stream plus
    N_HOT corpus-wide stopword tokens appended to EVERY doc."""
    from pyspark.sql import functions as F

    base = F.when(
        F.col("id") % 10 == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    tok = lambda d, p: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.hash(d, p), F.lit(VOCAB)).cast("string")
    )
    cols = []
    for p in range(1, DOC_LEN + 1):
        src_doc = base if p <= DOC_LEN - 4 else F.col("id")
        cols.append(tok(src_doc, F.lit(p)))
    cols.extend(F.lit(f"hot{h}") for h in range(N_HOT))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
    )


def main() -> None:
    from pagerank_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="pair-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM/codegen/shuffle-service first-run costs land on a
    # throwaway corpus, not the 1x timing (unwarmed, the 1x pass
    # measured SLOWER than 2x and every slope read below 1.0).
    warm = synth_corpus(spark, 500).persist()
    warm.count()
    containment_pairs(warm, n=1, threshold=0.8, max_doc_freq=CAP).count()
    warm.unpersist()

    results: dict[str, dict] = {}
    for scale, n_docs in (("1x", BASE_DOCS), ("2x", 2 * BASE_DOCS)):
        corpus = synth_corpus(spark, n_docs).persist()
        corpus.count()
        planted = n_docs // 10
        rec: dict[str, object] = {"n_docs": n_docs, "planted": planted}

        t0 = time.perf_counter()
        n_unc = containment_pairs(
            corpus, n=1, threshold=0.8, max_doc_freq=None
        ).count()
        rec["uncapped_sec"] = round(time.perf_counter() - t0, 2)
        rec["uncapped_pairs"] = n_unc

        t0 = time.perf_counter()
        n_cap = containment_pairs(
            corpus, n=1, threshold=0.8, max_doc_freq=CAP
        ).count()
        rec["capped_sec"] = round(time.perf_counter() - t0, 2)
        rec["capped_pairs"] = n_cap

        t0 = time.perf_counter()
        sh = word_shingles(corpus, "doc_id", "text", n=1)
        cands = lsh_candidate_pairs(
            minhash_signatures(sh, "doc_id"), "doc_id"
        )
        n_cand = containment_pairs(
            corpus, n=1, threshold=0.8, candidates=cands, shingled=sh
        ).count()
        rec["candidates_sec"] = round(time.perf_counter() - t0, 2)
        rec["candidates_pairs"] = n_cand

        t0 = time.perf_counter()
        n_jac = jaccard_pairs(
            word_shingles(corpus, "doc_id", "text", n=1),
            "doc_id",
            threshold=0.7,
            max_doc_freq=CAP,
        ).count()
        rec["jaccard_capped_sec"] = round(time.perf_counter() - t0, 2)
        rec["jaccard_capped_pairs"] = n_jac

        corpus.unpersist()
        results[scale] = rec

        # Output correctness: exhaustive self-join plans recover the
        # planted pairs exactly (hot-only overlap is far below the
        # threshold, hash tokens make accidental near-dups
        # ~impossible); LSH candidates are probabilistic at the
        # planted containment — recall >= 0.8 with exact verification
        # keeping false positives out.
        assert 0.95 * planted <= n_unc <= 1.05 * planted, (n_unc, planted)
        assert 0.95 * planted <= n_cap <= 1.05 * planted, (n_cap, planted)
        assert 0.8 * planted <= n_cand <= 1.05 * planted, (n_cand, planted)

    slopes = {
        plan: round(
            results["2x"][f"{plan}_sec"]
            / max(0.01, results["1x"][f"{plan}_sec"]),
            2,
        )
        for plan in ("uncapped", "capped", "candidates", "jaccard_capped")
    }
    out = {
        "metric": "pair_probe_capped_2x_slope",
        "value": slopes["capped"],
        "unit": "ratio",
        "slopes": slopes,
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "PAIR_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    # The bounded plans must stay subquadratic; the uncapped plan must
    # measurably out-grow the capped one (the cap's effect) — it
    # trends to 4 as N grows but fixed overheads damp it at probe N.
    assert slopes["capped"] < 3.2, f"capped superlinear: {slopes}"
    assert slopes["candidates"] < 3.2, f"candidates superlinear: {slopes}"
    assert slopes["jaccard_capped"] < 3.2, f"jaccard superlinear: {slopes}"
    assert slopes["uncapped"] >= slopes["capped"] + 0.5, (
        f"cap effect not visible: {slopes}"
    )


if __name__ == "__main__":
    main()
