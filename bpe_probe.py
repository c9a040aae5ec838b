#!/usr/bin/env python
"""BPE training one decade up (round-9 verdict #6): ``bpe_train`` is
the one iterative text operator without a growth artifact. Its scale
claim (operators/text.py:537): the corpus collapses to the
(word, freq) VOCABULARY relation once — corpus size matters exactly
once — and every merge round is then a pair-count shuffle over the
vocabulary, so PER-ROUND cost must be bound by the word-type count,
not the corpus row count.

Probe design: two corpora (1M and 2M docs, ~30M and ~60M running
words) drawn from the SAME deterministic 50k-word-type population —
the natural-language regime where doubling the corpus barely grows
the vocabulary. Train at merges=2 and merges=30 on each; the marginal
per-round cost is (t30 − t2)/28, which cancels the corpus-bound
collapse prefix both runs share. Vocab-bound means the 2× corpus's
per-round cost stays ~flat (assert < 1.6× — generous for host noise;
corpus-bound behavior would show ~2×).

Writes BPE_PROBE.json. Slow (~5-10 min) — run per-round, not in
bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_BPE_PROBE_DOCS", 1_000_000))
VOCAB_TYPES = 50_000
WORDS_PER_DOC = 30
MERGES_HI = 30
MERGES_LO = 2

# Single-JVM local[32] heap sizing — same rationale as dedup10_probe.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def synth_corpus(spark, n_docs: int):
    """n_docs documents of WORDS_PER_DOC words over a fixed 50k-type
    population: word i of doc d is w{(d*31 + i*17) mod 50000} — fully
    deterministic, same type population at every corpus size."""
    from pyspark.sql import functions as F

    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        ((F.col("id") * 31 + i * 17) % VOCAB_TYPES).cast("string"),
    )
    words = F.array(*[word(i) for i in range(WORDS_PER_DOC)])
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )


def main() -> None:
    from pagerank_spark.operators.text import bpe_train
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for scale, n_docs in (("1x", BASE_DOCS), ("2x", 2 * BASE_DOCS)):
        corpus = synth_corpus(spark, n_docs).persist()
        corpus.count()

        t0 = time.perf_counter()
        lo = bpe_train(corpus, merges=MERGES_LO).collect()
        t_lo = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        hi = bpe_train(corpus, merges=MERGES_HI).collect()
        t_hi = round(time.perf_counter() - t0, 2)
        corpus.unpersist()

        assert len(lo) == MERGES_LO and len(hi) == MERGES_HI
        # the shared prefix must agree: same corpus, same argmax path
        assert [r["merged"] for r in hi[:MERGES_LO]] == [
            r["merged"] for r in lo
        ]
        per_round = round((t_hi - t_lo) / (MERGES_HI - MERGES_LO), 3)
        results[scale] = {
            "n_docs": n_docs,
            "running_words": n_docs * WORDS_PER_DOC,
            "word_types": VOCAB_TYPES,
            f"t_merges{MERGES_LO}_sec": t_lo,
            f"t_merges{MERGES_HI}_sec": t_hi,
            "per_round_sec": per_round,
            "top_merge": hi[0]["merged"],
            "top_merge_count": hi[0]["pair_count"],
        }

    ratio = round(
        results["2x"]["per_round_sec"]
        / max(0.01, results["1x"]["per_round_sec"]),
        2,
    )
    collapse_ratio = round(
        results["2x"][f"t_merges{MERGES_LO}_sec"]
        / max(0.01, results["1x"][f"t_merges{MERGES_LO}_sec"]),
        2,
    )
    out = {
        "metric": "bpe_probe_per_round_2x_ratio",
        "value": ratio,
        "unit": "ratio",
        "collapse_2x_ratio": collapse_ratio,
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BPE_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    assert ratio < 1.6, (
        f"BPE per-round cost grew {ratio}x with a 2x corpus over a "
        f"fixed vocabulary — rounds are corpus-bound, not vocab-bound"
    )


if __name__ == "__main__":
    main()
