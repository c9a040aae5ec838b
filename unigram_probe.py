#!/usr/bin/env python
"""UNIGRAM_PROBE.json — fertility + cost evidence for q254's
unigram-LM tokenizer vs q151's BPE on the same corpus.

Compares corpus-level chars-per-token (fertility — higher is better
compression) of:
  - the 2-round / L=6 / 80-piece unigram-LM vocabulary,
  - the 6-merge BPE vocabulary (q150/q151's configuration),
  - the q254 oracle configuration (L=4 / 40 pieces) for reference,
and records wall-clock for train and apply at sf0.01 plus the scale
ratio of training cost sf0.001 → sf0.01 (corpus collapses to the same
31-word relation at both scales, so near-flat growth is the expected —
and 100 TB-relevant — signature: EM cost tracks the DISTINCT-word
relation, not the corpus).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def corpus_fertility(stats_df) -> float:
    row = stats_df.agg(
        (F.sum("n_chars") / F.sum("n_tokens")).alias("cpt")
    ).collect()[0]
    return float(row["cpt"])


def main() -> None:
    from pagerank_spark.operators.text import bpe_segment_stats
    from pagerank_spark.operators.tokenizer import (
        unigram_lm_train,
        unigram_segment_stats,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs001 = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )

    # --- unigram, evidence configuration (L=6, 80 pieces) ----------
    t0 = time.perf_counter()
    vocab = unigram_lm_train(
        docs01, rounds=2, max_piece_len=6, seed_size=240, vocab_size=80
    ).cache()
    vocab.count()
    out["unigram_L6_v80_train_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["unigram_L6_v80_fertility"] = round(
        corpus_fertility(
            unigram_segment_stats(docs01, vocab, max_piece_len=6)
        ),
        6,
    )
    out["unigram_apply_sec"] = round(time.perf_counter() - t0, 3)
    vocab.unpersist()

    # --- unigram, q254 oracle configuration (L=4, 40 pieces) -------
    v254 = unigram_lm_train(
        docs01, rounds=2, max_piece_len=4, seed_size=60, vocab_size=40
    )
    out["unigram_q254_fertility"] = round(
        corpus_fertility(
            unigram_segment_stats(docs01, v254, max_piece_len=4)
        ),
        6,
    )

    # --- BPE, q151 configuration (6 merges) -------------------------
    t0 = time.perf_counter()
    out["bpe_6merge_fertility"] = round(
        corpus_fertility(bpe_segment_stats(docs01, merges=6)), 6
    )
    out["bpe_6merge_train_apply_sec"] = round(
        time.perf_counter() - t0, 3
    )

    # --- scale growth of unigram training ---------------------------
    t0 = time.perf_counter()
    unigram_lm_train(
        docs001, rounds=2, max_piece_len=4, seed_size=60, vocab_size=40
    ).count()
    small = time.perf_counter() - t0
    t0 = time.perf_counter()
    unigram_lm_train(
        docs01, rounds=2, max_piece_len=4, seed_size=60, vocab_size=40
    ).count()
    big = time.perf_counter() - t0
    out["train_sec_sf0.001"] = round(small, 3)
    out["train_sec_sf0.01"] = round(big, 3)
    out["train_growth_10x_corpus"] = round(big / small, 3)

    with open("/root/repo/UNIGRAM_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
