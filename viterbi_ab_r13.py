#!/usr/bin/env python
"""VITERBI_AB_r13.json — interleaved A/B of the q257 Viterbi fold.

A (r12 shape): best-candidate selection as a chained when-tree that
references the running `best` TWICE per candidate (comparison +
otherwise) — an expression tree EXPONENTIAL in max_piece_len, which
Catalyst re-analyzes per plan (r12 verdict #6: apply measured 28.8 s
vs BPE's 2.4 s on the same fixture).

B (shipped): lexicographic array_max over (p, −tokens, −l) candidate
structs — linear in L, the exact rule (and shape) of the q257 twin's
list_sort. Selection semantics identical: greatest probability, then
fewest tokens, then lowest piece length.

Workload: the UNIGRAM_PROBE apply configuration — L=6 / 80-piece
vocabulary trained on sf0.01, then unigram_segment_stats over the
same corpus. Interleaved A/B/A/B in one session; per-doc outputs
compared row-for-row (must be IDENTICAL — same DP, same tie rule).
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pagerank_spark.session import get_spark

    old = load_module("tok_old", "/tmp/old_tokenizer.py")
    new = load_module(
        "tok_new", "/root/repo/pagerank_spark/operators/tokenizer.py"
    )
    spark = get_spark(app_name="viterbi-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    vocab = new.unigram_lm_train(
        docs, rounds=2, max_piece_len=6, seed_size=240, vocab_size=80
    ).cache()
    vocab.count()

    times = {"A_when_chain": [], "B_array_max": []}
    vals = {}
    for _ in range(2):
        for tag, mod in (("A_when_chain", old), ("B_array_max", new)):
            t0 = time.perf_counter()
            rows = sorted(
                (
                    r["doc_id"], r["n_words"], r["n_chars"],
                    r["n_tokens"],
                )
                for r in mod.unigram_segment_stats(
                    docs, vocab, max_piece_len=6
                ).collect()
            )
            times[tag].append(round(time.perf_counter() - t0, 2))
            vals[tag] = rows
    vocab.unpersist()
    out = {
        "workload": "unigram apply, sf0.01, L=6, 80-piece vocab",
        "times_sec": times,
        "best_A": min(times["A_when_chain"]),
        "best_B": min(times["B_array_max"]),
        "speedup": round(
            min(times["A_when_chain"]) / min(times["B_array_max"]), 2
        ),
        "values_identical": vals["A_when_chain"] == vals["B_array_max"],
        "n_docs": len(vals["B_array_max"]),
    }
    print(json.dumps(out))
    with open("/root/repo/VITERBI_AB_r13.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()
    assert out["values_identical"]


if __name__ == "__main__":
    main()
