#!/usr/bin/env python
"""Exact-substring dedup scale probe: run ``dup_span_coverage`` AND
``remove_duplicate_spans`` (n=8) on synthetic corpora at two sizes and
record the scaling slope — the evidence that the inverted-index shape
(gram shuffle -> dup keys joined back -> per-doc union) is
corpus-LINEAR, plus exact recovery of a planted duplicated span.

Corpus (deterministic, no RNG): each doc is 40 hash-formula tokens
from a huge implicit vocabulary (murmur3(doc, pos) hex), so accidental
cross-doc 8-grams are ~impossible; every 10th doc has positions 11-18
replaced by a FIXED 8-token template shared by all planted docs. The
ground truth is therefore closed-form: planted docs have exactly one
duplicated 8-gram start, 8 covered tokens, dup_frac 0.2, and lose
exactly 8 tokens under the rewrite; every other doc reports zeros and
survives unchanged.

Asserts: exact planted-span detection at both sizes (no false
positives, no misses) and wall-clock growth <= 2.4x for a 2x corpus.
Prints ONE JSON line and writes SPAN_PROBE.json. A capacity probe,
not a latency headline — not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_SPAN_PROBE_DOCS", 100_000))
DOC_LEN = 40
SPAN_START, SPAN_LEN = 11, 8  # 1-based positions 11..18
N_GRAM = 8


def synth_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    planted = F.col("id") % 10 == 1
    cols = []
    for p in range(1, DOC_LEN + 1):
        # two independent 32-bit murmurs per token (~62 bits): a
        # single 32-bit hash measurably collides across 100k docs x 40
        # positions, and one colliding token ADJACENT to the shared
        # template creates a real (but unplanted) duplicated 8-gram —
        # the first probe run found exactly such a pair
        unique = F.concat(
            F.lit("w"),
            F.hex(F.abs(F.hash(F.col("id"), F.lit(p), F.lit("spanA")))),
            F.lit("_"),
            F.hex(F.abs(F.hash(F.col("id"), F.lit(p), F.lit("spanB")))),
        )
        if SPAN_START <= p < SPAN_START + SPAN_LEN:
            tokp = F.when(planted, F.lit(f"TPL{p}")).otherwise(unique)
        else:
            tokp = unique
        cols.append(tokp)
    return spark.range(0, n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
        planted.alias("is_planted"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.dedup import (
        dup_span_coverage,
        remove_duplicate_spans,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="pagerank_spark-span-probe")
    spark.sparkContext.setLogLevel("ERROR")

    result = {
        "doc_len": DOC_LEN,
        "n_gram": N_GRAM,
        "span_len": SPAN_LEN,
        "sizes": {},
    }
    for n in (BASE_DOCS, BASE_DOCS * 2):
        corpus = synth_corpus(spark, n).persist()
        truth = {
            r["doc_id"]: r["is_planted"] for r in corpus.select(
                "doc_id", "is_planted"
            ).collect()
        }
        n_planted = sum(truth.values())

        t0 = time.perf_counter()
        cov = dup_span_coverage(corpus, n=N_GRAM)
        stats = (
            cov.join(corpus.select("doc_id", "is_planted"), on="doc_id")
            .groupBy("is_planted")
            .agg(
                F.count("*").alias("docs"),
                F.sum(
                    F.when(F.col("covered_tokens") == SPAN_LEN, 1).otherwise(0)
                ).alias("exact_span"),
                F.sum(
                    F.when(F.col("covered_tokens") > 0, 1).otherwise(0)
                ).alias("any_cover"),
            )
            .collect()
        )
        t_cov = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        rem = remove_duplicate_spans(corpus, n=N_GRAM)
        removed = (
            rem.join(corpus.select("doc_id", "is_planted"), on="doc_id")
            .groupBy("is_planted")
            .agg(
                F.sum(
                    F.when(F.col("removed_tokens") == SPAN_LEN, 1).otherwise(0)
                ).alias("lost_span"),
                F.sum(
                    F.when(F.col("removed_tokens") == 0, 1).otherwise(0)
                ).alias("untouched"),
            )
            .collect()
        )
        t_rem = round(time.perf_counter() - t0, 3)

        s = {r["is_planted"]: r for r in stats}
        r = {r["is_planted"]: r for r in removed}
        result["sizes"][str(n)] = {
            "n_planted": n_planted,
            "planted_exact_span": int(s[True]["exact_span"]),
            "clean_with_any_cover": int(s[False]["any_cover"]),
            "planted_lost_span": int(r[True]["lost_span"]),
            "clean_untouched": int(r[False]["untouched"]),
            "clean_docs": int(s[False]["docs"]),
            "sec_coverage": t_cov,
            "sec_rewrite": t_rem,
        }
        corpus.unpersist()

    lo = result["sizes"][str(BASE_DOCS)]
    hi = result["sizes"][str(BASE_DOCS * 2)]
    result["growth_coverage"] = round(
        hi["sec_coverage"] / max(lo["sec_coverage"], 0.001), 3
    )
    result["growth_rewrite"] = round(
        hi["sec_rewrite"] / max(lo["sec_rewrite"], 0.001), 3
    )
    checks = {
        "recall_low": lo["planted_exact_span"] == lo["n_planted"],
        "recall_high": hi["planted_exact_span"] == hi["n_planted"],
        "no_false_positives_low": lo["clean_with_any_cover"] == 0,
        "no_false_positives_high": hi["clean_with_any_cover"] == 0,
        "rewrite_exact_low": lo["planted_lost_span"] == lo["n_planted"],
        "rewrite_exact_high": hi["planted_lost_span"] == hi["n_planted"],
        "clean_survive_low": lo["clean_untouched"] == lo["clean_docs"],
        "clean_survive_high": hi["clean_untouched"] == hi["clean_docs"],
        "subquadratic_coverage": result["growth_coverage"] <= 2.4,
        "subquadratic_rewrite": result["growth_rewrite"] <= 2.4,
    }
    result["checks"] = checks
    result["ok"] = all(checks.values())
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "SPAN_PROBE.json"), "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
