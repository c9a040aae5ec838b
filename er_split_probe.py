#!/usr/bin/env python
"""Scale probe for the two round-7 ops that lacked growth evidence
(VERDICT r7 'Next round' #6): sorted-neighborhood ER (q192) and the
leakage-safe split (q188). Writes ER_SPLIT_PROBE.json.

Sorted-neighborhood (operators/dedup.py sorted_neighborhood_pairs):
  * recall on PLANTED last-character typos — a last-char edit keeps the
    sort prefix, so the typo lands lexicographically adjacent to its
    original; every planted pair should be inside the rank window
    (this is the error class SNM exists for: typos in the blocking key
    that key-blocking (q175) would separate).
  * 2x-corpus cost ratio: the distinct-value relation doubles (the
    second half is a deterministic head-character rewrite, disjoint
    from the originals); with the two-level prefix-sum rank the cost
    should grow ~linearly (ratio well under 4 = no quadratic pairing,
    no single-partition sort blow-up).

leakage_safe_split (operators/dedup.py):
  * invariant: every near-dup cluster lands in EXACTLY one split
    (count_distinct(split) per canonical_id == 1) — the guarantee the
    operator exists for — plus every input row covered and split
    fractions near the requested 0.8/0.1/0.1.
  * 2x-corpus cost ratio, where the second half duplicates the first
    half's TEXTS under fresh ids — the worst case for the operator,
    since every doc now has a cross-half near-duplicate and the
    cluster relation is maximal.

Methodology: sf0.1 part names for ER (~20k distinct), sf0.01 documents
for the split (LSH+components dominates; sf0.01 keeps the probe under
a minute a point). Warm best-of-2 per point, local[32], noop-sink.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.dedup import (
        leakage_safe_split,
        sorted_neighborhood_pairs,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    def best2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # ---- sorted-neighborhood ER ------------------------------------
    # p_name alone has ~128 distinct values at sf0.1 — too small to say
    # anything about growth. The name|brand|type combo gives ~8.4k
    # distinct natural-word strings with diverse prefixes.
    names1 = (
        spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        .select(
            F.concat_ws(
                " ", F.col("p_name"), F.col("p_brand"), F.col("p_type")
            ).alias("name")
        )
        .distinct()
    )
    # planted typos: every 10th name (by portable order), last char
    # rewritten to 'q' (disjoint from the originals by construction)
    planted_src = names1.orderBy("name").limit(2000).where(
        F.substring("name", -1, 1) != "q"
    )
    typos = planted_src.select(
        F.concat(
            F.expr("substring(name, 1, length(name) - 1)"), F.lit("q")
        ).alias("name")
    ).join(names1, on="name", how="left_anti")
    n_planted = typos.count()
    corpus1 = names1.unionByName(typos).persist()
    corpus1.count()
    # 2x: head-character rewrite to 'zz' prefix — new sort region,
    # same value-length distribution
    extra = names1.select(F.concat(F.lit("zz"), F.col("name")).alias("name"))
    corpus2 = corpus1.unionByName(extra).persist()
    corpus2.count()

    t1 = best2(lambda: sorted_neighborhood_pairs(corpus1, "name"))
    t2 = best2(lambda: sorted_neighborhood_pairs(corpus2, "name"))
    pairs = sorted_neighborhood_pairs(corpus1, "name")
    hits = (
        typos.select(F.col("name").alias("typo"))
        .join(
            pairs.select(
                F.col("name_a").alias("m1"), F.col("name_b").alias("m2")
            ),
            (F.col("typo") == F.col("m1")) | (F.col("typo") == F.col("m2")),
            "left_semi",
        )
        .count()
    )
    out["sorted_neighborhood"] = {
        "distinct_values_1x": corpus1.count(),
        "distinct_values_2x": corpus2.count(),
        "planted_typos": n_planted,
        "planted_recovered": hits,
        "recall": round(hits / max(n_planted, 1), 4),
        "sec_1x": t1,
        "sec_2x": t2,
        "cost_ratio_2x": round(t2 / t1, 2),
    }
    print("SNM:", out["sorted_neighborhood"], flush=True)
    corpus1.unpersist()
    corpus2.unpersist()

    # Shared-prefix robustness: 15k Customer#000... names all share a
    # 10+-char prefix — without the LCP strip they'd collapse into ONE
    # rank block (the exact single-partition degeneracy the operator
    # avoids). Plant last-char typos, expect full recall and >1 block.
    cnames = (
        spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    ctypos = (
        cnames.orderBy("name")
        .limit(1000)
        .where(F.substring("name", -1, 1) != "q")
        .select(
            F.concat(
                F.expr("substring(name, 1, length(name) - 1)"), F.lit("q")
            ).alias("name")
        )
        .join(cnames, on="name", how="left_anti")
    )
    n_cp = ctypos.count()
    ccorpus = cnames.unionByName(ctypos).persist()
    ccorpus.count()
    cpairs = sorted_neighborhood_pairs(ccorpus, "name")
    chits = (
        ctypos.select(F.col("name").alias("typo"))
        .join(
            cpairs.select(
                F.col("name_a").alias("m1"), F.col("name_b").alias("m2")
            ),
            (F.col("typo") == F.col("m1")) | (F.col("typo") == F.col("m2")),
            "left_semi",
        )
        .count()
    )
    out["sorted_neighborhood_shared_prefix_ids"] = {
        "distinct_values": ccorpus.count(),
        "planted_typos": n_cp,
        "planted_recovered": chits,
        "recall": round(chits / max(n_cp, 1), 4),
        "sec": best2(lambda: sorted_neighborhood_pairs(ccorpus, "name")),
    }
    print("SNM-ids:", out["sorted_neighborhood_shared_prefix_ids"], flush=True)
    ccorpus.unpersist()

    # ---- leakage_safe_split ----------------------------------------
    docs1 = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text").persist()
    n1 = docs1.count()
    docs2 = docs1.unionByName(
        docs1.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    ).persist()
    n2 = docs2.count()

    t1 = best2(lambda: leakage_safe_split(docs1))
    t2 = best2(lambda: leakage_safe_split(docs2))
    split2 = leakage_safe_split(docs2).persist()
    straddling = (
        split2.groupBy("canonical_id")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    covered = split2.count()
    fracs = {
        r["split"]: round(r["c"] / covered, 3)
        for r in split2.groupBy("split")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    out["leakage_safe_split"] = {
        "rows_1x": n1,
        "rows_2x": n2,
        "sec_1x": t1,
        "sec_2x": t2,
        "cost_ratio_2x": round(t2 / t1, 2),
        "clusters_straddling_splits_2x": straddling,
        "rows_covered_2x": covered,
        "split_fracs_2x": fracs,
    }
    print("SPLIT:", out["leakage_safe_split"], flush=True)
    split2.unpersist()

    with open(os.path.join(REPO, "ER_SPLIT_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
