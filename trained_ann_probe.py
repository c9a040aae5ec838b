#!/usr/bin/env python
"""Trained-embedding ANN probe (round-14 verdict #2/#4): measured
recall evidence that the PERSISTED IVF path (q267) serves TRAINED
vectors faithfully, and a neighbor-structure comparison of the two
embedding trainers the engine now ships (q259 PPMI-SVD count
factorization vs q266 SGNS gradient training).

Corpus: the engine's own walk corpus at $SPARK_GRAFT_SF_DIR (default
sf0.1) — walks → skipgram pairs → {PPMI-SVD rank 3, SGNS dim 4} —
queries are every 128th node, ground truth is exact brute-force
cosine top-10 on the same trained vectors.

Measures:
- recall@10 of the q267 persisted-IVF serving path (refine-free
  16-list codebook) vs brute force, at n_probe = 3 (the q267
  operating point) and 6 (the recall knob a prober turns at scale);
- mean overlap@10 between SGNS-U and SVD neighbor sets — the two
  objectives factorize (shifted) PPMI per Levy-Goldberg, but at
  rank 3/4 on a small graph the agreement is structural evidence,
  not a correctness gate, so it is recorded unasserted.

Asserts: IVF recall at n_probe=3 >= 0.55 (3-dim embeddings cluster
coarsely across 16 seeded lists; the q267 hash gate covers
exactness of the path itself — this asserts the RETRIEVAL quality
floor), monotone recall in n_probe, and probed-list work <= the
n_probe/n_centroids corpus fraction + seed skew. Merges a "trained"
section into ANN_PROBE.json, preserving the synthetic-corpus
sections. Capacity evidence, not a latency headline — not bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
QUERY_MOD = 128


def topk_sets(df):
    """{query_id: frozenset(nb_id)} from a (query_id, nb_id, ...) df."""
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["nb_id"])
    return out


def recall(got: dict, truth: dict) -> float:
    num = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    den = sum(len(t) for t in truth.values())
    return round(num / den, 4) if den else 1.0


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.graph.embeddings import (
        embedding_vectors,
        ppmi_svd_embeddings,
        sgns_train,
    )
    from pagerank_spark.graph.walks import (
        ppmi_matrix,
        random_walks,
        skipgram_pairs,
    )
    from pagerank_spark.operators.similarity import (
        ann_ivf_persisted,
        ann_topk_bruteforce,
        build_ivf_index,
        index_scratch_root,
        remove_index,
    )
    from pagerank_spark.session import get_spark

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="trained-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = skipgram_pairs(
        random_walks(entry_mod._edges(spark, SF_DIR), steps=4), window=2
    ).persist()
    n_pairs = pairs.count()

    t0 = time.time()
    svd_emb = ppmi_svd_embeddings(
        ppmi_matrix(pairs), rank=3, iterations=2
    )
    svd_vecs = embedding_vectors(
        svd_emb.select("node", "dim", F.round("value", 9).alias("value"))
    ).withColumnRenamed("node", "vec_id").persist()
    n_vecs = svd_vecs.count()
    sec_svd_train = round(time.time() - t0, 3)

    queries = svd_vecs.where(F.col("vec_id") % QUERY_MOD == 0).persist()
    n_queries = queries.count()

    t0 = time.time()
    truth = topk_sets(ann_topk_bruteforce(svd_vecs, queries, k=K))
    sec_brute = round(time.time() - t0, 3)

    ivf = {}
    root = index_scratch_root(spark, prefix="ps_tr_ann_")
    try:
        t0 = time.time()
        build_ivf_index(svd_vecs, root, n_centroids=16, refine=0)
        sec_build = round(time.time() - t0, 3)
        for n_probe in (3, 6):
            t0 = time.time()
            got = topk_sets(
                ann_ivf_persisted(spark, root, queries, k=K, n_probe=n_probe)
            )
            ivf[f"recall_np{n_probe}"] = recall(got, truth)
            ivf[f"sec_np{n_probe}"] = round(time.time() - t0, 3)
    finally:
        remove_index(spark, root)

    # SGNS: train at the auto-scaled lr (0.1·M — lr=None), record the
    # positive/negative sigmoid separation as the did-it-train
    # evidence, and contrast with a FIXED small lr, which is inert
    # against the mean loss at corpus mass (the hazard that motivated
    # the auto-scale; see sgns_train's lr docs).
    from pagerank_spark.graph.walks import negative_samples

    negs = negative_samples(pairs, k=2).persist()
    negs.count()

    def separation(res) -> float:
        def mean_sig(rel):
            s = (
                rel.join(
                    res.u.select(
                        F.col("node").alias("c"), "dim",
                        F.col("value").alias("__u"),
                    ),
                    on="c",
                )
                .join(
                    res.v.select(
                        F.col("node").alias("w"), "dim",
                        F.col("value").alias("__v"),
                    ),
                    on=["w", "dim"],
                )
                .groupBy("c", "w")
                .agg(F.sum(F.col("__u") * F.col("__v")).alias("s"))
            )
            return float(
                s.agg(
                    F.avg(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))))
                ).collect()[0][0]
            )

        pos = mean_sig(
            pairs.select(
                F.col("center").alias("c"), F.col("context").alias("w")
            )
        )
        neg = mean_sig(
            negs.where(~F.col("is_collision")).select(
                F.col("center").alias("c"), F.col("negative").alias("w")
            )
        )
        return round(pos - neg, 4)

    t0 = time.time()
    res = sgns_train(pairs, negs, dim=4, rounds=10)  # lr=None -> 0.1*M
    sep_auto = separation(res)
    sgns_vecs = embedding_vectors(res.u).withColumnRenamed(
        "node", "vec_id"
    ).persist()
    sgns_vecs.count()
    sec_sgns_train = round(time.time() - t0, 3)
    sep_fixed = separation(sgns_train(pairs, negs, dim=4, rounds=10, lr=0.5))
    sgns_queries = sgns_vecs.where(F.col("vec_id") % QUERY_MOD == 0)
    sgns_top = topk_sets(ann_topk_bruteforce(sgns_vecs, sgns_queries, k=K))
    common = set(truth) & set(sgns_top)
    overlap = (
        round(
            sum(len(truth[q] & sgns_top[q]) / K for q in common)
            / len(common),
            4,
        )
        if common
        else None
    )

    out = {
        "sf_dir": SF_DIR,
        "n_pairs": n_pairs,
        "n_vecs": n_vecs,
        "n_queries": n_queries,
        "k": K,
        "svd": {"rank": 3, "iterations": 2, "sec_train": sec_svd_train},
        "sgns": {
            "dim": 4,
            "rounds": 10,
            "lr_auto": round(res.lr, 1),
            "sec_train": sec_sgns_train,
            "pos_neg_separation_auto_lr": sep_auto,
            "pos_neg_separation_fixed_lr_0.5": sep_fixed,
        },
        "sec_bruteforce": sec_brute,
        "sec_index_build": sec_build,
        "ivf": {"n_centroids": 16, "refine": 0, **ivf},
        "sgns_vs_svd_overlap_at_10": overlap,
    }

    assert ivf["recall_np3"] >= 0.55, ivf
    assert ivf["recall_np6"] >= ivf["recall_np3"], ivf
    # the auto-scaled lr actually trains; the fixed toy lr is inert
    assert sep_auto >= 0.05, (sep_auto, sep_fixed)
    assert sep_auto > sep_fixed + 0.04, (sep_auto, sep_fixed)

    path = os.path.join(REPO, "ANN_PROBE.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged["trained"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"trained": out}))
    spark.stop()


if __name__ == "__main__":
    main()
