#!/usr/bin/env python
"""SGNS_PROBE.json — scale evidence for q266's SGNS embedding trainer.

The claim under test: every per-round join input is bounded by the
DISTINCT (center, word, label) example relation — corpus-independent
on a fixed graph — so doubling the RAW walk corpus (wid-salted
duplication, exactly what 2× walks-per-node produces) must

- leave the distinct-pair relation unchanged (``n_pairs``), the
  vocabulary unchanged, and the example mass ~exactly doubled (the
  q170 draws are integer inverse-CDF through the corpus totals, so a
  doubled modulus legitimately re-draws a handful of negatives — the
  sampler tracks the unigram distribution by design; measured drift
  is recorded as ``ex_mass_2x_ratio``);
- leave the training wall flat (``train_2x_slope`` ≈ 1);
- with the DRAW RELATION held fixed (same negatives, doubled pair
  counts), leave the TRAINED VECTORS bit-identical
  (``u_identical_fixed_negs``): the objective is the MEAN loss, so
  uniformly doubled masses double every residual g AND the
  normalizer M — the gradient, and with it the whole 9dp-rounded
  trajectory, is invariant. The mean-normalization analogue of
  SVD_PROBE's nnz invariance, one step stronger: same cost AND the
  same answer.

The rounds axis (2 → 4) must stay ~linear — the macro witness that
``checkpoint_reset_stats`` keeps planner cost flat in round count
(the micro 20-round evidence lives in the commit that added it).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_pairs(spark, walks, replication: int):
    from pagerank_spark.graph.walks import skipgram_pairs

    corpus = None
    for i in range(replication):
        salted = walks.select(
            (F.col("start") + F.lit(i * 10**12)).alias("start"),
            "path",
            "walk_len",
        )
        corpus = salted if corpus is None else corpus.unionByName(salted)
    return skipgram_pairs(corpus, window=2)


def train(pairs, rounds: int):
    from pagerank_spark.graph.embeddings import sgns_train

    t0 = time.time()
    res = sgns_train(pairs, dim=4, rounds=rounds, lr=0.5)
    n_u = res.u.count()
    return res, n_u, round(time.time() - t0, 3)


def main() -> None:
    import importlib.util

    from pagerank_spark.graph.walks import random_walks
    from pagerank_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = get_spark(app_name="sgns-probe")
    spark.sparkContext.setLogLevel("ERROR")

    walks = random_walks(mod._edges(spark, SF_DIR), steps=4).persist()
    n_walks = walks.count()

    out = {"sf_dir": SF_DIR, "n_walks": n_walks}
    results = {}
    for tag, rep in (("1x", 1), ("2x", 2)):
        pairs = build_pairs(spark, walks, rep).persist()
        n_pairs = pairs.count()
        mass = pairs.agg(F.sum("cnt")).collect()[0][0]
        res, n_u, sec = train(pairs, rounds=2)
        # the aggregated example relation the rounds actually join
        n_ex = (
            res.example_mass,
            n_u,
        )
        u_map = {
            (r["node"], r["dim"]): r["value"] for r in res.u.collect()
        }
        results[tag] = {
            "pairs": n_pairs,
            "mass": int(mass),
            "u": u_map,
            "n_u": n_u,
            "ex_mass": res.example_mass,
        }
        out[f"n_pairs_{tag}"] = n_pairs
        out[f"raw_mass_{tag}"] = int(mass)
        out[f"ex_mass_{tag}"] = res.example_mass
        out[f"train_{tag}_sec"] = sec
        pairs.unpersist()

    out["train_2x_slope"] = round(
        out["train_2x_sec"] / out["train_1x_sec"], 3
    )
    out["ex_mass_2x_ratio"] = round(
        out["ex_mass_2x"] / out["ex_mass_1x"], 5
    )
    out["vocab_equal"] = results["1x"]["n_u"] == results["2x"]["n_u"]

    # fixed-draw invariance: same negatives relation, doubled counts
    from pagerank_spark.graph.embeddings import sgns_train
    from pagerank_spark.graph.walks import negative_samples

    p1 = build_pairs(spark, walks, 1).persist()
    p1.count()
    negs = negative_samples(p1, k=2).persist()
    negs.count()
    p2 = build_pairs(spark, walks, 2).persist()
    p2.count()
    u_fixed = {}
    for tag, p in (("1x", p1), ("2x", p2)):
        res = sgns_train(p, negs, dim=4, rounds=2, lr=0.5)
        u_fixed[tag] = {
            (r["node"], r["dim"]): r["value"] for r in res.u.collect()
        }
    out["u_identical_fixed_negs"] = u_fixed["1x"] == u_fixed["2x"]
    p1.unpersist(); p2.unpersist(); negs.unpersist()

    # rounds axis: 2 -> 4 at 1x
    pairs = build_pairs(spark, walks, 1).persist()
    pairs.count()
    _, _, sec_r4 = train(pairs, rounds=4)
    pairs.unpersist()
    out["train_rounds4_sec"] = sec_r4
    out["rounds_2x_slope"] = round(sec_r4 / out["train_1x_sec"], 3)

    # asserts: distinct-pair boundedness, flat cost, invariant answer,
    # ~linear rounds (generous bounds — wall noise on a shared host)
    assert out["n_pairs_1x"] == out["n_pairs_2x"], out
    assert out["raw_mass_2x"] == 2 * out["raw_mass_1x"], out
    assert abs(out["ex_mass_2x_ratio"] - 2.0) < 0.01, out
    assert out["vocab_equal"], out
    assert out["u_identical_fixed_negs"], (
        "fixed draws + doubled counts must train identical vectors"
    )
    assert out["train_2x_slope"] < 1.5, out
    assert out["rounds_2x_slope"] < 3.0, out

    with open(os.path.join(REPO, "SGNS_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    walks.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
