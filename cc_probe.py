#!/usr/bin/env python
"""Connected-components algorithm-crossover probe: validate the
``algorithm="auto"`` rule with measured label-vs-star timings on BOTH
diameter regimes, the way SCALE_PROBE.json validated PageRank's
broadcast-vs-shuffle cut. Round 6 finding: label propagation beats
star contraction on low-diameter graphs at EVERY measured size (the
old size-based cut wrongly picked star above 5M state rows), while
high-diameter chains make label infeasible — so auto is now a HYBRID:
label with a bounded round budget, star restart on non-convergence,
verified end-to-end here on a chain graph.

Three deterministic graphs (no RNG):

- ``small_low_diam``: attachment-tree + hash-mixed edges, 1M edges /
  300k vertices. Both algorithms measured.
- ``big_low_diam``: same topology at 10M edges / 3M vertices (above
  the old 5M size cut). Both algorithms measured.
- ``big_high_diam``: 100 disjoint paths of 100k vertices each (10M
  nodes, ~10M edges) — label propagation distance ~100k rounds, the
  regime where min-label CANNOT converge in any usable round budget.
  Label is run with a small cap to measure per-round cost and confirm
  it raises; star must converge (O(log^2) rounds) and find exactly
  100 components.

Prints ONE JSON line and writes CC_PROBE.json. Capacity evidence, not
a latency headline — not part of bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MIX_A, MIX_B = 2654435761, 2246822519


def low_diam_graph(spark, vertices: int, edges: int):
    """Attachment tree (depth <= log2 V) + hash-mixed volume edges."""
    from pyspark.sql import functions as F

    tree = spark.range(1, vertices).select(
        F.col("id").alias("src"),
        (
            F.col("id")
            * MIX_A
            % F.greatest((F.col("id") / 2).cast("long"), F.lit(1))
        ).alias("dst"),
    )
    rand = spark.range(edges - vertices + 1).select(
        (F.col("id") * MIX_A % vertices).alias("src"),
        ((F.col("id") * MIX_B + 7) % vertices).alias("dst"),
    )
    return tree.unionByName(rand)


def high_diam_graph(spark, n_chains: int, chain_len: int):
    """n_chains disjoint paths of chain_len vertices: id c*chain_len+i
    links to its successor. Diameter = chain_len - 1."""
    from pyspark.sql import functions as F

    total = n_chains * chain_len
    return (
        spark.range(total)
        .where(F.pmod(F.col("id"), F.lit(chain_len)) != chain_len - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )


def timed_cc(edges, algorithm: str, max_iterations: int = 60):
    from pagerank_spark.graph.components import connected_components

    t0 = time.perf_counter()
    comp = connected_components(
        edges, max_iterations=max_iterations, algorithm=algorithm
    )
    n = comp.select("component").distinct().count()
    secs = round(time.perf_counter() - t0, 2)
    comp.unpersist()
    return secs, n


def main() -> None:
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"graphs": {}}

    # --- small low-diameter ---
    e_small = low_diam_graph(spark, 300_000, 1_000_000).persist()
    e_small.count()
    s_label, n1 = timed_cc(e_small, "label")
    s_star, n2 = timed_cc(e_small, "star")
    assert n1 == n2, (n1, n2)
    result["graphs"]["small_low_diam"] = {
        "edges": 1_000_000,
        "vertices": 300_000,
        "n_components": n1,
        "sec_label": s_label,
        "sec_star": s_star,
        "hybrid_primary": "label",
    }
    e_small.unpersist()

    # --- big low-diameter (above the OLD 5M size cut) ---
    e_big = low_diam_graph(spark, 3_000_000, 10_000_000).persist()
    e_big.count()
    b_label, n3 = timed_cc(e_big, "label")
    b_star, n4 = timed_cc(e_big, "star")
    assert n3 == n4, (n3, n4)
    result["graphs"]["big_low_diam"] = {
        "edges": 10_000_000,
        "vertices": 3_000_000,
        "n_components": n3,
        "sec_label": b_label,
        "sec_star": b_star,
    }
    e_big.unpersist()

    # --- big high-diameter (chains: label cannot converge) ---
    e_chain = high_diam_graph(spark, 100, 100_000).persist()
    e_chain.count()
    label_raised = False
    t0 = time.perf_counter()
    try:
        timed_cc(e_chain, "label", max_iterations=10)
    except Exception:
        label_raised = True
    label_10_rounds = round(time.perf_counter() - t0, 2)
    c_star, n5 = timed_cc(e_chain, "star", max_iterations=60)
    result["graphs"]["big_high_diam"] = {
        "edges": 9_999_900,
        "vertices": 10_000_000,
        "diameter": 99_999,
        "n_components_star": n5,
        "label_capped_10_rounds_sec": label_10_rounds,
        "label_raised_nonconvergence": label_raised,
        "label_rounds_needed": "~100k (diameter-bound) — infeasible",
        "sec_star": c_star,
        "star_components_correct": n5 == 100,
    }
    e_chain.unpersist()

    # --- auto fallback end-to-end: a chain graph small enough to run
    # the full hybrid (label budget exhausts -> star restart) fast ---
    e_fb = high_diam_graph(spark, 10, 5_000).persist()
    e_fb.count()
    t0 = time.perf_counter()
    fb_secs, fb_n = timed_cc(e_fb, "auto", max_iterations=60)
    result["graphs"]["auto_fallback_chain"] = {
        "edges": 49_990,
        "vertices": 50_000,
        "diameter": 4_999,
        "sec_auto_hybrid": fb_secs,
        "n_components": fb_n,
        "fallback_found_all_components": fb_n == 10,
    }
    e_fb.unpersist()

    small = result["graphs"]["small_low_diam"]
    big = result["graphs"]["big_low_diam"]
    chain = result["graphs"]["big_high_diam"]
    checks = {
        # the hybrid's primary path (label) must win on low diameter
        # at BOTH sizes — this is what invalidated the old size cut
        "label_wins_small_low_diam": small["sec_label"] <= small["sec_star"] * 1.2,
        "label_wins_big_low_diam": big["sec_label"] <= big["sec_star"] * 1.2,
        # star must be the only algorithm that works on high diameter
        "chain_label_infeasible": chain["label_raised_nonconvergence"],
        "chain_star_correct": chain["star_components_correct"],
        # and auto must actually take the fallback and get it right
        "auto_fallback_correct": result["graphs"]["auto_fallback_chain"][
            "fallback_found_all_components"
        ],
    }
    result["checks"] = checks
    result["ok"] = all(checks.values())
    result["conclusion"] = (
        "hybrid auto (label budget -> star fallback) validated: label is "
        "the right primary at every measured size on low-diameter graphs, "
        "star the only feasible algorithm at high diameter"
        if result["ok"]
        else "auto rule needs adjustment - see checks"
    )

    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "CC_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
