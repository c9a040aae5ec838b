#!/usr/bin/env python
"""Growth evidence for betweenness_centrality (q243, round 11): wall
time vs edge-count doubling and vs pivot-count doubling on synthetic
power-lawish graphs. The state is |pivots| x reached-nodes rows, so
the defensible claim at 100 TB is: cost grows ~linearly in BOTH the
edge count and the pivot count (pivot sampling is the knob that
bounds it). Writes BETWEENNESS_PROBE.json."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pagerank_spark.graph.components import betweenness_centrality
from pagerank_spark.session import get_spark


def synth_edges(spark, n_edges: int, n_nodes: int):
    # deterministic hash graph with mild hubness: dst skewed by %7
    return (
        spark.range(n_edges)
        .select(
            (F.xxhash64("id", F.lit(1)) % n_nodes).alias("src"),
            (
                F.when(
                    F.col("id") % 7 == 0,
                    F.xxhash64("id", F.lit(2)) % (n_nodes // 20),
                ).otherwise(F.xxhash64("id", F.lit(3)) % n_nodes)
            ).alias("dst"),
        )
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def main():
    spark = get_spark(app_name="betweenness-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"max_iterations": 8, "points": []}

    def run(n_edges, n_nodes, pivot_mod):
        e = synth_edges(spark, n_edges, n_nodes)
        seeds = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .where(F.col("node") % pivot_mod == 0)
        )
        n_pivots = seeds.count()
        t0 = time.perf_counter()
        res = betweenness_centrality(
            e, seeds, max_iterations=8, scaled=True
        )
        n_rows = res.count()
        wall = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        it = jmap.entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(True)
        return {
            "n_edges": n_edges, "n_nodes": n_nodes,
            "n_pivots": n_pivots, "result_rows": n_rows,
            "wall_sec": wall,
        }

    # three controlled axes off one base point, ~13 pivots each
    # unless stated: DENSIFY (2x edges, same nodes), SCALE (2x edges
    # AND nodes at matched degree), PIVOTS (2x pivots, same graph)
    run(100_000, 10_000, 2048)  # unrecorded JVM/session warm-up
    p1 = run(2_000_000, 200_000, 16384)
    p_dense = run(4_000_000, 200_000, 16384)
    p_scale = run(4_000_000, 400_000, 32768)
    p_piv = run(2_000_000, 200_000, 8192)
    out["points"] = [p1, p_dense, p_scale, p_piv]
    out["densify_2x_edges_ratio"] = round(
        p_dense["wall_sec"] / p1["wall_sec"], 2
    )
    out["scale_2x_edges_nodes_ratio"] = round(
        p_scale["wall_sec"] / p1["wall_sec"], 2
    )
    out["pivot_ratio"] = {
        "pivots": round(p_piv["n_pivots"] / max(p1["n_pivots"], 1), 2),
        "wall": round(p_piv["wall_sec"] / p1["wall_sec"], 2),
    }
    out["note"] = (
        "forward phase is the multi-source BFS with one extra SUM; "
        "backward is one level join per observed depth <= 8. Expected "
        "and acceptable: wall ~linear in edges at fixed pivots, and "
        "sub-linear-to-linear in pivots (fixed per-round overhead "
        "amortizes across the seed dimension - the state rows scale "
        "with pivots but rounds do not)."
    )
    with open("/root/repo/BETWEENNESS_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
