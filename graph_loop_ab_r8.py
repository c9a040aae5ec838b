#!/usr/bin/env python
"""Round-8 re-measurement of the HITS/Katz convergence loops after the
plan-side-normalization rework (VERDICT r7 'Next round' #5).

What changed in the loops (graph/pagerank.py):
  * HITS: the two normalization scalars per round no longer come back
    to the driver — they stay plan-side as broadcast one-row relations,
    so a fixed-k run is ONE action for the whole loop, and a
    delta-convergence run pays exactly one scalar collect per round
    (was three).
  * Both loops cache PRE-PARTITIONED edge layouts (HITS: src AND dst;
    Katz: src) and align the vertex-sized state to them, so per-round
    exchanges move only the state vector, and small graphs get the
    PageRank loop's AQE-off + vertex-sized shuffle-partition tuning.

Methodology identical to the round-5 GRAPH_LOOP_AB runs: sf0.1 derived
edge graph, local[32], warm best-of-2 per point, noop-sink
materialization via the loop's own terminal count.  Appends a
"round8_after" section to GRAPH_LOOP_AB.json next to the round-5/7
numbers so the trend is auditable.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry_mod
    from pagerank_spark.graph.pagerank import hits, katz_centrality
    from pagerank_spark.session import get_spark

    spark = get_spark()
    edges = entry_mod._edges(spark, SF_DIR)
    edges.persist().count()

    out: dict[str, dict] = {"hits_loop_sec": {}, "katz_loop_sec": {}}

    def best2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for k in (2, 4, 10):
        out["hits_loop_sec"][f"k{k}"] = best2(
            lambda: hits(edges, iterations=k, mode="loop")
        )
        print("hits", k, out["hits_loop_sec"][f"k{k}"], flush=True)
    for k in (10, 40):
        out["katz_loop_sec"][f"k{k}"] = best2(
            lambda: katz_centrality(edges, iterations=k, mode="loop")
        )
        print("katz", k, out["katz_loop_sec"][f"k{k}"], flush=True)

    path = os.path.join(REPO, "GRAPH_LOOP_AB.json")
    doc = json.load(open(path))
    doc["round8_after"] = {
        "change": (
            "plan-side broadcast normalization scalars (1 driver action "
            "per round for delta runs, 0 for fixed-k) + cached "
            "pre-partitioned edge layouts + small-graph AQE/partition "
            "tuning, mirroring the PageRank loop"
        ),
        **out,
        "prior_loop_sec": {
            "hits": {"k2": 3.113, "k4": 5.597, "k10": 14.744},
            "katz": {"k10": 6.812, "k40": 24.064},
        },
    }
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
