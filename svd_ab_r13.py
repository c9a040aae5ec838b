#!/usr/bin/env python
"""SVD_AB_r13.json — interleaved A/B of the q259 SVD loop shapes.

A (round-13 initial): modified Gram-Schmidt deflation as per-component
broadcast-exchange subtrees inside each checkpoint job, per-component
Rayleigh collects, and a separate cached matrix per pin (the walk→PPMI
lineage materialized twice).

B (shipped): classical GS — all deflation dots in one scalar collect +
one summed adjustment join, one batched Rayleigh job for all
components, and ONE shared matrix cache for factorization + embedding
projection.

Interleaved A/B/A/B on the q259 workload at sf0.1 (same session, same
fixture). A and B are different (both valid) projection-deflation
arithmetics with the same fixed point — mid-convergence values differ
at ~1e-6 by construction — so the artifact records the measured value
gap; hash-correctness of each shape is pinned by its own unrolled
DuckDB twin (q259 parity, green for both in round 13).
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


def run(spark, entry, emb_mod):
    import pagerank_spark.graph.embeddings as cur

    sys.modules["pagerank_spark.graph.embeddings"] = emb_mod
    try:
        from pyspark.sql import functions as F

        from pagerank_spark.graph.walks import (
            ppmi_matrix,
            random_walks,
            skipgram_pairs,
        )

        t0 = time.perf_counter()
        pairs = skipgram_pairs(
            random_walks(entry._edges(spark, "/root/testdata/sf0.1"), steps=4),
            window=2,
        )
        emb = emb_mod.ppmi_svd_embeddings(
            ppmi_matrix(pairs), rank=3, iterations=2
        )
        rows = sorted(
            (r["node"], r["dim"], round(r["value"], 6))
            for r in emb.select("node", "dim", "value").collect()
        )
        emb.unpersist()
        return time.perf_counter() - t0, rows
    finally:
        sys.modules["pagerank_spark.graph.embeddings"] = cur


def main() -> None:
    from pagerank_spark.session import get_spark

    entry = load_module("entry_ab", "/root/repo/__spark_entry__.py")
    old = load_module("emb_old", "/tmp/old_embeddings.py")
    new = load_module(
        "emb_new", "/root/repo/pagerank_spark/graph/embeddings.py"
    )
    spark = get_spark(app_name="svd-ab")
    spark.sparkContext.setLogLevel("ERROR")

    times = {"A_modifiedGS": [], "B_classicalGS": []}
    vals = {}
    for _ in range(2):
        for tag, mod in (("A_modifiedGS", old), ("B_classicalGS", new)):
            t, rows = run(spark, entry, mod)
            times[tag].append(round(t, 2))
            vals[tag] = rows
    a = {(n, d): x for n, d, x in vals["A_modifiedGS"]}
    b = {(n, d): x for n, d, x in vals["B_classicalGS"]}
    max_diff = max(abs(a[k] - b[k]) for k in a) if a.keys() == b.keys() else None
    out = {
        "workload": "q259 pipeline, sf0.1, rank 3, 2 iterations",
        "times_sec": times,
        "best_A": min(times["A_modifiedGS"]),
        "best_B": min(times["B_classicalGS"]),
        "speedup": round(
            min(times["A_modifiedGS"]) / min(times["B_classicalGS"]), 2
        ),
        # A and B are DIFFERENT (both valid) deflation arithmetics —
        # modified vs classical Gram-Schmidt — so mid-convergence
        # values differ at the ~1e-6 level by construction; each shape
        # was hash-green against its own unrolled DuckDB twin, which
        # is the correctness gate. Recorded here: the actual value gap.
        "same_key_set": a.keys() == b.keys(),
        "max_abs_value_diff": max_diff,
        "n_rows": len(vals["B_classicalGS"]),
    }
    print(json.dumps(out))
    with open("/root/repo/SVD_AB_r13.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()
    assert out["same_key_set"]
    assert out["max_abs_value_diff"] is not None and out["max_abs_value_diff"] < 1e-3


if __name__ == "__main__":
    main()
