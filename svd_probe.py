#!/usr/bin/env python
"""SVD_PROBE.json — scale evidence for q259's PPMI-SVD embedding
trainer.

The claim under test: the SVD's per-step join inputs are bounded by
the DISTINCT co-occurring pair count (≤ vocab², corpus-independent),
so doubling the RAW walk corpus (same graph, 2× walks) must

- leave the aggregated PPMI relation's row count unchanged
  (``nnz_1x == nnz_2x``),
- leave the factorization's own wall time flat (``svd_2x_slope`` ≈ 1;
  only the one pairing/count aggregation pass upstream scales with
  raw windows),

while the component axis (rank 2 → 4) grows linearly (each extra
component costs the same matvec rounds + one extra projection join
per iteration).

Corpus doubling is real duplication of walk rows under fresh walk ids
(wid-salted union), exactly what 2× walks-per-node would produce on a
fixed graph: distinct pairs stay put, counts double, PPMI values move
— the aggregation is IN the measured pipeline path.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _edges(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._edges(spark, SF_DIR)


def build_ppmi(spark, walks, replication: int):
    from pagerank_spark.graph.walks import ppmi_matrix, skipgram_pairs

    corpus = None
    for i in range(replication):
        salted = walks.select(
            (F.col("start") + F.lit(i * 10**12)).alias("start"),
            "path",
            "walk_len",
        )
        corpus = salted if corpus is None else corpus.unionByName(salted)
    return ppmi_matrix(skipgram_pairs(corpus, window=2))


def main() -> None:
    from pagerank_spark.graph.embeddings import ppmi_svd_embeddings
    from pagerank_spark.graph.walks import random_walks
    from pagerank_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    walks = random_walks(_edges(spark), steps=4).persist()
    out["n_walks"] = walks.count()

    for rep in (1, 2):
        # pipeline time: pairing + PPMI + SVD from raw walk rows
        t0 = time.perf_counter()
        emb = ppmi_svd_embeddings(
            build_ppmi(spark, walks, rep), rank=3, iterations=2
        )
        emb.count()
        out[f"pipeline_{rep}x_sec"] = round(time.perf_counter() - t0, 3)
        emb.unpersist()

        # SVD-only time on a materialized PPMI relation
        ppmi = build_ppmi(spark, walks, rep).persist()
        out[f"nnz_{rep}x"] = ppmi.count()
        t0 = time.perf_counter()
        emb = ppmi_svd_embeddings(ppmi, rank=3, iterations=2)
        emb.count()
        out[f"svd_{rep}x_sec"] = round(time.perf_counter() - t0, 3)
        emb.unpersist()
        ppmi.unpersist()

    out["pipeline_2x_slope"] = round(
        out["pipeline_2x_sec"] / out["pipeline_1x_sec"], 3
    )
    out["svd_2x_slope"] = round(out["svd_2x_sec"] / out["svd_1x_sec"], 3)
    assert out["nnz_1x"] == out["nnz_2x"], (
        "distinct-pair relation must be corpus-size-independent"
    )

    # component axis: rank 2 vs 4 on the 1x matrix
    ppmi = build_ppmi(spark, walks, 1).persist()
    ppmi.count()
    for rank in (2, 4):
        t0 = time.perf_counter()
        emb = ppmi_svd_embeddings(ppmi, rank=rank, iterations=2)
        emb.count()
        out[f"svd_rank{rank}_sec"] = round(time.perf_counter() - t0, 3)
        emb.unpersist()
    out["rank_2x_slope"] = round(
        out["svd_rank4_sec"] / out["svd_rank2_sec"], 3
    )
    ppmi.unpersist()

    # spectral sanity: eigenvalue estimates come out ordered
    from pagerank_spark.graph.embeddings import svd_topk

    ppmi = build_ppmi(spark, walks, 1)
    v, lams = svd_topk(ppmi, rank=3, iterations=2)
    v.unpersist()
    out["lams"] = [round(x, 3) for x in lams]
    assert lams[0] >= lams[1] >= lams[2] > 0, f"unordered spectrum {lams}"

    walks.unpersist()
    with open("/root/repo/SVD_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
