#!/usr/bin/env python
"""Round-14 optimization: where does q259's wall time go?

Times (noop-sink, warm session) the q259 pipeline's prefixes:
  A  walks->skipgram pairs
  B  A + ppmi_matrix
  C  full q259 (B + rank-3 x 2-round SVD + U*sqrt(lam) long form)
and counts Spark jobs per segment via the status tracker, so the SVD
loop's scheduler overhead is separated from the data path.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from pagerank_spark.session import get_spark

    _ = SparkSession  # bench parity: same session factory as bench.py
    spark = get_spark(app_name="svd-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pagerank_spark.graph.embeddings import ppmi_svd_embeddings
    from pagerank_spark.graph.walks import (
        ppmi_matrix,
        random_walks,
        skipgram_pairs,
    )
    from pyspark.sql import functions as F

    tracker = spark.sparkContext.statusTracker()
    res = {}

    def timed(tag, fn, passes=2):
        best = None
        for _ in range(passes):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            jobs = spark.sparkContext._jsc.sc().statusTracker()
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
            for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
                jr.unpersist(True)
        res[tag] = round(best, 3)
        print(tag, res[tag], flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    edges = lambda: entry._edges(spark, SF_DIR)  # noqa: E731
    timed("A_pairs", lambda: noop(
        skipgram_pairs(random_walks(edges(), steps=4), window=2)))
    timed("B_ppmi", lambda: noop(
        ppmi_matrix(skipgram_pairs(random_walks(edges(), steps=4),
                                   window=2))))

    def full():
        pairs = skipgram_pairs(random_walks(edges(), steps=4), window=2)
        emb = ppmi_svd_embeddings(ppmi_matrix(pairs), rank=3, iterations=2)
        noop(emb.select("node", "dim", F.round("value", 6).alias("value")))
        emb.unpersist()

    timed("C_full_q259", full)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
