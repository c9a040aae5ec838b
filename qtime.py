#!/usr/bin/env python
"""Round-14 measurement helper: time a SUBSET of declared queries with
exactly the bench.py methodology (same session factory, noop sink,
min-of-N passes, blocking cache release between timings) so individual
optimizations can be A/B'd without paying a full 129-entry bench run.

Usage: python qtime.py q259_ppmi_svd_embeddings q266_sgns_train ...
       [--passes N] [--jobs]  (--jobs also prints Spark job counts)
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    count_jobs = "--jobs" in sys.argv

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()

    def release() -> None:
        spark.catalog.clearCache()
        for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
            jr.unpersist(True)

    # warm the JVM/footers like bench.py
    queries["q01_edge_scan"](spark, SF_DIR).collect()
    release()

    sc = spark.sparkContext
    out: dict[str, float] = {}
    jobs_out: dict[str, int] = {}
    for name in args:
        best = None
        best_jobs = None
        for _ in range(max(passes, 1)):
            jid0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            sc.setJobDescription(None)
            jid1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            if best is None or el < best:
                best = el
                best_jobs = jid1 - jid0
            release()
        out[name] = best
        if count_jobs:
            jobs_out[name] = best_jobs
        print(f"{name}: {best}" + (f"  jobs={best_jobs}" if count_jobs else ""), flush=True)
    print(json.dumps({"queries": out, "jobs": jobs_out, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
