#!/usr/bin/env python
"""Round-11 verdict #5 A/B: fixed-k HITS loop with per-round broadcast
normalization barriers (PRE, commit 824f2fd) vs the deferred-
normalization body (_hits_iterate_fixed — no per-round barrier, one
rescale every HITS_RESCALE_EVERY rounds, one final normalize).

Interleaved in one warm session (PRE, POST, PRE, POST, ...), best-of-3,
sf0.1 derived graph, k=10, noop sink; jobs counted per job group via
the status tracker. Writes HITS_OVERHEAD_AB_r11.json. Also pins
value equality POST vs PRE at 1e-9 before timing."""
import importlib
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pagerank_spark.session import get_spark


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/old_pagerank.py"
    spark = get_spark(app_name="hits-overhead-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    edges = entry._edges(spark, "/root/testdata/sf0.1")

    old = _load(old_path, "old_pagerank")
    new = importlib.import_module("pagerank_spark.graph.pagerank")

    def release():
        spark.catalog.clearCache()
        jmap = sc._jsc.getPersistentRDDs()
        it = jmap.entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(True)

    # value pin first: POST == PRE at 1e-9 on the bench graph
    a = {r["node"]: r for r in old.hits(
        edges, iterations=10, mode="loop").collect()}
    release()
    b = {r["node"]: r for r in new.hits(
        edges, iterations=10, mode="loop").collect()}
    release()
    assert set(a) == set(b)
    worst = max(
        max(abs(a[k]["hub"] - b[k]["hub"]), abs(a[k]["auth"] - b[k]["auth"]))
        for k in a
    )
    assert worst < 1e-9, worst

    runs = {"pre": [], "post": []}
    jobs = {"pre": [], "post": []}
    for rep in range(int(os.environ.get('AB_REPS', '3'))):
        for tag, mod in (("pre", old), ("post", new)):
            g = f"{tag}{rep}"
            sc.setJobGroup(g, g)
            t0 = time.perf_counter()
            df = mod.hits(edges, iterations=10, mode="loop")
            df.write.format("noop").mode("overwrite").save()
            runs[tag].append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup("o", "o")
            jobs[tag].append(len(sc.statusTracker().getJobIdsForGroup(g)))
            df.unpersist()
            release()

    out = {
        "metric": "hits_fixed_k10_overhead_ab_r11",
        "sf_dir": "/root/testdata/sf0.1",
        "pre_commit": "824f2fd (per-round broadcast normalization barriers)",
        "post": "deferred normalization (_hits_iterate_fixed)",
        "value_worst_abs_diff": worst,
        "interleaved_sec": runs,
        "best_of_3_sec": {k: min(v) for k, v in runs.items()},
        "median_sec": {k: sorted(v)[len(v) // 2] for k, v in runs.items()},
        "jobs_per_run": jobs,
        "jobs_per_round": {
            k: round(min(v) / 10, 2) for k, v in jobs.items()
        },
    }
    with open(os.path.join(REPO, "HITS_OVERHEAD_AB_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["best_of_3_sec"]), json.dumps(out["jobs_per_round"]))
    spark.stop()


if __name__ == "__main__":
    main()
