"""Jobs-per-iteration probe for the VertexLoop-family loops (round-11
verdict #5): run each loop on the sf0.1 derived graph under a job
group, count Spark jobs via the status tracker, report jobs/round and
wall seconds."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pagerank_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="loop-jobs-probe")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

import importlib.util
spec = importlib.util.spec_from_file_location("e", "/root/repo/__spark_entry__.py")
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

edges = entry._edges(spark, SF)

def release():
    spark.catalog.clearCache()
    jmap = sc._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)

def measure(name, fn, rounds):
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    sc.setJobGroup("other", "other")
    jobs = len(sc.statusTracker().getJobIdsForGroup(name))
    release()
    return {"jobs": jobs, "rounds": rounds,
            "jobs_per_round": round(jobs / rounds, 2), "wall_sec": wall}

out = {}

from pagerank_spark.graph.pagerank import hits
out["hits_loop_k10"] = measure(
    "hits10", lambda: hits(edges, iterations=10, mode="loop"), 10)

from pagerank_spark.graph.components import (
    label_propagation, shortest_paths, multi_source_shortest_paths,
    betweenness_centrality,
)
out["label_propagation_k10"] = measure(
    "lpa10", lambda: label_propagation(edges, n_iterations=10), 10)

srcs = edges.select(F.col("src").alias("node")).distinct().where(F.col("node") % 64 == 0)
out["shortest_paths_12"] = measure(
    "sp12", lambda: shortest_paths(edges, srcs, max_iterations=12), 12)

seeds = edges.select(F.col("src").alias("node")).distinct().where(F.col("node") % 32 == 0)
out["multi_source_bfs_12"] = measure(
    "msp12", lambda: multi_source_shortest_paths(edges, seeds, max_iterations=12), 12)

out["betweenness_12"] = measure(
    "bc12", lambda: betweenness_centrality(edges, seeds, max_iterations=12), 24)

with open("/root/repo/LOOP_JOBS_PROBE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
spark.stop()
