#!/usr/bin/env python
"""Round-14 optimization: in-job vs driver-gap wall attribution for
declared queries. Runs each query once warm (excluded), then once under
INFO logging; afterwards the captured stderr is parsed (DAGScheduler
"Got job"/"Job N finished, took T" lines between per-query marker
lines) to split the measured wall into time INSIDE Spark jobs vs the
gaps between them — driver-side planning/analysis/collect handling
(guide §1/§7.3). Usage:

    SPARK_GRAFT_SF_DIR=... python jobgap_probe_r14.py q1 q2 2>/tmp/x.log
    python jobgap_probe_r14.py --parse /tmp/x.log
"""
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MARK = "JOBGAP-MARK"


def run(names) -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="jobgap-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def release():
        spark.catalog.clearCache()
        for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
            jr.unpersist(True)

    def _hits_loop(spark, sf_dir):
        from pagerank_spark.graph.pagerank import hits as _h

        return _h(entry._edges(spark, sf_dir), iterations=10, mode="loop")

    def _pr_wikidata(spark, sf_dir):
        from pagerank_spark.graph import pagerank, top_k
        from pagerank_spark.io import read_edge_list

        res = pagerank(
            read_edge_list(spark, "/root/reference/WikiData.txt")
        )
        return top_k(res.ranks, 100)

    qs = dict(entry.queries())
    qs["hits_loop_k10"] = _hits_loop
    qs["pagerank_wikidata"] = _pr_wikidata
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        noop(fn(spark, SF_DIR))
        warm = time.perf_counter() - t0
        release()
        spark.sparkContext.setLogLevel("INFO")
        sys.stderr.write(f"{MARK} BEGIN {name}\n")
        sys.stderr.flush()
        t0 = time.perf_counter()
        noop(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        sys.stderr.write(f"{MARK} END {name} wall={wall:.3f} warm={warm:.3f}\n")
        sys.stderr.flush()
        spark.sparkContext.setLogLevel("ERROR")
        release()
        print(f"{name}: warm={warm:.2f}s measured={wall:.2f}s", flush=True)
    spark.stop()


def parse(path) -> None:
    fin_re = re.compile(
        r"Job (\d+) finished: (.*), took ([0-9.]+) (m?s)$"
    )
    cur = None
    injob = 0.0
    njobs = 0
    for ln in open(path, errors="replace"):
        ln = ln.rstrip("\n")
        if f"{MARK} BEGIN " in ln:
            cur = ln.split(f"{MARK} BEGIN ")[1].strip()
            injob, njobs = 0.0, 0
            continue
        if f"{MARK} END " in ln and cur:
            tail = ln.split(f"{MARK} END ")[1]
            wall = float(re.search(r"wall=([0-9.]+)", tail).group(1))
            print(
                f"{cur}: wall={wall:.2f}s in-job={injob:.2f}s "
                f"gaps={wall - injob:.2f}s jobs={njobs}"
            )
            cur = None
            continue
        m = fin_re.search(ln)
        if m and cur:
            d = float(m.group(3)) / (1000.0 if m.group(4) == "ms" else 1.0)
            injob += d
            njobs += 1


if __name__ == "__main__":
    if sys.argv[1] == "--parse":
        parse(sys.argv[2])
    else:
        run(sys.argv[1:])
