#!/usr/bin/env python
"""Round-8 warning adjudication (the AB_BENCH_r7 methodology): the
full bench run warned on 14 queries at 1.5-2.4x their current-host
baselines — a BROAD pattern across queries whose code has not changed
since the baseline run earlier the same session, which points at host
drift (firecracker noisy-neighbor), not plan regressions. The one
genuinely-changed query in the set is q192 (sorted-neighborhood moved
to the LCP-stripped prefix-block operator: one extra min/max scalar
collect plus the offsets window — a real, bounded cost increase paid
for rank-work partitioning).

Re-times EXACTLY the warned queries on this host, best-of-3, same
noop-sink methodology as bench.py. verdict per query:
  ok        — quiet best-of-3 within 1.5x of the host baseline
  regressed — still above the guard

Writes AB_BENCH_r8.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WARNED = [
    "q03_out_degree_top20",
    "q08_induced_subgraph",
    "q11_lineitem_agg",
    "q18_top_customers",
    "q21_fingerprint",
    "q22_language_id",
    "q59_interval_join",
    "q90_neardup_clusters",
    "q146_quantize_embeddings",
    "q147_quantized_ann",
    "q150_bpe_train",
    "q171_bm25_search",
    "q184_equidepth_hist",
    "q192_sorted_neighborhood",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import HOST_BASELINE, REGRESSION_FACTOR
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="ab-bench-r8")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["q01_edge_scan"](spark, SF_DIR).collect()

    out: dict[str, dict] = {}
    for name in WARNED:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        base = HOST_BASELINE[name]
        out[name] = {
            "quiet_best_of_3": best,
            "host_baseline": base,
            "ratio": round(best / base, 2),
            "verdict": (
                "ok" if best <= REGRESSION_FACTOR * base else "regressed"
            ),
        }
    result = {
        "metric": "ab_bench_r8_warning_adjudication",
        "cause_hypothesis": (
            "broad 1.5-2.4x drift across unchanged queries within one "
            "session = host noise; q192 additionally pays its new "
            "LCP-collect + offsets window"
        ),
        "queries": out,
        "all_ok": all(v["verdict"] == "ok" for v in out.values()),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "AB_BENCH_r8.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
