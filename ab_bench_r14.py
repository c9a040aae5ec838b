#!/usr/bin/env python
"""AB_BENCH_r14.json — interleaved old-vs-new whole-query A/B for the
round-14 optimization set, with untouched CONTROL queries to factor out
host drift.

The close-window solo bench runs (r14C 10:23 "before" vs r14E/F 15:1x
"after") disagree on UNTOUCHED queries by a uniform ~1.2-1.4x — pure
TPC-H SQL entries (q213/q216/q217), q194, q18 etc. share no changed
code path, so that uplift is host drift across the 5-hour window, not
regression. This harness settles attribution the way rounds 10-13 did
(ab_bench_r10/11, TAIL_AB_r13): alternate PASSES of the OLD engine
(the dd1c399 pre-optimization worktree at /root/repo_head) and the NEW
engine (HEAD) in one contiguous time window — each pass a fresh
subprocess/session (the engines differ across many modules, so
in-process module swapping is not safe) that warms the JVM, then times
each query once with the bench.py methodology (noop sink, blocking
cache release between queries). min over 3 passes per arm per query.

CONTROL queries (untouched by any r14 optimization commit) measure the
residual window noise: their old/new ratio should be ~1.0; the touched
queries' ratio minus the control band is the change-attributable win.

Usage: python ab_bench_r14.py        (writes AB_BENCH_r14.json)
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO_NEW = os.path.dirname(os.path.abspath(__file__))
REPO_OLD = os.environ.get("AB_OLD_REPO", "/root/repo_head")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "3"))

# Queries whose code path a round-14 optimization commit changed.
TOUCHED = [
    "q259_ppmi_svd_embeddings",   # SVD raw-matvec checkpoint + PPMI pin
    "q255_flac_decode",           # vectorized FLAC codec
    "q251_progressive_jpeg",      # closed-form diagonal ramp means
    "q263_softmax_language_id",   # feature persist + Arrow weights
    "q262_softmax_train",         # Arrow per-round weights
    "q258_logreg_score_corpus",   # feature persist + Arrow weights
    "q253_logreg_train",          # Arrow per-round weights
    "q266_sgns_train",            # fused side-tagged SGNS state
    "q268_word_sgns_semantic_ann",  # same + Arrow codebooks
    "q36_ann_ivf",                # de-windowed IVF assignment
    "q234_ivf_index_lifecycle",   # de-window + Arrow codebooks
    "q191_pq_ann",                # Arrow codebooks
    "q90_neardup_clusters",       # Arrow union-find output
    "q150_bpe_train",             # Arrow merge rows
]
# Untouched by every r14 optimization commit: host-drift controls.
CONTROLS = [
    "q213_tpch_q8",
    "q124_hits",
    "q202_spearman_corr",
    "q254_unigram_lm_train",
    "q257_unigram_segment_stats",
    "q159_random_walks",
    "q27_minhash_lsh",
]

RUNNER = r"""
import importlib.util, json, os, sys, time
repo = sys.argv[1]
names = json.loads(sys.argv[2])
sf = sys.argv[3]
sys.path.insert(0, repo)
spec = importlib.util.spec_from_file_location(
    "entry", os.path.join(repo, "__spark_entry__.py"))
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
from pagerank_spark.session import get_spark
spark = get_spark(app_name="ab-r14")
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()

def release():
    spark.catalog.clearCache()
    for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
        jr.unpersist(True)

qs["q01_edge_scan"](spark, sf).collect()  # warm JVM + parquet footers
out = {}
for n in names:
    t0 = time.perf_counter()
    qs[n](spark, sf).write.format("noop").mode("overwrite").save()
    out[n] = round(time.perf_counter() - t0, 3)
    release()
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_pass(repo: str) -> dict[str, float]:
    names = TOUCHED + CONTROLS
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, json.dumps(names), SF_DIR],
        capture_output=True,
        text=True,
        check=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"runner produced no AB_RESULT for {repo}:\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    times: dict[str, dict[str, list[float]]] = {
        "old": {}, "new": {}
    }
    for i in range(PASSES):
        for arm, repo in (("old", REPO_OLD), ("new", REPO_NEW)):
            got = run_pass(repo)
            for n, s in got.items():
                times[arm].setdefault(n, []).append(s)
            print(f"pass {i + 1}/{PASSES} {arm}: "
                  f"total {sum(got.values()):.1f}s", flush=True)

    def summarize(arm: str) -> dict[str, dict[str, float]]:
        return {
            n: {
                "min": min(v),
                "median": round(statistics.median(v), 3),
            }
            for n, v in times[arm].items()
        }

    s_old, s_new = summarize("old"), summarize("new")
    ratios = {
        n: round(s_new[n]["min"] / s_old[n]["min"], 3)
        for n in s_old
    }
    ctl = [ratios[n] for n in CONTROLS]
    rec = {
        "protocol": (
            f"{PASSES} interleaved passes per arm, fresh session per "
            "pass, warmup query, noop sink + blocking cache release "
            "per query, min across passes"
        ),
        "old_ref": "dd1c399 (pre-optimization r14 build close)",
        "sf_dir": SF_DIR,
        "touched": TOUCHED,
        "controls": CONTROLS,
        "times_sec": times,
        "min_old": {n: s_old[n]["min"] for n in s_old},
        "min_new": {n: s_new[n]["min"] for n in s_new},
        "ratio_new_over_old_min": ratios,
        "control_ratio_median": round(statistics.median(ctl), 3),
    }
    out = os.path.join(REPO_NEW, "AB_BENCH_r14.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in (
        "ratio_new_over_old_min", "control_ratio_median")}))


if __name__ == "__main__":
    main()
