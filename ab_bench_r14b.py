#!/usr/bin/env python
"""AB_BENCH_r14B.json — interleaved old-vs-new whole-query A/B for the
SECOND round-14 optimization session (the checkpoint-pin / loop-conf /
codec-spread set), with untouched CONTROL queries to factor out host
drift, exactly the ab_bench_r14.py protocol.

OLD arm: the worktree at 9c9d400 (where the first optimization session
closed); NEW arm: HEAD. Alternating passes, fresh subprocess/session
per pass, bench methodology (warmup, noop sink, blocking cache release
per query), min over PASSES per arm. Besides the raw min ratios the
artifact records the PASS-NORMALIZED estimator from AB_BENCH_r14.json:
each query's seconds divided by its own pass's control-set total,
which cancels minute-scale window drift because the controls share the
pass.

Usage: python ab_bench_r14b.py        (writes AB_BENCH_r14B.json)
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO_NEW = os.path.dirname(os.path.abspath(__file__))
REPO_OLD = os.environ.get("AB_OLD_REPO", "/root/repo_sess1")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "3"))

# Queries whose code path a session-2 optimization commit changed.
TOUCHED = [
    "q259_ppmi_svd_embeddings",    # PPMI pin checkpoint-rooted
    "q265_trained_embedding_ann",  # same
    "q267_trained_ivf_serving",    # same
    "q266_sgns_train",             # example-relation checkpoint
    "q268_word_sgns_semantic_ann",  # same
    "q253_logreg_train",           # xb/lab checkpoint + loop conf
    "q258_logreg_score_corpus",    # same
    "q262_softmax_train",          # same
    "q263_softmax_language_id",    # same
    "q254_unigram_lm_train",       # words-relation checkpoint
    "q257_unigram_segment_stats",  # same
    "q256_node2vec_walks",         # per-step frontier checkpoint
    "q251_progressive_jpeg",       # codec-input spread
    "q138_jpeg_decode",            # codec-input spread
    "q255_flac_decode",            # codec-input spread
    "q242_gif_decode",             # codec-input spread
    "q245_tiff_decode",            # codec-input spread
    "q235_image_resize",           # codec-input spread (PPM)
]
# Spread deliberately gated OFF for these — expected ~1.0 (the A/B
# that set the gates is in _ids_spread's docstring).
NEUTRAL = [
    "q252_interlaced_palette_png",
    "q115_audio_decode",
    "q264_audio_neardup",
]
# Untouched by every session-2 commit: host-drift controls.
CONTROLS = [
    "q213_tpch_q8",
    "q124_hits",
    "q202_spearman_corr",
    "q159_random_walks",
    "q27_minhash_lsh",
    "q187_containment_pairs",
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
spark = get_spark(app_name="ab-r14b")
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()

def release():
    spark.catalog.clearCache()
    for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
        jr.unpersist(True)

qs["q01_edge_scan"](spark, sf).collect()  # warm JVM + parquet footers

# warm the Python worker pool too (32 workers x pandas import):
# without this, whichever mapInPandas query runs FIRST in the pass
# absorbs the session's one-time worker spin-up — measured 6-45 s
# depending on memory pressure — and the arms time that, not the query
def _touch(it):
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    for b in it:
        yield b

spark.range(0, 32, 1, 32).mapInPandas(
    _touch, schema="id long"
).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    best = None
    for _ in range(2):  # bench.py methodology: min-of-2 per query
        t0 = time.perf_counter()
        qs[n](spark, sf).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        release()
    out[n] = round(best, 3)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_pass(repo: str) -> dict[str, float]:
    names = TOUCHED + NEUTRAL + CONTROLS
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
    times: dict[str, dict[str, list[float]]] = {"old": {}, "new": {}}
    norm: dict[str, dict[str, list[float]]] = {"old": {}, "new": {}}
    for i in range(PASSES):
        for arm, repo in (("old", REPO_OLD), ("new", REPO_NEW)):
            got = run_pass(repo)
            ctl_total = sum(got[c] for c in CONTROLS)
            for n, s in got.items():
                times[arm].setdefault(n, []).append(s)
                norm[arm].setdefault(n, []).append(s / ctl_total)
            print(f"pass {i + 1}/{PASSES} {arm}: "
                  f"total {sum(got.values()):.1f}s "
                  f"(controls {ctl_total:.1f}s)", flush=True)

    mins = {
        arm: {n: min(v) for n, v in times[arm].items()}
        for arm in ("old", "new")
    }
    nmins = {
        arm: {n: min(v) for n, v in norm[arm].items()}
        for arm in ("old", "new")
    }
    ratios = {
        n: round(mins["new"][n] / mins["old"][n], 3) for n in mins["old"]
    }
    nratios = {
        n: round(nmins["new"][n] / nmins["old"][n], 3)
        for n in nmins["old"]
    }
    ctl = [nratios[n] for n in CONTROLS]
    tch = [nratios[n] for n in TOUCHED]
    rec = {
        "protocol": (
            f"{PASSES} interleaved passes per arm, fresh session per "
            "pass, warmup query, noop sink + blocking cache release "
            "per query; min across passes, plus the pass-normalized "
            "estimator (each query / its pass's control total)"
        ),
        "old_ref": "9c9d400 (session-1 optimization close)",
        "sf_dir": SF_DIR,
        "touched": TOUCHED,
        "neutral_expected": NEUTRAL,
        "controls": CONTROLS,
        "times_sec": times,
        "min_old": mins["old"],
        "min_new": mins["new"],
        "ratio_new_over_old_min": ratios,
        "normalized_ratio": nratios,
        "control_normalized_median": round(statistics.median(ctl), 3),
        "touched_normalized_median": round(statistics.median(tch), 3),
    }
    out = os.path.join(REPO_NEW, "AB_BENCH_r14B.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps({k: rec[k] for k in (
        "normalized_ratio",
        "control_normalized_median",
        "touched_normalized_median",
    )}))


if __name__ == "__main__":
    main()
