#!/usr/bin/env python
"""A/B the r14 fused-state sgns_train against the two-relation HEAD~1
shape: same q266 workload (walk pairs at sf0.1), interleaved timed
runs in ONE session, plus value comparison of the trained factors."""
import json
import os
import subprocess
import sys
import time
import types

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OLD_REF = os.environ.get("SGNS_AB_OLD_REF", "e21ae29")


def load_old_embeddings():
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{OLD_REF}:pagerank_spark/graph/embeddings.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    mod = types.ModuleType("old_embeddings")
    sys.modules["old_embeddings"] = mod  # dataclass needs the registry
    exec(compile(src, "old_embeddings", "exec"), mod.__dict__)
    return mod


def main() -> None:
    import importlib.util

    from pagerank_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    spark = get_spark(app_name="sgns-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    from pagerank_spark.graph import embeddings as new_emb
    from pagerank_spark.graph.walks import random_walks, skipgram_pairs

    old_emb = load_old_embeddings()

    def pairs():
        return skipgram_pairs(
            random_walks(entry._edges(spark, SF_DIR), steps=4), window=2
        )

    def release():
        spark.catalog.clearCache()
        for jr in spark.sparkContext._jsc.getPersistentRDDs().values():
            jr.unpersist(True)

    def run(mod):
        t0 = time.perf_counter()
        res = mod.sgns_train(pairs(), dim=4, rounds=2, lr=0.5, neg_k=2)
        out = res.u.select("node", "dim", "value")
        out.write.format("noop").mode("overwrite").save()
        rows = {(r["node"], r["dim"]): r["value"] for r in out.collect()}
        el = time.perf_counter() - t0
        release()
        return el, rows

    times = {"old": [], "new": []}
    vals = {}
    for i in range(3):
        for tag, mod in (("old", old_emb), ("new", new_emb)):
            el, rows = run(mod)
            times[tag].append(round(el, 3))
            vals[tag] = rows
            print(tag, el, flush=True)
    assert vals["old"].keys() == vals["new"].keys()
    worst = max(
        abs(vals["old"][k] - vals["new"][k]) for k in vals["old"]
    )
    rec = {
        "workload": "q266 shape: sf0.1 walk pairs, dim=4, rounds=2, lr=0.5",
        "interleaved_sec": times,
        "best": {t: min(v) for t, v in times.items()},
        "median": {t: sorted(v)[1] for t, v in times.items()},
        "n_cells": len(vals["old"]),
        "worst_abs_value_diff": worst,
        "old_ref": OLD_REF,
    }
    print(json.dumps(rec))
    with open(os.path.join(REPO, "SGNS_AB_r14.json"), "w") as f:
        json.dump(rec, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
