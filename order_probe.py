#!/usr/bin/env python
"""Training-order operators one decade up (round-10): ``training_order``
and ``mixture_order`` (q240/q241) exist precisely because a global
``row_number`` window single-partitions at scale — this probe runs the
two-level prefix-sum rank at 10M and 20M rows and checks the claims:

1. cost ~linear at 2× rows (slope < 3, generous for host noise — a
   single-partition sort would blow past it and long before that blow
   out one task's memory);
2. the output is a true permutation at every scale (distinct positions
   == N, max == N-1 — checked distributedly, nothing collected);
3. mixture proportions hold at scale: in the weighted interleave the
   heavier source's positions have the smaller mean (rate interleave
   over proportionally-sized sources).

Writes ORDER_PROBE.json. ~2-4 min; run per-round, not in bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_ORDER_PROBE_ROWS", 10_000_000))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.curation import (
        mixture_order,
        training_order,
    )
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name="order-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def release_session_state() -> None:
        # mixture_order's interleave keys live as lazy localCheckpoint
        # blocks until GC'd; left resident they tax the NEXT
        # measurement's execution memory (the first probe run measured
        # training_order 4.3x slower at 2x purely from the previous
        # op's resident blocks — bench.py's release discipline).
        import gc

        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jmap.values():
            jrdd.unpersist(True)
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    results: dict[str, dict] = {}
    for scale, n in (("1x", BASE_ROWS), ("2x", 2 * BASE_ROWS)):
        # 3 sources at 3:2:1 weights with proportional sizes (id mod 6)
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 6 < 3, "a")
            .when(F.col("id") % 6 < 5, "b")
            .otherwise("c")
            .alias("source"),
        )

        t0 = time.perf_counter()
        t_order = training_order(df, "doc_id", seed=11)
        chk = t_order.agg(
            F.count("*").alias("n"),
            F.countDistinct("position").alias("n_pos"),
            F.max("position").alias("max_pos"),
        ).collect()[0]
        t_train = round(time.perf_counter() - t0, 2)
        assert (chk["n"], chk["n_pos"], chk["max_pos"]) == (n, n, n - 1)
        release_session_state()

        t0 = time.perf_counter()
        m_order = mixture_order(
            df, {"a": 3, "b": 2, "c": 1}, "source", "doc_id", seed=11
        )
        mchk = {
            r["source"]: (r["n"], float(r["mean_pos"]))
            for r in m_order.groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.avg("position").alias("mean_pos"),
            )
            .collect()
        }
        t_mix = round(time.perf_counter() - t0, 2)
        # proportional sizes -> every source spans the whole order, so
        # all means sit near the middle; a block-concatenated (wrong)
        # order would separate them by ~n/3
        mid = (n - 1) / 2
        for s, (cnt, mean) in mchk.items():
            assert abs(mean - mid) < 0.02 * n, (s, mean, mid)
        assert abs(mchk["a"][0] - n // 2) <= 3  # 3/6 of rows (mod-6 tail)

        release_session_state()
        results[scale] = {
            "n_rows": n,
            "training_order_sec": t_train,
            "mixture_order_sec": t_mix,
            "mixture_mean_pos": {s: round(v[1], 1) for s, v in mchk.items()},
        }

    slopes = {
        op: round(
            results["2x"][f"{op}_sec"]
            / max(0.01, results["1x"][f"{op}_sec"]),
            2,
        )
        for op in ("training_order", "mixture_order")
    }
    out = {
        "metric": "order_probe_2x_slopes",
        "slopes": slopes,
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "ORDER_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    for op, s in slopes.items():
        assert s < 3.0, f"superlinear {op} at 10M rows: {s}"


if __name__ == "__main__":
    main()
