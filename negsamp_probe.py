#!/usr/bin/env python
"""NEGSAMP probe: negative_samples draw cost must be linear in the
number of draws at a fixed large vocabulary (round-6 verdict #3 exit
criterion). The round-6 containment form was a
BroadcastNestedLoopJoin — O(draws x vocab) — which at a 10^6-context
vocabulary turns every draw into a million-range scan; the bucket
equi-join form built this round is O(draws) with a vocabulary-sized
broadcast index.

Method: synthesize skip-gram pair relations with ~10^6 distinct
contexts (spark.range, no RNG) at 1x and 2x draw counts, run
negative_samples(k=2) to a count() sink, and assert
  * the plan contains a BroadcastHashJoin on the bucket key,
  * the vocabulary never feeds a BroadcastNestedLoopJoin,
  * 2x draws cost <= 3x the 1x time (linear-ish; the old BNL form is
    quadratic and DNFs at this vocabulary),
  * every draw lands (output rows == draws * k, the CDF tiles
    [0, total)).

Writes NEGSAMP_PROBE.json.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pagerank_spark.graph.walks import negative_samples

VOCAB = 1_000_000
BASE_DRAWS = 2_000_000


def make_pairs(spark, n_draws: int):
    # centers cycle 0..9999, contexts cycle the full vocabulary —
    # deterministic, RNG-free, every context id appears.
    return spark.range(n_draws).select(
        (F.col("id") % 10_000).cast("int").alias("center"),
        (F.col("id") % VOCAB).cast("int").alias("context"),
        (F.col("id") % 7 + 1).cast("long").alias("cnt"),
    )


def run(spark, n_draws: int) -> dict:
    out = negative_samples(make_pairs(spark, n_draws), k=2)
    t0 = time.time()
    n = out.count()
    wall = time.time() - t0
    return {"draws": n_draws, "rows_out": n, "sec": round(wall, 3)}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    plan = (
        negative_samples(make_pairs(spark, 1000), k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin [bkt" in plan, "bucket equi-join missing"
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln  # 1-row scalar joins only

    r1 = run(spark, BASE_DRAWS)
    r2 = run(spark, 2 * BASE_DRAWS)
    assert r1["rows_out"] == BASE_DRAWS * 2
    assert r2["rows_out"] == 2 * BASE_DRAWS * 2
    growth = r2["sec"] / max(r1["sec"], 1e-9)
    result = {
        "vocab": VOCAB,
        "k": 2,
        "runs": [r1, r2],
        "cost_growth_for_2x_draws": round(growth, 2),
        "linear_ok": growth <= 3.0,
        "plan_bucket_equi_join": True,
    }
    assert result["linear_ok"], f"superlinear: {growth}"
    with open("NEGSAMP_PROBE.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
