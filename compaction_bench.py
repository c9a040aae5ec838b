#!/usr/bin/env python
"""Microbench for the table layer's OPTIMIZE analogue
(``pagerank_spark.table.compact_table``): measures what snapshot
compaction + range clustering buys a selective scan.

Scenario (the 100 TB story at bench scale): a table accumulated as many
small files with no clustering — the state every streaming-upsert or
fine-grained-append table converges to — versus the same snapshot
compacted with ``sort_by`` so each output file covers a disjoint key
range and parquet min/max stats let a key-range scan skip whole
files/row-groups.

Method: write ``lineitem`` (sf dir from $SPARK_GRAFT_SF_DIR, default
sf0.1) as a ``--files``-way randomly bucketed snapshot, time a ~1%
``l_orderkey`` range scan (filter + aggregate, best-of-``--passes``),
then ``compact_table(sort_by=["l_orderkey"])`` and time the same scan
against the new snapshot. Prints ONE JSON line::

    {"metric": "compaction_scan_speedup", "value": <before/after>,
     "scan_before_sec": ..., "scan_after_sec": ..., "compact_sec": ...,
     "files_before": N, "files_after": M, "rows": R, "sf": ...}

Run: ``python compaction_bench.py`` (artifact: COMPACTION_BENCH.json).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _parquet_files(snap_dir: str) -> int:
    return len(glob.glob(os.path.join(snap_dir, "*.parquet")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64,
                    help="fragment count for the uncompacted snapshot")
    ap.add_argument("--target-files", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "COMPACTION_BENCH.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pagerank_spark.session import get_spark
    from pagerank_spark.table import (
        _snap_dir,
        compact_table,
        current_version,
        read_table,
        write_table,
    )

    spark = get_spark(app_name="compaction-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="compaction_bench_")
    try:
        src = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        # Fragment WITHOUT key clustering: round-robin repartition mixes
        # every key range into every file — min/max stats prune nothing.
        v0 = write_table(src.repartition(args.files), root)
        lo, hi = src.agg(
            F.min("l_orderkey"), F.max("l_orderkey")
        ).collect()[0]
        span = max((hi - lo) // 100, 1)  # ~1% key range
        q_lo, q_hi = lo + 42 * span, lo + 43 * span

        def scan(version: int) -> float:
            best = None
            for _ in range(max(args.passes, 1)):
                t0 = time.perf_counter()
                read_table(spark, root, version).where(
                    F.col("l_orderkey").between(q_lo, q_hi)
                ).agg(
                    F.sum("l_extendedprice"), F.count("*")
                ).collect()
                e = time.perf_counter() - t0
                best = e if best is None else min(best, e)
            return round(best, 4)

        before = scan(v0)
        t0 = time.perf_counter()
        v1 = compact_table(
            spark, root, target_files=args.target_files,
            sort_by=["l_orderkey"],
        )
        compact_sec = round(time.perf_counter() - t0, 4)
        after = scan(v1)

        result = {
            "metric": "compaction_scan_speedup",
            "value": round(before / after, 3) if after else None,
            "unit": "x",
            "scan_before_sec": before,
            "scan_after_sec": after,
            "compact_sec": compact_sec,
            "files_before": _parquet_files(_snap_dir(root, v0)),
            "files_after": _parquet_files(_snap_dir(root, v1)),
            "rows": src.count(),
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        }
        assert current_version(root) == v1
        line = json.dumps(result)
        print(line)
        with open(args.out, "w") as f:
            f.write(line + "\n")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
