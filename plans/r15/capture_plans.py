#!/usr/bin/env python
"""Capture .explain('formatted') for named declared queries.

Usage: python capture_plans.py <repo_dir> <suffix> <query substrings...>
Writes plans/r14/<query>_<suffix>.txt under THIS repo (the optimization
workspace), regardless of which repo_dir the engine is imported from —
so `capture_plans.py /root/repo_head before q234 q36` records the
pre-optimization plans and the same call against /root/repo the post
ones. sf dir: $SPARK_GRAFT_SF_DIR or sf0.01 (plan shape, not timing).
"""
import importlib.util
import os
import sys

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    repo, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"plans-{suffix}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for pat in names:
        matches = [n for n in qs if pat in n]
        if not matches:
            print(f"NO MATCH: {pat}")
            continue
        for name in matches:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
