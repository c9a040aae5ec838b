#!/usr/bin/env python
"""Round-11 adjudication (round-10 verdict #1): the post-close
BENCH_LOCAL_r11 refresh recorded q11_lineitem_agg 0.373 -> 0.658 s
(1.76x) and q74_tpch_q18 0.662 -> 1.005 s (1.52x) vs their seeded
baselines, with no adjudication.

Code-identity fact established first: `git diff 36ed8ff HEAD` at the
time this script was written touched ONLY driver artifacts (VERDICT.md,
ADVICE.md, BENCH/CORRECTNESS json) — zero engine code changed between
the commit that seeded the baselines and the commit that produced the
warnings. A worktree A/B of the two commits would therefore time the
byte-identical engine twice; the adjudication reduces to re-measuring
the two flagged queries interleaved with two control queries of the
same shape (sub-second star-schema aggregations q12/q18, which the same
r11 refresh ALSO recorded inflated: 1.43x / 1.34x — the flat-inflation
signature of host drift, not a plan regression) on one warm session,
best-of-3 with run 0 discarded as warmup.

verdict rule:
  drift      — both flagged queries' best-of-3 <= 1.5x their seeded
               baseline (the engine meets its baseline when the host is
               quiet; the r11-refresh numbers were host noise)
  regression — either stays >1.5x: since the code is byte-identical to
               the baseline-seeding commit, that would mean the host
               floor itself moved -> re-baseline, per the r7 precedent
               (AB_BENCH_r6 proved the r2 minima unreachable for ANY
               commit).

Writes AB_BENCH_r11.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLAGGED = {"q11_lineitem_agg": 0.373, "q74_tpch_q18": 0.662}
CONTROLS = {"q12_customer_nation_region": 0.387, "q18_top_customers": 0.476}
R11_REFRESH = {
    "q11_lineitem_agg": 0.658,
    "q74_tpch_q18": 1.005,
    "q12_customer_nation_region": 0.554,
    "q18_top_customers": 0.637,
}


def main() -> None:
    from pagerank_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="ab-bench-r11")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()

    names = list(FLAGGED) + list(CONTROLS)
    runs: dict[str, list[float]] = {n: [] for n in names}
    for i in range(4):  # interleaved; round 0 discarded as warmup
        for name in names:
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            if i > 0:
                runs[name].append(el)
            spark.catalog.clearCache()

    best = {k: min(v) for k, v in runs.items()}
    ratios = {
        k: round(best[k] / base, 2)
        for k, base in {**FLAGGED, **CONTROLS}.items()
    }
    flagged_ok = all(ratios[k] <= 1.5 for k in FLAGGED)
    verdict = "drift" if flagged_ok else "host_floor_moved"
    result = {
        "metric": "ab_bench_r11_q11_q74_adjudication",
        "sf_dir": SF_DIR,
        "code_identity": (
            "git diff 36ed8ff..HEAD touches only driver artifacts; the "
            "engine is byte-identical to the baseline-seeding commit"
        ),
        "interleaved_best_of_3": best,
        "all_runs": runs,
        "ratio_vs_seeded_baseline": ratios,
        "seeded_baseline": {**FLAGGED, **CONTROLS},
        "r11_refresh_values": R11_REFRESH,
        "verdict": verdict,
        "action": (
            "r11-refresh warnings adjudicated as host drift: the "
            "unchanged engine meets its seeded baselines on a quiet "
            "interleaved run (controls moved with the flagged queries "
            "in the refresh, the flat-inflation drift signature)"
            if flagged_ok
            else (
                "host floor moved for identical code -> re-baseline "
                "q11/q74 to the new quiet-host best (r7 precedent)"
            )
        ),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "AB_BENCH_r11.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
