#!/usr/bin/env python
"""TAIL_AB_r13.json — interleaved re-measurement of the r12 bench tail.

q43 / q16 / q39 were flagged 1.8–2.3× their host-window seeds in the
r12 close run and adjudicated as host drift (disjoint warning sets,
byte-identical-engine re-runs at 0.87× median). The r12 verdict asked
for one interleaved HEAD-measurement on a quiet host so the seeds
regain guard value: this runs the three queries round-robin ×5 in one
warm session at sf0.1 and records per-query min/median — the min is
the candidate HOST_BASELINE refresh (bench.py seeds are "best observed
on the current host window").

Run at close time on an otherwise-idle host, BEFORE `make close-round`.
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = ["q16_adjacency_lists", "q39_revenue_per_nation", "q43_asof_join"]
ROUNDS = 5


def main() -> None:
    from pagerank_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "e", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()
    names = list(QUERIES)

    spark = get_spark(app_name="tail-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    times: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # one warm-up pass, untimed
        qs[n](spark, sf).count()
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf).count()
            times[n].append(round(time.perf_counter() - t0, 3))
    out = {
        "rounds": ROUNDS,
        "times_sec": times,
        "min": {n: min(v) for n, v in times.items()},
        "median": {
            n: round(statistics.median(v), 3) for n, v in times.items()
        },
    }
    print(json.dumps(out))
    with open("/root/repo/TAIL_AB_r13.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
