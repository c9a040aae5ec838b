#!/usr/bin/env python
"""CURATE_PROBE.json — end-to-end growth evidence for the curate CLI.

Every curation stage is probed ALONE elsewhere (DEDUP/SPAN/SEMDEDUP/
LOGREG/UNIGRAM…), but the composed pipeline — scrub → structure gate →
trained quality gate → exact dedup → split/write, as one `curate.py`
run — had no growth artifact (r12 verdict #5). This measures the WHOLE
CLI at 1M and 2M synthetic docs (sf0.01 documents replicated under
fresh ids — realistic token distributions, and the replicas make exact
dedup do real work) and asserts:

- total wall at 2× stays < 3× (near-linear composition, no
  stage-crossing blowup),
- every corpus-scanning stage's own wall (the CLI's new per-stage
  ``stage_sec`` report field) stays < 3× at 2×,
- the report counts scale exactly with replication (determinism:
  gate/quality verdicts are per-text, so counts double precisely;
  exact dedup collapses replicas to the same survivor set).

Labels for the trained gate: every 97th doc, y = text contains
'vector' — the logreg probe's planted-signal shape, 4 GD rounds.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_CURATE_PROBE_DOCS", 1_000_000))


def build_inputs(spark, replication: int, tag: str):
    from pyspark.sql import functions as F

    from pagerank_spark.functions import word_tokens

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = (
        docs.select(
            "doc_id", "text",
            F.explode(
                F.sequence(F.lit(0), F.lit(replication - 1))
            ).alias("rep"),
        )
        .select(
            (F.col("doc_id") * replication + F.col("rep")).alias(
                "doc_id"
            ),
            "text",
        )
    )
    src = f"/tmp/curate_probe_{tag}_src"
    corpus.write.mode("overwrite").parquet(src)
    # label the SAME originals at every scale (their rep-0 replicas):
    # identical labeled texts ⇒ identical GD trajectory ⇒ the trained
    # gate's keep decision is a pure function of text, so keep counts
    # scale exactly with replication (the determinism assert below)
    labels = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") * replication).alias("doc_id"),
        F.array_contains(
            word_tokens(F.lower(F.col("text"))), "vector"
        )
        .cast("double")
        .alias("y"),
    )
    lab = f"/tmp/curate_probe_{tag}_labels"
    labels.write.mode("overwrite").parquet(lab)
    return src, lab


def run_curate(spark, src: str, lab: str, out: str) -> dict:
    from pagerank_spark.curate import main as curate_main

    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = curate_main(
            [
                src, "--out", out,
                "--quality-labels", lab,
                "--quality-rounds", "4",
            ],
            spark=spark,
        )
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    report["wall_sec"] = round(time.perf_counter() - t0, 3)
    return report


def _run_scale(scale: str) -> None:
    """One scale per process invocation: the full composed CLI run at
    1M docs alone exceeds a 10-minute wall on this harness, so the
    probe stages as `1x` → `2x` → `finalize` (partial reports in
    /tmp), each within the cap."""
    from pagerank_spark.session import get_spark

    spark = get_spark(app_name=f"curate-probe-{scale}")
    spark.sparkContext.setLogLevel("ERROR")
    reps = max(1, BASE_DOCS // 500)
    replication = reps if scale == "1x" else 2 * reps
    src, lab = build_inputs(spark, replication, scale)
    report = run_curate(spark, src, lab, f"/tmp/curate_probe_{scale}_out")
    with open(f"/tmp/curate_probe_report_{scale}.json", "w") as f:
        json.dump(report, f)
    print(json.dumps(report))
    spark.stop()


def main() -> None:
    out: dict = {}
    reports: dict[str, dict] = {}
    for scale in ("1x", "2x"):
        reports[scale] = json.load(
            open(f"/tmp/curate_probe_report_{scale}.json")
        )
        report = reports[scale]
        out[f"docs_{scale}"] = report["input_rows"]
        out[f"wall_{scale}_sec"] = report["wall_sec"]
        out[f"stage_sec_{scale}"] = report["stage_sec"]

    out["wall_2x_slope"] = round(
        out["wall_2x_sec"] / out["wall_1x_sec"], 3
    )
    stage_slopes = {}
    for k, v1 in reports["1x"]["stage_sec"].items():
        v2 = reports["2x"]["stage_sec"].get(k)
        if v2 is not None and v1 >= 0.5:  # noise floor
            stage_slopes[k] = round(v2 / v1, 3)
    out["stage_2x_slopes"] = stage_slopes

    # determinism: per-text verdicts ⇒ counts scale exactly with
    # replication; exact dedup collapses replicas to one survivor set
    assert (
        reports["2x"]["input_rows"] == 2 * reports["1x"]["input_rows"]
    )
    assert (
        reports["2x"]["after_gate"] == 2 * reports["1x"]["after_gate"]
    )
    assert (
        reports["2x"]["after_quality_gate"]
        == 2 * reports["1x"]["after_quality_gate"]
    )
    assert (
        reports["2x"]["after_exact_dedup"]
        == reports["1x"]["after_exact_dedup"]
    ), "replica dedup must collapse to the same survivors"

    assert out["wall_2x_slope"] < 3.0, out
    for k, s in stage_slopes.items():
        assert s < 3.0, (k, s, out)

    with open(os.path.join(REPO, "CURATE_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    for scale in ("1x", "2x"):
        for suffix in ("src", "labels", "out"):
            shutil.rmtree(
                f"/tmp/curate_probe_{scale}_{suffix}",
                ignore_errors=True,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("1x", "2x"):
        _run_scale(sys.argv[1])
    else:
        main()
