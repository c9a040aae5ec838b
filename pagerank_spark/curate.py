"""Corpus-curation pipeline CLI: the training-data front door.

Composes the curation tier end-to-end over a parquet corpus —
scrub (PII redaction) → structure gate (Gopher bounds) → exact dedup
→ optional near-dup cluster dedup → deterministic train/val/test
split — and writes the result partitioned by split, plus a one-line
JSON report of per-stage row counts (the numbers an ingest dashboard
tracks load-over-load).

Every stage is one of the declared, oracle-verified operators; the
CLI only wires them, so the pipeline inherits their determinism: two
runs over the same corpus produce byte-identical keep decisions.

Usage::

    python -m pagerank_spark.curate CORPUS.parquet --out OUT_DIR
        [--id-col doc_id] [--text-col text]
        [--no-scrub] [--no-gate] [--no-dedup] [--neardup]
        [--split train=0.98,val=0.01,test=0.01]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_split(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, frac = part.partition("=")
        if not name or not frac:
            raise ValueError(f"bad split spec segment: {part!r}")
        out[name.strip()] = float(frac)
    return out


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input", help="parquet corpus (id, text columns)")
    ap.add_argument("--out", required=True,
                    help="output dir (parquet, partitioned by split)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-scrub", action="store_true",
                    help="skip PII redaction")
    ap.add_argument("--no-gate", action="store_true",
                    help="skip the Gopher structure gate")
    ap.add_argument("--no-dedup", action="store_true",
                    help="skip exact dedup")
    ap.add_argument("--neardup", action="store_true",
                    help="also drop MinHash near-duplicate clusters")
    ap.add_argument("--split", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument(
        "--audit",
        default=None,
        help="also write the per-document (id, stage, verdict, reason) "
        "provenance relation (parquet) — the lineage rows an ingest "
        "dashboard reconciles against the report counts; not supported "
        "together with --neardup",
    )
    args = ap.parse_args(argv)
    if args.audit and args.neardup:
        raise SystemExit(
            "--audit models the default pipeline stages "
            "(scrub/gate/dedup/split); --neardup is not audited"
        )

    from pyspark.sql import functions as F

    from pagerank_spark.operators.curation import dataset_split
    from pagerank_spark.operators.dedup import exact_dedup, neardup_clusters
    from pagerank_spark.operators.text import gopher_quality, pii_redact
    from pagerank_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="pagerank-curate")
        spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    id_col, text_col = args.id_col, args.text_col

    docs = spark.read.parquet(args.input)
    report: dict = {"input_rows": docs.count()}

    if not args.no_scrub:
        red = pii_redact(docs, text_col=text_col)
        report["pii_rows_touched"] = red.where(
            (F.col("n_emails") > 0) | (F.col("n_phones") > 0)
        ).count()
        # pii_redact emits f"{text_col}_redacted" — renaming the literal
        # "text_redacted" silently no-ops for any non-default --text-col
        # and breaks every downstream stage (r11 ADVICE).
        docs = red.drop(text_col, "n_emails", "n_phones").withColumnRenamed(
            f"{text_col}_redacted", text_col
        )

    if not args.no_gate:
        gated = gopher_quality(docs, text_col=text_col)
        docs = gated.where(F.col("passes_gopher")).select(docs.columns)
        report["after_gate"] = docs.count()

    if not args.no_dedup:
        docs = exact_dedup(docs, [text_col], id_col)
        report["after_exact_dedup"] = docs.count()

    if args.neardup:
        reps = neardup_clusters(docs, id_col=id_col, text_col=text_col)
        keep = reps.where(
            F.col(id_col) == F.col("canonical_id")
        ).select(id_col)
        docs = docs.join(keep, on=id_col, how="left_semi")
        report["after_neardup"] = docs.count()

    if args.audit:
        # One extra pass over the corpus TOTAL (not per stage): the
        # provenance relation recomputes the same operator flags the
        # pipeline used — identical deterministic verdicts — and
        # explodes them into audit rows. The reconcile pytest pins
        # report counts == audit counts stage for stage.
        from pagerank_spark.operators.curation import curation_provenance

        audit = curation_provenance(
            spark.read.parquet(args.input),
            id_col=id_col,
            text_col=text_col,
            fractions=_parse_split(args.split),
            scrub=not args.no_scrub,
            gate=not args.no_gate,
            dedup=not args.no_dedup,
        )
        audit.write.mode("overwrite").parquet(args.audit)
        report["audit"] = args.audit

    docs = dataset_split(docs, id_col, _parse_split(args.split))
    report["split_rows"] = {
        r["split"]: r["n"]
        for r in docs.groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    docs.write.mode("overwrite").partitionBy("split").parquet(args.out)
    report["output"] = args.out
    report["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
