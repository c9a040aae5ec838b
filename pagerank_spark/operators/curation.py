"""Corpus-curation operators: deterministic domain-mix sampling.

Training-data pipelines rarely train on a corpus in its natural
source proportions — they resample to a target mix (so much web, so
much code, so much reference text). ``sample_to_mix`` is that
operator: deterministic, single-pass, and exactly reproducible across
engines (the keep decision hashes the row id with the portable md5
hash family, so the DuckDB oracle twin selects the identical rows).

Extension tier — the reference (a PageRank engine) has no sampling
beyond its seeded head-sample; this is the large-corpus analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions import portable_hash60

MIX_PRECISION = 1_000_000


def mix_plan(
    df: DataFrame, group_col: str, weights: dict[str, float]
) -> DataFrame:
    """The sampling plan behind ``sample_to_mix``: per group, the
    observed count, the target weight, and the keep fraction.

    The feasible total is maximized without upsampling: with group
    counts n_g and weights w_g (any positive scale), the largest total
    T such that every group can supply its share is
    ``T = min_g(n_g / w_g)`` — the group hitting the minimum is kept
    whole (keep_frac = 1) and every other group downsamples to
    ``w_g · T / n_g``. One partial-combined count per group plus a
    scalar min — the plan table is group-cardinality-sized (tiny), so
    every downstream join against it broadcasts.

    Groups absent from ``weights`` get weight 0 (dropped); weights
    absent from the data simply contribute no rows.
    """
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{group_col} string, weight double",
    )
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_rows"))
    caps = counts.join(F.broadcast(w_df), on=group_col, how="inner")
    t = caps.agg(
        F.min(F.col("n_rows") / F.col("weight")).alias("__t")
    )
    return (
        caps.crossJoin(F.broadcast(t))
        .select(
            group_col,
            "n_rows",
            "weight",
            # round(·, 12) snaps the binding group's w·(n/w)/n — exactly
            # 1 algebraically, up to ~3 ulp off in floating point — back
            # to 1.0, so "the binding group is kept whole" holds
            # EXACTLY; a 5e-13 perturbation of real fractions is far
            # below the 1e-6 coin resolution. The oracle twin applies
            # the same rounding.
            F.least(
                F.lit(1.0),
                F.round(
                    F.col("weight") * F.col("__t") / F.col("n_rows"), 12
                ),
            ).alias("keep_frac"),
        )
    )


def sample_to_mix(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    id_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic stratified downsampling to a target group mix.

    Keeps row ``r`` of group ``g`` iff
    ``portable_hash60(id || ':' || salt) % 10^6 < floor(keep_frac_g ·
    10^6)`` — a per-row coin flip that is (a) stable under reruns and
    repartitioning (no RNG, no zipWithIndex), (b) independent of row
    order, and (c) reproducible in any engine with md5. The realized
    group sizes concentrate tightly around ``keep_frac_g · n_g``
    (binomial, not exact-count) — the standard trade for a one-pass,
    shuffle-free filter; the only shuffle in the whole operator is the
    tiny per-group count inside ``mix_plan``, which broadcasts back.

    At 100 TB: one scan computing a hash-compare filter per row, one
    broadcast join against a group-cardinality plan table. No window,
    no global sort, no driver materialization of data rows.
    """
    plan = mix_plan(df, group_col, weights).select(
        group_col,
        F.floor(F.col("keep_frac") * MIX_PRECISION)
        .cast("long")
        .alias("__thresh"),
    )
    coin = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ) % F.lit(MIX_PRECISION)
    return (
        df.join(F.broadcast(plan), on=group_col, how="inner")
        .where(coin < F.col("__thresh"))
        .drop("__thresh")
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least
    ``min_overlap`` distinct word ``n``-grams with the benchmark set —
    the standard eval-leakage scan a training pipeline runs before
    training. Returns (id_col, n_hits) where ``n_hits`` counts the
    doc's distinct shingles that occur anywhere in the benchmark.

    Plan: both sides shingle with the existing ``word_shingles``
    (sequence/slice/explode, pure Catalyst, distinct per doc), the
    benchmark's distinct shingle set broadcasts (eval suites are tiny
    next to a 100 TB corpus), and the overlap is a broadcast hash
    semi-join + partial-combined count. No Python, one shuffle (the
    per-doc count), corpus scanned once.
    """
    from pagerank_spark.operators.dedup import word_shingles

    c = word_shingles(corpus, id_col, text_col, n)
    b = (
        word_shingles(
            benchmark, id_col, bench_text_col or text_col, n
        )
        .select("shingle")
        .distinct()
    )
    return (
        c.join(F.broadcast(b), on="shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
        .where(F.col("n_hits") >= min_overlap)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """C4-style boilerplate removal: drop every line that occurs in at
    least ``min_docs`` DISTINCT documents (navigation chrome, cookie
    banners, license footers), preserving the remaining lines' order.
    Returns (id_col, cleaned text, n_lines_removed).

    Plan: posexplode lines (position keeps reassembly deterministic),
    count distinct docs per line (partial-combined agg on the line
    key), broadcast-or-shuffle join the boilerplate set back, and
    reassemble with sort_array over (pos, line) structs — exact,
    order-stable, no window and no Python. Every kept document emits
    exactly one row, including documents left empty.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("line")
    )
    tagged = lines.join(
        boiler.withColumn("__is_boiler", F.lit(True)), on="line", how="left"
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("__is_boiler").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias(text_col),
            F.sum(
                F.when(F.col("__is_boiler").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


__all__ = [
    "MIX_PRECISION",
    "mix_plan",
    "sample_to_mix",
    "contamination_report",
    "remove_boilerplate_lines",
]
