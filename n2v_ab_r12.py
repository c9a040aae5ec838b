#!/usr/bin/env python
"""N2V_AB_r12.json — A/B: q256 node2vec as committed vs the engine's
standard iterative-loop treatment (size-gated broadcasts of the
walk-frontier-side relations + `_iterative_loop_conf` shuffle sizing),
interleaved best-of-3 at sf0.1. Values must be identical row-for-row;
only the plan changes."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pagerank_spark.functions import portable_hash60  # noqa: E402
from pagerank_spark.graph.components import (  # noqa: E402
    BROADCAST_STATE_ROW_LIMIT,
    _bc,
    _iterative_loop_conf,
)


def n2v_opt(
    edges: DataFrame, steps: int = 4, p: float = 1.0, q: float = 1.0
) -> DataFrame:
    """node2vec_walks with the loop treatment under test."""
    spark = edges.sparkSession
    ec = edges.count()
    bcs = 2 * ec <= BROADCAST_STATE_ROW_LIMIT
    with _iterative_loop_conf(spark, ec):
        return _n2v_opt_body(edges, steps, p, q, bcs)


def _n2v_opt_body(edges, steps, p, q, bcs):
    w = Window.partitionBy("src").orderBy("dst")
    adj = edges.select(
        "src", "dst", (F.row_number().over(w) - 1).alias("idx")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    eset = edges.select(
        F.col("src").alias("p_src"), F.col("dst").alias("p_dst")
    ).distinct()

    state = (
        edges.select("src")
        .distinct()
        .select(
            F.col("src").alias("start"),
            F.col("src").alias("cur"),
            F.col("src").cast("string").alias("path"),
        )
    )
    pick1 = F.pmod(
        portable_hash60(
            F.concat(F.col("cur").cast("string"), F.lit("#1"))
        ),
        F.col("deg"),
    )
    state = (
        _bc(state, bcs).join(deg, state["cur"] == deg["src"], "inner")
        .withColumn("__pick", pick1)
        .drop("src", "deg")
    )
    state = (
        _bc(state, bcs).join(
            adj,
            (state["cur"] == adj["src"]) & (state["__pick"] == adj["idx"]),
        )
        .select(
            "start",
            F.col("cur").alias("prev"),
            F.col("dst").alias("cur"),
            F.concat(
                F.col("path"), F.lit("->"), F.col("dst").cast("string")
            ).alias("path"),
            F.lit(2).alias("walk_len"),
        )
    )

    win_cum = (
        Window.partitionBy("start")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_all = Window.partitionBy("start")
    for t in range(2, steps + 1):
        cand = _bc(state, bcs).join(
            adj.select(F.col("src").alias("__asrc"), "dst", "idx"),
            state["cur"] == F.col("__asrc"),
        ).join(
            _bc(eset, bcs),
            (F.col("p_src") == F.col("prev"))
            & (F.col("p_dst") == F.col("dst")),
            "left",
        )
        wcol = (
            F.when(F.col("dst") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("p_dst").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = (
            F.pmod(
                portable_hash60(
                    F.concat(
                        F.col("prev").cast("string"),
                        F.lit(">"),
                        F.col("cur").cast("string"),
                        F.lit(f"#{t}"),
                    )
                ),
                F.lit(1000000),
            ).cast("double")
            / F.lit(1000000.0)
        )
        scored = cand.select(
            "start",
            "dst",
            "idx",
            F.sum(wcol).over(win_cum).alias("__cum"),
            (u * F.sum(wcol).over(win_all)).alias("__target"),
        )
        chosen = (
            scored.where(F.col("__cum") > F.col("__target"))
            .groupBy("start")
            .agg(F.min_by("dst", "idx").alias("__nxt"))
        )
        state = state.join(_bc(chosen, bcs), on="start", how="left").select(
            "start",
            F.when(F.col("__nxt").isNotNull(), F.col("cur"))
            .otherwise(F.col("prev"))
            .alias("prev"),
            F.coalesce(F.col("__nxt"), F.col("cur")).alias("cur"),
            F.when(
                F.col("__nxt").isNotNull(),
                F.concat(
                    F.col("path"),
                    F.lit("->"),
                    F.col("__nxt").cast("string"),
                ),
            )
            .otherwise(F.col("path"))
            .alias("path"),
            F.when(F.col("__nxt").isNotNull(), F.col("walk_len") + 1)
            .otherwise(F.col("walk_len"))
            .alias("walk_len"),
        )
    return state.select(
        "start", "path", F.col("walk_len").cast("int").alias("walk_len")
    )


def main() -> None:
    import importlib.util

    from pagerank_spark.graph.walks import node2vec_walks
    from pagerank_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    edges = entry._edges(spark, "/root/testdata/sf0.1")

    # value identity first
    a = sorted(
        map(tuple, node2vec_walks(edges, steps=4, p=2.0, q=0.5).collect())
    )
    b = sorted(map(tuple, n2v_opt(edges, steps=4, p=2.0, q=0.5).collect()))
    assert a == b, "A/B value divergence!"

    pre, post = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        node2vec_walks(edges, steps=4, p=2.0, q=0.5).write.format(
            "noop"
        ).mode("overwrite").save()
        pre.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        n2v_opt(edges, steps=4, p=2.0, q=0.5).write.format("noop").mode(
            "overwrite"
        ).save()
        post.append(round(time.perf_counter() - t0, 3))
    out = {
        "pre_sec": pre,
        "post_sec": post,
        "pre_best": min(pre),
        "post_best": min(post),
        "speedup": round(min(pre) / min(post), 3),
        "values_identical": True,
    }
    with open("/root/repo/N2V_AB_r12.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
