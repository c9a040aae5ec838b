"""Count-min sketch: mergeable sublinear frequency estimation.

The heavy-hitters problem at 100 TB: exact per-key counts need a
vocabulary-sized shuffle; a count-min sketch (Cormode & Muthukrishnan
2005) answers point frequency queries within ``εN`` (ε = e/width)
with probability ``1 - e^-depth`` from a fixed ``depth × width``
integer grid that partial-aggregates map-side and merges across
shards by cell-wise addition — the same contract as Spark's own
``df.stat.countMinSketch`` but (a) never materialized on the driver,
(b) mergeable across corpus shards as a plain relational union-sum,
and (c) engine-portable: every bucket index derives from the md5
hash family (``portable_hash60``), so DuckDB reproduces the identical
sketch and the DECLARED estimates are deterministic, not approximate
— only their relation to the true counts is.

Extension tier: the reference has no sketches; SURVEY §2.13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions import portable_hash60


def _cms_pos(key: Column, d: int, width: int, salt: str) -> Column:
    """Bucket of hash row ``d``: portable 60-bit md5 hash of the salted
    key mod ``width`` (non-negative in both engines)."""
    return portable_hash60(F.concat(key, F.lit(f":{salt}{d}"))) % F.lit(
        width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch as its non-zero-cell relation
    ``(d INT, pos BIGINT, cnt BIGINT)`` — at most ``depth × width``
    rows regardless of input size.

    One explode (``depth`` rows per input row) + one partial-combined
    aggregation; the map-side combine collapses to sketch size before
    the exchange, so the shuffle is bounded by ``depth·width``, not by
    the data. Merging sketches from separate shards is
    ``unionAll → groupBy(d, pos).sum(cnt)`` — the linearity that makes
    the sketch a distributed-aggregation citizen.
    """
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(key, d, width, salt).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell"),
        w.alias("__w"),
    )
    return (
        cells.select(
            F.col("__cell.d").alias("d"),
            F.col("__cell.pos").alias("pos"),
            "__w",
        )
        .groupBy("d", "pos")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates: for each (distinct) probe row, the
    count-min estimate ``min_d sketch[d][h_d(key)]`` (missing cells
    read 0). Never underestimates; overestimates by at most ``εN``
    with the standard guarantee.

    Plan: explode the ``depth`` probe positions, broadcast-join the
    (bounded) sketch relation, regroup on the probe's own columns
    taking the min. Probe rows must be unique — pass ``.distinct()``
    first if not.
    """
    key = F.col(key_col).cast("string")
    exploded = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(key, d, width, salt).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select("*", F.col("__cell.d").alias("d"), F.col("__cell.pos").alias("pos"))
    joined = exploded.join(F.broadcast(sketch), on=["d", "pos"], how="left")
    return (
        joined.groupBy(*keys.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


__all__ = ["cms_build", "cms_estimate"]
