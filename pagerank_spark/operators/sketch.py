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

from pyspark.sql import Column, DataFrame, Window
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
    taking the min. Duplicate probe rows collapse to one output row
    (the min over a duplicated cell set is unchanged, so the estimate
    stays exact) — pass a ``.distinct()`` projection if per-duplicate
    multiplicity matters downstream.
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


# Portable HLL geometry: 2^HLL_BUCKET_BITS registers, rho measured in
# the remaining bits of the 60-bit portable hash.
HLL_BUCKET_BITS = 8
HLL_M = 1 << HLL_BUCKET_BITS
HLL_W_BITS = 60 - HLL_BUCKET_BITS  # 52
# Standard bias constant alpha_m for m = 256.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(
    df: DataFrame, key_col: str, salt: str = "hll"
) -> DataFrame:
    """Portable HyperLogLog BUILD: the register relation
    ``(bucket INT, max_rho INT)`` — at most 256 rows regardless of
    input size.

    Spark's own ``approx_count_distinct`` sketch cannot be
    cross-verified (its hash and register layout are engine-private —
    the one unavoidable rows-only gate in the declared surface, q50).
    This HLL derives everything from the portable md5 family: bucket =
    the hash's top 8 bits, rho = leading-zero count of the remaining
    52 bits + 1, computed via integer/string ops ONLY (``bin()``
    length — both engines have it; no log2 float at the boundaries).
    DuckDB rebuilds the identical registers, so the ESTIMATE itself is
    deterministic and hash-checkable; only its relation to the true
    NDV is approximate. Mergeable across shards by
    ``union → groupBy(bucket).max(max_rho)``; one explode-free scan
    with partial-combined max aggregation.
    """
    h = portable_hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    bucket = F.shiftright(h, HLL_W_BITS).cast("int")
    w = h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    # rho = leading zeros in the 52-bit window + 1; bin() drops leading
    # zeros, so len(bin(w)) is the bit-length of w. w = 0 -> all 52
    # bits zero -> rho = 53.
    rho = F.when(
        w == 0, F.lit(HLL_W_BITS + 1)
    ).otherwise(F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
    return (
        df.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Fold the register relation into the HLL cardinality estimate
    (one row: ``hll_estimate DOUBLE`` rounded to 4dp).

    The raw estimate ``alpha·m²/Σ2^-rho`` (absent buckets contribute
    2⁰) switches to linear counting ``m·ln(m/zeros)`` below 2.5m with
    empty registers — the standard small-range correction. All
    arithmetic is reproducible: 2^-rho is exact in binary floating
    point, the Σ is over ≤256 terms, and the result rounds to 4dp.
    """
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count("*").alias("__nb"),
    )
    s = F.coalesce(F.col("__s"), F.lit(0.0)) + (
        F.lit(HLL_M) - F.col("__nb")
    )  # absent buckets: rho 0 -> 2^0 = 1 each
    zeros = F.lit(HLL_M) - F.col("__nb")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("hll_estimate"))


__all__ = [
    "cms_build",
    "cms_estimate",
    "hll_registers",
    "hll_estimate",
    "hll_grouped_registers",
    "hll_merge",
    "hll_grouped_estimate",
    "HLL_BUCKET_BITS",
    "HLL_M",
    "HLL_ALPHA",
]


def hll_grouped_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    salt: str = "hll",
) -> DataFrame:
    """Grouped portable-HLL BUILD: ``(*group_cols, bucket, max_rho)``
    — at most 256 register rows PER GROUP regardless of input size.
    The same md5-derived bucket/rho as ``hll_registers`` (so a DuckDB
    twin rebuilds identical registers), with the group key carried
    through the one partial-combined max aggregation. This is the
    continuous-aggregate primitive: register relations are exactly
    mergeable across shards/partitions/time (``hll_merge``), so a
    rollup refresh never rescans history — the Druid/Timescale
    sketch-rollup shape, portable across engines.
    """
    h = portable_hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    bucket = F.shiftright(h, HLL_W_BITS).cast("int")
    w = h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    rho = F.when(
        w == 0, F.lit(HLL_W_BITS + 1)
    ).otherwise(F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two grouped register relations (the rollup REFRESH step):
    union → per-(group, bucket) max. Registers are a commutative
    idempotent monoid, so ``merge(rollup(x), rollup(y)) ==
    rollup(x ∪ y)`` EXACTLY — the pytest pins bit-equality, not an
    approximation. One shuffle on (group, bucket), sized by the
    register relations (≤256 rows/group), never by the event volume.
    """
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_grouped_estimate(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold grouped registers into per-group cardinality estimates
    ``(*group_cols, hll_estimate DOUBLE)`` — ``hll_estimate``'s
    formula (raw harmonic mean with the linear-counting small-range
    correction) per group, all arithmetic cross-engine reproducible,
    rounded to 4dp."""
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count("*").alias("__nb"),
    )
    s = F.col("__s") + (F.lit(HLL_M) - F.col("__nb"))
    zeros = F.lit(HLL_M) - F.col("__nb")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *[F.col(c) for c in group_cols],
        F.round(est, 4).alias("hll_estimate"),
    )


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    k: int = 100,
    group_cols: list[str] | None = None,
    salt: str = "bk",
) -> DataFrame:
    """Deterministic bottom-k sample: the ``k`` rows whose portable
    md5 hash of ``id_col`` is smallest (per group when ``group_cols``
    is given) — the classic mergeable uniform-sample sketch:
    ``bottomk(a ∪ b) == bottomk(bottomk(a) ∪ bottomk(b))`` exactly,
    so shard samples combine without revisiting data, and two engines
    agree row-for-row (the md5 order IS the sample). Adds
    ``sample_rank`` (1-based by hash asc, id asc).

    Scale shape: ungrouped → ``orderBy(hash).limit(k)``, a
    TakeOrderedAndProject (per-partition top-k, driver merge of k·P
    rows — never a global sort or single-partition window); grouped →
    a rank window that Spark 4's WindowGroupLimit rewrites into
    per-key top-k pushdown before the shuffle.
    """
    if k < 1:
        raise ValueError(f"bottomk_sample: k must be >= 1, got {k}")
    h = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    hashed = df.withColumn("__h", h)
    if not group_cols:
        topped = hashed.orderBy(F.asc("__h"), F.asc(id_col)).limit(k)
        w = Window.orderBy(F.asc("__h"), F.asc(id_col))
    else:
        w = Window.partitionBy(*group_cols).orderBy(
            F.asc("__h"), F.asc(id_col)
        )
        topped = hashed
    ranked = topped.withColumn("sample_rank", F.row_number().over(w))
    if group_cols:
        ranked = ranked.where(F.col("sample_rank") <= k)
    return ranked.drop("__h")


def weighted_bottomk_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    group_cols: list[str] | None = None,
    salt: str = "wbk",
) -> DataFrame:
    """Weighted-without-replacement bottom-k (Efraimidis–Spirakis
    2006, exponential-clock form): each row draws the deterministic
    uniform ``u = (hash60 + 1) / 2^60`` and keeps key
    ``-ln(u) / weight``; the ``k`` smallest keys are a weighted
    WOR sample. Deterministic and mergeable like ``bottomk_sample``;
    the key rounds to 9dp BEFORE ranking (id-asc ties) so both
    engines make identical keep decisions despite libm ln differences.
    Non-positive weights are excluded (they can never be sampled
    under ES semantics). Adds ``sample_rank``.
    """
    if k < 1:
        raise ValueError(f"weighted_bottomk_sample: k must be >= 1, got {k}")
    u = (
        portable_hash60(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
        )
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    hashed = df.where(F.col(weight_col) > 0).withColumn("__k", key)
    if not group_cols:
        topped = hashed.orderBy(F.asc("__k"), F.asc(id_col)).limit(k)
        w = Window.orderBy(F.asc("__k"), F.asc(id_col))
    else:
        w = Window.partitionBy(*group_cols).orderBy(
            F.asc("__k"), F.asc(id_col)
        )
        topped = hashed
    ranked = topped.withColumn("sample_rank", F.row_number().over(w))
    if group_cols:
        ranked = ranked.where(F.col("sample_rank") <= k)
    return ranked.drop("__k")
