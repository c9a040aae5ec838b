"""Relational operator surface (SURVEY.md §2: A3, A7, A8, J3, J4, U2, U3, W1).

Thin, declarative DataFrame builders — each maps one reference behavior
to the Catalyst plan you'd want at scale (partial-agg-friendly groupBys,
semi joins instead of collected membership sets, TakeOrderedAndProject
for top-k). Every operator here is exercised by a declared oracle query
in ``__spark_entry__.py`` with a DuckDB SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _is_timestamp(dtype) -> bool:
    return isinstance(dtype, (TimestampType, TimestampNTZType))


def _seconds_interval(seconds: float) -> Column:
    """A DayTimeInterval of ``seconds`` — timestamp ± interval is tz-free
    for both TIMESTAMP (physical duration) and TIMESTAMP_NTZ (naive
    wall-clock), unlike the epoch-double hop, which silently shifts NTZ
    differences across DST transitions in a DST session timezone."""
    return F.expr(f"INTERVAL '{float(seconds)}' SECOND")


def _bucket_epoch(c: Column, dtype) -> Column:
    """Whole seconds for width bucketing, consistent with the semantics
    of timestamp subtraction for the column's type: physical epoch for
    TIMESTAMP, tz-free naive epoch (days since 1970 × 86400 + time of
    day) for TIMESTAMP_NTZ — ``unix_timestamp`` on NTZ would reintroduce
    the session-tz DST distortion that the interval bounds avoid.
    Numeric epoch columns pass through floored."""
    if isinstance(dtype, TimestampNTZType):
        return (
            F.unix_date(F.to_date(c)) * F.lit(86400).cast("long")
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        )
    if isinstance(dtype, TimestampType):
        return F.unix_timestamp(c)
    return F.floor(c.cast("double")).cast("long")


def _bucket_epoch_ms(c: Column, dtype) -> Column:
    """Epoch MILLISECONDS for sub-second width bucketing, with the same
    type-aware tz-free semantics as ``_bucket_epoch``: ``unix_millis``
    for TIMESTAMP (physical epoch), naive wall-clock millis for
    TIMESTAMP_NTZ (``extract(second)`` keeps the fractional part —
    ``F.second`` truncates), floored double×1000 for numeric epochs."""
    if isinstance(dtype, TimestampNTZType):
        return (
            (
                F.unix_date(F.to_date(c)) * F.lit(86400).cast("long")
                + F.hour(c) * 3600
                + F.minute(c) * 60
            )
            * F.lit(1000).cast("long")
            # extract(SECOND) keeps the fraction (decimal seconds)
            + F.floor(F.extract(F.lit("SECOND"), c) * 1000).cast("long")
        )
    if isinstance(dtype, TimestampType):
        return F.unix_millis(c)
    return F.floor(c.cast("double") * 1000).cast("long")


def adjacency_lists(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """A3: per-source sorted destination list (reference ``pageRank.py:102-107``).

    ``collect_list`` then ``sort_array`` so the result is deterministic
    regardless of shuffle arrival order. One shuffle on ``src``; the list
    is bounded by out-degree (use the flat edge table when a hub's fanout
    would exceed a single row's size budget).
    """
    return edges.groupBy(F.col(src).alias("src")).agg(
        F.sort_array(F.collect_list(F.col(dst))).alias("dsts"),
        F.count("*").alias("deg"),
    )


def duplicate_rows_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """A7: rows appearing more than once (reference ``pageRank.py:59-63``).

    Group-by on the full key with HAVING count>1 — a partial-aggregated
    hash agg, NOT ``df.duplicated()``-style windowing, so map-side combine
    collapses duplicates before the shuffle.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_occurrences"))
        .where(F.col("n_occurrences") > 1)
    )


def score_quantiles(
    df: DataFrame,
    col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = True,
) -> DataFrame:
    """A8: quantiles of a measure column (reference boxplot stats,
    ``streamlit-pagerank.py:371-373``).

    ``exact=True`` uses SQL ``percentile`` (exact interpolated — matches
    DuckDB's ``quantile_cont``); ``exact=False`` uses
    ``percentile_approx`` (single-pass sketch, the 100 TB path where an
    exact global sort of the measure column is not worth it).
    Returns one row with columns p25/p50/p75-style names.
    """
    fn = "percentile" if exact else "percentile_approx"
    aggs = [
        F.expr(f"{fn}({col}, {p})").alias(f"p{int(p * 100)}") for p in probs
    ]
    return df.agg(*aggs)


def induced_subgraph(
    edges: DataFrame, nodes: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """J3/U3: edges whose BOTH endpoints are in ``nodes`` (one column: node).

    Reference: the top-20 graph filter (``streamlit-pagerank.py:321-346``,
    row-wise ``set.issubset``). Two left-semi joins — each a broadcastable
    hash join when the node set is small (top-k always is); no collected
    membership set on the driver.
    """
    n = nodes.select(F.col(nodes.columns[0]).alias("__n"))
    return (
        edges.join(n, on=[F.col(src) == F.col("__n")], how="left_semi")
        .join(n, on=[F.col(dst) == F.col("__n")], how="left_semi")
    )


def node_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: relational intersection of two single-column node sets
    (reference ``pageRank.py:108-109``, ``set.intersection``)."""
    return a.intersect(b)


def subset_flag(
    edges: DataFrame, nodes: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """U3: per-edge boolean — are both endpoints members of ``nodes``?

    The membership test as a *flag* (reference ``streamlit-pagerank.py:
    322-325``) rather than a filter: two left joins against the node set
    with a null-check, so the full edge bag is preserved.
    """
    n_src = nodes.select(F.col(nodes.columns[0]).alias(src), F.lit(1).alias("__in_s"))
    n_dst = nodes.select(F.col(nodes.columns[0]).alias(dst), F.lit(1).alias("__in_d"))
    return (
        edges.join(F.broadcast(n_src), on=src, how="left")
        .join(F.broadcast(n_dst), on=dst, how="left")
        .select(
            src,
            dst,
            (F.col("__in_s").isNotNull() & F.col("__in_d").isNotNull()).alias(
                "in_subset"
            ),
        )
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    A hot key (one key holding a large share of rows) funnels an entire
    shuffle partition to one reducer; salting splits it across
    ``n_salts`` reducers at the cost of replicating the other side
    ``n_salts``× (use only when ``other`` is small-ish but above the
    broadcast threshold — below it, ``F.broadcast`` is strictly better;
    and try AQE's skew-join splitting first, which needs no replication).
    Salt values don't affect results — every salted left row still meets
    every matching right row exactly once. Only left-preserving joins
    are valid: the replicated side's unmatched rows would be emitted
    once PER SALT under ``right``/``full``/``right_semi`` semantics, so
    those are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only "
            f"(inner/left/left_semi/left_anti), got how={how!r}: the "
            f"non-skewed side is replicated n_salts times, so right/full "
            f"joins would duplicate its unmatched rows"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    left = skewed.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    right = other.withColumn("__salt", F.explode(salts))
    return left.join(right, on=on + ["__salt"], how=how).drop("__salt")


def with_position(
    df: DataFrame, order_col: str, tiebreak_col: str, out_col: str = "position"
) -> DataFrame:
    """W1: 1-based global rank position (reference ``streamlit-pagerank.py:
    278-281``).

    A global (unpartitioned) window — single-partition sort. Correct and
    cheap for bounded top-k inputs; for an unbounded table prefer
    ``orderBy().limit(k)`` first (TakeOrderedAndProject), then this.
    """
    w = Window.orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return df.withColumn(out_col, F.row_number().over(w))


def positional_compare(
    runs: list[DataFrame], value_col: str, position_col: str = "position"
) -> DataFrame:
    """J4: join N orderings on position; flag positions where all agree
    (reference ``README.md:289-293`` rank-list comparison).

    Each input must carry (position, value_col); run *i* contributes
    column ``{value_col}_{i}``.
    """
    tagged = [
        r.select(position_col, F.col(value_col).alias(f"{value_col}_{i}"))
        for i, r in enumerate(runs)
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.join(t, on=position_col, how="inner")
    cols = [f"{value_col}_{i}" for i in range(len(runs))]
    all_match = F.lit(True)
    for c in cols[1:]:
        all_match = all_match & (F.col(cols[0]) == F.col(c))
    return out.withColumn("all_match", all_match)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same ``on`` key (left-outer: left rows
    with no preceding right row keep nulls). ``tolerance_seconds``
    (pandas ``merge_asof(tolerance=...)`` parity) additionally nulls the
    carried row when it is older than ``left_ts - tolerance`` — a
    staleness bound, applied as a post-window mask so the plan shape is
    unchanged.

    The reference has no temporal joins; this is extension tier. The
    DuckDB oracle twin expresses it natively as ``ASOF LEFT JOIN``.

    Scale design: NOT a range join (Spark would plan the inequality as a
    broadcast-nested-loop or sort-merge with per-key quadratic tails).
    Instead the union-marker formulation: union both sides, ONE shuffle
    on ``on``, one in-partition sort on (ts, side), then
    ``last(value, ignorenulls)`` over an unbounded-preceding window
    carries the most recent right-side row forward onto each left
    row. Cost is one exchange + one sort regardless of how many right
    rows precede each left row. At equal timestamps the right row sorts
    before the left row, so the join is inclusive (``>=``), matching
    ASOF semantics.

    The carried right-side columns travel as ONE struct — carrying them
    independently would stitch a composite row whenever the latest
    preceding right row has a NULL in some value column (``last(...,
    ignorenulls)`` per column would reach further back for just that
    column). True ASOF semantics: all carried fields, NULLs included,
    come from the single latest preceding right row. Right rows are
    first deduplicated per (key, ts) by ``max(struct(values))`` —
    lexicographic over the value columns — so the winner at a tied
    timestamp is one actual input row, never a per-column mix.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = [c for c in left.columns if c not in (on, left_ts)]
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in value_cols]

    r_struct = F.struct(
        F.col("__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    r_side = (
        right.groupBy(F.col(on), F.col(right_ts).alias("__ts"))
        .agg(
            F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__vals")
        )
        .select(on, "__ts", *[F.col(f"__vals.{c}").alias(c) for c in value_cols])
        .select(
            F.col(on),
            F.col("__ts"),
            r_struct.alias("__carry"),
            F.lit(0).alias("__side"),
        )
    )
    # F.struct() requires ≥1 field; a keys-and-ts-only left side carries a
    # dummy payload field that is dropped at the end.
    payload_fields = payload or ["__side"]
    l_side = left.withColumn("__side", F.lit(1)).select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.struct(*payload_fields).alias("__payload"),
        F.col("__side"),
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_schema = r_side.schema["__carry"].dataType
    unioned = l_side.withColumn(
        "__carry", F.lit(None).cast(carry_schema)
    ).unionByName(
        r_side.withColumn(
            "__payload",
            F.lit(None).cast(l_side.schema["__payload"].dataType),
        ).select(on, "__ts", "__payload", "__side", "__carry")
    )
    out = unioned.select(
        on,
        "__ts",
        "__payload",
        "__side",
        F.last("__carry", ignorenulls=True).over(w).alias("__carry"),
    ).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # Timestamp columns (TIMESTAMP and TIMESTAMP_NTZ alike): tz-free
        # interval arithmetic — subtraction yields a DayTimeInterval with
        # no session-tz dependence, matching pandas merge_asof's naive
        # difference for NTZ and physical duration for instants. The
        # epoch-double hop is kept only for numeric epoch ts columns.
        carry_ts = F.col(f"__carry.{right_ts}{suffix}")
        if _is_timestamp(left.schema[left_ts].dataType):
            fresh = carry_ts >= F.col("__ts") - _seconds_interval(
                tolerance_seconds
            )
        else:
            fresh = (
                F.col("__ts").cast("double") - carry_ts.cast("double")
            ) <= F.lit(float(tolerance_seconds))
        out = out.withColumn(
            "__carry", F.when(fresh, F.col("__carry"))
        )
    return out.select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[F.col(f"__payload.{c}").alias(c) for c in payload],
        *[F.col(f"__carry.{c}").alias(c) for c in carried],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    interval_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Bounded-interval equi-join: left rows paired with right rows on
    the same keys whose ``right_ts`` lies in
    ``[left_ts - interval_seconds, left_ts]`` (both ends inclusive).

    Extension tier — the batch twin of a stream-stream time-bounded
    join. Scale design: NOT a raw inequality join (Spark plans those as
    broadcast-nested-loop or a sort-merge with per-key quadratic
    tails). Both sides are bucketed by ``floor(ts / interval)``; the
    right side lands in its own bucket AND the next one, so every
    qualifying pair shares exactly one (keys, bucket) — a plain
    equi-join shuffle — and the precise bounds are a post-join filter.
    Each matching pair meets exactly once (the right row's two bucket
    copies are distinct, and only one equals the left row's bucket).

    Right columns are prefixed ``r_`` on name collisions.

    Timestamp handling is type-aware and tz-free: the precise bounds use
    interval arithmetic (valid for TIMESTAMP and TIMESTAMP_NTZ alike —
    the fixtures' parquet ``ts`` reads as NTZ, which cannot cast to
    double), and the bucket epoch matches each type's subtraction
    semantics so bucket adjacency still covers every qualifying pair
    even in a DST session timezone.

    ``interval_seconds`` may be fractional down to 1 millisecond:
    buckets are MILLISECOND-floored epochs divided by the width in
    whole millis, so the b/b+1 adjacency argument holds for any width
    that is an integer number of milliseconds (two timestamps within
    the interval are at floored-millis distance ≤ width, hence same or
    adjacent bucket). Widths that are not a whole number of millis
    (e.g. 1e-4 s) are rejected — the bucket arithmetic cannot
    represent them, and neither can the engine's timestamps.
    """
    interval_ms = round(float(interval_seconds) * 1000)
    if interval_ms < 1 or abs(interval_ms - float(interval_seconds) * 1000) > 1e-6:
        raise ValueError(
            "interval_seconds must be a positive whole number of "
            f"milliseconds (>= 0.001); got {interval_seconds!r}"
        )
    w = F.lit(int(interval_ms))
    l_dtype = left.schema[left_ts].dataType
    r_dtype = right.schema[right_ts].dataType
    rename = {
        c: f"r_{c}"
        for c in right.columns
        if c in left.columns and c not in on
    }
    r = right.select(
        *on,
        *[F.col(c).alias(rename.get(c, c)) for c in right.columns if c not in on],
    )
    r_ts_out = rename.get(right_ts, right_ts)
    l = left.withColumn(
        "__b", F.floor(_bucket_epoch_ms(F.col(left_ts), l_dtype) / w)
    )
    r_bucket = F.floor(_bucket_epoch_ms(F.col(r_ts_out), r_dtype) / w)
    r = r.withColumn("__b", F.explode(F.array(r_bucket, r_bucket + 1)))
    if _is_timestamp(l_dtype):
        lo_pred = F.col(r_ts_out) >= F.col(left_ts) - _seconds_interval(
            interval_ms / 1000.0
        )
    else:
        lo_pred = (
            F.col(r_ts_out).cast("double")
            >= F.col(left_ts).cast("double") - interval_ms / 1000.0
        )
    return (
        l.join(r, on=on + ["__b"])
        .where(lo_pred & (F.col(r_ts_out) <= F.col(left_ts)))
        .drop("__b")
    )


def groupwise_zscore(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "z",
    engine: str = "window",
) -> DataFrame:
    """Per-group standardization: ``(x - mean(group)) / stddev(group)``
    (sample stddev; NULL for singleton groups) — the feature-scaling
    step of a training-data pipeline.

    Two engines with identical semantics:

    - ``window`` (default, scale path): one hash shuffle on ``keys``;
      the aggregates and the division stay in whole-stage codegen, no
      Python in the loop.
    - ``pandas``: ``groupBy(...).applyInPandas`` — each group arrives
      as one Arrow batch and is normalized by vectorized numpy. The
      demonstration path for custom groupwise logic Catalyst can't
      express; prefer ``window`` whenever the expression exists
      JVM-side. Each group must fit in one executor's memory — for
      heavy-tailed group sizes use the window engine.
    """
    if engine == "window":
        w = Window.partitionBy(*keys)
        mu = F.avg(value_col).over(w)
        sd = F.stddev_samp(value_col).over(w)
        return df.withColumn(out_col, (F.col(value_col) - mu) / sd)
    if engine != "pandas":
        raise ValueError(f"engine must be 'window' or 'pandas', got {engine!r}")

    # Copy the fields — StructType.add mutates in place, and df.schema
    # hands back the DataFrame's live schema object.
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _norm(pdf):
        v = pdf[value_col]
        sd = v.std(ddof=1)
        pdf = pdf.copy()
        pdf[out_col] = (v - v.mean()) / sd if sd and sd == sd else None
        return pdf

    return df.groupBy(*keys).applyInPandas(_norm, schema=out_schema)


def merge_grouped_partials(
    state: DataFrame, delta: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Incremental-view maintenance for algebraic aggregates: merge a
    delta batch's per-group partials into the existing aggregate state
    by the same combine rule Spark's partial aggregation uses
    (sums/counts add; avg is carried as sum+count). The invariant —
    ``merge(agg(base), agg(delta)) == agg(base ∪ delta)`` — is what
    lets a materialized aggregate refresh from only the new data
    instead of recomputing over the full history.

    Plan: unionAll + one partial-combined groupBy — the delta side is
    batch-sized, so at 100 TB of history the refresh cost is
    O(|delta| + |state|), never O(|history|); pair with
    ``table.upsert`` to persist the refreshed state as a snapshot.
    """
    aligned = delta.select(*keys, *sum_cols)
    return (
        state.select(*keys, *sum_cols)
        .unionAll(aligned)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )


def skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the report you run BEFORE
    keying a 100 TB shuffle on a column, to decide between a plain
    hash join, salting, or an AQE skew-join hint. Returns the
    ``top_n`` heaviest keys::

        (key_cols..., cnt, share, skew_factor, rank)

    where ``share = cnt / total_rows`` and ``skew_factor`` is the
    global max-key-count over mean-key-count (1.0 = perfectly uniform;
    the same number on every row). A share near 1/parallelism on rank
    1 means one task will straggle no matter how many executors you
    add — the signal to salt.

    Plan: one map-side-combined groupBy on the key (the same shuffle
    the real join would do, but carrying only counts), a scalar
    second-level aggregate over the per-key relation (broadcast back),
    and TakeOrdered for the top-N — never a global sort, nothing
    data-sized on the driver.
    """
    if not key_cols:
        raise ValueError("skew_report: key_cols must be non-empty")
    if top_n < 1:
        raise ValueError(f"skew_report: top_n must be >= 1, got {top_n}")
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__tot"),
        F.count("*").alias("__nkeys"),
        F.max("cnt").alias("__maxc"),
    )
    top = counts.orderBy(
        F.desc("cnt"), *[F.asc(c) for c in key_cols]
    ).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), *[F.asc(c) for c in key_cols])
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "cnt",
            (F.col("cnt") / F.col("__tot")).alias("share"),
            (
                F.col("__maxc")
                / (F.col("__tot") / F.col("__nkeys"))
            ).alias("skew_factor"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


def apply_cdf_to_sums(
    agg: DataFrame,
    cdf: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Refresh a keyed (COUNT, SUMs) aggregate from a change data feed
    (``table.table_changes``) instead of recomputing over the table:
    inserts and update-postimages add, deletes and update-preimages
    subtract; a group whose refreshed count reaches zero disappears —
    exactly ``agg(v_to)``, at O(|cdf|) cost.

    This is the CDF's consumer contract: together with
    ``merge_grouped_partials`` it keeps a 100 TB materialized
    aggregate fresh for the price of the delta. One union + one
    partial-combined groupBy; no join against the base table.
    """
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cdf.select(
        *keys,
        sign.alias("__s"),
        *[F.col(c) for c in sum_cols],
    ).select(
        *keys,
        F.col("__s").alias(count_col),
        *[(F.col(c) * F.col("__s")).alias(c) for c in sum_cols],
    )
    return (
        agg.select(*keys, count_col, *sum_cols)
        .unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .where(F.col(count_col) > 0)
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    top_n: int = 5,
) -> DataFrame:
    """Pre-flight EXACT join-size prediction — run this (cost: two
    count aggregations over the inputs) before keying a 100 TB join
    to catch multiplicative blowup: ``|A ⋈ B| = Σ_k cntA(k)·cntB(k)``.
    Returns the ``top_n`` heaviest output keys plus the global
    numbers replicated on every row::

        (keys..., pairs, total_pairs, blowup_left, blowup_right, rank)

    where ``blowup_left = total_pairs / |A|`` (how many output rows
    each left row fans out to, on average). A single key contributing
    most of ``total_pairs`` is the salting signal ``skew_report``
    then quantifies per side.

    Plan: per-side key counts (map-side combined), an equi-join of
    the two COUNT relations (key-cardinality-sized, not data-sized),
    a scalar aggregate broadcast back, TakeOrdered for the top keys.
    The data tables are never joined.
    """
    if not keys:
        raise ValueError("join_cardinality: keys must be non-empty")
    if top_n < 1:
        raise ValueError(f"join_cardinality: top_n must be >= 1, got {top_n}")
    la = left.groupBy(*keys).agg(F.count("*").alias("__ca"))
    rb = right.groupBy(*keys).agg(F.count("*").alias("__cb"))
    pairs = la.join(rb, on=keys).select(
        *keys, (F.col("__ca") * F.col("__cb")).alias("pairs")
    )
    totals = pairs.agg(F.sum("pairs").alias("__tot"))
    n_left = left.count()
    n_right = right.count()
    top = pairs.orderBy(
        F.desc("pairs"), *[F.asc(k) for k in keys]
    ).limit(top_n)
    w = Window.orderBy(F.desc("pairs"), *[F.asc(k) for k in keys])
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "pairs",
            F.col("__tot").cast("long").alias("total_pairs"),
            (F.col("__tot") / F.lit(float(n_left))).alias("blowup_left"),
            (F.col("__tot") / F.lit(float(n_right))).alias("blowup_right"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Group-wise percentile capping (winsorization) — the numeric
    outlier treatment in feature/metric curation: each value is
    clipped into its group's ``[p_lower, p_upper]`` band. Adds
    ``__lo``, ``__hi`` and ``{value_col}_clipped``.

    The bounds come from ``approx_percentile`` (Greenwald-Khanna) —
    the single-pass MERGEABLE sketch, so the bound pass is one
    partial-combined aggregation however large the group; the bounds
    relation is group-cardinality-sized and broadcasts back onto one
    scan of the data. At oracle scale the sketch's rank error is < 1
    row (q85's trick), making the declared query hash-exact.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(
            f"winsorize: need 0 <= lower < upper <= 1, got {lower}, {upper}"
        )
    q = F.expr(
        f"approx_percentile({value_col}, array({lower}, {upper}), 1000000)"
    )
    bounds = df.groupBy(*keys).agg(q.alias("__q")).select(
        *keys,
        F.col("__q")[0].alias("__lo"),
        F.col("__q")[1].alias("__hi"),
    )
    return df.join(F.broadcast(bounds), on=keys).withColumn(
        f"{value_col}_clipped",
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix of ``cols`` in ONE
    aggregation pass — the feature-audit primitive before model
    training (k² algebraic ``corr`` expressions over a single scan;
    never k² scans, never a driver loop over pairs). Returns the
    upper triangle ``(col_a, col_b, corr)`` rounded to 6dp, NULL for
    degenerate (zero-variance) columns — SQL ``corr`` semantics,
    which is what the twin checks."""
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least 2 columns")
    pairs = [
        (i, j, a, b)
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i < j
    ]
    aggs = [
        F.round(
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")), 6
        ).alias(f"__c_{i}_{j}")
        for i, j, a, b in pairs
    ]
    wide = df.agg(*aggs)
    # unpivot the one-row wide aggregate with stack — a UNION of
    # per-cell selects would re-evaluate the aggregation per branch
    # (k² scans), exactly what this operator exists to avoid
    stack_args = ", ".join(
        f"'{a}', '{b}', __c_{i}_{j}" for i, j, a, b in pairs
    )
    return wide.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
        )
    )
