"""Behavioral-analytics operators: ordered funnels and cohort retention.

Extension tier — the reference engine has no event-sequence analytics;
these are the standard product-analytics queries a training-data /
telemetry pipeline runs over an events fact, expressed as
partial-agg-friendly DataFrame plans (no window over the full event
stream, no per-user Python).

Scale shape: every stage is a per-user conditional min-aggregation
(map-side combinable) followed by a broadcast-or-shuffle equi-join on
``user_id`` — the fact is scanned once per stage with column pruning,
and nothing ever materializes per-event state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window

from pagerank_spark.session import local_relation
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion times: for each user, the earliest time
    each stage was reached STRICTLY AFTER the previous stage.

    ``t_0 = min ts of stage 0``; ``t_i = min ts of stage i with
    ts > t_{i-1}``. A user's row carries NULL from the first stage they
    never completed (in order). One conditional-min aggregation per
    stage over the pruned (user, ts) projection — the per-stage
    dependency is a join on the previous stage's times, not a window
    over the raw stream, so each step shuffles only |users| rows.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    out = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(epoch).alias("t_0"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == stage)
            .select(user_col, epoch.alias("__e"))
            .join(out.select(user_col, f"t_{i - 1}"), on=user_col)
            .where(F.col("__e") > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__e").alias(f"t_{i}"))
        )
        out = out.join(nxt, on=user_col, how="left")
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: one row per stage — (stage index, stage name,
    number of users whose ordered funnel reached it)."""
    times = funnel_stage_times(events, stages, user_col, type_col, ts_col)
    aggs = [
        F.count(F.col(f"t_{i}")).alias(f"__n_{i}") for i in range(len(stages))
    ]
    wide = times.agg(*aggs)
    rows = [
        wide.select(
            F.lit(i).cast("long").alias("stage"),
            F.lit(stage).alias("stage_name"),
            F.col(f"__n_{i}").cast("long").alias("n_users"),
        )
        for i, stage in enumerate(stages)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
    max_offset: int = 3,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, counted
    as active in each subsequent period offset (0..max_offset).

    Two scans of the pruned (user, ts) projection: one min-agg for the
    cohort assignment, one distinct-activity set, joined on user — the
    activity matrix is |users|·|periods|, never |events|. Periods are
    fixed-width epoch buckets (calendar-agnostic, so the arithmetic is
    engine-portable).
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / period_seconds)
    cohort = events.groupBy(user_col).agg(F.min(bucket).alias("cohort"))
    active = events.select(
        user_col, bucket.alias("period")
    ).distinct()
    return (
        active.join(cohort, on=user_col)
        .withColumn("offset", (F.col("period") - F.col("cohort")).cast("long"))
        .where(F.col("offset") <= max_offset)
        .groupBy(F.col("cohort").cast("long").alias("cohort"), "offset")
        .agg(F.count("*").alias("n_active"))
    )


def binary_auc(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """Exact tie-corrected ROC AUC via the Mann-Whitney rank-sum —
    how a corpus-quality classifier gets evaluated before its scores
    gate a training mix. Returns one row::

        (n_pos, n_neg, auc)

    with ``auc = (Σ_pos avg_rank − P(P+1)/2) / (P·N)`` where tied
    scores share the average of their positional ranks (the exact
    trapezoidal-ROC value).

    Scale shape: the corpus collapses to the DISTINCT-SCORE relation
    first (one partial-combined shuffle carrying (score, count,
    pos_count)); the rank prefix-sum window then runs over that
    bounded relation — scores are compared at full precision, but
    their distinct count, not the corpus size, is what the
    single-partition window sees (round scores upstream if the score
    domain is genuinely unbounded). Never sorts the corpus, never a
    pairwise O(n²) comparison.
    """
    from pyspark.sql import Window

    s = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("int").alias("y"),
    )
    g = s.groupBy("s").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = g.withColumn(
        "before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn(
        "avg_rank", F.col("before") + (F.col("cnt") + 1) / 2.0
    )
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
        (
            (
                F.sum(F.col("pos") * F.col("avg_rank"))
                - F.sum("pos") * (F.sum("pos") + 1) / 2.0
            )
            / (F.sum("pos") * (F.sum("cnt") - F.sum("pos")))
        ).alias("auc"),
    )


def pr_at_thresholds(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Precision/recall/F1 of the rule ``score >= t`` at each
    threshold — how a curation gate's cutoff is actually tuned after
    ``binary_auc`` says the score ranks well. Returns one row per
    threshold::

        (threshold, tp, fp, fn, precision, recall, f1)

    (precision is NULL when nothing is predicted positive; F1 NULL
    when precision+recall is 0).

    Scale shape: the same distinct-score collapse as ``binary_auc``
    (one partial-combined shuffle), then a broadcast join against the
    literal threshold grid and one |thresholds|-row aggregation — the
    corpus is scanned once for the whole grid, not once per cutoff.
    """
    if not thresholds:
        raise ValueError("pr_at_thresholds: thresholds must be non-empty")
    spark = df.sparkSession
    s = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("int").alias("y"),
    )
    g = s.groupBy("s").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    th = local_relation(spark, 
        [(float(t),) for t in thresholds], "threshold DOUBLE"
    )
    pred = F.col("s") >= F.col("threshold")
    agg = (
        g.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(pred, F.col("pos")).otherwise(0)).alias("tp"),
            F.sum(
                F.when(pred, F.col("cnt") - F.col("pos")).otherwise(0)
            ).alias("fp"),
            F.sum(F.when(~pred, F.col("pos")).otherwise(0)).alias("fn"),
        )
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        precision.isNotNull()
        & recall.isNotNull()
        & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    return agg.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the classic
    smoothing/anomaly-baseline primitive: ``e_i = α·x_i + (1−α)·e_{i−1}``
    with ``e_0 = x_0`` over each key's time-ordered series. Returns
    one row per input event::

        (key_col, id_col?, ts_col, value_col, ewma)

    The recurrence is a SEQUENTIAL left fold, so it is computed as
    one: collect each key's (ts-ordered) series, fold it with a
    Catalyst ``aggregate`` (codegen, executor-side), posexplode back
    — one shuffle on the key, per-key memory bounded by the series
    length (use the streaming tier's stateful ops for unbounded
    keys). Exactly the same fold an engine with ``list_reduce``
    makes, so the DuckDB twin (q158) is value-exact at the shared
    rounding; pick α with an exact binary representation (0.25,
    0.5…) to keep 1−α exact too.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    from pyspark.sql import functions as F  # local alias for clarity

    order_cols = [ts_col] + ([id_col] if id_col else [])
    srt = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.col(value_col).cast("double").alias("__v"),
            )
        )
    )
    g = df.groupBy(key_col).agg(srt.alias("series"))
    a, b = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    folded = F.aggregate(
        F.transform(F.col("series"), lambda s: s["__v"]),
        F.array().cast("array<double>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x)).otherwise(
            F.concat(acc, F.array(a * x + b * F.element_at(acc, -1)))
        ),
    )
    out_cols = [F.col("s")[c].alias(c) for c in order_cols] + [
        F.col("s")["__v"].alias(value_col),
        F.col("e").alias("ewma"),
    ]
    return (
        g.withColumn("ewmas", folded)
        .select(
            key_col,
            F.posexplode(
                F.zip_with(
                    "series",
                    "ewmas",
                    lambda s, e: F.struct(s.alias("s"), e.alias("e")),
                )
            ).alias("__pos", "z"),
        )
        .select(key_col, F.col("z.s").alias("s"), F.col("z.e").alias("e"))
        .select(key_col, *out_cols)
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Population stability index between a reference and a current
    dataset — the standard distribution-drift monitor run before a
    model or curation gate trained on ``ref`` is trusted on ``cur``.
    Values are bucketed on a FIXED equi-width grid (``width_bucket``
    over [lo, hi); underflow bucket 0, overflow ``n_buckets``+1 — the
    grid must be pinned, not data-dependent, for drift to be
    comparable across runs). Per bucket::

        (bucket, n_ref, n_cur, contrib, psi)

    with ``contrib = (p_cur − p_ref)·ln(p_cur/p_ref)`` under additive
    0.5 smoothing (so empty buckets contribute finitely) and ``psi``
    the replicated total (rule of thumb: < 0.1 stable, > 0.25 drifted).

    Plan: one partial-combined bucket count per side (the only data
    scans), a full-outer join of two ≤ n_buckets+2-row relations, and
    scalar totals broadcast back — drift over 100 TB costs two
    aggregation passes.
    """
    if not lo < hi:
        raise ValueError(f"psi_report: need lo < hi, got {lo}, {hi}")
    if n_buckets < 1:
        raise ValueError(f"psi_report: n_buckets must be >= 1, got {n_buckets}")

    def counts(df, name):
        return (
            df.select(
                F.expr(
                    f"width_bucket({value_col}, {lo!r}, {hi!r}, {n_buckets})"
                )
                .cast("long")
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    k = n_buckets + 2
    r = counts(ref, "n_ref")
    c = counts(cur, "n_cur")
    j = r.join(c, on="bucket", how="full_outer").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = j.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    pr = (F.col("n_ref") + 0.5) / (F.col("__tr") + 0.5 * k)
    pc = (F.col("n_cur") + 0.5) / (F.col("__tc") + 0.5 * k)
    scored = j.crossJoin(F.broadcast(tot)).withColumn(
        "contrib", (pc - pr) * F.log(pc / pr)
    )
    psi = scored.groupBy().agg(F.sum("contrib").alias("psi"))
    return scored.crossJoin(F.broadcast(psi)).select(
        "bucket", "n_ref", "n_cur", "contrib", "psi"
    )


def longest_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    calendar days. Returns::

        (user_col, n_active_days, best_streak, best_start)

    where ``best_streak`` is the length in days of the longest
    consecutive-day run, ``best_start`` its first day (``yyyy-MM-dd``
    string for cross-engine hashing), ties broken by earliest start.

    Plan: distinct (user, day) first — the only full-fact shuffle,
    partial-combined, and it collapses the input to at most
    |users|·|days| rows before any window runs. The classic
    ``day - row_number()`` island key then needs two per-user window
    passes over that small relation plus one aggregation; per-user
    state is bounded by the calendar, never by event volume.
    """
    from pyspark.sql import Window

    days = df.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    w = Window.partitionBy(user_col).orderBy("day")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    runs = islands.groupBy(user_col, "grp").agg(
        F.count("*").alias("streak"),
        F.min("day").alias("start"),
    )
    pick = Window.partitionBy(user_col).orderBy(
        F.desc("streak"), F.asc("start")
    )
    return (
        runs.withColumn("rk", F.row_number().over(pick))
        .groupBy(user_col)
        .agg(
            F.sum("streak").alias("n_active_days"),
            F.max(F.when(F.col("rk") == 1, F.col("streak"))).alias(
                "best_streak"
            ),
            F.date_format(
                F.max(F.when(F.col("rk") == 1, F.col("start"))),
                "yyyy-MM-dd",
            ).alias("best_start"),
        )
    )


def scd2_runs(
    df: DataFrame,
    user_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event log:
    collapse each user's event sequence into versioned runs of equal
    ``attr_col``, one row per run::

        (user_col, version, attr_col, valid_from, valid_to,
         n_events, is_current)

    ``valid_from``/``valid_to`` are whole-second epochs (the
    sessionize convention — reproducible in engines without
    sub-second timestamps), ``version`` numbers runs per user from 1,
    ``is_current`` marks the last run. Ordering is total —
    ``(epoch, id_col)`` — so run boundaries are deterministic even
    under same-second events.

    Plan: the two-row_number gaps-and-islands difference (``rn`` over
    the user minus ``rn`` over (user, attr)) plus the version and
    is_current windows all run behind ONE hash exchange on the user
    key — HashPartitioning(user) satisfies every (user, ...) window's
    clustering, so only local re-sorts separate them (plan-asserted).
    Per-user window state is one row; nothing driver-side.
    """
    from pyspark.sql import Window

    pre = df.select(
        F.col(user_col),
        F.col(attr_col),
        F.unix_timestamp(F.col(ts_col)).alias("ep"),
        F.col(id_col).alias("__id"),
    )
    w_all = Window.partitionBy(user_col).orderBy("ep", "__id")
    w_attr = Window.partitionBy(user_col, attr_col).orderBy("ep", "__id")
    numbered = pre.select(
        user_col,
        attr_col,
        "ep",
        F.col("__id").alias("__first"),
        (F.row_number().over(w_all) - F.row_number().over(w_attr)).alias(
            "grp"
        ),
    )
    runs = numbered.groupBy(user_col, attr_col, "grp").agg(
        F.min("ep").alias("valid_from"),
        F.max("ep").alias("valid_to"),
        F.count("*").alias("n_events"),
        F.min("__first").alias("__first"),
    )
    # Tie-break on the run's first event id: two runs can share a
    # whole-second valid_from, and row_number over a tie is
    # nondeterministic across engines.
    w_ver = Window.partitionBy(user_col).orderBy("valid_from", "__first")
    return runs.withColumn(
        "version", F.row_number().over(w_ver)
    ).withColumn(
        "is_current",
        F.col("version")
        == F.max("version").over(Window.partitionBy(user_col)),
    ).select(
        user_col,
        "version",
        attr_col,
        "valid_from",
        "valid_to",
        "n_events",
        "is_current",
    )


def equidepth_histogram(
    df: DataFrame,
    col: str,
    buckets: int = 8,
    exact: bool = False,
    accuracy: int = 1_000_000,
) -> DataFrame:
    """Equi-DEPTH histogram: ``buckets`` quantile-bounded bins with
    per-bin counts and value ranges — the optimizer-statistics /
    distribution-audit complement of the equi-width ``width_bucket``
    histogram (q100). Returns ``(bucket, n, min_v, max_v)``.

    Scale shape: the ``buckets-1`` interior cutpoints come by DEFAULT
    from ONE ``approx_percentile`` aggregation — the mergeable
    Greenwald–Khanna sketch whose buffer is bounded by ``accuracy``
    (O(accuracy·log n)), the only cutpoint source that survives 100 TB.
    At ``accuracy`` ≥ n the sketch's rank error ``n/accuracy`` is < 1,
    so it returns exactly the discrete quantile (DuckDB
    ``quantile_disc``) — the q85 equivalence that keeps the oracle
    hash-exact while pinning the SKETCH code path; real scale drops
    ``accuracy`` to ~1e4 for a bounded-error histogram on the same
    plan. ``exact=True`` keeps the interpolated ``percentile``
    (a full-column aggregation buffer — audit/oracle use only). Either
    way the one-row cutpoint relation is broadcast-cross-joined back
    so bucket assignment is a pure scan-side expression:
    bucket = 1 + Σ 1[v > cut_i], a fold over a ``buckets-1``-element
    literal-sized array. NEVER ``ntile`` over a global window — that
    funnels the full table into one partition (the q171 lesson applies
    to every unpartitioned window).
    """
    if buckets < 2:
        raise ValueError(f"equidepth_histogram: buckets >= 2, got {buckets}")
    fracs = [i / buckets for i in range(1, buckets)]
    v = F.col(col).cast("double")
    frac_array = f"array({', '.join(str(f) for f in fracs)})"
    cut_expr = (
        f"percentile({col}, {frac_array})"
        if exact
        else f"approx_percentile({col}, {frac_array}, {accuracy})"
    )
    cuts = df.where(v.isNotNull()).agg(F.expr(cut_expr).alias("__cuts"))
    # cutpoints rounded to 6dp BEFORE comparison, both engines: a value
    # exactly on an interpolated cutpoint must bucket identically even
    # if the engines' interpolations differ by 1 ulp
    bucket = F.lit(1) + F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(v > F.round(c, 6), 1).otherwise(0),
    )
    return (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(cuts))
        .select(bucket.cast("long").alias("bucket"), v.alias("__v"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("__v"), 6).alias("min_v"),
            F.round(F.max("__v"), 6).alias("max_v"),
        )
        .orderBy("bucket")
    )


def groupwise_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    engine: str = "sql",
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y ~ x`` — one
    regression per segment/device/nation. Returns
    ``(*group_cols, n, slope, intercept, r2)`` rounded to 6dp, NULLs
    where the group is degenerate (var(x)=0), matching SQL
    ``regr_slope``/``regr_intercept``/``regr_r2`` semantics, which is
    exactly what the DuckDB twin checks.

    Two engines with identical semantics
    (``test_groupwise_ols_engines_agree`` pins them equal):

    - ``sql`` (default, scale path): Catalyst's algebraic
      ``regr_count/regr_slope/regr_intercept/regr_r2`` aggregates —
      ONE partial-combined hash aggregation, whole-stage codegen, no
      Python worker, no per-group memory requirement. regr_* are
      moment sums, so billions of rows per group stream through
      map-side combine.
    - ``arrow``: ``groupBy(...).applyInPandas`` — each group arrives
      as one Arrow batch and is fit by vectorized numpy. The template
      for per-group fits SQL can't express (robust/iterative/multi-
      feature); each group must fit in one executor's memory.
      ``AB_BENCH_r10.json`` (interleaved best-of-3, sf0.1): sql 0.39 s
      vs arrow 0.59 s — the Python-worker round trip costs ~1.5× even
      vectorized, hence the SQL default per the q84 precedent.

    Degenerate-group semantics follow SQL regr_*: ``n`` is the
    non-null-PAIR count (regr_count); var(x)=0 → slope/intercept/r2
    all NULL; var(y)=0 with var(x)≠0 → r2 = 1 (regr_r2's horizontal
    perfect fit), not NULL. Verified to match Spark's built-ins in
    every degenerate case (empty, singleton, var(x)=0, var(y)=0)."""
    if engine == "sql":
        return (
            df.select(*group_cols, x_col, y_col)
            .groupBy(*group_cols)
            .agg(
                F.expr(f"regr_count({y_col}, {x_col})")
                .cast("long")
                .alias("n"),
                F.round(F.expr(f"regr_slope({y_col}, {x_col})"), 6).alias(
                    "slope"
                ),
                F.round(
                    F.expr(f"regr_intercept({y_col}, {x_col})"), 6
                ).alias("intercept"),
                F.round(F.expr(f"regr_r2({y_col}, {x_col})"), 6).alias(
                    "r2"
                ),
            )
        )
    if engine != "arrow":
        raise ValueError(f"engine must be 'sql' or 'arrow', got {engine!r}")
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*group_cols).schema.fields
    )
    schema = (
        f"{out_fields}, n long, slope double, intercept double, r2 double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        def round6(v: float) -> float:
            # Half-away-from-zero at 6dp, matching Spark F.round — the
            # SQL engine's rounding. Python round() banker's-rounds
            # exact .5 ties the other way, so the two engines could
            # disagree at a tie despite the identical-semantics claim
            # (r10 ADVICE).
            return math.copysign(
                math.floor(abs(v) * 1e6 + 0.5) / 1e6, v
            )

        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        keep = ~(np.isnan(x) | np.isnan(y))
        x, y = x[keep], y[keep]
        n = len(x)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["n"] = [n]
        sxx = float(((x - x.mean()) ** 2).sum()) if n else 0.0
        syy = float(((y - y.mean()) ** 2).sum()) if n else 0.0
        if n == 0 or sxx == 0.0:
            row["slope"] = [None]
            row["intercept"] = [None]
            row["r2"] = [None]
        else:
            sxy = float(((x - x.mean()) * (y - y.mean())).sum())
            slope = sxy / sxx
            row["slope"] = [round6(slope)]
            row["intercept"] = [round6(float(y.mean() - slope * x.mean()))]
            # SQL regr_r2: NULL when var(x)=0 (handled above), exactly
            # 1 when var(y)=0 with var(x)!=0 (a perfect horizontal fit)
            row["r2"] = [
                1.0 if syy == 0.0 else round6(sxy * sxy / (sxx * syy))
            ]
        return pd.DataFrame(row)

    return (
        df.select(*group_cols, x_col, y_col)
        .groupBy(*group_cols)
        .applyInPandas(fit, schema=schema)
    )


def concentration_report(
    df: DataFrame, group_col: str, weight_col: str | None = None
) -> DataFrame:
    """Source-concentration audit: Herfindahl–Hirschman index, Gini
    coefficient, and top-group share over a grouping column — the
    "is this corpus dominated by one domain?" check a data-mix review
    runs before training. Returns one row
    ``(n_groups, hhi, gini, top_share)``.

    One corpus pass to the group relation (count or weighted sum);
    HHI is a plain aggregate over it, Gini uses the sorted-rank
    formula ``2·Σ i·w_i / (n·Σw) − (n+1)/n`` via a row_number window
    over the group relation (group-space sort, never the corpus).
    """
    w_expr = (
        F.count("*")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("double"))
    )
    groups = df.groupBy(group_col).agg(
        w_expr.cast("double").alias("w")
    )
    rk = F.row_number().over(Window.orderBy("w", group_col))
    g = groups.select("w", rk.alias("i"))
    return g.agg(
        F.count("*").alias("n_groups"),
        F.round(
            F.sum(F.col("w") * F.col("w"))
            / (F.sum("w") * F.sum("w")),
            6,
        ).alias("hhi"),
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("w"))
            / (F.count("*") * F.sum("w"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
        F.round(F.max("w") / F.sum("w"), 6).alias("top_share"),
    )


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per
    customer, Recency (days since last order, against the corpus max
    date), Frequency (order count), Monetary (total spend), each
    scored into ``n_tiles`` quintiles (5 = best), concatenated into a
    segment code ('555' = recent, frequent, high-spend). Returns
    ``(segment, n_customers, avg_recency_days, avg_frequency,
    avg_monetary)`` per occupied segment.

    One corpus pass to the per-customer relation; the anchor date is
    a broadcast scalar; ntile windows run over customers (dimension-
    sized, orderable), and ties break on the customer key so the
    quantile edges are deterministic across engines.
    """
    per = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(F.to_date(F.col(ts_col))).alias("last_d"),
        F.count("*").alias("freq"),
        F.sum(F.col(amount_col).cast("double")).alias("mon"),
    )
    anchor = per.agg(F.max("last_d").alias("maxd"))
    scored = per.crossJoin(F.broadcast(anchor)).select(
        "cust",
        F.datediff(F.col("maxd"), F.col("last_d")).alias("rec"),
        "freq",
        "mon",
    )
    r = F.ntile(n_tiles).over(
        Window.orderBy(F.col("rec").desc(), F.col("cust"))
    )
    fq = F.ntile(n_tiles).over(Window.orderBy("freq", "cust"))
    m = F.ntile(n_tiles).over(Window.orderBy("mon", "cust"))
    seg = scored.select(
        "rec",
        "freq",
        "mon",
        F.concat(
            r.cast("string"), fq.cast("string"), m.cast("string")
        ).alias("segment"),
    )
    return seg.groupBy("segment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("rec"), 6).alias("avg_recency_days"),
        F.round(F.avg("freq"), 6).alias("avg_frequency"),
        F.round(F.avg("mon"), 6).alias("avg_monetary"),
    )


def autocorrelation(
    series: DataFrame,
    t_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function of a regular time series at
    lags ``1..max_lag`` — the standard seasonality/persistence
    diagnostic (daily cycle shows as a spike at lag 7 on weekly data,
    etc.). ``series`` is the already-bucketed relation (one row per
    time bucket); the classic estimator uses the GLOBAL mean and
    sum-of-squares: ``r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²``, so a
    lag with few overlapping pairs shrinks toward 0 rather than
    exploding (the reason ACF uses this over per-lag Pearson).

    Scale shape: the input is bucket-space-sized (the corpus pass that
    built it is the caller's one scan); the mean/SS arrive as a
    broadcast one-row relation, each lag pairs by an equi-join on
    ``t + k = t'`` (explode over the max_lag literals, shuffle on the
    bucket key) — no window, no cross join, no driver loop. Returns
    ``(lag, n_pairs, acf)``, one row per lag ``1..max_lag``: a lag
    with zero overlapping pairs (``max_lag`` at or past the series
    span) emits ``(lag, 0, NULL)`` rather than silently dropping, so
    a caller iterating the full lag range never KeyErrors (the lag
    literals are left-joined to the pair aggregate — a max_lag-row
    broadcast, free).
    """
    if max_lag < 1:
        raise ValueError(f"autocorrelation: max_lag >= 1, got {max_lag}")
    base = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    mu_rel = base.agg(F.avg("x").alias("__mu"))
    g = (
        base.crossJoin(F.broadcast(mu_rel))
        .agg(
            F.max("__mu").alias("__mu"),
            F.sum(F.pow(F.col("x") - F.col("__mu"), 2)).alias("__ss"),
        )
    )
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, max_lag + 1)]))
    a = base.select("t", F.col("x").alias("xa"), lags.alias("lag"))
    b = base.select(
        (F.col("t")).alias("__tb"), F.col("x").alias("xb")
    )
    per_lag = (
        a.join(b, a["t"] + a["lag"] == b["__tb"])
        .crossJoin(F.broadcast(g))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.try_divide(
                    F.sum(
                        (F.col("xa") - F.col("__mu"))
                        * (F.col("xb") - F.col("__mu"))
                    ),
                    F.max("__ss"),
                ),
                6,
            ).alias("acf"),
        )
    )
    lag_rel = series.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    return lag_rel.join(F.broadcast(per_lag), on="lag", how="left").select(
        "lag",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias(
            "n_pairs"
        ),
        "acf",
    )


def seasonal_decompose(
    series: DataFrame,
    t_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a regular series:
    ``x_t = trend + seasonal + resid`` — the companion diagnostic to
    ``autocorrelation`` (ACF says "there is a weekly cycle";
    decomposition shows it). Trend is the centered moving average of
    width ``period`` (only where the full window exists — edges carry
    NULL trend/resid, the textbook convention); the seasonal component
    is the mean DETRENDED value per phase ``t mod period``, centered
    so the seasonal sums to ~0 over one period; resid is the rest.
    ``period`` must be odd (a centered integer window); even periods
    take the 2×p double-MA variant, not implemented here.

    Scale shape: the input is the already-bucketed series relation —
    bucket-space-sized by construction (the CUSUM/day-relation
    rationale), so the ordered moving-average window runs on one tiny
    partition, bit-identical across engines; the phase means are a
    ``period``-row aggregate joined back broadcast. The corpus pass
    that builds the series is the caller's. Returns
    ``(t, x, trend, seasonal, resid)``.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(
            f"seasonal_decompose: period must be odd and >= 3, got {period}"
        )
    half = period // 2
    base = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    w = Window.orderBy("t").rowsBetween(-half, half)
    trended = base.withColumn(
        "trend",
        F.when(
            F.count("x").over(w) == period, F.avg("x").over(w)
        ),
    )
    phase = trended.where(F.col("trend").isNotNull()).groupBy(
        (F.col("t") % period).alias("__ph")
    ).agg(F.avg(F.col("x") - F.col("trend")).alias("__raw"))
    phase_c = phase.crossJoin(
        F.broadcast(phase.agg(F.avg("__raw").alias("__m")))
    ).select("__ph", (F.col("__raw") - F.col("__m")).alias("__s"))
    return (
        trended.join(
            F.broadcast(phase_c),
            F.col("t") % period == F.col("__ph"),
            "left",
        )
        .select(
            "t",
            "x",
            F.round("trend", 6).alias("trend"),
            F.round("__s", 6).alias("seasonal"),
            F.round(F.col("x") - F.col("trend") - F.col("__s"), 6).alias(
                "resid"
            ),
        )
    )


def groupwise_gini(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group exact Gini coefficient as a vectorized GROUPED_AGG
    ``pandas_udf`` — the one UDF flavor the engine had not yet shipped
    (scalar Arrow batches: mapInPandas; grouped maps: applyInPandas;
    this is the grouped AGGREGATE, Spark's UDAF surface). Each group's
    values sort once in numpy: ``gini = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n``
    over the ascending sort (1-based i) — tie order cannot change the
    sum (equal values share a fixed position set), so the statistic is
    deterministic and a rank-window SQL twin reproduces it exactly
    (q230). NULLs drop; an empty or zero-sum group yields NULL.

    Scale shape: Arrow-batched partial aggregation is NOT available to
    Python UDAFs — each group's values gather to one executor (same
    contract as ``applyInPandas``), so this is for value-bounded
    groups (per-nation, per-source). The inequality measure itself
    needs the full sorted group by definition; for a global Gini over
    an unbounded corpus use ``concentration_report``'s rank-window
    form.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _gini(v: pd.Series) -> float:
        x = np.sort(v.dropna().to_numpy(dtype="float64"))
        n = x.size
        s = x.sum()
        if n == 0 or s == 0.0:
            return None
        i = np.arange(1, n + 1, dtype="float64")
        return round(float(2.0 * (i * x).sum() / (n * s) - (n + 1.0) / n), 6)

    # Spark refuses to mix a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg() — the count rides as a second pandas UDAF.
    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return int(v.dropna().size)

    return (
        df.groupBy(*group_cols)
        .agg(
            _n(F.col(value_col)).alias("n_values"),
            _gini(F.col(value_col)).alias("gini"),
        )
    )


def seasonal_naive_backtest(
    series: DataFrame,
    t_col: str,
    value_col: str,
    period: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Forecast-quality floor: backtest the SEASONAL-NAIVE forecast
    ``x̂_t = x_{t−period}`` over the last ``horizon`` buckets of a
    regular series and report MAE and sMAPE — the baseline every
    fancier telemetry forecaster must beat before it ships (a model
    that loses to last-week's value is noise). Returns one row
    ``(n_eval, mae, smape)``; buckets whose lag is missing are
    excluded from the evaluation.

    Scale shape: bucket-space relation in, one ``lag`` window in
    bucket order (the CUSUM/day-relation rationale), the eval cut is
    ``t > max(t) − horizon`` with the max arriving broadcast. One
    bounded aggregate out.
    """
    base = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    w = Window.orderBy("t")
    lagged = base.withColumn("xhat", F.lag("x", period).over(w))
    mx = base.agg(F.max("t").alias("__mx"))
    evald = (
        lagged.crossJoin(F.broadcast(mx))
        .where(
            (F.col("t") > F.col("__mx") - horizon)
            & F.col("xhat").isNotNull()
        )
    )
    err = F.abs(F.col("x") - F.col("xhat"))
    return evald.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.round(F.avg(err), 6).alias("mae"),
        F.round(
            F.avg(
                F.try_divide(
                    2.0 * err, F.abs(F.col("x")) + F.abs(F.col("xhat"))
                )
            ),
            6,
        ).alias("smape"),
    )


def calibration_report(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error — the third
    leg of the classifier-evaluation trio (``binary_auc`` ranks,
    ``pr_at_thresholds`` tunes the cutoff, this says whether the
    scores MEAN what they say: a 0.8 bucket should convert 80% of the
    time). Rows ``(bin, n, avg_prob, frac_pos, abs_gap, ece)`` — one
    per OCCUPIED equal-width probability bin, each carrying the
    global ``ece = Σ (n_b/N)·|avg_prob_b − frac_pos_b|``.

    Scale shape: one corpus pass into a ``bins``-key partial-combined
    aggregation (probabilities clamp to [0, 1]; bin = min(bins−1,
    floor(p·bins))); the ECE is a second aggregate over the bin
    relation, broadcast back. No windows, no Python.
    """
    if bins < 1:
        raise ValueError(f"calibration_report: bins >= 1, got {bins}")
    p = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.col(prob_col).cast("double"))
    )
    y = F.col(label_col).cast("int")
    b = (
        df.where(F.col(prob_col).isNotNull() & y.isNotNull())
        .groupBy(
            F.least(F.lit(bins - 1), F.floor(p * bins))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.avg(p).alias("__ap"),
            F.avg(y.cast("double")).alias("__fp"),
        )
    )
    tot = b.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("__ap") - F.col("__fp")))
            / F.sum("n")
        ).alias("__ece")
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.round("__ap", 6).alias("avg_prob"),
            F.round("__fp", 6).alias("frac_pos"),
            F.round(F.abs(F.col("__ap") - F.col("__fp")), 6).alias(
                "abs_gap"
            ),
            F.round("__ece", 6).alias("ece"),
        )
    )
