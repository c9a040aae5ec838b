"""PageRank as a DataFrame power-iteration loop (SURVEY.md §2.9, G1-G5).

Semantics are pinned to the reference implementation
(``pageRank.py:116-145``), NOT to GraphX/GraphFrames' built-in PageRank
(whose ranks do not sum to 1 — it skips the dangling-mass
renormalization the reference applies every iteration):

    r'[v] = (1-β)/N + β · Σ_{u→v} r[u] / deg(u)        (power step, :125-130)
    s = Σ_v r'[v];  r'[v] += (1-s)/N                    (renormalize, :133-135)
    stop when Σ_v |r'[v] - r[v]| <= δ                   (L1 check,    :138-139,123)

The renormalization constant is computed analytically instead of with a
second aggregation pass: every source vertex's rank is fully distributed
across its out-edges, so

    s = Σ r' = (1-β) + β · m,   m = Σ_{deg(u)>0} r[u] · dfrac(u)

and the correction is ``(1-s)/N = β·(1-m)/N`` — the classic uniform
redistribution of undistributed mass. ``dfrac`` (distributed fraction per
source) is 1 in "bag" mode; in "reference" mode it is
``distinct_out_degree/out_degree``, because the reference distributes
along deduplicated dst sets while dividing by the duplicate-counting
degree (``pageRank.py:102-110``) — its literal ``s = sum(new_rank.
values())`` picks that up automatically, and so does m_eff here. ``m``
is folded into the single per-iteration aggregation, so each iteration
runs exactly ONE Spark job.
(The float value of ``s`` differs from the reference's literal
``sum(dict.values())`` only by summation rounding, orders of magnitude
below the 1e-9 golden-score tolerance; verified against the golden
top-100 and the 13-iteration trajectory.)

Scale design (the part that matters at 100 TB):

- The loop state is ONE DataFrame ``(node, deg, rank)`` — carrying the
  out-degree in the state means the L1 convergence check and the
  next-iteration dangling mass come from the same single aggregation,
  with no extra join against a separate degree or old-rank table.
- The loop-invariant ``edges ⋈ degrees`` relation is computed once and
  cached — the analogue of the reference's block-stripe structure
  (``pageRank.py:96-113``), which Spark replaces with a hash-partitioned
  shuffle exchange; no custom block structure is needed (SURVEY §4 X1/X2).
- The per-iteration rank vector joins the edge table either by
  **broadcast** (rank vector fits in executor memory) or by
  **co-partitioned shuffle join** (``strategy="shuffle"``): edges are
  pre-partitioned by ``src`` once outside the loop, so each iteration
  shuffles only the (much smaller) rank vector, never the edge table.
- Contributions aggregate map-side first (partial hash agg) before the
  exchange on ``dst``; AQE skew-join splitting covers hub-vertex skew.
- One tiny driver-side scalar row per iteration (L1 norm + dangling
  mass) drives the loop — the only driver materialization; the rank
  table itself never collects.
- Lineage is truncated with a LAZY ``localCheckpoint`` every
  ``checkpoint_every`` iterations so the logical plan doesn't grow per
  iteration (SURVEY §7.5.1). Lazy means the checkpoint materializes
  inside the iteration's one aggregation job — no dedicated checkpoint
  pass — so truncation is free and the default cadence is EVERY
  iteration. Measured on WikiData (warm, lazy): cadence 1 → 4.9s,
  2 → 5.7s, 3 → 6.5s, never → crash; Catalyst re-analysis of the
  growing plan dominates any plan reuse. (Reliable ``checkpoint()``
  writes state to the checkpoint dir — real I/O per truncation — so
  that mode amortizes over 3 iterations.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pagerank_spark.graph.loop import VertexLoop

# Reduce-side partition floor for the tuned iteration loop (the sizing
# target is ~2M vertices/partition, capped by the session setting).
# Floor of 4 keeps a few cores busy on tiny graphs without paying
# per-task scheduling overhead across all 32.
LOOP_PARTS_FLOOR = 4

# Below this vertex count the co-partitioned shuffle join beats the
# broadcast join even though the rank vector trivially fits in memory:
# the per-iteration cost of broadcast is a driver collect + rebroadcast
# round trip, which at tiny sizes exceeds shuffling the rank vector
# through the (tuned, ~4-partition) exchange. Measured, 6 fixed
# iterations, best-of-2, local[32]: tuned shuffle wins at 10k vertices
# (1.8s vs 3.3s), 30k (4.5 vs 5.7), 80k (2.5 vs 3.7) and WikiData's 7k
# (4.3 vs 4.7); broadcast wins again by 200k (6.1 vs 8.2 — the collect
# amortizes, and the SMJ's per-iteration edge-side sort grows with E).
TINY_VERTEX_LIMIT = 100_000

# Setup-phase tuning gate: when Catalyst's size estimate of the edge
# plan is below this (64 MiB ≈ 4M edges at 16 bytes/row), the setup
# aggregations (vertex distinct, degree join, counts) run under the
# same AQE-off/small-partition confs as the loop — running setup
# untuned while only the loop was tuned measured 6.3s vs 4.4s
# end-to-end on WikiData. The estimate costs no job (it is the same
# statistic the optimizer uses for broadcast decisions). Deliberately
# conservative: tuning the setup of a 10M-edge graph down to 5
# partitions measured 3.5s SLOWER (under-parallelized distinct+join),
# so above the gate setup keeps the session's full parallelism.
SETUP_TUNE_SIZE_BYTES = 64 << 20


@dataclass
class PageRankResult:
    """Converged ranks plus the convergence trajectory."""

    ranks: DataFrame  # (node BIGINT, rank DOUBLE), sums to 1
    iterations: int
    l1_trajectory: list[float]
    strategy: str = "broadcast"  # the join strategy the loop ran with

    def top(self, k: int = 100) -> DataFrame:
        return top_k(self.ranks, k)


def materialize_or_release(df: DataFrame) -> DataFrame:
    """Materialize a FRESHLY persisted frame, releasing its lazy
    persist mark if the job fails. The fresh mark is in no shared
    release list yet (a loop's finally sweeps only its tracked
    generations), so a failed materializing count would otherwise pin
    the relation past every caller's cleanup — the last gap in the
    try/finally release discipline."""
    try:
        df.count()
    except Exception:
        df.unpersist()
        raise
    return df


def vertices(edges: DataFrame) -> DataFrame:
    """A1/U1: distinct vertex set = union of both endpoint columns.

    Reference: ``pageRank.py:47-53`` (list extend + set + sort; the sort is
    an ordering artifact we don't need — hash aggregation doesn't care).
    """
    return (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """A2: out-degree per source. Reference: ``pageRank.py:90-92``."""
    return edges.groupBy("src").agg(F.count("*").alias("deg"))


def top_k(ranks: DataFrame, k: int = 100) -> DataFrame:
    """O2/O3: top-k by rank desc (ties by node asc), as (page, score).

    Physical plan is TakeOrderedAndProject — per-partition top-k then a
    driver merge of k·P rows; no global sort of the full rank table.
    """
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
        .select(F.col("node").alias("page"), F.col("rank").alias("score"))
    )


def pagerank(
    edges: DataFrame,
    beta: float = 0.85,
    delta: float = 1e-5,
    max_iterations: int = 200,
    checkpoint_every: int | None = None,
    strategy: str = "auto",
    broadcast_vertex_limit: int = 2_000_000,
    edge_semantics: str = "bag",
    reliable_checkpoint: bool | str = "auto",
    tune_aqe: bool = True,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Power iteration with dangling-mass renormalization (G1-G4).

    ``init_ranks``: optional (node, rank) warm start — the incremental
    path for periodically refreshed graphs: restart from the previous
    converged vector instead of uniform. The fixed point is unique, so
    the result is unchanged; only the iteration count drops (a small
    graph delta leaves the old vector near the new fixed point). The
    vector is normalized over the CURRENT vertex set (new vertices get
    the uniform share, departed ones are dropped, then ranks rescale to
    sum 1), costing one extra setup aggregation.

    ``strategy``: "broadcast" joins the rank vector to edges as a broadcast
    hash join; "shuffle" co-partitions both sides on ``src``; "auto" is
    three MEASURED tiers (synthetic hash-mixed graphs, 6 fixed
    iterations, local[32]): tuned co-partitioned shuffle below
    ``TINY_VERTEX_LIMIT`` (100k — broadcast's per-iteration driver
    collect round trip costs more than the tiny rank exchange: 1.8 vs
    3.3s at 10k vertices, 2.5 vs 3.7s at 80k), broadcast from there to
    ``broadcast_vertex_limit`` (broadcast wins 6.1 vs 8.2s at 200k, is
    within noise at 1-2M, and collapses by 3M — 40.3 vs 16.7s, the
    collect + rebroadcast dominating), and shuffle again above. Beyond
    the cut, shuffle co-partitioning is also the only plan that
    survives a cluster whose rank vector exceeds executor memory.

    ``edge_semantics``: "bag" (default) lets every duplicate edge
    occurrence contribute; "reference" pins the reference's multigraph
    behavior (``pageRank.py:102-110``: dst sets are deduped per src while
    out-degree counts duplicate edges). Identical on simple graphs like
    WikiData; a test pins both on a multigraph.

    ``reliable_checkpoint``: use fault-tolerant ``checkpoint()`` (requires
    ``spark.sparkContext.setCheckpointDir``) instead of ``localCheckpoint``
    — the cluster-mode choice: localCheckpoint blocks die with their
    executor, killing a long iteration chain on any node loss. Default
    "auto" picks reliable whenever a checkpoint dir IS configured, so a
    cluster session that set one up never silently runs the
    non-fault-tolerant mode.

    Returns ranks over the full vertex set, summing to 1.
    """
    if edge_semantics not in ("bag", "reference"):
        raise ValueError(f"unknown edge_semantics: {edge_semantics!r}")
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if reliable_checkpoint == "auto":
        reliable_checkpoint = (
            spark.sparkContext.getCheckpointDir() is not None
        )
    if checkpoint_every is None:
        # Checkpoints are lazy (they materialize inside the iteration's
        # one aggregation job), so with localCheckpoint the truncation
        # is free and EVERY iteration should truncate — measured on
        # WikiData (warm, lazy): cadence 1 → 4.9s, 2 → 5.7s, 3 → 6.5s;
        # Catalyst re-analysis of the growing plan dominates any reuse.
        # Reliable checkpoints write the state table to the checkpoint
        # dir (HDFS/object store) — a real I/O cost per truncation, so
        # amortize over 3 iterations there.
        checkpoint_every = 3 if reliable_checkpoint else 1

    # AQE re-plans every stage at runtime; on a small graph each
    # iteration is a sub-second job and replanning overhead more than
    # doubles wall time (measured 21.8s → 9.7s on WikiData) — so it's
    # disabled for any graph under the broadcast limit (whichever join
    # strategy runs), which also loses AQE's partition coalescing; we
    # size the loop's reduce-side partitions ourselves (~2M rows /
    # partition, floor 4, never above the session setting; measured
    # 13.2s → ~7s on WikiData at 32 → 4 partitions). At scale AQE's
    # skew-join splitting is worth the replanning and stays on.
    #
    # The flip happens BEFORE the setup aggregations (vertex distinct,
    # degree join, counts): running setup under AQE + session
    # partitions while only the loop is tuned measured 6.3s vs 4.4s
    # end-to-end on WikiData — the setup jobs carry the same per-stage
    # fixed costs the loop does. Since the vertex count isn't known
    # yet at that point, the setup flip is gated on Catalyst's own
    # size estimate of the edge plan (the same statistic the optimizer
    # uses for broadcast decisions — no extra job); the loop flip is
    # then re-decided from the exact vertex count.
    # NOTE: these are session-global conf flips (restored in ``finally``)
    # — safe for a dedicated job session, not for a session shared with
    # concurrent queries; pass ``tune_aqe=False`` there.
    aqe_key = "spark.sql.adaptive.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    aqe_before = spark.conf.get(aqe_key)
    parts_before = spark.conf.get(parts_key)
    loop_parts = shuffle_parts
    conf_flipped = False
    if tune_aqe:
        est_bytes = _plan_size_bytes(edges)
        if est_bytes <= SETUP_TUNE_SIZE_BYTES:
            conf_flipped = True
            spark.conf.set(aqe_key, "false")
            loop_parts = max(
                LOOP_PARTS_FLOOR,
                min(shuffle_parts, -(-est_bytes // (32 << 20))),
            )
            spark.conf.set(parts_key, str(loop_parts))

    # Shared release lists (the components.py discipline): setup
    # appends its loop-lifetime caches (init_state, edge_deg, warm
    # start) to ``pinned`` and the loop appends state generations to
    # ``gens`` (cleared in place at checkpoints), so a failed job at
    # ANY point — setup collects included — releases everything in the
    # same finally that restores the session confs. The returned ranks
    # frame is a fresh persist, never in either list.
    pinned: list[DataFrame] = []
    gens: list[DataFrame] = []
    try:
        return _setup_and_iterate(
            spark,
            edges,
            beta=beta,
            delta=delta,
            max_iterations=max_iterations,
            checkpoint_every=checkpoint_every,
            strategy=strategy,
            broadcast_vertex_limit=broadcast_vertex_limit,
            edge_semantics=edge_semantics,
            reliable_checkpoint=reliable_checkpoint,
            tune_aqe=tune_aqe,
            init_ranks=init_ranks,
            shuffle_parts=shuffle_parts,
            loop_parts=loop_parts,
            conf_flipped=conf_flipped,
            aqe_before=aqe_before,
            parts_before=parts_before,
            pinned=pinned,
            gens=gens,
        )
    finally:
        if tune_aqe:
            spark.conf.set(aqe_key, aqe_before)
            spark.conf.set(parts_key, parts_before)
        for df in gens:
            df.unpersist()
        for df in pinned:
            df.unpersist()


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a plan (the statistic the optimizer
    itself uses for broadcast decisions) — no job is run. Falls back to
    'huge' when the estimate is unavailable (e.g. Spark Connect), which
    just means the setup phase runs untuned."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 62


def _setup_and_iterate(
    spark,
    edges: DataFrame,
    *,
    beta: float,
    delta: float,
    max_iterations: int,
    checkpoint_every: int,
    strategy: str,
    broadcast_vertex_limit: int,
    edge_semantics: str,
    reliable_checkpoint: bool,
    tune_aqe: bool,
    init_ranks: DataFrame | None,
    shuffle_parts: int,
    loop_parts: int,
    conf_flipped: bool,
    aqe_before: str,
    parts_before: str,
    pinned: list,
    gens: list,
) -> PageRankResult:
    aqe_key = "spark.sql.adaptive.enabled"
    parts_key = "spark.sql.shuffle.partitions"

    # Out-degrees are computed ONCE and reused for both the decorated edge
    # relation and the state init (was: two scans+aggs of the edge table).
    deg = degrees(edges)

    # ``dfrac`` = fraction of a source's rank actually distributed by the
    # power step. In "bag" mode every edge occurrence contributes, so it's
    # exactly 1. In "reference" mode contributions flow along DISTINCT
    # (src, dst) pairs while deg counts duplicates (``pageRank.py:102-110``),
    # so a multigraph source distributes only rank·(distinct_deg/deg); the
    # renormalization must then use m_eff = Σ rank·dfrac, not Σ rank —
    # that is what the reference's literal ``s = sum(new_rank.values())``
    # computes implicitly. With dfrac carried in the loop state, m_eff
    # folds into the same single per-iteration aggregation.
    if edge_semantics == "reference":
        ddeg = edges.distinct().groupBy("src").agg(F.count("*").alias("ddeg"))
        deg = deg.join(ddeg, on="src", how="inner").select(
            "src", "deg", (F.col("ddeg") / F.col("deg")).alias("dfrac")
        )
    else:
        deg = deg.withColumn("dfrac", F.lit(1.0))

    # G1: uniform init over the full vertex set, with out-degree attached
    # (deg NULL ⇔ dangling vertex). One cached state relation per iterate.
    init_state = (
        vertices(edges)
        .join(deg, on=[F.col("node") == F.col("src")], how="left")
        .select("node", "deg", "dfrac")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pinned.append(init_state)
    state = init_state
    counts = state.agg(
        F.count("*").alias("n"),
        F.count("deg").alias("n_src"),
        F.sum("dfrac").alias("sdfrac"),
    ).collect()[0]
    n, n_src = counts["n"], counts["n_src"]
    if n == 0:
        empty = state.withColumn("rank", F.lit(0.0)).select("node", "rank")
        return PageRankResult(empty, 0, [], strategy)

    if strategy == "auto":
        if n <= TINY_VERTEX_LIMIT:
            # Tiny tier: co-partitioned shuffle — broadcast's
            # per-iteration driver collect costs more than the tiny
            # rank exchange (see TINY_VERTEX_LIMIT measurements).
            strategy = "shuffle"
        elif n <= broadcast_vertex_limit:
            strategy = "broadcast"
        else:
            strategy = "shuffle"

    # Re-decide the loop tuning from the EXACT vertex count: small
    # graphs get (or keep) the flip with partitions sized to vertices;
    # big-vertex graphs restore the session confs so the loop runs
    # with AQE's skew handling even if the setup estimate was small.
    if tune_aqe and n <= broadcast_vertex_limit:
        if not conf_flipped:
            conf_flipped = True
            spark.conf.set(aqe_key, "false")
        loop_parts = max(
            LOOP_PARTS_FLOOR, min(shuffle_parts, -(-n // 2_000_000))
        )
        spark.conf.set(parts_key, str(loop_parts))
    elif conf_flipped:
        spark.conf.set(aqe_key, aqe_before)
        spark.conf.set(parts_key, parts_before)
        conf_flipped = False
        loop_parts = shuffle_parts

    # Loop-invariant: edges decorated with the source's out-degree
    # (reference builds this once too — M_block_list at pageRank.py:159).
    # Built AFTER the conf flip: it materializes inside the first
    # iteration, so its cached partitioning must match the loop's sizing
    # (a 32-partition cache would put 32 map tasks in every iteration).
    contributing = edges.distinct() if edge_semantics == "reference" else edges
    edge_deg = contributing.join(deg.select("src", "deg"), on="src", how="inner")
    if strategy == "shuffle":
        # Pre-partition by src so each iteration's rank join shuffles only
        # the rank vector, reusing this cached exchange for the edge side.
        # Tuned small graphs use the loop's partition sizing so every
        # per-iteration exchange (rank side, contribs agg) aligns.
        edge_deg = edge_deg.repartition(loop_parts, "src")
    edge_deg = edge_deg.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.append(edge_deg)

    teleport = (1.0 - beta) / n
    if init_ranks is None:
        state = state.withColumn("rank", F.lit(1.0 / n))
        # Distributed mass of the uniform init: Σ_{deg(u)>0} (1/n)·dfrac(u).
        # In bag mode sdfrac == n_src, giving the classic n_src/n.
        m = (counts["sdfrac"] or 0.0) / n
    else:
        # Warm start: previous vector onto the current vertex set (new
        # vertices → uniform share), renormalized to sum exactly 1 so
        # the analytic dangling correction stays valid from iteration 1.
        warm = (
            state.join(
                init_ranks.select("node", F.col("rank").alias("__r0")),
                on="node",
                how="left",
            )
            .select(
                "node",
                "deg",
                "dfrac",
                F.coalesce(F.col("__r0"), F.lit(1.0 / n)).alias("rank"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Rides the loop's cache-eviction cycle: released at the first
        # checkpoint sweep like any other state generation.
        gens.append(warm)
        row0 = warm.agg(
            F.sum("rank").alias("t"),
            F.sum(
                F.when(
                    F.col("deg").isNotNull(), F.col("rank") * F.col("dfrac")
                ).otherwise(0.0)
            ).alias("mraw"),
        ).collect()[0]
        total = row0["t"] or 1.0
        state = warm.withColumn("rank", F.col("rank") / F.lit(float(total)))
        m = (row0["mraw"] or 0.0) / total

    trajectory: list[float] = []

    return _iterate(
        spark,
        edge_deg,
        state,
        n,
        m,
        beta=beta,
        delta=delta,
        teleport=teleport,
        max_iterations=max_iterations,
        checkpoint_every=checkpoint_every,
        strategy=strategy,
        shuffle_parts=loop_parts,
        trajectory=trajectory,
        cached=gens,
        reliable_checkpoint=reliable_checkpoint,
    )


def _iterate(
    spark,
    edge_deg: DataFrame,
    state: DataFrame,
    n: int,
    m: float,
    *,
    beta: float,
    delta: float,
    teleport: float,
    max_iterations: int,
    checkpoint_every: int,
    strategy: str,
    shuffle_parts: int,
    trajectory: list[float],
    cached: list[DataFrame],
    reliable_checkpoint: bool,
) -> PageRankResult:
    loop = VertexLoop(
        cached,
        checkpoint_every=checkpoint_every,
        reliable=reliable_checkpoint,
    )
    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        rank_side = state.where(F.col("deg").isNotNull()).select(
            F.col("node").alias("src"), "rank"
        )
        import os as _os
        _ab = _os.environ.get("SPARK_PR_AB", "")
        if strategy == "broadcast" or _ab == "bcast":
            rank_side = F.broadcast(rank_side)
        elif _ab == "free":
            pass
        else:
            rank_side = rank_side.repartition(shuffle_parts, "src")

        # G2 power step: J1 join + A4 group-sum, then left-join back to the
        # full vertex set so in-edge-less vertices keep the teleport term
        # (the reference gets that via dict re-init at pageRank.py:125).
        contribs = (
            edge_deg.join(rank_side, on="src", how="inner")
            .select(
                F.col("dst").alias("node"),
                (F.lit(beta) * F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("contrib"))
        )
        # G3: renormalization constant from the previous iterate's
        # distributed mass (see module docstring for the algebra; in
        # reference mode m is Σ rank·dfrac so multigraph sources' partial
        # distribution is accounted for and ranks still sum to 1).
        correction = beta * (1.0 - m) / n
        pre = (
            state.select(
                "node", "deg", "dfrac", F.col("rank").alias("old_rank")
            )
            .join(contribs, on="node", how="left")
            .select(
                "node",
                "deg",
                "dfrac",
                "old_rank",
                (
                    F.lit(teleport + correction)
                    + F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # G4 + lineage control via the shared engine primitive
        # (graph/loop.py VertexLoop — SURVEY §7.5.1): lazy checkpoint
        # on the cadence materializing inside the ONE per-round
        # aggregation (L1 convergence metric + next iteration's
        # distributed mass), persisted generations tracked before the
        # agg and swept after each checkpoint.
        pre, row = loop.advance(
            pre,
            metrics={
                "l1": F.sum(F.abs(F.col("rank") - F.col("old_rank"))),
                "m": F.sum(
                    F.when(
                        F.col("deg").isNotNull(),
                        F.col("rank") * F.col("dfrac"),
                    ).otherwise(0.0)
                ),
            },
        )
        l1, m = row["l1"], row["m"]
        trajectory.append(l1)

        state = pre.select("node", "deg", "dfrac", "rank")
        if l1 <= delta:
            break

    # The setup-lifetime caches (edge_deg, init_state) and any live
    # state generations are released by pagerank()'s finally right
    # after this returns — the returned ranks frame is a fresh persist,
    # untouched by that sweep (and self-releasing on a failed count).
    final = materialize_or_release(
        state.select("node", "rank").persist(StorageLevel.MEMORY_AND_DISK)
    )
    return PageRankResult(final, iteration, trajectory, strategy)


def compare_teleports(
    edges: DataFrame,
    betas: tuple[float, ...] = (0.80, 0.85, 0.90),
    delta: float = 1e-5,
    k: int = 100,
    tune_aqe: bool = True,
    max_iterations: int | None = None,
) -> DataFrame:
    """G5 parameter sweep (reference README-only ``compare_teleports``).

    Runs the pipeline per β, attaches 1-based positions (W1 row_number),
    and joins on position (J4) so each row compares the page ranked at
    position *i* across all runs, plus an ``all_match`` flag.

    ``max_iterations`` caps each run's power iterations (pass with
    ``delta=0.0`` for a fixed-iteration sweep — the SURVEY §5.3
    deterministic variant an exact SQL twin can reproduce). Ordering is
    on scores rounded to 9 decimals with page-id tiebreak, so positions
    don't depend on sub-1e-9 float summation-order noise.
    """
    from pyspark.sql import Window

    score9 = F.round("score", 9)
    w = Window.orderBy(F.desc(score9), F.asc("page"))
    tagged = []
    for beta in betas:
        kwargs = {} if max_iterations is None else {
            "max_iterations": max_iterations
        }
        res = pagerank(
            edges, beta=beta, delta=delta, tune_aqe=tune_aqe, **kwargs
        )
        t = (
            res.ranks.select(
                F.col("node").alias("page"), F.col("rank").alias("score")
            )
            .orderBy(F.desc(score9), F.asc("page"))
            .limit(k)
            .withColumn("position", F.row_number().over(w))
            .select("position", F.col("page").alias(f"page_{_beta_tag(beta)}"))
        )
        tagged.append(t)
        res.ranks.unpersist()

    out = tagged[0]
    for t in tagged[1:]:
        out = out.join(t, on="position", how="inner")
    page_cols = [c for c in out.columns if c.startswith("page_")]
    all_match = F.lit(True)
    for c in page_cols[1:]:
        all_match = all_match & (F.col(page_cols[0]) == F.col(c))
    return out.withColumn("all_match", all_match).orderBy("position")


def _beta_tag(beta: float) -> str:
    return str(beta).replace(".", "_")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    beta: float = 0.85,
    iterations: int = 2,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling) mass returns to
    the seed set instead of the whole graph. Returns (node, rank).

    Extension tier (the reference teleports uniformly; README.md's
    ``compare_teleports`` sweeps β only). Fixed-iteration synchronous
    power steps starting from the teleport distribution (uniform over
    seeds), so the declared 2-iteration query has an exact SQL twin:

        r'[v] = (1-β+β·dm)·s[v] + β·Σ_{u→v} r[u]/deg(u)

    with ``s[v] = 1/|S|`` on seeds (0 elsewhere) and ``dm`` the dangling
    mass Σ_{deg(u)=0} r[u] of the previous iterate — ranks sum to 1
    every iteration.

    Scale shape: the whole computation is ONE lazy DAG — the per-
    iteration scalars (|S|, dm) are single-row aggregates attached by
    broadcast cross join, never collected to the driver, so the
    operator composes inside a larger declared query. For high
    iteration counts prefer the convergence-looped ``pagerank`` shape
    (per-iteration checkpointing); this fixed-k form targets k ≤ ~4.
    """
    deg = degrees(edges)
    seed_set = seeds.select("node").distinct()
    n_seeds = F.broadcast(seed_set.agg(F.count("*").alias("__ns")))

    state = (
        vertices(edges)
        .join(deg, on=[F.col("node") == F.col("src")], how="left")
        .select("node", "deg")
        .join(
            seed_set.withColumn("__is_seed", F.lit(1)), on="node", how="left"
        )
        .crossJoin(n_seeds)
        .select(
            "node",
            "deg",
            (
                F.coalesce(F.col("__is_seed"), F.lit(0)) / F.col("__ns")
            ).alias("s"),
        )
    )
    state = state.withColumn("rank", F.col("s"))

    for _ in range(iterations):
        dm = F.broadcast(
            state.where(F.col("deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
        )
        contribs = (
            edges.join(
                state.select(
                    F.col("node").alias("src"), "rank", F.col("deg").alias("d")
                ),
                on="src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.lit(beta) * F.col("rank") / F.col("d")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        state = (
            state.select("node", "deg", "s")
            .join(contribs, on="node", how="left")
            .crossJoin(dm)
            .select(
                "node",
                "deg",
                "s",
                (
                    (F.lit(1.0 - beta) + F.lit(beta) * F.col("__dm"))
                    * F.col("s")
                    + F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return state.select("node", "rank")


def weighted_pagerank(
    edges: DataFrame,
    beta: float = 0.85,
    iterations: int = 2,
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank: contributions split ∝ edge weight instead of
    uniformly. Returns (node, rank).

    Extension tier (the reference's loop — pageRank.py:117-139 — is
    unweighted). Each step:

        r'[v] = (1-β)/n + β·dm/n + β·Σ_{u→v} r[u]·w(u,v)/W(u)

    with ``W(u)`` the sum of u's outgoing weights and ``dm`` the
    dangling mass — ranks sum to 1 every iteration. Fixed-iteration
    synchronous form so a k-step declared query has an exact SQL twin
    (same pattern as ``personalized_pagerank``); swap in the
    convergence-looped shape of ``pagerank`` for large k.

    Scale shape: one weight-sum aggregation up front (reused every
    iteration, analogous to the degree table), then per iteration one
    shuffle join + one partial-agg sum; the scalars (n, dm) ride along
    as broadcast single-row joins — nothing collects to the driver.
    """
    wsum = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum(weight_col).alias("wsum")
    )
    verts = vertices(edges)
    n = F.broadcast(verts.agg(F.count("*").alias("__n")))

    state = (
        verts.join(wsum, on="node", how="left")
        .crossJoin(n)
        .select("node", "wsum", "__n", (1.0 / F.col("__n")).alias("rank"))
    )

    for _ in range(iterations):
        dm = F.broadcast(
            state.where(F.col("wsum").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
        )
        contribs = (
            edges.join(
                state.select(
                    F.col("node").alias("src"),
                    "rank",
                    F.col("wsum").alias("__ws"),
                ),
                on="src",
            )
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(beta)
                    * F.col("rank")
                    * F.col(weight_col)
                    / F.col("__ws")
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        state = (
            state.select("node", "wsum", "__n")
            .join(contribs, on="node", how="left")
            .crossJoin(dm)
            .select(
                "node",
                "wsum",
                "__n",
                (
                    (F.lit(1.0 - beta) + F.lit(beta) * F.col("__dm"))
                    / F.col("__n")
                    + F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return state.select("node", "rank")


def hits(
    edges: DataFrame,
    iterations: int = 2,
    *,
    delta: float | None = None,
    max_iterations: int | None = None,
    mode: str = "auto",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999): the other classic
    link-analysis fixed point beside PageRank. Returns
    ``(node, hub, auth)`` after synchronous rounds of

        a[v] ∝ Σ_{u→v} h[u]        (authority: pointed to by good hubs)
        h[u] ∝ Σ_{u→v} a[v]        (hub: points at good authorities)

    each L1-normalized (scores sum to 1 — keeps the fixed-iteration
    algebra rational, so a declared k-step query has an exact SQL
    twin; the classical L2 norm only rescales the ranking).

    Two execution shapes, selected by ``mode``:

    - ``"dag"``: the whole k-step computation is ONE lazy DAG — per
      half-step one equi-join against the edge table + one
      partial-combined aggregation, normalization constants riding
      broadcast single-row cross joins; nothing collects to the
      driver. The edge and vertex relations are deliberately NOT
      cached: the DAG references each ~2k times, but Catalyst's size
      estimates on the raw plan keep every half-step join a
      broadcast — caching replaces them with InMemoryRelations whose
      stats flip the joins to sort-merge, which A/B-measured 3×
      SLOWER (17s vs 5s at sf0.1, k=2) despite the repeated upstream
      scans. Only shape with a pure-SQL oracle twin (q124).
    - ``"loop"``: the ``pagerank`` checkpoint pattern for large k or
      ``delta``-convergence — edges cached once, per-iteration lazy
      localCheckpoint truncating lineage, per-iteration scalar aggs
      for the two L1-normalization constants and the convergence
      metric ``L1(auth)+L1(hub)``. Cost is linear in k (the DAG shape
      re-scans edges ~2k times and its analyzed plan grows per step).
    - ``"auto"``: loop when ``delta`` is set or ``iterations > 2``,
      else dag. Measured at sf0.1 (derived 20k-node graph, warm
      best-of-2): k=2 dag 3.6s vs loop 3.1s (within noise — dag kept
      for its collect-free single-DAG shape and SQL-twin parity),
      k=4 dag 110.8s vs loop 5.6s, k=10 dag DNF (>560s, one run) vs
      loop 14.7s — the unrolled plan's Catalyst analysis grows
      super-linearly with k, so the cut sits right after the last
      measured point where the dag is competitive.

    With ``delta`` set, iterates until the combined L1 change of both
    vectors is ≤ delta (capped by ``max_iterations``, default 100).

    Extension tier: same family as the reference's PageRank loop
    (``pageRank.py:116-145``) but the two-sided mutual-reinforcement
    recursion.
    """
    if delta is None and iterations < 1:
        raise ValueError(f"hits: iterations must be >= 1, got {iterations}")
    if mode not in ("auto", "dag", "loop"):
        raise ValueError(f"hits: unknown mode {mode!r}")
    if mode == "auto":
        mode = "loop" if (delta is not None or iterations > 2) else "dag"
    if mode == "loop":
        return _hits_loop(
            edges,
            delta=0.0 if delta is None else delta,
            max_iterations=(
                max_iterations
                if max_iterations is not None
                else (iterations if delta is None else 100)
            ),
        )
    verts = vertices(edges)
    n = F.broadcast(verts.agg(F.count("*").alias("__n")))
    state = verts.crossJoin(n).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("hub")
    )

    auth = None
    for _ in range(iterations):
        a_raw = (
            edges.join(
                state.select(F.col("node").alias("src"), "hub"), on="src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("__v"))
        )
        a_full = verts.join(a_raw, on="node", how="left").select(
            "node", F.coalesce(F.col("__v"), F.lit(0.0)).alias("__v")
        )
        a_sum = F.broadcast(a_full.agg(F.sum("__v").alias("__s")))
        auth = a_full.crossJoin(a_sum).select(
            "node", (F.col("__v") / F.col("__s")).alias("auth")
        )
        h_raw = (
            edges.join(
                auth.select(F.col("node").alias("dst"), "auth"), on="dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("__v"))
        )
        h_full = verts.join(h_raw, on="node", how="left").select(
            "node", F.coalesce(F.col("__v"), F.lit(0.0)).alias("__v")
        )
        h_sum = F.broadcast(h_full.agg(F.sum("__v").alias("__s")))
        state = h_full.crossJoin(h_sum).select(
            "node", (F.col("__v") / F.col("__s")).alias("hub")
        )

    return state.join(auth, on="node", how="inner").select(
        "node", "hub", "auth"
    )


def _hits_loop(
    edges: DataFrame, *, delta: float, max_iterations: int
) -> DataFrame:
    """Convergence-loop HITS on the ``pagerank`` checkpoint pattern.

    Edges cached once; per iteration two equi-join + partial-agg jobs
    (authority half-step, hub half-step) over a lazy-localCheckpointed
    vertex-sized state — lineage never grows, edges scan from cache.
    Normalization constants stay PLAN-SIDE as broadcast one-row
    relations (never per-round driver collects): for fixed-k runs the
    whole loop is then a single final action — zero driver round trips
    per iteration — and for delta-convergence runs the authority and
    hub L1 deltas fold into ONE scalar action per round (the previous
    shape paid three: s_a collect, s_h+l1a collect, l1h collect).
    Measured A/B in GRAPH_LOOP_AB.json. The convergence metric is
    ``L1(auth_t - auth_{t-1}) + L1(hub_t - hub_{t-1})`` (delta=0 → run
    exactly ``max_iterations`` rounds, bit-compatible with the
    unrolled DAG up to float summation order).

    Hub contributions aggregate the UNNORMALIZED authority vector: the
    hub normalization divides by the sum anyway, so the s_a factor
    cancels and each half-step needs only one scalar.

    Join strategy: HITS joins edges on BOTH ends (src for the
    authority step, dst for the hub step), so the loop caches TWO
    pre-partitioned edge layouts and aligns the vertex-sized state to
    each — every per-round exchange moves only the state vector, never
    the edge table (without this, Catalyst sees the checkpointed state
    with unknown stats and broadcasts the EDGES each half-step — fine
    at 10 MB, fatal at cluster scale). The 2× edge cache is the price
    of zero per-round edge movement; a memory-tight cluster can keep
    one layout and accept one edge shuffle per round.
    """
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst")
    verts = vertices(e).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return verts.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    # Same per-iteration tuning as the PageRank loop: AQE's runtime
    # coalescing re-plans every round (breaking reuse of the cached
    # edge partitioning) and the session's shuffle sizing is far too
    # wide for a small graph's vertex-sized exchanges — flip both for
    # the loop's duration, restore after.
    aqe_key = "spark.sql.adaptive.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    aqe_before = spark.conf.get(aqe_key)
    parts_before = spark.conf.get(parts_key)
    tuned = n <= TINY_VERTEX_LIMIT
    parts = shuffle_parts
    if tuned:
        spark.conf.set(aqe_key, "false")
        parts = max(
            LOOP_PARTS_FLOOR, min(shuffle_parts, -(-n // 2_000_000))
        )
        spark.conf.set(parts_key, str(parts))
    try:
        return _hits_loop_body(
            e, verts, n, parts, max_iterations, delta
        )
    finally:
        # restore SESSION-GLOBAL confs even when a mid-loop job dies —
        # a skipped restore leaves every later query in the session on
        # AQE-off / tiny-shuffle settings (the PageRank loop's
        # discipline).
        if tuned:
            spark.conf.set(aqe_key, aqe_before)
            spark.conf.set(parts_key, parts_before)


def _hits_loop_body(
    e: DataFrame,
    verts: DataFrame,
    n: int,
    parts: int,
    max_iterations: int,
    delta: float,
) -> DataFrame:
    e_src = e.repartition(parts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e_dst = e.repartition(parts, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    # try/finally below: a mid-loop job failure must still release the
    # two full edge-table caches and the vertex cache — without it they
    # stay pinned for the session lifetime (the conf restore in the
    # caller already has this discipline).
    try:
        return _hits_iterate(
            e_src, e_dst, verts, n, parts, max_iterations, delta
        )
    finally:
        e_src.unpersist()
        e_dst.unpersist()
        verts.unpersist()


def _hits_iterate(
    e_src: DataFrame,
    e_dst: DataFrame,
    verts: DataFrame,
    n: int,
    parts: int,
    max_iterations: int,
    delta: float,
) -> DataFrame:

    def _norm(col: str) -> Column:
        # empty/zero sum -> divide by 1 (keeps the all-zero vector),
        # matching the old `collect()[0][col] or 1.0` driver guard
        s = F.col(col)
        return F.when(F.coalesce(s, F.lit(0.0)) == 0.0, 1.0).otherwise(s)

    # r15 optimization (§3.1): below the engine's broadcast-state cut
    # the planner broadcasts the vertex-sized state side of each
    # half-step join ANYWAY (the checkpointed state keeps small origin
    # stats), so the explicit co-partitioning repartition executed as
    # a dead Exchange UNDER the BroadcastExchange — two wasted
    # state shuffles per round. Hint the broadcast explicitly and skip
    # the repartition when state is small; above the cut keep the
    # repartition that aligns the state to the cached edge layouts
    # (the zero-edge-movement property the loop exists for). The
    # no-broadcast alternative (autoBroadcastJoinThreshold=-1 +
    # shuffled-hash, PageRank's tiny tier) was A/B-measured SLOWER
    # here (9.0/10.4 s vs 6.9/8.1 s at sf0.1 k=10): HITS joins the
    # 600k-row edge relation on BOTH ends, so the forced-shuffle form
    # re-exchanges contributions every half-step while the 4096-row
    # broadcast build is nearly free.
    from pagerank_spark.graph.components import (
        BROADCAST_STATE_ROW_LIMIT,
        _bc,
    )

    bcs = n <= BROADCAST_STATE_ROW_LIMIT

    def _align(df: DataFrame, key: str) -> DataFrame:
        return _bc(df, True) if bcs else df.repartition(parts, key)

    state = verts.select(
        "node",
        F.lit(1.0 / n).alias("hub"),
        F.lit(1.0 / n).alias("auth"),
    )
    # HITS is the TWO-half-step variant of the shared loop: each round
    # truncates lineage twice (after the authority and hub steps), and
    # the per-round scalar is conditional on delta — so it uses the
    # primitive's cadence-free truncate() rather than advance()
    # (graph/loop.py; the persist-tracking halves of the discipline
    # don't apply, HITS never persists mid-loop state).
    loop = VertexLoop([])
    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        contrib_a = (
            e_src.join(
                _align(
                    state.select(F.col("node").alias("src"), "hub"),
                    "src",
                ),
                on="src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("__ca"))
        )
        mid = (
            state.select(
                "node",
                F.col("hub").alias("old_hub"),
                F.col("auth").alias("old_auth"),
            )
            .join(contrib_a, on="node", how="left")
            .select(
                "node",
                "old_hub",
                "old_auth",
                F.coalesce(F.col("__ca"), F.lit(0.0)).alias("va"),
            )
        )
        mid = loop.truncate(mid)
        s_a = F.broadcast(mid.agg(F.sum("va").alias("__sa")))
        contrib_h = (
            e_dst.join(
                _align(
                    mid.select(F.col("node").alias("dst"), "va"), "dst"
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("va").alias("__ch"))
        )
        nxt = (
            mid.join(contrib_h, on="node", how="left")
            .crossJoin(s_a)
            .select(
                "node",
                "old_hub",
                "old_auth",
                (F.col("va") / _norm("__sa")).alias("auth"),
                F.coalesce(F.col("__ch"), F.lit(0.0)).alias("vh"),
            )
        )
        nxt = loop.truncate(nxt)
        s_h = F.broadcast(nxt.agg(F.sum("vh").alias("__sh")))
        scored = nxt.crossJoin(s_h).select(
            "node",
            (F.col("vh") / _norm("__sh")).alias("hub"),
            "auth",
            "old_hub",
            "old_auth",
        )
        if delta > 0:
            # The ONE driver action per round: both L1 deltas in a
            # single scan of the checkpointed vertex-sized relation.
            row = scored.agg(
                F.sum(F.abs(F.col("auth") - F.col("old_auth"))).alias(
                    "l1a"
                ),
                F.sum(F.abs(F.col("hub") - F.col("old_hub"))).alias("l1h"),
            ).collect()[0]
        state = scored.select("node", "hub", "auth")
        if delta > 0 and (row["l1a"] or 0.0) + (row["l1h"] or 0.0) <= delta:
            break
    return materialize_or_release(
        state.persist(StorageLevel.MEMORY_AND_DISK)
    )


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    iterations: int = 3,
    *,
    delta: float | None = None,
    max_iterations: int | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Katz centrality, fixed-iteration form: counts in-paths of every
    length, geometrically damped —

        x_{t+1}[v] = 1 + α · Σ_{u→v} x_t[u],   x_0 = 0

    so after k rounds ``x_k[v] = Σ_{j<=k-1} α^j · (#paths of length j
    ending at v)`` — the truncated Katz series over path lengths
    0..k-1 (x_1 = 1 is the j=0 term; converges for α below the
    inverse spectral radius). Returns (node, katz).

    Extension tier — the damped-path cousin of PageRank that does NOT
    divide by out-degree, so prolific linkers transfer full weight.
    ``mode="dag"`` (auto default for fixed k): one-DAG scale shape
    like ``hits`` — per round one edge join + one partial-combined
    aggregation, no driver collects, no normalization scalars at all;
    edges and vertices uncached for the same broadcast-preserving
    reason as ``hits``. Unlike HITS (whose two-sided recursion
    references each intermediate twice and blows up analysis
    super-linearly — DNF at k=10), Katz references its state ONCE per
    round, so the unrolled plan stays linear: measured at sf0.1 (warm
    best-of-2) dag wins at every tested k — k=3 1.6s vs loop 3.4s,
    k=10 3.2 vs 6.8, k=40 20.9 vs 24.1 (converging slopes; the
    loop's per-round scalar-collect overhead dominates at this
    scale). ``mode="loop"`` (auto when ``delta`` is set): cached
    edges + lazy localCheckpoint per round + one scalar agg driving
    the ``L1(x_t - x_{t-1}) <= delta`` stop. On a cluster where the
    edge table exceeds page cache, the dag's k cold re-scans dominate
    and the loop's one cached scan wins far earlier — force
    ``mode="loop"`` there.
    """
    if delta is None and iterations < 1:
        raise ValueError(
            f"katz_centrality: iterations must be >= 1, got {iterations}"
        )
    if mode not in ("auto", "dag", "loop"):
        raise ValueError(f"katz_centrality: unknown mode {mode!r}")
    if mode == "auto":
        mode = "loop" if delta is not None else "dag"
    if mode == "loop":
        return _katz_loop(
            edges,
            alpha,
            delta=0.0 if delta is None else delta,
            max_iterations=(
                max_iterations
                if max_iterations is not None
                else (iterations if delta is None else 100)
            ),
        )
    verts = vertices(edges)
    state = verts.select("node", F.lit(0.0).alias("katz"))
    for _ in range(iterations):
        raw = (
            edges.join(
                state.select(F.col("node").alias("src"), "katz"), on="src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("katz").alias("__v"))
        )
        state = verts.join(raw, on="node", how="left").select(
            "node",
            (
                F.lit(1.0)
                + F.lit(alpha) * F.coalesce(F.col("__v"), F.lit(0.0))
            ).alias("katz"),
        )
    return state


def _katz_loop(
    edges: DataFrame,
    alpha: float,
    *,
    delta: float,
    max_iterations: int,
) -> DataFrame:
    """Convergence-loop Katz on the ``pagerank`` checkpoint pattern:
    cached SRC-PARTITIONED edges (per-round exchanges move only the
    vertex-sized state, never the edge table — Catalyst would
    otherwise broadcast the edges each round, since the checkpointed
    state has unknown stats), per round ONE job (edge join + partial
    agg + the L1 scalar, materializing the lazy localCheckpoint),
    lineage truncated every round; small graphs get the PageRank
    loop's AQE-off + vertex-sized partition tuning. delta=0 → exactly
    ``max_iterations`` rounds, matching the unrolled DAG up to float
    summation order."""
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = edges.select("src", "dst")
    verts = vertices(base).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    aqe_key = "spark.sql.adaptive.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    aqe_before = spark.conf.get(aqe_key)
    parts_before = spark.conf.get(parts_key)
    tuned = 0 < n <= TINY_VERTEX_LIMIT
    parts = shuffle_parts
    if tuned:
        spark.conf.set(aqe_key, "false")
        parts = max(
            LOOP_PARTS_FLOOR, min(shuffle_parts, -(-n // 2_000_000))
        )
        spark.conf.set(parts_key, str(parts))
    try:
        return _katz_loop_body(
            base, verts, alpha, parts, max_iterations, delta
        )
    finally:
        # restore SESSION-GLOBAL confs even when a mid-loop collect
        # dies (same discipline as the PageRank and HITS loops).
        if tuned:
            spark.conf.set(aqe_key, aqe_before)
            spark.conf.set(parts_key, parts_before)


def _katz_loop_body(
    base: DataFrame,
    verts: DataFrame,
    alpha: float,
    parts: int,
    max_iterations: int,
    delta: float,
) -> DataFrame:
    e = base.repartition(parts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    # try/finally: a mid-loop job failure must not leave the cached
    # edge layout and vertex relation pinned for the session lifetime
    # (same discipline as the HITS loop body).
    try:
        state = verts.select("node", F.lit(0.0).alias("katz"))
        # cadence 1 + a metric every round: the shared primitive's
        # lazy checkpoint materializes inside the L1 aggregation — the
        # loop never persists a generation, so the shared ``cached``
        # list stays empty and the sweep is a no-op (same plan as the
        # hand-written loop; graph/loop.py VertexLoop).
        loop = VertexLoop([], checkpoint_every=1)
        iteration = 0
        while iteration < max_iterations:
            iteration += 1
            raw = (
                e.join(
                    state.select(
                        F.col("node").alias("src"), "katz"
                    ).repartition(parts, "src"),
                    on="src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("katz").alias("__v"))
            )
            nxt = (
                state.select("node", F.col("katz").alias("__old"))
                .join(raw, on="node", how="left")
                .select(
                    "node",
                    "__old",
                    (
                        F.lit(1.0)
                        + F.lit(alpha)
                        * F.coalesce(F.col("__v"), F.lit(0.0))
                    ).alias("katz"),
                )
            )
            nxt, row = loop.advance(
                nxt,
                metrics={
                    "l1": F.sum(F.abs(F.col("katz") - F.col("__old")))
                },
            )
            state = nxt.select("node", "katz")
            if delta > 0 and (row["l1"] or 0.0) <= delta:
                break
        return materialize_or_release(
            state.persist(StorageLevel.MEMORY_AND_DISK)
        )
    finally:
        e.unpersist()
        verts.unpersist()
