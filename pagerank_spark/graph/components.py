"""Generic message-passing and connected components on edge DataFrames.

``aggregate_messages`` is the Pregel-style primitive the PageRank loop
specializes: attach vertex state to edge endpoints, send an expression
along each edge, aggregate at the destination. ``connected_components``
builds min-label propagation on top of it — the standard iterative
algorithm (converges in graph-diameter rounds), with the same
persist/checkpoint/one-job-per-iteration discipline as the PageRank loop
(``pagerank.py``), so it scales the same way: per round, one shuffle on
the message key plus one scalar convergence collect.
"""

from __future__ import annotations

from contextlib import contextmanager, nullcontext

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pagerank_spark.graph.loop import VertexLoop
from pagerank_spark.graph.pagerank import materialize_or_release, vertices

# Below this many edges a loop's per-iteration stages are sub-second:
# AQE's runtime replanning costs more than it saves (measured on the
# PageRank loop: 21.8s → 9.7s on WikiData with AQE off) and 32 reduce
# partitions put 32 near-empty tasks in every stage. Above it, AQE's
# skew-join splitting is worth the replanning and the session sizing
# stands.
SMALL_LOOP_EDGE_LIMIT = 64_000_000
LOOP_ROWS_PER_PARTITION = 2_000_000
LOOP_PARTS_FLOOR = 4

# Below this bound on the loop's STATE rows (vertex-table-sized; the
# wrappers bound it by the edge count they already compute), the
# per-round state joins broadcast instead of shuffling — the same cut
# the PageRank loop applies via broadcast_vertex_limit (~5M rows ≈
# 80 MB hashed). With AQE off inside the loop tuning, Catalyst has no
# runtime sizes for the derived per-round intermediates and would
# default the joins to sort-merge, shuffling the big edge side every
# round; the explicit hint keeps the only per-round exchange the
# message aggregation itself. Above the bound the hint is withheld
# and the joins shuffle — correct at cluster scale.
BROADCAST_STATE_ROW_LIMIT = 5_000_000

# connected_components auto mode: label-propagation round budget before
# falling back to star contraction. Real web/social graphs propagate
# min labels in well under 30 rounds (CC_PROBE.json: attachment-tree
# topology converges in ~log2 V ≈ 22 at 3M vertices); only
# pathological long-chain components exhaust this and trigger the
# diameter-independent fallback.
LABEL_FALLBACK_ROUNDS = 30


def _bc(df: DataFrame, broadcast_state: bool) -> DataFrame:
    return F.broadcast(df) if broadcast_state else df


@contextmanager
def _iterative_loop_conf(spark, approx_rows: int):
    """Size the shuffle to the loop's data and disable AQE for small
    iterative graph jobs; restore the session confs on exit. A no-op
    above ``SMALL_LOOP_EDGE_LIMIT`` rows. Session-global flips (like
    the PageRank loop's) — safe for a dedicated job session, not one
    shared with concurrent queries."""
    if approx_rows > SMALL_LOOP_EDGE_LIMIT:
        yield
        return
    aqe_key = "spark.sql.adaptive.enabled"
    parts_key = "spark.sql.shuffle.partitions"
    aqe_before = spark.conf.get(aqe_key)
    parts_before = spark.conf.get(parts_key)
    session_parts = int(parts_before)
    loop_parts = max(
        LOOP_PARTS_FLOOR,
        min(session_parts, -(-approx_rows // LOOP_ROWS_PER_PARTITION)),
    )
    spark.conf.set(aqe_key, "false")
    spark.conf.set(parts_key, str(loop_parts))
    try:
        yield
    finally:
        spark.conf.set(aqe_key, aqe_before)
        spark.conf.set(parts_key, parts_before)


def aggregate_messages(
    edges: DataFrame,
    vertex_state: DataFrame,
    msg: Column,
    agg: Column,
    broadcast_state: bool = False,
) -> DataFrame:
    """One message round: for each edge, evaluate ``msg`` over the edge
    row joined with the source's state (columns of ``vertex_state``
    except ``node``), then aggregate ``agg`` per destination.

    Returns (node, msg_agg) for destinations that received ≥1 message.
    ``broadcast_state`` pins the state side of the join as a broadcast
    (callers gate it on ``BROADCAST_STATE_ROW_LIMIT``); otherwise the
    join broadcasts or shuffles per Catalyst's choice. The aggregate
    partial-combines map-side either way.
    """
    src_state = vertex_state.select(
        F.col("node").alias("src"),
        *[c for c in vertex_state.columns if c != "node"],
    )
    return (
        edges.join(_bc(src_state, broadcast_state), on="src")
        .select(F.col("dst").alias("node"), msg.alias("__msg"))
        .groupBy("node")
        .agg(agg.alias("msg_agg"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count via the canonical two-join plan.

    Canonicalize to distinct undirected (src < dst) edges, then count
    paths src→mid→dst closed by a (src, dst) edge — each triangle
    (a<b<c) is counted exactly once. Both joins are equi-joins on node
    keys (shuffle or broadcast per Catalyst); no enumeration of
    wedges beyond the join itself. Returns one row: (n_triangles).
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        e1.join(e2, on="b")
        .join(e3, on=["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    tune: bool = True,
    algorithm: str = "auto",
) -> DataFrame:
    """Undirected connected components: (node, component) where
    ``component`` is the minimum node id in the node's component.

    Two algorithms, selected by ``algorithm``:

    - ``"label"`` — min-label propagation: each round every vertex
      takes the min of its own label and its neighbors' labels; stops
      when no label changes. Rounds scale with the label propagation
      DISTANCE (≈ how far each node is from its component's min-id
      node) — cheap fixed cost per round, ideal for small or
      low-diameter graphs; raises if ``max_iterations`` is exhausted
      before convergence.
    - ``"star"`` — alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond"): rounds are O(log²) in the component size REGARDLESS of
      diameter — the cluster-scale choice, and the only one that
      terminates usefully on long-path/chain components (near-dup
      chains produce exactly those).
    - ``"auto"`` — HYBRID, validated by ``CC_PROBE.json``: run label
      propagation with a bounded round budget
      (``min(LABEL_FALLBACK_ROUNDS, max_iterations)``) and fall back
      to star contraction on non-convergence. Measured at local[32]:
      label beats star on low-diameter graphs at BOTH probe sizes
      (1M edges: 7.7s vs 12.5s; 10M edges: 20.4s vs 34.9s — the old
      size-based cut wrongly picked star above 5M state rows), while
      on a 100k-diameter chain graph label cannot converge in any
      usable budget (~100k rounds needed) and star finishes in
      O(log²) rounds. Diameter is unknowable a priori, so the budget
      IS the detector: real web/social graphs propagate min labels in
      well under ``LABEL_FALLBACK_ROUNDS`` rounds; pathological
      long-chain components (e.g. near-dup pair chains) exhaust it
      and pay one label-budget's cost before the star restart.

    Small-graph loops run under ``_iterative_loop_conf`` (AQE off,
    right-sized shuffle) — the same measured tuning the PageRank loop
    applies; a no-op above ``SMALL_LOOP_EDGE_LIMIT`` edges. Pass
    ``tune=False`` (mirroring ``pagerank(tune_aqe=False)``) in sessions
    shared with concurrent queries: the tuning flips session-global
    confs for the duration of the loop.
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    spark = edges.sparkSession
    approx = 2 * edges.count()
    small = approx <= BROADCAST_STATE_ROW_LIMIT
    ctx = _iterative_loop_conf(spark, approx) if tune else nullcontext()
    with ctx:
        if algorithm == "auto":
            budget = min(LABEL_FALLBACK_ROUNDS, max_iterations)
            try:
                return _connected_components_impl(
                    edges, budget, checkpoint_every, broadcast_state=small
                )
            except RuntimeError:
                # label budget exhausted: high-diameter component —
                # restart with the diameter-independent contraction
                return _connected_components_star(
                    edges, max_iterations, broadcast_state=small
                )
        if algorithm == "star":
            return _connected_components_star(
                edges, max_iterations, broadcast_state=small
            )
        return _connected_components_impl(
            edges,
            max_iterations,
            checkpoint_every,
            broadcast_state=small,
        )


def _connected_components_star(
    edges: DataFrame,
    max_iterations: int,
    broadcast_state: bool = False,
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al.): contract the
    edge list toward a star forest where every node points at its
    component's minimum id. Diameter-independent — O(log²) rounds.

    Per round (two shuffle-bounded steps, no collect_list so hub
    neighborhoods never materialize in one task):

    - large-star: with the symmetric neighbor view, every neighbor
      LARGER than u repoints to ``m(u) = min(N(u) ∪ {u})``.
    - small-star: on the resulting (child > parent) list, every parent
      of u except the minimum repoints to that minimum, and u follows.

    Convergence: the small-star output is compared to the previous
    round's edge set with an anti join (exact, order-free); a stable
    set IS the star forest. Output matches the label algorithm exactly:
    (node, component) over the full vertex set, component = min id.
    """
    verts = vertices(edges).persist(StorageLevel.MEMORY_AND_DISK)
    # try/finally: a mid-round job failure must still release the
    # vertex cache (the loop-body split pagerank.py's HITS/Katz use).
    try:
        return _star_rounds(edges, verts, max_iterations, broadcast_state)
    finally:
        verts.unpersist()


def _star_rounds(
    edges: DataFrame,
    verts: DataFrame,
    max_iterations: int,
    broadcast_state: bool,
) -> DataFrame:
    cur = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        sym = cur.unionAll(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # m(u) = min over neighborhood incl. self.
        mn = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        big = (
            sym.where(F.col("dst") > F.col("src"))
            .join(_bc(mn, broadcast_state), on="src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star over the (child → smaller parent) list.
        pm = big.groupBy("src").agg(F.min("dst").alias("m"))
        small_edges = (
            big.join(_bc(pm, broadcast_state), on="src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionAll(
                pm.select(F.col("src"), F.col("m").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            small_edges.join(cur, on=["src", "dst"], how="left_anti")
            .unionAll(
                cur.join(small_edges, on=["src", "dst"], how="left_anti")
            )
            .limit(1)
            .count()
        )
        cur = small_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "star contraction did not converge within "
            f"max_iterations={max_iterations} — unexpected (rounds are "
            "O(log² component size)); raise max_iterations"
        )

    return materialize_or_release(
        verts.join(
            cur.select(F.col("src").alias("node"), F.col("dst").alias("__c")),
            on="node",
            how="left",
        )
        .select(
            "node", F.coalesce("__c", F.col("node")).alias("component")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _connected_components_impl(
    edges: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool = False,
) -> DataFrame:
    und = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    und = und.persist(StorageLevel.MEMORY_AND_DISK)
    # Shared-list + try/finally: the rounds body appends every persisted
    # state generation to ``cached`` (and clears it in place at each
    # checkpoint), so a mid-round job failure releases the edge cache
    # AND whatever generations were pinned when it died. unpersist on
    # an already-released frame is a no-op, so the sweep composes with
    # the body's own in-loop releases; the returned frame is never in
    # the list.
    cached: list[DataFrame] = []
    try:
        return _cc_rounds(
            und, edges, max_iterations, checkpoint_every,
            broadcast_state, cached,
        )
    finally:
        for df in cached:
            df.unpersist()
        und.unpersist()


def _cc_rounds(
    und: DataFrame,
    edges: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    cached: list,
) -> DataFrame:
    state = (
        vertices(edges)
        .withColumn("comp", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cached.append(state)

    loop = VertexLoop(cached, checkpoint_every=checkpoint_every)
    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        nbr_min = aggregate_messages(
            und,
            state,
            msg=F.col("comp"),
            agg=F.min("__msg"),
            broadcast_state=broadcast_state,
        )
        # NOTE on pointer jumping: measured twice, rejected twice.
        # (a) Small graphs (sf0.01): halves iterations (30 → 14) but
        # nearly triples per-iteration cost — net LOSS (18.5s → 26.5s).
        # (b) Long-diameter graphs: a post-round comp←comp[comp]
        # self-join on the lazily checkpointed state re-derives the
        # doubly-referenced chain (geometric blowup, 2.2s → 200s/round
        # by round 23), and the safe in-plan variant against the
        # PREVIOUS state only shortcuts by a constant factor — path
        # components still need ~diameter rounds. The principled
        # O(log²) alternative is large-star/small-star (Kiveris et
        # al.), a different loop body; until that's needed, the cap
        # below raises instead of silently returning non-converged
        # labels.
        new_state = (
            state.select("node", F.col("comp").alias("old_comp"))
            .join(_bc(nbr_min, broadcast_state), on="node", how="left")
            .select(
                "node",
                "old_comp",
                F.least(
                    F.col("old_comp"),
                    F.coalesce(F.col("msg_agg"), F.col("old_comp")),
                ).alias("comp"),
            )
        )
        # Lifecycle via the shared engine primitive (graph/loop.py
        # VertexLoop): lazy checkpoint on cadence materializing inside
        # the one convergence-check aggregation, persist generations
        # tracked before it, earlier generations swept after it.
        # sum() over an empty relation is NULL — treat as converged.
        new_state, row = loop.advance(
            new_state,
            metrics={
                "n": F.sum(
                    F.when(
                        F.col("comp") != F.col("old_comp"), 1
                    ).otherwise(0)
                )
            },
        )
        changed = row["n"] or 0

        state = new_state.select("node", "comp")
        if changed == 0:
            break
    else:
        # Exhausting the cap without a changed==0 round means the
        # labels are NOT components yet (min-label needs ~the distance
        # from each node to its component's min-id node — long path
        # components legitimately need thousands of rounds). Silently
        # returning partial labels corrupts every downstream dedup /
        # canonicalization decision, so fail loudly instead.
        raise RuntimeError(
            "connected_components did not converge within "
            f"max_iterations={max_iterations} (last round still "
            f"changed {changed} labels); raise max_iterations — "
            "propagation rounds scale with the graph's label "
            "propagation distance, not just its size"
        )

    return materialize_or_release(
        state.select("node", F.col("comp").alias("component")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_iterations: int = 30,
    checkpoint_every: int = 1,
    tune: bool = True,
) -> DataFrame:
    """Directed BFS hop distances from a source set: (node, dist) for
    every node reachable within ``max_iterations`` hops.

    Frontier-based message passing over ``aggregate_messages``: each
    round sends dist+1 along out-edges of the CURRENT frontier only
    (never the whole reached set), and an anti join keeps just the
    newly reached nodes — with unit edge weights a node's first
    discovery round IS its minimum distance, so no relaxation or
    re-visit is ever needed. Per round: one shuffle join on ``src``
    sized by the frontier, one partial-combined min-aggregation on
    ``dst``, one anti join against the reached set. The reached set's
    union lineage is checkpoint-truncated on the same cadence as the
    other iterative loops. Small graphs run under
    ``_iterative_loop_conf`` (AQE off, right-sized shuffle);
    ``tune=False`` opts out for shared sessions.
    """
    spark = edges.sparkSession
    ec = edges.count()
    ctx = _iterative_loop_conf(spark, ec) if tune else nullcontext()
    with ctx:
        return _shortest_paths_impl(
            edges,
            sources,
            max_iterations,
            checkpoint_every,
            broadcast_state=2 * ec <= BROADCAST_STATE_ROW_LIMIT,
        )


def _shortest_paths_impl(
    edges: DataFrame,
    sources: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool = False,
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # Shared lists + try/finally (the _connected_components_impl
    # discipline): a mid-round job failure releases the edge cache and
    # every frontier/state generation still pinned; on success the
    # sweep spares only the returned frame (which the non-checkpoint
    # branch does leave in ``cached``).
    cached: list[DataFrame] = []
    pending: list[DataFrame] = []
    out: DataFrame | None = None
    try:
        out = _sp_rounds(
            e, sources, max_iterations, checkpoint_every,
            broadcast_state, cached, pending,
        )
        return out
    finally:
        for df in pending:
            df.unpersist()
        for df in cached:
            if df is not out:
                df.unpersist()
        e.unpersist()


def _sp_rounds(
    e: DataFrame,
    sources: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    cached: list,
    pending: list,
) -> DataFrame:
    # The frontier variant of the shared loop (graph/loop.py
    # VertexLoop): ``track`` pins each generation BEFORE its
    # materializing count, and a lazily checkpointed ``reached``
    # materializes only in the NEXT round's anti-join — so on
    # checkpoint rounds the superseded generations move to the
    # DEFERRED list (defer_all_but) and are released one round late
    # (flush_deferred), never under a still-lazy checkpoint.
    loop = VertexLoop(
        cached, checkpoint_every=checkpoint_every, deferred=pending
    )
    frontier = loop.track(
        sources.select("node").distinct().withColumn("dist", F.lit(0))
    )
    reached = frontier

    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        msgs = aggregate_messages(
            e,
            frontier,
            msg=F.col("dist") + 1,
            agg=F.min("__msg"),
            broadcast_state=broadcast_state,
        )
        new_frontier = loop.track(
            msgs.join(
                _bc(reached, broadcast_state), on="node", how="left_anti"
            ).select("node", F.col("msg_agg").alias("dist"))
        )
        n_new = new_frontier.count()
        # The count's anti join scanned ``reached`` fully — any lazy
        # checkpoint from last round is now materialized; its upstream
        # caches are safe to drop (in place — the caller's finally
        # shares both lists).
        loop.flush_deferred()
        if n_new == 0:
            new_frontier.unpersist()
            break
        merged = reached.unionByName(new_frontier)
        if iteration % checkpoint_every == 0:
            reached = loop.truncate(merged)
            loop.defer_all_but(new_frontier)
        else:
            reached = loop.track(merged)
        frontier = new_frontier

    return materialize_or_release(
        reached.persist(StorageLevel.MEMORY_AND_DISK)
    )


def multi_source_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_iterations: int = 30,
    checkpoint_every: int = 1,
    tune: bool = True,
) -> DataFrame:
    """Labeled multi-source BFS: hop distances from EVERY seed
    independently — ``(seed, node, dist)`` for each (seed, node) pair
    reachable within ``max_iterations`` hops. The landmark primitive
    behind closeness/harmonic centrality and distance-sketch
    embeddings: one synchronized frontier loop answers all seeds at
    once instead of |seeds| sequential BFS runs.

    Same frontier discipline as ``shortest_paths`` with the state
    keyed by (seed, node): per round one join of the edge table
    against the current frontier, one partial-combined min-agg on
    (seed, dst), one anti join against the reached set; first
    discovery IS the minimum distance, so no relaxation. State size
    is |seeds| × reached-nodes — the broadcast-vs-shuffle cut
    accounts for the multiplier.
    """
    spark = edges.sparkSession
    ec = edges.count()
    n_seeds = max(1, seeds.select("node").distinct().count())
    ctx = _iterative_loop_conf(spark, ec) if tune else nullcontext()
    with ctx:
        return _multi_source_sp_impl(
            edges,
            seeds,
            max_iterations,
            checkpoint_every,
            broadcast_state=(
                2 * ec * n_seeds <= BROADCAST_STATE_ROW_LIMIT
            ),
        )


def _multi_source_sp_impl(
    edges: DataFrame,
    seeds: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool = False,
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # Shared lists + try/finally — see _shortest_paths_impl.
    cached: list[DataFrame] = []
    pending: list[DataFrame] = []
    out: DataFrame | None = None
    try:
        out = _multi_sp_rounds(
            e, seeds, max_iterations, checkpoint_every,
            broadcast_state, cached, pending,
        )
        return out
    finally:
        for df in pending:
            df.unpersist()
        for df in cached:
            if df is not out:
                df.unpersist()
        e.unpersist()


def _multi_sp_rounds(
    e: DataFrame,
    seeds: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    cached: list,
    pending: list,
) -> DataFrame:
    # (seed, node)-keyed frontier variant of the shared loop — same
    # track / defer-one-round-late lifecycle as _sp_rounds
    # (graph/loop.py VertexLoop).
    loop = VertexLoop(
        cached, checkpoint_every=checkpoint_every, deferred=pending
    )
    frontier = loop.track(
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"))
        .withColumn("dist", F.lit(0))
    )
    reached = frontier

    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        msgs = (
            e.join(
                _bc(
                    frontier.select(
                        F.col("node").alias("src"), "seed", "dist"
                    ),
                    broadcast_state,
                ),
                on="src",
            )
            .select(
                "seed",
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
        new_frontier = loop.track(
            msgs.join(
                _bc(reached.select("seed", "node"), broadcast_state),
                on=["seed", "node"],
                how="left_anti",
            )
        )
        n_new = new_frontier.count()
        loop.flush_deferred()
        if n_new == 0:
            new_frontier.unpersist()
            break
        merged = reached.unionByName(new_frontier)
        if iteration % checkpoint_every == 0:
            reached = loop.truncate(merged)
            loop.defer_all_but(new_frontier)
        else:
            reached = loop.track(merged)
        frontier = new_frontier

    return materialize_or_release(
        reached.persist(StorageLevel.MEMORY_AND_DISK)
    )


def harmonic_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    max_iterations: int = 30,
    tune: bool = True,
) -> DataFrame:
    """Out-harmonic centrality of each seed over the directed graph:
    ``C(s) = Σ_{v ≠ s reachable} 1 / d(s, v)`` — well-defined on
    disconnected graphs (unreachable nodes contribute 0, no infinite
    closeness denominators). Returns (seed, harmonic, n_reached),
    harmonic rounded to 9dp. Exact for the given seeds; run on a
    landmark sample for the standard approximate all-nodes variant.
    """
    d = multi_source_shortest_paths(
        edges, seeds, max_iterations=max_iterations, tune=tune
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 9).alias(
                "harmonic"
            ),
            F.count("*").alias("n_reached"),
        )
    )


def label_propagation(
    edges: DataFrame, n_iterations: int = 2, tune: bool = True
) -> DataFrame:
    """Synchronous label propagation (community detection): (node, label).

    Extension tier — the reference has no community detection; this is
    the standard GraphFrames-style LPA re-expressed with DataFrames.
    Each round every vertex adopts the MOST FREQUENT label among its
    undirected neighbors, ties broken by the smallest label; vertices
    with no neighbors (self-loop-only) keep their own. Synchronous
    fixed-iteration semantics make the result deterministic AND give the
    declared 2-round query an exact SQL twin (mode-by-count with the
    same tie break).

    Scale shape per round: one shuffle join (labels onto the symmetric
    adjacency), one partial-combined (node, label) count, one
    row_number window partitioned by node (bounded by each node's
    distinct neighbor-label count, never global). Lineage is truncated
    like the other iterative loops; the final labels are
    materialized (eager localCheckpoint) INSIDE the tuning context so
    the loop actually executes under the tuned confs. ``tune=False``
    opts out for shared sessions.
    """
    spark = edges.sparkSession
    approx = 2 * edges.count()
    ctx = _iterative_loop_conf(spark, approx) if tune else nullcontext()
    with ctx:
        return _label_propagation_impl(
            edges,
            n_iterations,
            broadcast_state=approx <= BROADCAST_STATE_ROW_LIMIT,
        )


def _label_propagation_impl(
    edges: DataFrame, n_iterations: int, broadcast_state: bool = False
) -> DataFrame:
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    adj = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # try/finally: the adjacency cache must not outlive a mid-round
    # failure. Labels themselves are only ever eagerly checkpointed
    # (never persisted), so the adjacency is the one pinned relation.
    try:
        return _label_prop_rounds(
            adj, edges, n_iterations, broadcast_state
        )
    finally:
        adj.unpersist()


def _label_prop_rounds(
    adj: DataFrame,
    edges: DataFrame,
    n_iterations: int,
    broadcast_state: bool,
) -> DataFrame:
    labels = vertices(edges).withColumn("label", F.col("node"))
    # Fixed-round variant of the shared loop: no per-round scalar, so
    # lineage truncation is EAGER on its cadence (graph/loop.py;
    # sweeping under a lazy checkpoint would recompute through
    # released caches — the invariant the primitive encodes).
    loop = VertexLoop([])
    for i in range(1, n_iterations + 1):
        counts = (
            adj.join(
                _bc(
                    labels.select(F.col("node").alias("src"), "label"),
                    broadcast_state,
                ),
                on="src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("n"))
        )
        # Mode with smallest-label tie break as a hash aggregation:
        # min of (-n, label) orders first by larger count then by
        # smaller label — negating the COUNT (always numeric) keeps the
        # label column untouched, so string node ids order correctly
        # too. A row_number window over the same (node) key would add a
        # full in-partition SORT after the shuffle; min_by keeps the
        # second stage a partial-combined hash agg.
        picked = counts.groupBy("node").agg(
            F.min_by(
                "label", F.struct((-F.col("n")).alias("nn"), F.col("label"))
            ).alias("new_label")
        )
        labels = (
            labels.select("node", "label")
            .join(_bc(picked, broadcast_state), on="node", how="left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
        if i % 3 == 0:
            labels = loop.truncate(labels, eager=True)
    # Materialize the final labels while still inside the caller's
    # tuning context — otherwise (e.g. the default n_iterations=2,
    # which never hits the i%3 checkpoint) the whole loop would plan
    # lazily and execute only after the confs were restored.
    if n_iterations % 3 != 0:
        labels = loop.truncate(labels, eager=True)
    return labels


def twohop_recommendations(edges: DataFrame, k: int = 20) -> DataFrame:
    """Friend-of-friend motif: per source, how many distinct two-hop
    targets are NOT already direct neighbors — the classic
    recommendation-candidate count. Returns the top-``k`` sources
    (ties by node asc): (node, n_recs).

    Plan shape: two equi-joins on node keys over the distinct edge set
    (a→b→c), a distinct on the (a, c) pair, one LEFT ANTI join to
    remove existing a→c edges, then a partial-combined count and
    TakeOrdered — no cartesian stage, no window over the full table.
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    hops = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(e.select(F.col("src").alias("b"), F.col("dst").alias("c")), on="b")
        .where(F.col("a") != F.col("c"))
        .select("a", "c")
        .distinct()
    )
    recs = hops.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        on=["a", "c"],
        how="left_anti",
    )
    return (
        recs.groupBy(F.col("a").alias("node"))
        .agg(F.count("*").alias("n_recs"))
        .orderBy(F.desc("n_recs"), F.asc("node"))
        .limit(k)
    )


def weighted_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "w",
    max_iterations: int = 20,
    checkpoint_every: int = 1,
    tune: bool = True,
) -> DataFrame:
    """Frontier Bellman-Ford: minimum-cost distances from a source set
    over positively weighted directed edges — (node, dist).

    After k rounds ``dist`` is exact over all paths of ≤ k edges, and
    the loop stops early once a round improves nothing, so with
    ``max_iterations ≥`` the shortest-path hop diameter the result is
    the true SSSP. Per round only the FRONTIER (nodes improved last
    round) relaxes its out-edges — a node whose distance is settled
    re-sends nothing (its edges were already relaxed with that value in
    the round it improved). Per round: one shuffle join on ``src``
    sized by the frontier, one partial-combined min-agg on ``dst``, one
    join against the distance table to keep strict improvements.
    Small graphs run under ``_iterative_loop_conf``; ``tune=False``
    opts out for shared sessions.
    """
    spark = edges.sparkSession
    ec = edges.count()
    ctx = _iterative_loop_conf(spark, ec) if tune else nullcontext()
    with ctx:
        return _weighted_shortest_paths_impl(
            edges,
            sources,
            weight_col,
            max_iterations,
            checkpoint_every,
            broadcast_state=2 * ec <= BROADCAST_STATE_ROW_LIMIT,
        )


def _weighted_shortest_paths_impl(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool = False,
) -> DataFrame:
    e = edges.select("src", "dst", F.col(weight_col).alias("__w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Shared lists + try/finally — see _shortest_paths_impl.
    cached: list[DataFrame] = []
    pending: list[DataFrame] = []
    out: DataFrame | None = None
    try:
        out = _weighted_sp_rounds(
            e, sources, max_iterations, checkpoint_every,
            broadcast_state, cached, pending,
        )
        return out
    finally:
        for df in pending:
            df.unpersist()
        for df in cached:
            if df is not out:
                df.unpersist()
        e.unpersist()


def _weighted_sp_rounds(
    e: DataFrame,
    sources: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    cached: list,
    pending: list,
) -> DataFrame:
    # See _sp_rounds: the frontier variant of the shared loop
    # (graph/loop.py VertexLoop) — a lazily checkpointed ``dist``
    # materializes in the NEXT round's improved-count join, so
    # superseded generations are deferred one round.
    loop = VertexLoop(
        cached, checkpoint_every=checkpoint_every, deferred=pending
    )
    dist = loop.track(
        sources.select("node").distinct().withColumn("dist", F.lit(0.0))
    )
    frontier = dist

    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        msgs = (
            e.join(
                _bc(
                    frontier.select(F.col("node").alias("src"), "dist"),
                    broadcast_state,
                ),
                on="src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("__w")).alias("cand"),
            )
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        improved = loop.track(
            msgs.join(_bc(dist, broadcast_state), on="node", how="left")
            .where(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("node", F.col("cand").alias("dist"))
        )
        n_improved = improved.count()
        # The count's left join scanned ``dist`` fully — last round's
        # lazy checkpoint is materialized; drop its deferred upstream
        # caches (in place — the caller's finally shares both lists).
        loop.flush_deferred()
        if n_improved == 0:
            improved.unpersist()
            break
        merged = (
            dist.join(
                improved.select("node", F.col("dist").alias("better")),
                on="node",
                how="full",
            )
            .select(
                "node",
                F.coalesce(F.col("better"), F.col("dist")).alias("dist"),
            )
        )
        if iteration % checkpoint_every == 0:
            dist = loop.truncate(merged)
            loop.defer_all_but(improved)
        else:
            dist = loop.track(merged)
        frontier = improved

    return materialize_or_release(
        dist.persist(StorageLevel.MEMORY_AND_DISK)
    )


def kcore_peel(
    edges: DataFrame, k: int = 3, rounds: int = 3
) -> DataFrame:
    """Bounded k-core peeling: iteratively drop vertices of undirected
    degree < k (and their edges) for ``rounds`` rounds; returns the
    surviving (node, deg) table.

    Extension tier (no reference analogue). Fixed-round peeling keeps
    the result deterministic and gives the declared query an exact
    unrolled-CTE SQL twin; full k-core = run until no node is dropped
    (at 100 TB each round is one partial-combined degree count plus two
    broadcast-or-shuffle semi joins — the surviving-node set shrinks
    monotonically, so later rounds are cheap).
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    e = und
    deg = None
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("a")), on="a", how="left_semi")
            .join(keep.select(F.col("node").alias("b")), on="b", how="left_semi")
        )
    out = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return out


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity: Pearson correlation between the undirected
    degrees of the two endpoints across distinct non-loop edges — one
    scalar row summarizing hub-to-hub vs hub-to-leaf wiring.

    Two shuffles total: the degree count, then the edge-endpoint joins
    (broadcastable when the vertex set is small relative to edges);
    ``corr`` is a single-pass mergeable moment aggregate.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
        und.join(da, on="a").join(db, on="b")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.round(F.corr("deg_a", "deg_b"), 6).alias("assortativity"),
        )
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient on the distinct undirected
    graph: triangles_at(v) / C(deg(v), 2); nodes with deg < 2 get 0.

    The triangle enumeration reuses the canonical two-join plan of
    ``triangle_count`` (each triangle found once as a<b<c), then each
    triangle credits its three corners — an explode + count, never a
    per-node neighborhood materialization.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        und.join(e2, on="b")
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    out = (
        deg.join(corner, on="node", how="left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.coalesce("n_tri", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1) / 2.0),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("clustering"),
        )
    )
    return out


def adamic_adar(
    edges: DataFrame, k: int = 50, max_degree: int = 64
) -> DataFrame:
    """Adamic-Adar link prediction on the distinct undirected graph:
    for each NON-adjacent pair (u < v), ``score = Σ_{w ∈ N(u)∩N(v)}
    1/ln(deg(w))``; returns the top-``k`` candidate links
    ``(u, v, score, n_common)`` by (score desc, u asc, v asc), score
    rounded to 6dp so the ranking is engine-reproducible.

    Scale shape: common-neighbor pairs are enumerated THROUGH each
    shared neighbor ``w`` (self-join of the neighbor relation on
    ``w``), so per-``w`` cost is deg(w)² — shared neighbors above
    ``max_degree`` are excluded, the standard hub cap in link
    prediction (a million-degree hub generates 10¹² pairs while
    contributing weight 1/ln(10⁶) ≈ 0.07; the cap bounds the join
    quadratically while discarding near-zero signal). Degrees in the
    WEIGHT use the true uncapped degree. The adjacency exclusion is a
    left-anti join; top-k is TakeOrdered, never a global sort.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    nbr = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    deg = nbr.groupBy("node").agg(F.count("*").alias("deg"))
    wn = (
        nbr.join(deg, on="node")
        .where((F.col("deg") >= 2) & (F.col("deg") <= max_degree))
        .select(
            F.col("node").alias("w"),
            F.col("nbr").alias("n"),
            (F.lit(1.0) / F.log(F.col("deg"))).alias("wt"),
        )
    )
    left = wn.select("w", F.col("n").alias("u"), "wt")
    right = wn.select("w", F.col("n").alias("v"))
    pairs = left.join(right, on="w").where(F.col("u") < F.col("v"))
    sc = pairs.groupBy("u", "v").agg(
        F.round(F.sum("wt"), 6).alias("score"),
        F.count("*").alias("n_common"),
    )
    nonadj = sc.join(
        und,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        how="left_anti",
    )
    return nonadj.orderBy(
        F.desc("score"), F.asc("u"), F.asc("v")
    ).limit(k)


def _min_label_fixpoint(
    edges: DataFrame,
    nodes: DataFrame,
    max_iterations: int,
    checkpoint_every: int = 1,
    broadcast_state: bool = False,
) -> DataFrame:
    """Directed min-label propagation to fixpoint: for each node, the
    minimum node id among its ancestors (nodes that can reach it,
    itself included). Labels flow ALONG edge direction (src → dst)."""
    # Shared list + try/finally — see _connected_components_impl. The
    # returned frame is an eager checkpoint, never in the list.
    cached: list[DataFrame] = []
    try:
        return _min_label_rounds(
            edges, nodes, max_iterations, checkpoint_every,
            broadcast_state, cached,
        )
    finally:
        for df in cached:
            df.unpersist()


def _min_label_rounds(
    edges: DataFrame,
    nodes: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    cached: list,
) -> DataFrame:
    state = nodes.withColumn("lab", F.col("node")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cached.append(state)
    # Same shared-lifecycle shape as _cc_rounds (graph/loop.py
    # VertexLoop): lazy checkpoint on cadence inside the one
    # convergence aggregation, tracked persists swept after it.
    loop = VertexLoop(cached, checkpoint_every=checkpoint_every)
    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        nbr = aggregate_messages(
            edges, state.select("node", "lab"), msg=F.col("lab"),
            agg=F.min("__msg"), broadcast_state=broadcast_state,
        )
        new_state = (
            state.select("node", F.col("lab").alias("old"))
            .join(_bc(nbr, broadcast_state), on="node", how="left")
            .select(
                "node",
                "old",
                F.least(
                    F.col("old"), F.coalesce("msg_agg", F.col("old"))
                ).alias("lab"),
            )
        )
        new_state, row = loop.advance(
            new_state,
            metrics={
                "n": F.sum(
                    F.when(F.col("lab") != F.col("old"), 1).otherwise(0)
                )
            },
        )
        changed = row["n"] or 0
        state = new_state.select("node", "lab")
        if changed == 0:
            break
    else:
        # SCC correctness REQUIRES the fixpoint: with partial labels,
        # F(v) == B(v) can coincide spuriously and settle nodes into
        # the wrong SCC. Fail loudly like connected_components.
        raise RuntimeError(
            "min-label propagation did not reach its fixpoint within "
            f"max_iterations={max_iterations} (last round changed "
            f"{changed} labels); raise max_label_iterations"
        )
    out = state.select("node", "lab")
    if hasattr(out, "localCheckpoint"):
        out = out.localCheckpoint(eager=True)
    return out


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 60,
    max_label_iterations: int = 30,
    tune: bool = True,
) -> DataFrame:
    """Strongly connected components by forward/backward min-pivot
    peeling: (node, component) with component = min node id in the SCC.

    Per outer round, over the residual graph: F(v) = min ancestor id
    (min-label propagation along edges), B(v) = min descendant id
    (along reversed edges). F(v) == B(v) == L means v and L reach each
    other, so every such v settles into SCC L — all local min-pivots
    settle concurrently, and the global min always does, so each round
    strictly shrinks the residual. Standard FW-BW-style decomposition
    (Fleischer et al.'s divide-and-conquer reachability idea) driven by
    label propagation instead of recursion — every step is a shuffle
    join + partial-agg, nothing driver-side but the scalar change
    counts. ``tune=False`` opts out of the session-conf tuning for
    shared sessions.
    """
    spark = edges.sparkSession
    ec = edges.count()
    ctx = _iterative_loop_conf(spark, ec) if tune else nullcontext()
    with ctx:
        return _scc_impl(
            edges,
            max_rounds,
            max_label_iterations,
            broadcast_state=2 * ec <= BROADCAST_STATE_ROW_LIMIT,
        )


def _scc_impl(
    edges: DataFrame,
    max_rounds: int,
    max_label_iterations: int,
    broadcast_state: bool = False,
) -> DataFrame:
    residual_edges = edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    residual_nodes = vertices(residual_edges)
    settled: DataFrame | None = None

    # try/finally around the peel loop: `residual_edges` is re-pinned
    # each round (the finally sees the CURRENT binding), so a failed
    # round — including one inside _min_label_fixpoint — releases the
    # live residual cache instead of pinning it for the session.
    try:
        for _ in range(max_rounds):
            if residual_nodes.isEmpty():
                break
            fwd = _min_label_fixpoint(
                residual_edges,
                residual_nodes,
                max_label_iterations,
                broadcast_state=broadcast_state,
            ).withColumnRenamed("lab", "f")
            bwd = _min_label_fixpoint(
                residual_edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
                residual_nodes,
                max_label_iterations,
                broadcast_state=broadcast_state,
            ).withColumnRenamed("lab", "b")
            both = fwd.join(bwd, on="node")
            done = (
                both.where(F.col("f") == F.col("b"))
                .select("node", F.col("f").alias("component"))
                .localCheckpoint(eager=True)
            )
            settled = (
                done if settled is None else settled.unionByName(done)
            )
            residual_nodes = (
                both.where(F.col("f") != F.col("b"))
                .select("node")
                .localCheckpoint(eager=True)
            )
            keep_src = _bc(
                residual_nodes.select(F.col("node").alias("src")),
                broadcast_state,
            )
            keep_dst = _bc(
                residual_nodes.select(F.col("node").alias("dst")),
                broadcast_state,
            )
            new_edges = (
                residual_edges.join(keep_src, on="src", how="left_semi")
                .join(keep_dst, on="dst", how="left_semi")
                .localCheckpoint(eager=True)
            )
            residual_edges.unpersist()
            residual_edges = new_edges.persist(
                StorageLevel.MEMORY_AND_DISK
            )
    finally:
        residual_edges.unpersist()
    if not residual_nodes.isEmpty():
        raise RuntimeError(
            "SCC peeling did not converge within max_rounds="
            f"{max_rounds}; raise max_rounds (each round settles every "
            "current min-pivot SCC, so adversarial id orderings can need "
            "up to #SCC rounds)"
        )
    return settled


def maximal_independent_set(
    edges: DataFrame, rounds: int = 3
) -> DataFrame:
    """Deterministic Luby-style maximal independent set — the classic
    symmetry-breaking primitive behind distributed coloring /
    scheduling (Luby 1986), with the random priorities replaced by a
    portable hash so every engine (and the q169 DuckDB twin) selects
    the same set. Returns ``(node, status)`` over the undirected
    closure of ``edges`` with status ``in_set`` / ``dominated`` /
    ``undecided`` (nodes still alive after ``rounds``).

    Per round over the ALIVE subgraph: a node joins the set iff its
    ``hash60(node || '#' || round)`` priority is strictly smaller
    than every alive neighbor's (ties by node id — priorities need
    not be unique); its neighbors become dominated. Each round is one
    join + one min-aggregation on the live edge relation — frontier
    work shrinks geometrically, the standard O(log n)-round shape.
    """
    from pagerank_spark.functions import portable_hash60

    if rounds < 1:
        raise ValueError(
            f"maximal_independent_set: rounds must be >= 1, got {rounds}"
        )
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    live_edges = und
    # alive nodes tracked EXPLICITLY: a node whose neighbors all died
    # in earlier rounds has no live edges left but must still be able
    # to join the set (min_np comes back NULL -> automatic winner)
    live_nodes = nodes
    decided = None  # (node, status)
    for r in range(1, rounds + 1):
        # fixed-width string priority: 16-hex-digit hash || 8-digit id
        # — lexicographic order == numeric order, and a plain MIN over
        # strings is portable to any engine (no struct-min needed)
        pri = lambda c: F.concat(  # noqa: E731
            F.lpad(
                F.hex(
                    portable_hash60(
                        F.concat(F.col(c).cast("string"), F.lit(f"#m{r}"))
                    )
                ),
                16,
                "0",
            ),
            F.lpad(F.col(c).cast("string"), 8, "0"),
        )
        nbr_min = (
            live_edges.select(
                F.col("src").alias("node"), pri("dst").alias("np")
            )
            .groupBy("node")
            .agg(F.min("np").alias("min_np"))
        )
        winners = (
            live_nodes.join(nbr_min, on="node", how="left")
            .where(
                F.col("min_np").isNull()
                | (pri("node") < F.col("min_np"))
            )
            .select("node")
        )
        dominated = (
            live_edges.join(
                winners.select(F.col("node").alias("src")), on="src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(winners, on="node", how="left_anti")
        )
        new_decided = winners.select(
            "node", F.lit("in_set").alias("status")
        ).unionAll(
            dominated.select("node", F.lit("dominated").alias("status"))
        )
        decided = (
            new_decided
            if decided is None
            else decided.unionAll(new_decided)
        )
        gone = winners.unionAll(dominated.select("node"))
        live_edges = (
            live_edges.join(
                gone.select(F.col("node").alias("src")), on="src", how="left_anti"
            )
            .join(
                gone.select(F.col("node").alias("dst")), on="dst", how="left_anti"
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        live_nodes = live_nodes.join(
            gone, on="node", how="left_anti"
        ).localCheckpoint(eager=False)
    undecided = (
        nodes.join(decided.select("node"), on="node", how="left_anti")
        .select("node", F.lit("undecided").alias("status"))
    )
    return decided.unionAll(undecided)


def ktruss(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 2,
) -> DataFrame:
    """k-truss edge peeling, ``rounds`` FIXED iterations (the SURVEY
    §5.3 determinism rule — an exact SQL twin can unroll fixed
    rounds; pass more rounds for a tighter fixpoint). Each round
    computes per-edge triangle support on the surviving subgraph via
    the canonical two-join wedge closure (``triangle_count``'s plan,
    kept per-edge instead of globally summed) and drops edges with
    support < k-2. Returns the surviving canonical undirected edges
    ``(src, dst, support)`` with the LAST round's support.

    The community-core primitive one notch stronger than k-core:
    every surviving edge participates in ≥ k-2 triangles among
    survivors. Scale shape: per round three equi-joins on node keys +
    one partial-combined count per edge — no wedge materialization
    beyond the joins, no windows; edge relation shrinks monotonically
    so later rounds are cheaper. Support counting mirrors the
    triangle plan: each triangle (a<b<c) contributes to all three of
    its edges via a union of the three role projections.
    """
    if k < 2:
        raise ValueError(f"ktruss: k must be >= 2, got {k}")
    if rounds < 1:
        raise ValueError(f"ktruss: rounds must be >= 1, got {rounds}")
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    surv = und
    out = None
    for r in range(rounds):
        e1 = surv.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = surv.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        e3 = surv.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tri = e1.join(e2, on="b").join(e3, on=["a", "c"])
        # each triangle supports its three edges
        sup = (
            tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(
                tri.select(F.col("b").alias("src"), F.col("c").alias("dst"))
            )
            .unionAll(
                tri.select(F.col("a").alias("src"), F.col("c").alias("dst"))
            )
            .groupBy("src", "dst")
            .agg(F.count("*").alias("support"))
        )
        out = (
            surv.join(sup, on=["src", "dst"], how="left")
            .select(
                "src",
                "dst",
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            )
            .where(F.col("support") >= k - 2)
        )
        if r < rounds - 1:
            # lazy lineage cut, the graph-loop discipline: the next
            # round re-reads the survivor relation twice per join leg
            out = out.localCheckpoint(eager=False)
        surv = out.select("src", "dst")
    return out


def betweenness_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    max_iterations: int = 30,
    checkpoint_every: int = 1,
    tune: bool = True,
    scaled: bool = True,
) -> DataFrame:
    """Approximate betweenness centrality: sampled Brandes over the
    multi-source frontier machinery (the classic centrality missing
    beside PageRank/HITS/Katz/harmonic). ``seeds`` holds the pivot
    set — deterministic hash-chosen in the callers, or the full vertex
    set for exact betweenness. Returns ``(node, betweenness)`` for
    every node with a nonzero dependency accumulation; with
    ``scaled=True`` each sum is multiplied by the Brandes–Pich
    estimator factor |V| / |pivots| (exact betweenness when the pivot
    set IS the vertex set, since the factor is then 1).

    Semantics are hop-bounded: shortest paths longer than
    ``max_iterations`` hops are not explored, on BOTH phases — the
    same truncation every BFS-based loop here applies, and the one an
    unrolled SQL twin can mirror exactly.

    Two phases, both synchronized (seed, node)-keyed loops:

    - **forward** — the ``multi_source_shortest_paths`` frontier loop
      extended with path counting: a node discovered in round d has
      ALL its shortest-path predecessors in round d-1's frontier, so
      ``sigma(s, v) = Σ sigma(s, u)`` over frontier in-neighbors is
      one extra SUM riding the existing per-round aggregation — no
      extra shuffle.
    - **backward** — level-synchronous dependency accumulation, from
      the deepest observed level down: for v at level d-1,
      ``delta(s,v) = Σ_w sigma_v/sigma_w · (1 + delta(s,w))`` over
      out-edges v→w landing exactly one level deeper (the shortest-
      path DAG edges — enforced by the inner join against level d-1,
      never materialized as a DAG). Per level: one join of the edge
      table against the (level-filtered, broadcast-gated) successor
      deltas, one partial-combined SUM. Each level's delta relation
      is lazily checkpointed and materialized by its own count — the
      VertexLoop cadence-1 shape — so lineage never compounds across
      levels.

    Scale shape: state is |pivots| × reached-nodes rows, same as the
    landmark BFS (the broadcast-vs-shuffle cut accounts for the
    multiplier); pivot sampling is exactly what bounds it at 100 TB.
    No global windows, no collects beyond one scalar per round plus
    the max-depth scalar between phases.
    """
    spark = edges.sparkSession
    ec = edges.count()
    n_seeds = max(1, seeds.select("node").distinct().count())
    ctx = _iterative_loop_conf(spark, ec) if tune else nullcontext()
    with ctx:
        return _betweenness_impl(
            edges,
            seeds,
            max_iterations,
            checkpoint_every,
            broadcast_state=(2 * ec * n_seeds <= BROADCAST_STATE_ROW_LIMIT),
            n_seeds=n_seeds,
            scaled=scaled,
        )


def _betweenness_impl(
    edges: DataFrame,
    seeds: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    n_seeds: int,
    scaled: bool,
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # Shared lists + try/finally — the _shortest_paths_impl discipline.
    cached: list[DataFrame] = []
    pending: list[DataFrame] = []
    out: DataFrame | None = None
    try:
        out = _betweenness_rounds(
            e, seeds, max_iterations, checkpoint_every,
            broadcast_state, n_seeds, scaled, cached, pending,
        )
        return out
    finally:
        for df in pending:
            df.unpersist()
        for df in cached:
            if df is not out:
                df.unpersist()
        e.unpersist()


def _betweenness_rounds(
    e: DataFrame,
    seeds: DataFrame,
    max_iterations: int,
    checkpoint_every: int,
    broadcast_state: bool,
    n_seeds: int,
    scaled: bool,
    cached: list,
    pending: list,
) -> DataFrame:
    # ---- forward: sigma-carrying multi-source BFS -------------------
    loop = VertexLoop(
        cached, checkpoint_every=checkpoint_every, deferred=pending
    )
    frontier = loop.track(
        seeds.select(F.col("node").alias("seed"))
        .distinct()
        .select(
            "seed",
            F.col("seed").alias("node"),
            F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
    )
    reached = frontier

    iteration = 0
    while iteration < max_iterations:
        iteration += 1
        msgs = (
            e.join(
                _bc(
                    frontier.select(
                        F.col("node").alias("src"), "seed", "dist", "sigma"
                    ),
                    broadcast_state,
                ),
                on="src",
            )
            .select(
                "seed",
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
                "sigma",
            )
            # every shortest-path predecessor of a round-d node sits in
            # round d-1's frontier, so this SUM is the full sigma
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"), F.sum("sigma").alias("sigma"))
        )
        new_frontier = loop.track(
            msgs.join(
                _bc(reached.select("seed", "node"), broadcast_state),
                on=["seed", "node"],
                how="left_anti",
            )
        )
        n_new = new_frontier.count()
        loop.flush_deferred()
        if n_new == 0:
            new_frontier.unpersist()
            break
        merged = reached.unionByName(new_frontier)
        if iteration % checkpoint_every == 0:
            reached = loop.truncate(merged)
            loop.defer_all_but(new_frontier)
        else:
            reached = loop.track(merged)
        frontier = new_frontier

    reached = materialize_or_release(
        reached.persist(StorageLevel.MEMORY_AND_DISK)
    )
    cached.append(reached)

    # one scalar between phases: the deepest observed level (the
    # Brandes–Pich factor below wants |V| over ALL graph vertices, not
    # the reached count, so nothing else is needed here — r11 ADVICE
    # dropped a dead countDistinct from this collect)
    row = reached.agg(F.max("dist").alias("maxd")).collect()[0]
    max_dist = row["maxd"] if row["maxd"] is not None else 0

    if scaled:
        # Brandes–Pich estimator over |V| (all graph vertices, not just
        # reached ones — matches the exact-betweenness limit)
        n_vertices = vertices(e).count()
        factor = n_vertices / n_seeds
    else:
        factor = 1.0

    # ---- backward: level-synchronous dependency accumulation --------
    # cadence-1 sub-loop on its OWN generation list: every level's
    # delta is a lazy localCheckpoint materialized by its count, so
    # the accumulated union reads only checkpointed pieces — and the
    # sub-loop's sweep can never release ``reached`` (still needed for
    # the remaining levels) out of the caller's shared list.
    back = VertexLoop([], checkpoint_every=1)
    spark = e.sparkSession
    acc: list[DataFrame] = []
    delta_prev: DataFrame | None = None
    for d in range(max_dist, 0, -1):
        w = reached.where(F.col("dist") == d).select(
            "seed", F.col("node").alias("dst"), F.col("sigma").alias("sigma_w")
        )
        if delta_prev is not None:
            w = w.join(
                _bc(
                    delta_prev.select(
                        "seed", F.col("node").alias("dst"),
                        F.col("delta").alias("delta_w"),
                    ),
                    broadcast_state,
                ),
                on=["seed", "dst"],
                how="left",
            ).fillna(0.0, subset=["delta_w"])
        else:
            w = w.withColumn("delta_w", F.lit(0.0))
        v = reached.where(F.col("dist") == d - 1).select(
            "seed", "node", F.col("sigma").alias("sigma_v")
        )
        contrib = (
            e.join(_bc(w, broadcast_state), on="dst")
            .select(
                "seed",
                F.col("src").alias("node"),
                ((1.0 + F.col("delta_w")) / F.col("sigma_w")).alias("ratio"),
            )
            # inner join against level d-1 keeps only shortest-path DAG
            # edges and attaches the predecessor's sigma
            .join(_bc(v, broadcast_state), on=["seed", "node"])
            .groupBy("seed", "node")
            .agg(F.sum(F.col("sigma_v") * F.col("ratio")).alias("delta"))
        )
        contrib, _ = back.advance(contrib, metrics={"n": F.count("*")})
        acc.append(contrib)
        delta_prev = contrib

    if not acc:
        return spark.createDataFrame([], "node BIGINT, betweenness DOUBLE")

    alldelta = acc[0]
    for piece in acc[1:]:
        alldelta = alldelta.unionByName(piece)
    result = (
        alldelta.where(F.col("node") != F.col("seed"))
        .groupBy("node")
        .agg((F.sum("delta") * F.lit(factor)).alias("betweenness"))
    )
    # Eagerly checkpoint the final (node-bounded) relation so it no
    # longer reads through the per-level delta checkpoints, then destroy
    # those blocks deterministically — previously all max_dist levels
    # lingered until ContextCleaner GC (r11 ADVICE). Safe only in this
    # order: the eager materialization completes before any block it
    # read from is released.
    result = result.localCheckpoint(eager=True)
    for piece in acc:
        piece.unpersist()
    return result
