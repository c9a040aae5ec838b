"""Distributed truncated SVD of the PPMI co-occurrence matrix — the
step that turns the walk→skipgram→PPMI training-data pipeline
(q159/q160/q161) into actual node EMBEDDINGS. Levy & Goldberg 2014
showed skip-gram with negative sampling implicitly factorizes the
(shifted) PPMI matrix; the classic count-based alternative is to
factorize it explicitly with a truncated SVD and take ``U·Σ^½`` as
the embedding. The reference corpus emits walk training data but
never trains on it (SURVEY §7.4's similarity-search north star);
this closes that gap with a deterministic, engine-reproducible
factorization.

Algorithm: sequential power iteration with PROJECTION DEFLATION on
the Gram matrix ``G = MᵀM`` of the sparse PPMI relation ``M`` (rows =
centers, columns = contexts):

* each matvec ``G·v`` is computed as ``Mᵀ(M·v)`` — two equi-joins
  against the sparse (row, col, w) relation plus two partial-combined
  aggregations; ``G`` itself is NEVER materialized (vocab² dense in
  the worst case),
* component c > 0 orthogonalizes every iterate against the already-
  found vectors (``y ← y − Σₖ (vₖ·y) vₖ`` — per previous component
  one scalar dot and one vocabulary-sized join, never a dense outer
  product), i.e. power iteration on ``(I − VVᵀ)G``, whose top
  eigenvector is the (c+1)-th of ``G``. Projection deflation keeps
  EIGENVALUE-SCALE floats out of the loop — every subtraction is in
  units of the current iterate, and the subsequent normalize+round
  step absorbs cross-engine reduction-order drift BEFORE it can
  compound (Hotelling deflation would thread λₖ ≈ O(‖G‖) scalars
  through the arithmetic, where a 9-decimal round can no longer
  absorb a 1e-15 relative drift),
* every singular vector lives as a DISTRIBUTED (node, x) relation;
  only r eigenvalue scalars ever reach the driver — node-count-sized
  state never leaves the cluster (unlike the logreg trainer's
  dim-sized weights, the vocabulary here is corpus-scale).

Determinism (the oracle-twin contract, q259): fixed iteration count,
the deterministic ``1/√|V|`` all-ones start, input weights rounded to
9 decimals, every normalized vector re-rounded to 9 decimals ENGINE-
SIDE (``F.round`` ↔ ``ROUND``) so cross-engine ulps are absorbed at
each step instead of compounding. Eigenvalues are collected unrounded
and only ever re-enter as the λ^(−¼) embedding scale, where relative
drift ~1e-15 is invisible at the queries' 6-decimal output rounding.
An unrolled DuckDB CTE chain reproduces the exact trajectory.

Scale shape: the aggregated PPMI relation is bounded by the number of
DISTINCT co-occurring pairs (≤ vocab², typically ≪), independent of
how many raw walk windows produced it — so doubling the walk corpus
does not grow the per-step join inputs (SVD_PROBE.json measures
this). Per component per iteration: two shuffles of at most
nnz(M)-many rows plus c vocabulary-sized projection joins; iterates
are eagerly localCheckpoint-ed each step (the VertexLoop discipline)
so neither lineage nor analyzer cost ever compounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["svd_topk", "ppmi_svd_embeddings", "embedding_vectors"]


def svd_topk(
    matrix: DataFrame,
    rank: int = 3,
    iterations: int = 2,
    *,
    row_col: str = "center",
    col_col: str = "context",
    value_col: str = "ppmi",
    round_dp: int = 9,
) -> tuple[DataFrame, list[float]]:
    """Top-``rank`` right singular vectors of the sparse ``matrix``
    relation by projection-deflated power iteration on ``MᵀM``.

    Returns ``(v, lams)``: ``v`` is a persisted ``(node, component,
    x)`` relation (component ∈ [0, rank), vectors unit-norm rounded to
    ``round_dp``), ``lams`` the eigenvalue estimates of ``MᵀM``
    (= squared singular values, unrounded driver floats). Caller owns
    the returned DataFrame's unpersist.

    Only ``rank`` scalars are collected; all vectors stay distributed.
    """
    if rank < 1:
        raise ValueError(f"svd_topk: rank must be >= 1, got {rank}")
    if iterations < 1:
        raise ValueError(
            f"svd_topk: iterations must be >= 1, got {iterations}"
        )
    m = (
        matrix.select(
            F.col(row_col).alias("r"),
            F.col(col_col).alias("c"),
            F.round(F.col(value_col).cast("double"), round_dp).alias("w"),
        )
        .where(F.col("w") > 0)
        .persist()
    )

    def big_matvec(v: DataFrame) -> DataFrame:
        """y = Mᵀ(M v): two sparse joins, two partial-combined aggs."""
        t = (
            m.join(v.select(F.col("node").alias("c"), "x"), on="c")
            .groupBy("r")
            .agg(F.sum(F.col("w") * F.col("x")).alias("t"))
        )
        return (
            m.join(t, on="r")
            .groupBy("c")
            .agg(F.sum(F.col("w") * F.col("t")).alias("y"))
            .select(F.col("c").alias("node"), "y")
        )

    comps: list[tuple[DataFrame, float]] = []
    try:
        m.count()  # materialize the pin before the loop reuses it
        nctx = m.select("c").distinct().count()
        if nctx == 0:
            raise ValueError("svd_topk: matrix has no positive entries")
        init = 1.0 / math.sqrt(float(nctx))
        for comp in range(rank):
            v = m.select(F.col("c").alias("node")).distinct().select(
                "node", F.lit(init).alias("x")
            )
            for _ in range(iterations):
                y = big_matvec(v)
                # project out the found subspace: y −= (vₖ·y) vₖ —
                # one scalar relation + one node-sized join per k
                for vk, _lam in comps:
                    sk = y.join(
                        vk.select("node", F.col("x").alias("xk")),
                        on="node",
                    ).agg(F.sum(F.col("y") * F.col("xk")).alias("s"))
                    y = (
                        y.join(
                            vk.select("node", F.col("x").alias("xk")),
                            on="node",
                        )
                        .crossJoin(F.broadcast(sk))
                        .select(
                            "node",
                            (
                                F.col("y") - F.col("s") * F.col("xk")
                            ).alias("y"),
                        )
                    )
                norm = y.agg(
                    F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("n")
                )
                # EAGER localCheckpoint, not persist: the iterate is
                # re-referenced by every later step AND every later
                # component's projection, so a growing logical plan
                # would cost the analyzer exponentially (each step
                # references y twice — norm + quotient). Checkpoint
                # truncates the plan to a LogicalRDD; blocks are
                # released by the context cleaner when the refs drop
                # (the VertexLoop discipline, graph/loop.py).
                v = (
                    y.crossJoin(F.broadcast(norm))
                    .select(
                        "node",
                        F.round(
                            F.when(
                                F.col("n") > 0, F.col("y") / F.col("n")
                            ).otherwise(F.lit(0.0)),
                            round_dp,
                        ).alias("x"),
                    )
                    .localCheckpoint(eager=True)
                )
            # Rayleigh quotient with the FINAL v (already ⊥ previous
            # components): λ = v·Gv = ‖Mv‖² — one scalar collect
            t = (
                m.join(v.select(F.col("node").alias("c"), "x"), on="c")
                .groupBy("r")
                .agg(F.sum(F.col("w") * F.col("x")).alias("t"))
            )
            lam = float(
                t.agg(F.sum(F.col("t") * F.col("t"))).collect()[0][0]
                or 0.0
            )
            comps.append((v, lam))
        out = None
        for ci, (vk, _lam) in enumerate(comps):
            part = vk.select(
                "node", F.lit(ci).cast("int").alias("component"), "x"
            )
            out = part if out is None else out.unionByName(part)
        out = out.persist()
        out.count()
        return out, [lam for _, lam in comps]
    finally:
        m.unpersist()


def ppmi_svd_embeddings(
    ppmi: DataFrame,
    rank: int = 3,
    iterations: int = 2,
    *,
    row_col: str = "center",
    col_col: str = "context",
    value_col: str = "ppmi",
    round_dp: int = 9,
) -> DataFrame:
    """Train node embeddings from a PPMI relation: factorize with
    :func:`svd_topk`, then emit the Levy–Goldberg ``U·Σ^½`` rows as a
    long-form ``(node, dim, value)`` relation::

        value[node, k] = (M vₖ)[node] · λₖ^(−¼)    (λₖ = σₖ², so this
                         is uₖ σₖ^½ — the PPMI-SVD embedding of choice)

    Components with a non-positive eigenvalue estimate (rank exceeds
    the matrix's numerical rank) emit 0.0. One extra sparse join per
    component; the output is node×rank-sized and returned PERSISTED
    (materialized before the factor pin is released) — caller owns the
    unpersist. Feed through :func:`embedding_vectors` to get the
    ``array<double>`` form that ``ann_topk_bruteforce`` / ``ann_ivf``
    consume.
    """
    v, lams = svd_topk(
        ppmi,
        rank=rank,
        iterations=iterations,
        row_col=row_col,
        col_col=col_col,
        value_col=value_col,
        round_dp=round_dp,
    )
    m = (
        ppmi.select(
            F.col(row_col).alias("node"),
            F.col(col_col).alias("c"),
            F.round(F.col(value_col).cast("double"), round_dp).alias("w"),
        )
        .where(F.col("w") > 0)
        .persist()  # the union below scans m once per component
    )
    try:
        out = None
        for k, lam in enumerate(lams):
            scale = lam ** -0.25 if lam > 0 else 0.0
            part = (
                m.join(
                    v.where(F.col("component") == k).select(
                        F.col("node").alias("c"), "x"
                    ),
                    on="c",
                )
                .groupBy("node")
                .agg(
                    (F.sum(F.col("w") * F.col("x")) * F.lit(scale)).alias(
                        "value"
                    )
                )
                .select("node", F.lit(k).cast("int").alias("dim"), "value")
            )
            out = part if out is None else out.unionByName(part)
        # materialize before releasing the factor pin
        out = out.persist()
        out.count()
        return out
    finally:
        v.unpersist()
        m.unpersist()


def embedding_vectors(
    emb: DataFrame,
    *,
    node_col: str = "node",
    dim_col: str = "dim",
    value_col: str = "value",
    out_col: str = "embedding",
) -> DataFrame:
    """Pivot long-form ``(node, dim, value)`` embeddings to the
    ``(node, array<double>)`` shape the ANN operators take: one
    partial-combined collect per node, dims sorted inside the array
    expression (no window)."""
    return (
        emb.groupBy(F.col(node_col).alias(node_col))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(dim_col), F.col(value_col)))
            ).alias("__s")
        )
        .select(
            node_col,
            F.transform(F.col("__s"), lambda s: s[value_col]).alias(
                out_col
            ),
        )
    )
