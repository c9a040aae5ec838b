"""ppmi_svd_embeddings / svd_topk vs NumPy's exact SVD.

The factorization must (a) converge to the true top singular
subspace of the sparse relation (NumPy oracle, dense), (b) emit
embeddings whose geometry reflects the co-occurrence structure
(cluster test), and (c) plug straight into the ANN tier
(embedding_vectors → ann_topk_bruteforce).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.graph.embeddings import (
    embedding_vectors,
    ppmi_svd_embeddings,
    svd_topk,
)

# a fixed 6×5 positive matrix whose three row-blocks have strongly
# separated scales (σ ≈ 12 / 5.5 / 2.6): power iteration's angle error
# decays as (λ_next/λ_k)^t, so a clustered spectrum would never reach
# per-element tolerance in finitely many rounds
M_ROWS = [
    [8.0, 2.0, 1.0, 0.0, 0.4],
    [7.0, 2.4, 0.8, 0.2, 0.0],
    [0.2, 3.0, 2.8, 0.0, 0.3],
    [0.1, 2.9, 3.1, 0.2, 0.1],
    [0.0, 0.1, 0.2, 1.3, 1.2],
    [0.3, 0.0, 0.1, 1.3, 1.4],
]


def _relation(spark):
    rows = [
        (i, j, v)
        for i, row in enumerate(M_ROWS)
        for j, v in enumerate(row)
        if v > 0
    ]
    return spark.createDataFrame(
        rows, "center long, context long, ppmi double"
    )


def test_svd_topk_matches_numpy(spark):
    """40 power rounds on a gapped 6×5 matrix: singular values within
    1e-6 of NumPy's, right singular vectors aligned to |cos| > 1-1e-6
    (sign is iteration-determined, so compare up to sign)."""
    m = np.array(M_ROWS)
    _, s_np, vh_np = np.linalg.svd(m)
    v, lams = svd_topk(_relation(spark), rank=2, iterations=40)
    try:
        rows = v.collect()
    finally:
        v.unpersist()
    for k in range(2):
        assert math.sqrt(lams[k]) == pytest.approx(s_np[k], abs=1e-6)
        vk = np.zeros(5)
        for r in rows:
            if r["component"] == k:
                vk[r["node"]] = r["x"]
        cos = abs(float(vk @ vh_np[k])) / (np.linalg.norm(vk) or 1.0)
        assert cos > 1 - 1e-6
    # vectors are unit-norm and mutually orthogonal (deflation works)
    v0 = np.zeros(5)
    v1 = np.zeros(5)
    for r in rows:
        (v0 if r["component"] == 0 else v1)[r["node"]] = r["x"]
    assert np.linalg.norm(v0) == pytest.approx(1.0, abs=1e-6)
    assert abs(float(v0 @ v1)) < 1e-6


def test_svd_topk_validation(spark):
    with pytest.raises(ValueError):
        svd_topk(_relation(spark), rank=0)
    with pytest.raises(ValueError):
        svd_topk(_relation(spark), rank=1, iterations=0)
    empty = spark.createDataFrame(
        [], "center long, context long, ppmi double"
    )
    with pytest.raises(ValueError, match="no positive entries"):
        svd_topk(empty, rank=1)


def test_embeddings_match_numpy_usigma_half(spark):
    """ppmi_svd_embeddings = U·Σ^½ rows (up to per-component sign):
    check every (node, dim) value against the NumPy factors."""
    m = np.array(M_ROWS)
    u_np, s_np, _ = np.linalg.svd(m)
    emb = ppmi_svd_embeddings(_relation(spark), rank=2, iterations=40)
    try:
        got = {(r["node"], r["dim"]): r["value"] for r in emb.collect()}
    finally:
        emb.unpersist()
    for k in range(2):
        want = u_np[:, k] * math.sqrt(s_np[k])
        have = np.array([got[(i, k)] for i in range(6)])
        sign = 1.0 if float(want @ have) >= 0 else -1.0
        assert np.allclose(have, sign * want, atol=1e-5)


def test_embedding_geometry_separates_clusters(spark):
    """Two co-occurrence blocks → same-block nodes must be closer in
    embedding space than cross-block nodes (cosine)."""
    pairs = []
    for block in ([0, 1, 2], [10, 11, 12]):
        for a in block:
            for b in block:
                if a != b:
                    pairs.append((a, b, 5.0))
    pairs.append((2, 10, 0.5))  # one weak bridge
    ppmi = spark.createDataFrame(
        pairs, "center long, context long, ppmi double"
    )
    emb = ppmi_svd_embeddings(ppmi, rank=2, iterations=30)
    try:
        vecs = {
            r["node"]: r["embedding"]
            for r in embedding_vectors(emb).collect()
        }
    finally:
        emb.unpersist()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b)
        )
        return num / den if den else 0.0

    within = cos(vecs[0], vecs[1])
    across = cos(vecs[0], vecs[11])
    assert within > across + 0.1


def test_embedding_vectors_feed_ann(spark):
    """The long→array pivot is directly consumable by the ANN tier."""
    from pagerank_spark.operators.similarity import ann_topk_bruteforce

    emb = ppmi_svd_embeddings(_relation(spark), rank=2, iterations=10)
    try:
        vecs = embedding_vectors(emb).withColumnRenamed(
            "node", "vec_id"
        )
        q = vecs.where(F.col("vec_id") == 0)
        out = ann_topk_bruteforce(vecs, q, k=3)
        assert out.count() == 3
    finally:
        emb.unpersist()
