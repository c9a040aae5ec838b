"""Pure-pandas PageRank oracle mirroring the reference loop semantics
(``pageRank.py:116-145``): power step + dangling-mass renormalization +
L1 convergence. Used by property tests as the trusted implementation.
"""

from __future__ import annotations


def pagerank_oracle(
    edges: list[tuple[int, int]],
    beta: float = 0.85,
    delta: float = 1e-5,
    dedup_dsts: bool = False,
) -> tuple[dict[int, float], int]:
    """Returns (ranks, iterations). Semantics identical to the reference.

    ``dedup_dsts=True`` pins the reference's multigraph behavior
    (``pageRank.py:102-110``): each source's dst set is deduplicated
    while its out-degree still counts duplicate edges, so part of a
    duplicated source's rank is undistributed and the actual-sum
    renormalization (``s = sum(new_rank.values())``) redistributes it.
    """
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    if n == 0:
        return {}, 0
    deg: dict[int, int] = {}
    out: dict[int, list[int]] = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        out.setdefault(s, []).append(d)
    if dedup_dsts:
        out = {s: sorted(set(dsts)) for s, dsts in out.items()}
    old = {v: 1.0 / n for v in nodes}
    base = (1.0 - beta) / n
    it = 0
    while it < 500:
        it += 1
        new = {v: base for v in nodes}
        for s, dsts in out.items():
            w = beta * old[s] / deg[s]
            for d in dsts:
                new[d] += w
        s_total = sum(new.values())
        corr = (1.0 - s_total) / n
        new = {k: v + corr for k, v in new.items()}
        l1 = sum(abs(new[v] - old[v]) for v in nodes)
        old = new
        if l1 <= delta:
            break
    return old, it
