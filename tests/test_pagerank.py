"""Golden + property tests for the PageRank loop (SURVEY.md §5.2)."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from pagerank_spark.graph import compare_teleports, pagerank, top_k
from pagerank_spark.io import read_edge_list

from tests.conftest import RESOURCES, WIKIDATA
from tests.pandas_oracle import pagerank_oracle


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src LONG, dst LONG")


def _ranks_dict(res):
    return {r["node"]: r["rank"] for r in res.ranks.collect()}


def _assert_matches_oracle(spark, edges, beta=0.85):
    got = pagerank(_edges_df(spark, edges), beta=beta)
    want, want_iters = pagerank_oracle(edges, beta=beta)
    got_d = _ranks_dict(got)
    assert set(got_d) == set(want)
    for node, score in want.items():
        assert got_d[node] == pytest.approx(score, abs=1e-9), node
    assert got.iterations == want_iters
    assert sum(got_d.values()) == pytest.approx(1.0, abs=1e-9)
    got.ranks.unpersist()


class TestGolden:
    """End-to-end vs the reference's published top-100 (README.md:320-421)."""

    @pytest.fixture(scope="class")
    def golden(self):
        path = os.path.join(RESOURCES, "golden_top100.txt")
        rows = [line.split("\t") for line in open(path)]
        return [(int(p), float(s)) for p, s in rows]

    @pytest.fixture(scope="class")
    def result(self, spark):
        edges = read_edge_list(spark, WIKIDATA)
        res = pagerank(edges, beta=0.85, delta=1e-5)
        yield res
        res.ranks.unpersist()

    def test_top100_order_and_scores(self, result, golden):
        top = top_k(result.ranks, 100).collect()
        assert [r["page"] for r in top] == [p for p, _ in golden]
        for row, (_, score) in zip(top, golden):
            assert row["score"] == pytest.approx(score, abs=1e-9)

    def test_iteration_count(self, result):
        assert result.iterations == 13  # README.md:437

    def test_ranks_sum_to_one(self, result):
        total = result.ranks.agg(F.sum("rank")).collect()[0][0]
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_trajectory_monotone_tail(self, result):
        # L1 decreases after the first few iterations (power method contraction)
        tail = result.l1_trajectory[2:]
        assert all(a > b for a, b in zip(tail, tail[1:]))


class TestProperties:
    def test_cycle_uniform(self, spark):
        n = 10
        edges = [(i, (i + 1) % n) for i in range(n)]
        res = pagerank(_edges_df(spark, edges))
        for node, rank in _ranks_dict(res).items():
            assert rank == pytest.approx(1.0 / n, abs=1e-9)
        res.ranks.unpersist()

    def test_star_in_center_max(self, spark):
        edges = [(i, 0) for i in range(1, 8)]
        res = pagerank(_edges_df(spark, edges))
        d = _ranks_dict(res)
        assert d[0] == max(d.values())
        assert sum(d.values()) == pytest.approx(1.0, abs=1e-9)
        res.ranks.unpersist()

    def test_star_in_matches_oracle(self, spark):
        _assert_matches_oracle(spark, [(i, 0) for i in range(1, 8)])

    def test_two_components(self, spark):
        edges = [(1, 2), (2, 1), (10, 11), (11, 12), (12, 10)]
        _assert_matches_oracle(spark, edges)

    def test_dangling_heavy(self, spark):
        # every dst is dangling: exercises renormalization hard
        edges = [(1, 100), (1, 101), (2, 102), (3, 103), (3, 100)]
        _assert_matches_oracle(spark, edges)

    def test_random_graphs_match_oracle(self, spark):
        rng = random.Random(42)
        for trial in range(3):
            n = rng.randint(10, 60)
            edges = sorted(
                {
                    (rng.randint(0, n), rng.randint(0, n))
                    for _ in range(rng.randint(n, 4 * n))
                }
            )
            edges = [(s, d) for s, d in edges if s != d]
            _assert_matches_oracle(spark, edges)

    def test_relabeling_invariance(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
        shift = [(s + 1000, d + 1000) for s, d in edges]
        a = _ranks_dict(pagerank(_edges_df(spark, edges)))
        b = _ranks_dict(pagerank(_edges_df(spark, shift)))
        for node, rank in a.items():
            assert b[node + 1000] == pytest.approx(rank, abs=1e-12)

    def test_empty_graph(self, spark):
        res = pagerank(
            spark.createDataFrame([], "src LONG, dst LONG")
        )
        assert res.iterations == 0
        assert res.ranks.count() == 0

    def test_self_loop_only(self, spark):
        _assert_matches_oracle(spark, [(1, 1), (1, 2)])

    def test_multigraph_semantics_pinned(self, spark):
        # Duplicate edge (1,2)x2 + (1,3). Bag semantics: node 2 receives
        # twice node 3's contribution. Reference semantics (pageRank.py:
        # 102-110): dst sets dedup per src but out-degree counts dups,
        # so 2 and 3 receive equal contributions → equal ranks.
        edges = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
        bag = _ranks_dict(pagerank(_edges_df(spark, edges)))
        assert bag[2] > bag[3]
        ref = _ranks_dict(
            pagerank(_edges_df(spark, edges), edge_semantics="reference")
        )
        assert ref[2] == pytest.approx(ref[3], abs=1e-12)

    def test_multigraph_reference_mode_matches_oracle(self, spark):
        # The analytic renormalization must account for the partially
        # distributed mass of duplicated sources (dfrac = ddeg/deg):
        # ranks sum to 1 AND the whole trajectory matches a direct
        # reference-algorithm run with deduped dst sets.
        edges = [
            (1, 2), (1, 2), (1, 3), (2, 1), (3, 1),
            (4, 1), (4, 1), (4, 1), (4, 2), (2, 4),
        ]
        got = pagerank(_edges_df(spark, edges), edge_semantics="reference")
        want, want_iters = pagerank_oracle(edges, dedup_dsts=True)
        got_d = _ranks_dict(got)
        assert sum(got_d.values()) == pytest.approx(1.0, abs=1e-9)
        assert got.iterations == want_iters
        for node, score in want.items():
            assert got_d[node] == pytest.approx(score, abs=1e-9), node
        got.ranks.unpersist()

    def test_reliable_checkpoint_mode(self, spark, tmp_path):
        import os

        ckpt = tmp_path / "ckpt"
        spark.sparkContext.setCheckpointDir(str(ckpt))
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
        a = _ranks_dict(
            pagerank(_edges_df(spark, edges), reliable_checkpoint=False)
        )
        b = _ranks_dict(
            pagerank(
                _edges_df(spark, edges),
                reliable_checkpoint=True,
                checkpoint_every=2,
            )
        )
        for node, rank in a.items():
            assert b[node] == pytest.approx(rank, abs=1e-12)

        # "auto" (the default) must pick the fault-tolerant mode when a
        # checkpoint dir is configured: new RDD checkpoint files appear.
        def n_ckpt_files():
            return sum(len(fs) for _, _, fs in os.walk(ckpt))

        before = n_ckpt_files()
        c = _ranks_dict(pagerank(_edges_df(spark, edges), checkpoint_every=2))
        assert n_ckpt_files() > before
        for node, rank in a.items():
            assert c[node] == pytest.approx(rank, abs=1e-12)

    def test_shuffle_strategy_same_result(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 1)]
        a = _ranks_dict(pagerank(_edges_df(spark, edges), strategy="broadcast"))
        b = _ranks_dict(pagerank(_edges_df(spark, edges), strategy="shuffle"))
        for node, rank in a.items():
            assert b[node] == pytest.approx(rank, abs=1e-12)


class TestCompareTeleports:
    def test_sweep_shape(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 4)]
        out = compare_teleports(
            _edges_df(spark, edges), betas=(0.80, 0.85), k=5
        ).collect()
        assert len(out) == 5
        assert out[0]["position"] == 1
        assert {"page_0_8", "page_0_85", "all_match"} <= set(out[0].asDict())


class TestWarmStart:
    def test_warm_start_same_fixed_point_fewer_iterations(self, spark):
        rng = random.Random(5)
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(800)
        ]
        cold = pagerank(_edges_df(spark, edges), tune_aqe=False)
        # Restarting from the converged vector: first L1 is already under
        # delta, so the loop stops immediately with the same ranks.
        warm = pagerank(
            _edges_df(spark, edges),
            tune_aqe=False,
            init_ranks=cold.ranks,
        )
        assert warm.iterations < cold.iterations
        assert warm.iterations <= 2
        cd, wd = _ranks_dict(cold), _ranks_dict(warm)
        assert set(cd) == set(wd)
        for node in cd:
            assert wd[node] == pytest.approx(cd[node], abs=1e-6)
        cold.ranks.unpersist()
        warm.ranks.unpersist()

    def test_warm_start_after_delta_matches_cold(self, spark):
        rng = random.Random(9)
        edges = [
            (rng.randrange(150), rng.randrange(150)) for _ in range(600)
        ]
        prev = pagerank(_edges_df(spark, edges), tune_aqe=False)
        # graph delta: a few new edges, including a brand-new vertex 999
        delta_edges = edges + [(999, 3), (3, 999), (1, 2), (7, 11)]
        cold = pagerank(_edges_df(spark, delta_edges), tune_aqe=False)
        warm = pagerank(
            _edges_df(spark, delta_edges),
            tune_aqe=False,
            init_ranks=prev.ranks,
        )
        assert warm.iterations <= cold.iterations
        cd, wd = _ranks_dict(cold), _ranks_dict(warm)
        assert set(cd) == set(wd)
        total = sum(wd.values())
        assert total == pytest.approx(1.0, abs=1e-9)
        for node in cd:
            assert wd[node] == pytest.approx(cd[node], abs=1e-5)
        prev.ranks.unpersist()
        cold.ranks.unpersist()
        warm.ranks.unpersist()


def test_auto_strategy_tiers(spark):
    # Tiny graphs run the co-partitioned shuffle loop (broadcast's
    # per-iteration driver collect costs more than the rank exchange);
    # forcing a tiny broadcast_vertex_limit pushes the same graph to
    # shuffle via the big-graph tier too.
    edges = [(i, (i * 7) % 50) for i in range(200)]
    res = pagerank(_edges_df(spark, edges), delta=0.0, max_iterations=2)
    assert res.strategy == "shuffle"
    res2 = pagerank(
        _edges_df(spark, edges),
        delta=0.0,
        max_iterations=2,
        strategy="broadcast",
    )
    assert res2.strategy == "broadcast"
    # The two tiers agree value-for-value (9dp — summation order).
    a = {r["node"]: round(r["rank"], 9) for r in res.ranks.collect()}
    b = {r["node"]: round(r["rank"], 9) for r in res2.ranks.collect()}
    assert a == b
    res.ranks.unpersist(), res2.ranks.unpersist()


def test_hits_hand_graph(spark):
    # Star: 1,2,3 all point at 4; 4 points at 5.
    # Authorities concentrate on 4; hubs on 1,2,3.
    from pagerank_spark.graph.pagerank import hits

    e = _edges_df(spark, [(1, 4), (2, 4), (3, 4), (4, 5)])
    out = {r["node"]: r for r in hits(e, iterations=2).collect()}
    assert len(out) == 5
    import pytest as _pt

    assert sum(r["hub"] for r in out.values()) == _pt.approx(1.0)
    assert sum(r["auth"] for r in out.values()) == _pt.approx(1.0)
    # 4 is the top authority; 1,2,3 are the (equal) top hubs.
    assert out[4]["auth"] == max(r["auth"] for r in out.values())
    assert out[1]["hub"] == out[2]["hub"] == out[3]["hub"]
    assert out[1]["hub"] > out[4]["hub"] > out[5]["hub"]


def test_katz_truncated_series(spark):
    # Chain 1->2->3: x3[3] counts paths of length 0..2 ending at 3
    # (x1 = 1 is the j=0 term, so k rounds cover lengths 0..k-1).
    from pagerank_spark.graph.pagerank import katz_centrality

    e = _edges_df(spark, [(1, 2), (2, 3)])
    a = 0.1
    out = {
        r["node"]: r["katz"]
        for r in katz_centrality(e, alpha=a, iterations=3).collect()
    }
    assert out[1] == 1.0                      # nothing points at 1
    assert out[2] == 1.0 + a                  # one in-path of length 1
    assert out[3] == 1.0 + a * (1.0 + a)      # length-1 and length-2


def test_hits_loop_matches_dag(spark):
    # Loop engine == unrolled DAG at the same iteration count (the
    # auto cut flips hits to the loop past 2 iterations).
    from pagerank_spark.graph.pagerank import hits

    random.seed(7)
    edges = list({(random.randrange(30), random.randrange(30))
                  for _ in range(80)})
    e = _edges_df(spark, edges)
    dag = {r["node"]: r for r in hits(e, iterations=3, mode="dag").collect()}
    loop = hits(e, iterations=3, mode="loop")
    got = {r["node"]: r for r in loop.collect()}
    assert set(got) == set(dag)
    for node in dag:
        assert got[node]["hub"] == pytest.approx(dag[node]["hub"], abs=1e-9)
        assert got[node]["auth"] == pytest.approx(dag[node]["auth"], abs=1e-9)
    loop.unpersist()


def test_hits_loop_converges(spark):
    # delta-driven loop reaches the star graph's fixed point: all auth
    # on 4 (only in-edges target), hubs equal on 1,2,3... plus 4->5.
    from pagerank_spark.graph.pagerank import hits

    e = _edges_df(spark, [(1, 4), (2, 4), (3, 4), (4, 5)])
    out = hits(e, delta=1e-12, max_iterations=100)
    got = {r["node"]: r for r in out.collect()}
    assert sum(r["hub"] for r in got.values()) == pytest.approx(1.0)
    assert sum(r["auth"] for r in got.values()) == pytest.approx(1.0)
    assert got[4]["auth"] == max(r["auth"] for r in got.values())
    assert got[1]["hub"] == pytest.approx(got[2]["hub"], abs=1e-12)
    out.unpersist()


def test_katz_loop_matches_dag_and_converges(spark):
    from pagerank_spark.graph.pagerank import katz_centrality

    random.seed(11)
    edges = list({(random.randrange(25), random.randrange(25))
                  for _ in range(60)})
    e = _edges_df(spark, edges)
    a = 0.05
    dag = {r["node"]: r["katz"]
           for r in katz_centrality(e, alpha=a, iterations=4, mode="dag").collect()}
    loop = katz_centrality(e, alpha=a, iterations=4, mode="loop")
    got = {r["node"]: r["katz"] for r in loop.collect()}
    assert set(got) == set(dag)
    for node in dag:
        assert got[node] == pytest.approx(dag[node], abs=1e-12)
    loop.unpersist()
    # Convergence mode: the truncated series approaches the closed
    # form on a chain, where the geometric tail vanishes below delta.
    chain = _edges_df(spark, [(1, 2), (2, 3)])
    conv = katz_centrality(chain, alpha=0.1, delta=1e-10)
    vals = {r["node"]: r["katz"] for r in conv.collect()}
    assert vals[3] == pytest.approx(1.0 + 0.1 * (1.0 + 0.1), abs=1e-9)
    conv.unpersist()


def test_hits_katz_validate_iterations(spark):
    from pagerank_spark.graph.pagerank import hits, katz_centrality

    e = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="iterations"):
        hits(e, iterations=0)
    with pytest.raises(ValueError, match="iterations"):
        katz_centrality(e, iterations=-1)
    with pytest.raises(ValueError, match="mode"):
        hits(e, iterations=2, mode="nope")
