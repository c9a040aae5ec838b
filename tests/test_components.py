"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.graph.components import aggregate_messages, connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # min id per component
    return {n: find(n) for n in list(parent)}


def test_two_components(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11)]
    out = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "src LONG, dst LONG")
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_matches_union_find_on_fixture_graph(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges_df = li.select(
        (F.col("l_orderkey") % 512).cast("long").alias("src"),
        ((F.col("l_partkey") % 512) + 1000).cast("long").alias("dst"),
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges_df).collect()
    }
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    want = _union_find(edges)
    # union-find roots are already the min id because unions always point
    # the larger root at the smaller one
    assert got == want


def test_empty_graph_terminates(spark):
    out = connected_components(
        spark.createDataFrame([], "src LONG, dst LONG"), max_iterations=5
    )
    assert out.count() == 0


def test_triangle_count_known_graph(spark):
    from pagerank_spark.graph.components import triangle_count

    # K4 minus one edge: triangles {1,2,3} and {1,2,4} only.
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2), (2, 1), (3, 3)]
    out = triangle_count(
        spark.createDataFrame(edges, "src LONG, dst LONG")
    ).collect()
    assert out[0]["n_triangles"] == 2


def test_aggregate_messages_primitive(spark):
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src LONG, dst LONG")
    state = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 0.0)], "node LONG, w DOUBLE")
    out = {
        r["node"]: r["msg_agg"]
        for r in aggregate_messages(
            edges, state, msg=F.col("w"), agg=F.sum("__msg")
        ).collect()
    }
    assert out == {2: 10.0, 3: 30.0}


def test_shortest_paths_bfs_semantics(spark):
    from pagerank_spark.graph.components import shortest_paths

    # Path 1→2→3→4 with back-edge 4→1 (cycle), separate island 9→10,
    # and node 20 unreachable from the sources.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (9, 10), (20, 2)],
        "src long, dst long",
    )
    srcs = spark.createDataFrame([(1,), (9,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in shortest_paths(edges, srcs).collect()
    }
    assert out == {1: 0, 9: 0, 2: 1, 10: 1, 3: 2, 4: 3}


def test_shortest_paths_hop_cap(spark):
    from pagerank_spark.graph.components import shortest_paths

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in shortest_paths(chain, srcs, max_iterations=3).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}
