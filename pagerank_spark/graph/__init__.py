from pagerank_spark.graph.pagerank import (
    PageRankResult,
    compare_teleports,
    degrees,
    pagerank,
    top_k,
    vertices,
)

__all__ = [
    "PageRankResult",
    "compare_teleports",
    "degrees",
    "pagerank",
    "top_k",
    "vertices",
]
