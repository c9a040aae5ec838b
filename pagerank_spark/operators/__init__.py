from pagerank_spark.operators import dedup, similarity, text  # noqa: F401
