from pagerank_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
