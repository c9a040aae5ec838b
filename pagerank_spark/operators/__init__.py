from pagerank_spark.operators import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
