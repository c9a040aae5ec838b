"""pagerank_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
reference (Joshua-li-yi/PageRank: a single-process pandas/NumPy
PageRank pipeline) as an idiomatic Spark engine:

- ``pagerank_spark.session``   — SparkSession factory (AQE on, tuned defaults)
- ``pagerank_spark.io``        — sources (edge-list text, parquet, CSV) and sinks
- ``pagerank_spark.graph``     — PageRank power iteration (DataFrame loop),
  parameter sweeps, property-test helpers
- ``pagerank_spark.operators`` — relational operator surface (joins, aggs,
  windows, quantiles, top-k, set ops), dedup (exact/MinHash/SimHash/
  embedding), similarity search (brute-force + LSH), text analysis,
  multimodal binary-column plumbing
- ``pagerank_spark.functions`` — reusable column expressions
- ``pagerank_spark.streaming`` — Structured Streaming windowed aggregations
  (tumbling/sliding + watermark) with oracle-checkable batch twins

Everything is DataFrame/Catalyst-first: logical plans are declared with
the DataFrame API and physical strategy (broadcast vs shuffle joins,
partial aggregation, AQE skew handling) is left to the optimizer, with
explicit hints only where measurement says so.
"""

__version__ = "0.1.0"
