"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``),
but every setting here is chosen so the same code runs unchanged on a
multi-executor cluster:

- AQE on (runtime partition coalescing + skew-join splitting — hub
  vertices in the PageRank contribution aggregation are skewed keys).
- ``spark.sql.shuffle.partitions`` sized from the env, not hard-coded;
  AQE coalesces downward so oversizing is cheap.
- Arrow enabled for the Pandas-UDF paths (dedup/similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def local_relation(spark: SparkSession, rows, schema: str):
    """Driver-rows → DataFrame through the ARROW path (r14
    optimization, guide §4/§6.4): ``spark.createDataFrame(list)``
    builds a PICKLED-Python-RDD-backed relation whose EVERY evaluation
    (each broadcast build, each write task, each re-reference in a
    later job) round-trips a Python worker — measured 5–11 s for a
    16-row write on this host vs 0.3 s when the same rows enter via a
    pandas/Arrow conversion, which lands JVM-side rows that later jobs
    evaluate without Python. Used for every small driver-built
    relation on a hot path (codebooks, per-round weight relations,
    threshold grids, union-find output). Bit-identical values:
    int/float/str/bool/None and float lists cross Arrow losslessly;
    the rows-as-tuples contract matches createDataFrame. Falls back to
    the plain path for empty input or if pandas/Arrow is unavailable.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd
        from pyspark.sql.types import StructType

        st = StructType.fromDDL(schema)
        pdf = pd.DataFrame(
            {
                f.name: pd.Series(
                    [r[i] for r in rows], dtype=object
                )
                for i, f in enumerate(st.fields)
            }
        )
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)


def get_spark(
    app_name: str = "pagerank_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
