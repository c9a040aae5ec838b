"""Reusable column expressions (pagerank_spark.functions).

All pure Catalyst expressions — no Python UDFs — so they stay inside
whole-stage codegen and are portable to the DuckDB oracle SQL used by
the correctness gate (each helper documents its DuckDB equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31-1: modulus for the portable universal-hash family. Kept small so
# a*x+b never overflows int64 (Spark 4 runs ANSI mode: overflow errors).
HASH_PRIME = 2_147_483_647


def portable_hash60(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string, identical in Spark
    and DuckDB.

    Spark:  CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)
    DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_value(shingle_hash: Column, a: int, b: int) -> Column:
    """One member of the universal hash family h(x) = (a·x%P + b) % P.

    ``shingle_hash`` is first reduced mod P so the product fits int64.
    """
    x = shingle_hash % F.lit(HASH_PRIME)
    return (F.lit(a) * x + F.lit(b)) % F.lit(HASH_PRIME)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns.

    DuckDB equivalent: ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``.
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokenization; DuckDB: string_split_regex(trim(x),'\\s+')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")
