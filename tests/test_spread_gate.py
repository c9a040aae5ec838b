"""Focused r15 test for the codec-input spread gate."""
import pytest


def test_spread_gate(spark, monkeypatch):
    from pagerank_spark.operators import multimodal as mm

    target = spark.sparkContext.defaultParallelism
    small = spark.range(1000).selectExpr("id AS media_id")
    out = mm._spread_df(small)
    assert out.rdd.getNumPartitions() == target

    # monkeypatch the size probe by shrinking the limit so the REAL
    # introspection says "big", proving big inputs keep their layout
    monkeypatch.setattr(mm, "_SPREAD_SIZE_LIMIT", -1)
    big = spark.range(1000).selectExpr("id AS media_id")
    kept = mm._spread_df(big)
    assert kept is big  # no repartition above the cut

    # row-count fallback: force the introspection to fail
    monkeypatch.setattr(mm, "_SPREAD_SIZE_LIMIT", 64 << 20)

    class Shim:
        def __init__(self, df):
            self._df = df
        def __getattr__(self, name):
            if name == "_jdf":
                raise AttributeError("no _jdf (connect mode)")
            return getattr(self._df, name)

    out2 = mm._spread_df(Shim(spark.range(500).selectExpr("id AS media_id")))
    assert out2.rdd.getNumPartitions() == target
