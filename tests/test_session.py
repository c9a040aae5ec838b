"""Tests for the session helpers — in particular ``local_relation``,
the r14 Arrow-backed replacement for ``spark.createDataFrame(list)``
on hot paths. The contract: identical values AND schema to the plain
path, but the relation must evaluate JVM-side (no pickled-Python-RDD
scan whose every evaluation round-trips a Python worker)."""

from __future__ import annotations

from pagerank_spark.session import local_relation


def _sorted_rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_local_relation_value_and_schema_parity(spark):
    """Every type class used by call sites (int, float, str, bool,
    None, float lists) crosses identically to createDataFrame."""
    rows = [
        (1, 1.5, "a", True, [0.0, -2.25]),
        (-7, float(2**53), "", False, []),
        (None, None, None, None, None),
        (42, -0.0, "utf8 ✓", True, [1e-300, 3.141592653589793]),
    ]
    schema = (
        "k long, x double, s string, b boolean, v array<double>"
    )
    got = local_relation(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert _sorted_rows(got) == _sorted_rows(want)


def test_local_relation_empty_input_falls_back(spark):
    got = local_relation(spark, [], "a int, b string")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["a", "b"]


def test_local_relation_avoids_python_rdd_scan(spark):
    """The point of the helper: the plan must not contain a scan of a
    pickled Python RDD (``Scan ExistingRDD`` backed by Python), which
    is what createDataFrame(list) produces and what cost seconds per
    evaluation. Arrow conversion lands either a LocalTableScan or a
    JVM-side ExistingRDD of already-converted InternalRows — assert
    the plain-path marker is absent by comparing against it."""
    rows = [(i, float(i) / 8) for i in range(16)]
    fast = local_relation(spark, rows, "cid int, w double")
    # createDataFrame(pandas) with Arrow enabled maps to a JVM-local
    # relation; the java object must NOT be a PythonRDD-backed scan.
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert _sorted_rows(fast) == sorted(
        ((i, float(i) / 8) for i in range(16)), key=repr
    )
