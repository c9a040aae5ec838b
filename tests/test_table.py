"""Versioned-parquet table layer: snapshots, upsert merge, time travel,
vacuum, crash-orphan cleanup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pagerank_spark import table as T


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_write_read_roundtrip_and_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = T.write_table(_df(spark, [(1, "a"), (2, "b")]), root)
    v1 = T.write_table(_df(spark, [(3, "c")]), root)
    assert (v0, v1) == (0, 1)
    assert T.current_version(root) == 1
    assert T.list_versions(root) == [0, 1]
    assert {r["k"] for r in T.read_table(spark, root).collect()} == {3}
    # time travel
    assert {r["k"] for r in T.read_table(spark, root, version=0).collect()} == {1, 2}


def test_upsert_merges_by_key(spark, tmp_path):
    root = str(tmp_path / "t")
    T.write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    T.upsert_table(spark, _df(spark, [(2, "B"), (4, "d")]), root, keys=["k"])
    got = {r["k"]: r["val"] for r in T.read_table(spark, root).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # original snapshot is untouched (immutability)
    old = {r["k"]: r["val"] for r in T.read_table(spark, root, version=0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_append_accumulates(spark, tmp_path):
    root = str(tmp_path / "t")
    T.append_table(spark, _df(spark, [(1, "a")]), root)
    T.append_table(spark, _df(spark, [(2, "b")]), root)
    assert T.read_table(spark, root).count() == 2


def test_vacuum_keeps_recent_and_drops_orphans(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        T.write_table(_df(spark, [(i, "x")]), root)
    # simulate a crashed writer: snapshot dir exists, pointer never moved
    os.makedirs(os.path.join(root, "v00099"))
    dropped = T.vacuum_table(root, keep=2)
    assert dropped == [0, 1, 99]
    assert T.list_versions(root) == [2, 3]
    # current read still works; vacuumed time travel raises
    assert T.read_table(spark, root).count() == 1
    try:
        T.read_table(spark, root, version=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_history_reports_counts(spark, tmp_path):
    root = str(tmp_path / "t")
    T.write_table(_df(spark, [(1, "a")]), root)
    T.append_table(spark, _df(spark, [(2, "b"), (3, "c")]), root)
    hist = {r["version"]: (r["n_rows"], r["is_current"])
            for r in T.table_history(spark, root).collect()}
    assert hist == {0: (1, False), 1: (3, True)}


def test_upsert_is_null_safe_on_keys(spark, tmp_path):
    root = str(tmp_path / "t")
    T.write_table(_df(spark, [(None, "a"), (1, "b")]), root)
    T.upsert_table(spark, _df(spark, [(None, "A")]), root, keys=["k"])
    got = {r["k"]: r["val"] for r in T.read_table(spark, root).collect()}
    assert got == {None: "A", 1: "b"}


def test_upsert_sequences_match_dict_model(spark, tmp_path):
    """Model-based check: any interleaving of write/upsert/append agrees
    with a plain dict; every intermediate version time-travels back
    exactly. (Deterministic op list — no RNG in tests.)"""
    ops = [
        ("write", [(1, "a"), (2, "b")]),
        ("upsert", [(2, "B"), (3, "c")]),
        ("append", [(4, "d")]),
        ("upsert", [(1, "A"), (4, "D"), (5, "e")]),
        ("upsert", [(5, "E")]),
        ("append", [(6, "f"), (7, "g")]),
    ]
    root = str(tmp_path / "t")
    model: dict[int, str] = {}
    snapshots = []
    for op, rows in ops:
        df = _df(spark, rows)
        if op == "write":
            T.write_table(df, root)
            model = dict(rows)
        elif op == "upsert":
            T.upsert_table(spark, df, root, keys=["k"])
            model.update(dict(rows))
        else:
            T.append_table(spark, df, root)
            # append keeps duplicates; this op list never re-appends a
            # live key, so the dict stays a faithful model
            model.update(dict(rows))
        snapshots.append(dict(model))

    for v, want in enumerate(snapshots):
        got = {
            r["k"]: r["val"]
            for r in T.read_table(spark, root, version=v).collect()
        }
        assert got == want, f"version {v}"


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    import glob
    import os

    root = str(tmp_path / "t_compact")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("val")
    )
    T.write_table(df.repartition(16), root)
    v0_files = glob.glob(os.path.join(root, "v00000", "*.parquet"))
    assert len(v0_files) == 16

    v1 = T.compact_table(spark, root, target_files=2, sort_by=["k"])
    assert v1 == 1
    v1_files = glob.glob(os.path.join(root, "v00001", "*.parquet"))
    assert len(v1_files) == 2

    got = sorted(
        (r["k"], r["val"]) for r in T.read_table(spark, root).collect()
    )
    want = sorted((i, i % 7) for i in range(1000))
    assert got == want
    # time travel to the pre-compaction snapshot still works
    assert T.read_table(spark, root, version=0).count() == 1000

    # range-partitioned + sorted files have disjoint k ranges: file-level
    # min/max stats can prune (check via per-file min/max).
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(v1_files):
        t = pq.read_table(f, columns=["k"])
        ranges.append((t["k"][0].as_py(), t["k"][-1].as_py()))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_zorder_key_is_morton_interleave(spark):
    from pagerank_spark.table import _zorder_key

    # Values already spanning [0, 3] in both dims with bits=2 -> the
    # normalization is the identity and z must equal the exact Morton
    # code (x-bit before y-bit, most significant first).
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", _zorder_key(df, ["x", "y"], bits=2)
        ).collect()
    }

    def morton(x, y):
        z = 0
        for b in (1, 0):
            z = (z << 1) | ((x >> b) & 1)
            z = (z << 1) | ((y >> b) & 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_compact_zorder_clusters_both_dims(spark, tmp_path):
    from pagerank_spark import table as T

    # 64x64 grid fragmented randomly; z-order compaction into 16 files
    # must give per-file spans far below the full range in BOTH dims
    # (a single-dim sort leaves the second dim's span at ~full width).
    rows = [((i * 37) % 64, (i * 53) % 64, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    root = str(tmp_path / "ztbl")
    T.write_table(df.repartition(32), root)
    v = T.compact_table(
        spark, root, target_files=16, sort_by=["x", "y"], cluster="zorder"
    )
    assert T.current_version(root) == v
    snap = T.read_table(spark, root)
    assert snap.count() == 4096
    import glob
    import os

    from pyspark.sql import functions as F

    spans_x, spans_y = [], []
    for f in glob.glob(os.path.join(root, f"v{v:05d}", "*.parquet")):
        s = spark.read.parquet(f).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).collect()[0]
        spans_x.append(s["sx"]), spans_y.append(s["sy"])
    assert len(spans_x) >= 8
    # Z-order: average span well under the full 63 range in BOTH dims.
    assert sum(spans_x) / len(spans_x) <= 40
    assert sum(spans_y) / len(spans_y) <= 40


def test_upsert_schema_evolution(spark, tmp_path):
    from pagerank_spark import table as T

    root = str(tmp_path / "evo")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    T.write_table(base, root)
    delta = spark.createDataFrame(
        [(2, "B", 0.9), (3, "c", 0.5)], "id long, v string, score double"
    )
    # Strict mode drops the unknown column (no silent drift).
    T.upsert_table(spark, delta, root, keys=["id"])
    assert "score" not in T.read_table(spark, root).columns
    # Evolved mode widens: old rows read NULL for the new column.
    T.upsert_table(spark, delta, root, keys=["id"], evolve_schema=True)
    snap = {r["id"]: r for r in T.read_table(spark, root).collect()}
    assert set(T.read_table(spark, root).columns) == {"id", "v", "score"}
    assert snap[1]["score"] is None and snap[1]["v"] == "a"
    assert snap[2]["score"] == 0.9 and snap[2]["v"] == "B"
    assert snap[3]["score"] == 0.5


def test_time_travel_across_schema_evolution_boundary(spark, tmp_path):
    """Evolution must not rewrite history: after an evolving MERGE,
    the pre-evolution snapshot reads back with its ORIGINAL (narrow)
    schema and values, the evolved snapshot carries the widened schema
    with NULL-filled old rows, and a post-evolution strict MERGE keeps
    the widened schema. Version reads on both sides of the boundary
    stay available simultaneously."""
    from pagerank_spark import table as T

    root = str(tmp_path / "evo_tt")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    v0 = T.write_table(base, root)
    delta = spark.createDataFrame(
        [(2, "B", 0.9), (4, "d", 0.5)], "id long, v string, score double"
    )
    v1 = T.upsert_table(spark, delta, root, keys=["id"],
                        evolve_schema=True)

    # pre-evolution read: narrow schema, original rows, no leakage
    pre = T.read_table(spark, root, version=v0)
    assert pre.columns == ["id", "v"]
    assert sorted((r["id"], r["v"]) for r in pre.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]

    # evolved read: widened schema; untouched rows NULL-filled
    cur = {r["id"]: r for r in T.read_table(spark, root).collect()}
    assert set(T.read_table(spark, root).columns) == {"id", "v", "score"}
    assert cur[1]["score"] is None and cur[3]["score"] is None
    assert cur[2]["score"] == 0.9 and cur[4]["score"] == 0.5

    # strict MERGE after the boundary keeps the evolved schema and
    # NULLs the new column for rows its delta doesn't carry
    v2 = T.upsert_table(
        spark,
        spark.createDataFrame([(5, "e")], "id long, v string"),
        root,
        keys=["id"],
    )
    after = {r["id"]: r for r in T.read_table(spark, root).collect()}
    assert after[5]["score"] is None and after[2]["score"] == 0.9

    # all three versions remain independently readable
    assert [v0, v1, v2] == [0, 1, 2]
    assert T.read_table(spark, root, version=v1).count() == 4
    assert T.read_table(spark, root, version=v0).columns == ["id", "v"]


def test_zorder_key_bit_budget_and_null_guard(spark):
    from pagerank_spark.table import _zorder_key

    # 4 columns at the default 16 bits would need 64 key bits — the
    # key must auto-scale to 15 bits/col and stay non-negative.
    rows = [(i, i * 2, i * 3, i * 5) for i in range(32)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    vals = [
        r["z"]
        for r in df.withColumn("z", _zorder_key(df, ["a", "b", "c", "d"])).collect()
    ]
    assert all(v >= 0 for v in vals)
    assert len(set(vals)) > 1  # still discriminates

    # All-NULL / empty snapshot: constant key, no crash.
    empty = spark.createDataFrame([], "a long, b long")
    assert [
        r["z"]
        for r in empty.withColumn("z", _zorder_key(empty, ["a", "b"])).collect()
    ] == []
    nulls = spark.createDataFrame([(None, None)], "a long, b long")
    got = nulls.withColumn("z", _zorder_key(nulls, ["a", "b"])).collect()
    assert got[0]["z"] == 0


def test_table_changes_emits_all_change_types(spark, tmp_path):
    import pytest

    root = str(tmp_path / "cdf")
    v0 = T.write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    T.upsert_table(spark, _df(spark, [(2, "B"), (4, "d")]), root, keys=["k"])
    v2 = T.delete_where(spark, root, F.col("k") == 3)
    got = sorted(
        tuple(r) for r in T.table_changes(spark, root, v0, v2, ["k"]).collect()
    )
    assert got == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    # unchanged row (k=1) emits nothing; identical endpoints diff empty
    assert T.table_changes(spark, root, v2, v2, ["k"]).count() == 0

    with pytest.raises(ValueError):
        T.table_changes(spark, root, v0, v2, [])
    # schema drift between endpoints is refused
    T.upsert_table(
        spark,
        spark.createDataFrame([(9, "z", 1.0)], "k long, val string, extra double"),
        root,
        keys=["k"],
        evolve_schema=True,
    )
    with pytest.raises(ValueError):
        T.table_changes(spark, root, v0, T.current_version(root), ["k"])


def test_apply_cdf_to_sums_equals_recompute_and_drops_empty_groups(
    spark, tmp_path
):
    from pagerank_spark.operators.relational import apply_cdf_to_sums

    root = str(tmp_path / "cdf2")
    rows0 = [(1, "g1", 10.0), (2, "g1", 5.0), (3, "g2", 7.0)]
    df0 = spark.createDataFrame(rows0, "k long, g string, x double")
    v0 = T.write_table(df0, root)
    # update k=2 (g1), delete k=3 (g2 vanishes entirely), insert k=4 (g3)
    T.upsert_table(
        spark,
        spark.createDataFrame([(2, "g1", 6.0), (4, "g3", 1.0)],
                              "k long, g string, x double"),
        root,
        keys=["k"],
    )
    v2 = T.delete_where(spark, root, F.col("k") == 3)
    agg0 = df0.groupBy("g").agg(
        F.count("*").alias("n_rows"), F.sum("x").alias("x")
    )
    cdf = T.table_changes(spark, root, v0, v2, ["k"])
    got = {
        r["g"]: (r["n_rows"], r["x"])
        for r in apply_cdf_to_sums(agg0, cdf, ["g"], ["x"]).collect()
    }
    expect = {
        r["g"]: (r["n_rows"], r["x"])
        for r in T.read_table(spark, root)
        .groupBy("g")
        .agg(F.count("*").alias("n_rows"), F.sum("x").alias("x"))
        .collect()
    }
    assert got == expect == {"g1": (2, 16.0), "g3": (1, 1.0)}
    assert "g2" not in got  # emptied group must disappear


def test_bloom_file_skipping_point_lookup(spark, tmp_path):
    """Per-file Bloom sidecar: a point lookup reads a strict subset of
    files, returns exactly the full-scan answer, and an absent key
    returns empty — no false negatives by construction."""
    from pagerank_spark.table import (
        bloom_candidate_files,
        build_file_bloom,
        compact_table,
        read_point_lookup,
        read_table,
        write_table,
    )
    import pyspark.sql.functions as F

    root = str(tmp_path / "btab")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    write_table(df.repartition(8), root)
    # range-cluster on k so each key lives in one file
    compact_table(spark, root, target_files=8, sort_by=["k"])
    build_file_bloom(spark, root, "k")

    n_files = (
        read_table(spark, root)
        .select(F.col("_metadata.file_path"))
        .distinct()
        .count()
    )
    assert n_files == 8

    cand = bloom_candidate_files(spark, root, "k", 1234)
    assert 1 <= len(cand) < n_files  # real skipping happened
    got = read_point_lookup(spark, root, "k", 1234).collect()
    assert len(got) == 1 and got[0]["v"] == 1234 * 7 % 1000

    # absent key: may touch FP files but returns nothing
    assert read_point_lookup(spark, root, "k", 999_999).count() == 0
    # sidecar is invisible to the snapshot scan
    assert read_table(spark, root).count() == 4000


def test_bloom_params_persisted_and_mismatch_rejected(spark, tmp_path):
    """The sidecar stores its (m, k); probes derive them from the
    sidecar (so a caller can't silently probe with the wrong
    parameters and get false negatives), matching explicit values
    pass, and a conflicting explicit value raises."""
    import pytest

    from pagerank_spark.table import (
        bloom_candidate_files,
        build_file_bloom,
        compact_table,
        read_point_lookup,
        write_table,
    )
    import pyspark.sql.functions as F

    root = str(tmp_path / "btab2")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    write_table(df.repartition(4), root)
    compact_table(spark, root, target_files=4, sort_by=["k"])
    build_file_bloom(spark, root, "k", m=1 << 12, k=5)

    # probe with NO m/k: derived from the persisted params — the
    # pre-fix behavior would have probed with the (1<<16, 3) defaults
    # and found zero candidate files for a PRESENT key
    assert len(bloom_candidate_files(spark, root, "k", 77)) >= 1
    got = read_point_lookup(spark, root, "k", 77).collect()
    assert len(got) == 1 and got[0]["v"] == 7

    # matching explicit params are fine
    assert bloom_candidate_files(spark, root, "k", 77, m=1 << 12, k=5)
    # conflicting explicit params raise instead of dropping rows
    with pytest.raises(ValueError, match="m="):
        bloom_candidate_files(spark, root, "k", 77, m=1 << 16)
    with pytest.raises(ValueError, match="k="):
        read_point_lookup(spark, root, "k", 77, k=3)
