"""Unit tests for the relational / dedup / text operator surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators import dedup, relational, text


def _edges(spark):
    return spark.createDataFrame(
        [(1, 2), (1, 3), (1, 2), (2, 3), (3, 1), (4, 1)], ["src", "dst"]
    )


def test_exact_dedup_is_tie_safe(spark):
    # Two duplicate rows tie on order_col: exactly ONE must survive
    # (the round-1 min-join implementation kept both).
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("a", 2, "z"), ("b", 5, "w")],
        ["key", "ord", "payload"],
    )
    out = dedup.exact_dedup(df, ["key"], "ord")
    assert out.count() == 2
    kept = {r["key"]: r["ord"] for r in out.collect()}
    assert kept == {"a": 1, "b": 5}


def test_simhash_max_hamming_validated(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_neardup_pairs(df, max_hamming=7)


def test_language_markers_are_word_bounded(spark):
    # "la" must not match inside "plan"; "a" must not match inside "cat".
    df = spark.createDataFrame(
        [(1, "plan plan plan plan"), (2, "the cat and the hat")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.language_id(df).collect()}
    assert out[1] == "unknown"
    assert out[2] == "en"


def test_adjacency_lists_sorted(spark):
    rows = relational.adjacency_lists(_edges(spark)).collect()
    by_src = {r["src"]: (r["dsts"], r["deg"]) for r in rows}
    assert by_src[1] == ([2, 2, 3], 3)
    assert by_src[2] == ([3], 1)


def test_duplicate_rows_report(spark):
    rows = relational.duplicate_rows_report(_edges(spark), ["src", "dst"]).collect()
    assert [(r["src"], r["dst"], r["n_occurrences"]) for r in rows] == [(1, 2, 2)]


def test_score_quantiles_exact_matches_known(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], ["score"])
    row = relational.score_quantiles(df, "score").collect()[0]
    assert row["p25"] == pytest.approx(1.75)
    assert row["p50"] == pytest.approx(2.5)
    assert row["p75"] == pytest.approx(3.25)


def test_induced_subgraph_requires_both_endpoints(spark):
    nodes = spark.createDataFrame([(1,), (2,)], ["node"])
    rows = relational.induced_subgraph(_edges(spark), nodes).collect()
    assert sorted((r["src"], r["dst"]) for r in rows) == [(1, 2), (1, 2)]


def test_node_intersection(spark):
    e = _edges(spark)
    both = relational.node_intersection(
        e.select(F.col("src").alias("node")), e.select(F.col("dst").alias("node"))
    )
    assert sorted(r["node"] for r in both.collect()) == [1, 2, 3]


def test_subset_flag_preserves_bag(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["node"])
    rows = relational.subset_flag(_edges(spark), nodes).collect()
    assert len(rows) == 6  # full edge bag preserved
    flags = {}
    for r in rows:
        flags.setdefault((r["src"], r["dst"]), r["in_subset"])
    assert flags[(1, 2)] is True
    assert flags[(4, 1)] is False


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key; salted results must equal the
    # plain join exactly (salts only redistribute work).
    left = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 900 + k) for k in range(2, 12)],
        ["k", "lv"],
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(0, 12)], ["k", "rv"]
    )
    plain = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in left.join(right, on=["k"]).collect()
    )
    salted = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in relational.salted_join(left, right, on=["k"], n_salts=4).collect()
    )
    assert salted == plain
    assert len(plain) == 100


def test_with_position_and_positional_compare(spark):
    d = spark.createDataFrame([(1, 10), (2, 30), (3, 20)], ["node", "deg"])
    pos = relational.with_position(d, "deg", "node")
    by_node = {r["node"]: r["position"] for r in pos.collect()}
    assert by_node == {2: 1, 3: 2, 1: 3}
    cmp = relational.positional_compare([pos, pos], value_col="node").collect()
    assert all(r["all_match"] for r in cmp)


def test_jaccard_candidates_path_matches_full_join(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")], ["doc_id", "text"]
    )
    sh = dedup.word_shingles(docs, "doc_id", "text", n=1)
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.1).collect()
    }
    cands = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    via_cands = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.1, candidates=cands).collect()
    }
    assert via_cands == {(1, 2): full[(1, 2)]}
    assert full[(1, 2)] == pytest.approx(3 / 5)


def test_ann_lsh_schema_and_recall(spark):
    from pagerank_spark.io import load_table
    from pagerank_spark.operators.similarity import ann_lsh, ann_topk_bruteforce
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = ann_topk_bruteforce(emb, queries, k=3)
    approx = ann_lsh(emb, queries, dim=dim, k=3)
    assert exact.columns == approx.columns
    truth = {(r["query_id"], r["nb_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["nb_id"]) for r in approx.collect()}
    # LSH is approximate: require non-trivial overlap with exact top-k.
    assert len(truth & got) / len(truth) > 0.2


def test_ann_ivf_schema_and_recall(spark):
    from pagerank_spark.io import load_table
    from pagerank_spark.operators.similarity import ann_ivf, ann_topk_bruteforce
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = ann_topk_bruteforce(emb, queries, k=3)
    approx = ann_ivf(emb, queries, k=3, n_centroids=8, n_probe=3)
    assert exact.columns == approx.columns
    truth = {(r["query_id"], r["nb_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["nb_id"]) for r in approx.collect()}
    # Probing 3/8 lists: expect a substantial fraction of exact top-k.
    assert len(truth & got) / len(truth) > 0.3


def test_jaccard_hot_shingle_cap(spark):
    # 'a' appears in all three docs; with max_doc_freq=2 it is dropped
    # from intersections AND sizes.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a z")], ["doc_id", "text"]
    )
    sh = dedup.word_shingles(docs, "doc_id", "text", n=1)
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.1, max_doc_freq=2).collect()
    }
    assert capped == {(1, 2): pytest.approx(1.0)}


def test_asof_join_semantics(spark):
    # Inclusive at equal ts, max-dedup on tied right rows, left-outer
    # nulls when no right row precedes.
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (1, 15, 5.0), (2, 9, 9.0)],
        "k long, ts long, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["ts_asof"], r["v_asof"])
        for r in relational.asof_join(
            left, right, on="k", value_cols=["v"]
        ).collect()
    }
    assert out == {(1, 10): (10, 1.0), (1, 20): (15, 5.0), (2, 5): (None, None)}


def test_asof_join_null_columns_come_from_one_row(spark):
    # True ASOF semantics: ALL carried fields come from the single
    # latest preceding right row — a NULL in one of its value columns
    # must surface as NULL, not be stitched from an older right row
    # (the per-column last(ignorenulls) bug the struct carry fixes).
    left = spark.createDataFrame([(1, 20, "a")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "x"), (1, 15, None, "y")],
        "k long, ts long, v double, w string",
    )
    row = relational.asof_join(
        left, right, on="k", value_cols=["v", "w"]
    ).collect()[0]
    assert (row["ts_asof"], row["v_asof"], row["w_asof"]) == (15, None, "y")


def test_asof_join_single_shuffle_plan(spark):
    # The union-marker plan must contain exactly one exchange (on the
    # key) and no nested-loop/cartesian join.
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, tag string")
    right = spark.createDataFrame([(1, 9, 1.0)], "k long, ts long, v double")
    plan = (
        relational.asof_join(left, right, on="k", value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one exchange for the right-side dedup groupBy + one for the window
    # partitioning at most; both hash on k.
    assert plan.count("Exchange hashpartitioning") <= 2


def test_temporal_joins_ntz_dst_safe(spark):
    # TIMESTAMP_NTZ has naive-difference semantics (pandas merge_asof
    # parity). The old epoch-double hop measured physical seconds in the
    # session tz, so across a DST transition a 90-min-stale row passed a
    # 1h tolerance (spring-forward) and a 30-min-fresh row was dropped
    # (fall-back). Interval arithmetic is tz-free; pin both directions
    # under a DST session timezone.
    from datetime import datetime

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        left = spark.createDataFrame(
            [
                # spring-forward 2024-03-10 02:00: naive diff to its
                # right row is 90 min (physical 30 min).
                (1, datetime(2024, 3, 10, 3, 0)),
                # fall-back 2024-11-03 02:00: naive diff 30 min
                # (physical 90 min).
                (2, datetime(2024, 11, 3, 2, 15)),
            ],
            "k long, ts timestamp_ntz",
        )
        right = spark.createDataFrame(
            [
                (1, datetime(2024, 3, 10, 1, 30), 1.0),
                (2, datetime(2024, 11, 3, 1, 45), 2.0),
            ],
            "k long, ts timestamp_ntz, v double",
        )
        out = {
            r["k"]: r["v_asof"]
            for r in relational.asof_join(
                left, right, on="k", value_cols=["v"], tolerance_seconds=3600
            ).collect()
        }
        assert out == {1: None, 2: 2.0}

        pairs = {
            (r["k"], r["v"])
            for r in relational.interval_join(
                left, right.withColumnRenamed("v", "v"), on=["k"],
                interval_seconds=3600,
            ).collect()
        }
        assert pairs == {(2, 2.0)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_approx_count_distinct_error_bound(spark):
    from pagerank_spark.io import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.02 * r["exact"])


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 1000, 200),
            "lid": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "ts": rng.integers(0, 1000, 300),
            "v": rng.random(300).round(6),
        }
    )
    # merge_asof needs unique right (k, ts) to be deterministic — apply
    # the same max-dedup the operator applies.
    right = right.groupby(["k", "ts"], as_index=False)["v"].max()

    got = {
        r["lid"]: (r["ts_asof"], r["v_asof"])
        for r in relational.asof_join(
            spark.createDataFrame(left.astype({"k": "int64", "ts": "int64"})),
            spark.createDataFrame(right.astype({"k": "int64", "ts": "int64"})),
            on="k",
            value_cols=["v"],
        ).collect()
    }

    exp_df = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(
            columns={"ts": "rts", "v": "rv"}
        ),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    )
    for row in exp_df.itertuples():
        exp_ts = None if pd.isna(row.rts) else int(row.rts)
        exp_v = None if pd.isna(row.rv) else round(float(row.rv), 6)
        got_ts, got_v = got[row.lid]
        got_v = None if got_v is None else round(got_v, 6)
        assert (got_ts, got_v) == (exp_ts, exp_v), row.lid


def test_interval_join_matches_naive(spark):
    import random

    rng = random.Random(5)
    base = 1_700_000_000
    left = [
        (i, rng.randint(0, 4), base + rng.randint(0, 20_000))
        for i in range(80)
    ]
    right = [
        (100 + i, rng.randint(0, 4), base + rng.randint(0, 20_000), round(rng.random(), 3))
        for i in range(120)
    ]
    ldf = spark.createDataFrame(
        [(i, k, __import__("datetime").datetime.utcfromtimestamp(t)) for i, k, t in left],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, __import__("datetime").datetime.utcfromtimestamp(t), v) for i, k, t, v in right],
        "rid long, k long, ts timestamp, v double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in relational.interval_join(
            ldf, rdf, on=["k"], interval_seconds=3600
        ).collect()
    }
    want = {
        (li, ri)
        for (li, lk, lt) in left
        for (ri, rk, rt, _) in right
        if lk == rk and lt - 3600 <= rt <= lt
    }
    assert got == want
    assert len(want) > 0


def test_interval_join_equi_plan(spark):
    # The bucketed formulation must plan as a hash equi-join — never a
    # nested-loop range join.
    ldf = spark.createDataFrame([(1, 1, 0)], "lid long, k long, e long").select(
        "lid", "k", F.timestamp_seconds("e").alias("ts")
    )
    rdf = spark.createDataFrame([(2, 1, 0)], "rid long, k long, e long").select(
        "rid", "k", F.timestamp_seconds("e").alias("ts")
    )
    plan = (
        relational.interval_join(ldf, rdf, on=["k"], interval_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_groupwise_zscore_engines_agree(spark):
    """The Arrow applyInPandas path and the Catalyst window path are the
    same operator: identical values to 1e-9 on every row, including a
    singleton group (stddev_samp undefined -> NULL in both)."""
    from pagerank_spark.operators.relational import groupwise_zscore

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 10.0), ("b", 30.0),
         ("lone", 7.0)],
        "g string, x double",
    )
    w = {
        (r["g"], r["x"]): r["z"]
        for r in groupwise_zscore(df, ["g"], "x").collect()
    }
    p = {
        (r["g"], r["x"]): r["z"]
        for r in groupwise_zscore(df, ["g"], "x", engine="pandas").collect()
    }
    assert set(w) == set(p)
    for k, wv in w.items():
        pv = p[k]
        if wv is None:
            assert pv is None or pv != pv
        else:
            assert abs(wv - pv) < 1e-9
    assert w[("lone", 7.0)] is None


def test_groupwise_ols_engines_agree(spark):
    """The sql (regr_* moments) and arrow (applyInPandas numpy) OLS
    engines are the same operator: identical rounded values on real
    groups AND on every degenerate shape — all-null pairs (n=0),
    singleton, var(x)=0 (slope/intercept/r2 NULL), var(y)=0 with
    var(x)!=0 (r2 exactly 1)."""
    from pagerank_spark.operators.analytics import groupwise_ols

    df = spark.createDataFrame(
        [
            ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 7.0),
            ("a", 4.0, 8.5), ("a", 5.0, 11.0),
            ("vx0", 5.0, 1.0), ("vx0", 5.0, 2.0),
            ("vy0", 1.0, 3.0), ("vy0", 2.0, 3.0),
            ("nul", None, 1.0), ("nul", 2.0, None),
            ("one", 4.0, 9.0),
        ],
        "g string, x double, y double",
    )

    def rows(engine):
        return {
            r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
            for r in groupwise_ols(df, ["g"], "x", "y", engine=engine)
            .collect()
        }

    s, a = rows("sql"), rows("arrow")
    assert set(s) == set(a) == {"a", "vx0", "vy0", "nul", "one"}
    for g in s:
        assert s[g] == a[g], (g, s[g], a[g])
    assert s["nul"] == (0, None, None, None)
    assert s["one"] == (1, None, None, None)
    assert s["vx0"] == (2, None, None, None)
    assert s["vy0"] == (2, 0.0, 3.0, 1.0)


def test_groupwise_ols_bad_engine(spark):
    from pagerank_spark.operators.analytics import groupwise_ols

    df = spark.createDataFrame([("a", 1.0, 1.0)], "g string, x double, y double")
    try:
        groupwise_ols(df, ["g"], "x", "y", engine="rdd")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_groupwise_zscore_bad_engine(spark):
    from pagerank_spark.operators.relational import groupwise_zscore

    df = spark.createDataFrame([("a", 1.0)], "g string, x double")
    try:
        groupwise_zscore(df, ["g"], "x", engine="rdd")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_funnel_requires_strict_order(spark):
    """A user whose 'click' precedes their first 'view' must not count
    for stage 1 — the funnel is ordered, not a bag-of-events check."""
    from pagerank_spark.operators.analytics import funnel_counts

    rows = [
        # u1: view@10 -> click@20 -> purchase@30  (full funnel)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click@5 BEFORE view@10, no click after -> stops at view
        (2, "click", 5), (2, "view", 10), (2, "purchase", 30),
        # u3: view only
        (3, "view", 10),
        # u4: never viewed -> not even stage 0
        (4, "click", 10), (4, "purchase", 20),
    ]
    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows], "user_id long, event_type string, sec long"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = {
        r["stage_name"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_kcore_peels_tail(spark):
    """Triangle + pendant chain, k=2: the chain peels off over rounds,
    the triangle survives with degree 2 everywhere."""
    from pagerank_spark.graph.components import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),      # triangle: 2-core
         (3, 4), (4, 5)],             # pendant chain: peels
        "src long, dst long",
    )
    got = {r["node"]: r["deg"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: hub degree n pairs with
    leaf degree 1 on every edge -> corr undefined only if degenerate;
    star+extra edge gives a strictly negative coefficient."""
    from pagerank_spark.graph.components import degree_assortativity

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)],
        "src long, dst long",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_edges"] == 6
    assert row["assortativity"] < 0


def test_asof_tolerance_masks_stale_matches(spark):
    """tolerance_seconds nulls carried fields when the matched right row
    is older than the bound; an in-bound match is untouched."""
    from pagerank_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [("k", 100.0, "p1"), ("k", 5000.0, "p2")],
        "k string, ts double, tag string",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "tag")
    right = spark.createDataFrame(
        [("k", 90.0, 1.0)], "k string, ts double, v double"
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "v")

    out = {
        r["tag"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(
            left, right, on="k", value_cols=["v"], tolerance_seconds=60
        ).collect()
    }
    assert out["p1"][1] == 1.0           # 10s stale: kept
    assert out["p2"] == (None, None)     # 4910s stale: masked


def test_asof_tolerance_on_ntz_timestamps(spark):
    """The parquet fixtures surface ts as TIMESTAMP_NTZ, which cannot
    cast straight to double — the tolerance mask must work there too."""
    from pagerank_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:01:40", "p1"), ("k", "2024-01-01 01:23:20", "p2")],
        "k string, ts string, tag string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "tag")
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:01:30", 1.0)], "k string, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "v")

    out = {
        r["tag"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(
            left, right, on="k", value_cols=["v"], tolerance_seconds=60
        ).collect()
    }
    assert out["p1"][1] == 1.0
    assert out["p2"] == (None, None)


def test_asof_join_ntz_tolerance_matches_pandas(spark):
    # datetime64 (tz-naive) inputs declared as TIMESTAMP_NTZ with a
    # tolerance: the operator's DayTimeInterval bound must reproduce
    # pandas merge_asof's naive Timedelta semantics exactly even in a
    # DST session timezone. (TIMESTAMP columns are instants — physical
    # duration is the CORRECT semantics there and legitimately differs
    # from pandas across a DST transition.)
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(21)
    base = pd.Timestamp("2024-03-09 12:00:00")  # spans US spring-forward
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 150),
            "ts": base
            + pd.to_timedelta(rng.integers(0, 96 * 3600, 150), unit="s"),
            "lid": np.arange(150),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 200),
            "ts": base
            + pd.to_timedelta(rng.integers(0, 96 * 3600, 200), unit="s"),
            "v": rng.random(200).round(6),
        }
    )
    right = right.groupby(["k", "ts"], as_index=False)["v"].max()

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        got = {
            r["lid"]: r["v_asof"]
            for r in relational.asof_join(
                spark.createDataFrame(
                    left, "k long, ts timestamp_ntz, lid long"
                ),
                spark.createDataFrame(right, "k long, ts timestamp_ntz, v double"),
                on="k",
                value_cols=["v"],
                tolerance_seconds=7200,
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    exp_df = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"v": "rv"}),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=7200),
    )
    want = {int(r.lid): (None if pd.isna(r.rv) else r.rv) for r in exp_df.itertuples()}
    assert set(got) == set(want)
    for lid in want:
        if want[lid] is None:
            assert got[lid] is None
        else:
            assert got[lid] == pytest.approx(want[lid], abs=1e-9)


def test_interval_join_subsecond_widths(spark):
    # Millisecond bucketing supports fractional widths down to 1ms;
    # only sub-millisecond widths (unrepresentable) are refused.
    import duckdb
    import pytest as _pytest

    from pagerank_spark.operators.relational import interval_join

    df = spark.createDataFrame([(1, 10.0)], "k LONG, ts DOUBLE")
    with _pytest.raises(ValueError, match="millisecond"):
        interval_join(df, df, on=["k"], interval_seconds=0.0001)
    with _pytest.raises(ValueError, match="millisecond"):
        interval_join(df, df, on=["k"], interval_seconds=0)
    assert interval_join(df, df, on=["k"], interval_seconds=2.0).count() == 1

    # 0.5s width on sub-second numeric epochs vs a DuckDB twin.
    lrows = [(1, round(0.1 * i, 3)) for i in range(40)]
    rrows = [(1, round(0.07 * i, 3)) for i in range(60)]
    ldf = spark.createDataFrame(lrows, "k LONG, ts DOUBLE")
    rdf = spark.createDataFrame(
        [(k, t) for k, t in rrows], "k LONG, rts DOUBLE"
    )
    got = sorted(
        (r["ts"], r["rts"])
        for r in interval_join(
            ldf, rdf, on=["k"], interval_seconds=0.5, right_ts="rts"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, ts DOUBLE)")
    con.execute("CREATE TABLE r(k BIGINT, rts DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?)", lrows)
    con.executemany("INSERT INTO r VALUES (?, ?)", rrows)
    want = sorted(
        (row[0], row[1])
        for row in con.execute(
            "SELECT l.ts, r.rts FROM l JOIN r ON l.k = r.k "
            "AND r.rts >= l.ts - 0.5 AND r.rts <= l.ts"
        ).fetchall()
    )
    assert got == want and len(want) > 50

    # 0.5s width on TIMESTAMP columns: same pairs via interval bounds.
    lts = spark.createDataFrame(
        [(1, f"2024-01-01 00:00:{s:06.3f}") for s in
         (0.0, 0.25, 0.5, 1.0, 1.499, 1.5)],
        "k LONG, raw STRING",
    ).selectExpr("k", "CAST(raw AS TIMESTAMP) AS ts")
    rts = spark.createDataFrame(
        [(1, f"2024-01-01 00:00:{s:06.3f}") for s in
         (0.0, 0.3, 0.999, 1.0, 1.2)],
        "k LONG, raw STRING",
    ).selectExpr("k", "CAST(raw AS TIMESTAMP) AS rts")
    got_ts = {
        (str(r["ts"]), str(r["rts"]))
        for r in interval_join(
            lts, rts, on=["k"], interval_seconds=0.5, right_ts="rts"
        ).collect()
    }
    # naive cross check in integer millis (timestamp arithmetic is
    # exact microseconds; a float check misses lv-0.5 == rv edges)
    import itertools
    lvals = [0, 250, 500, 1000, 1499, 1500]
    rvals = [0, 300, 999, 1000, 1200]
    want_n = sum(
        1 for lv, rv in itertools.product(lvals, rvals)
        if lv - 500 <= rv <= lv
    )
    assert len(got_ts) == want_n == 11


def test_gopher_quality_gates(spark):
    long_good = " ".join(["alpha beta gamma delta"] * 15)  # 60 words
    too_short = "just a few words here"
    symbol_heavy = " ".join(["word ### *** ..."] * 20)  # 20 words, 60+ syms
    dup_lines = "\n".join(["same line of text"] * 8 + ["unique closer"])
    df = spark.createDataFrame(
        [(1, long_good), (2, too_short), (3, symbol_heavy), (4, dup_lines)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in text.gopher_quality(df, min_words=10).collect()
    }
    assert out[1]["passes_gopher"] is True
    assert out[2]["passes_gopher"] is False  # 4 words < floor
    assert out[3]["passes_gopher"] is False  # symbol ratio 7.0 > 0.1
    assert out[3]["symbol_word_ratio"] == 7.0
    assert out[4]["passes_gopher"] is False  # 7/9 duplicate lines
    assert abs(out[4]["dup_line_frac"] - 7 / 9) < 1e-9
    assert out[1]["n_words"] == 60
    assert abs(out[1]["mean_word_len"] - 19 / 4) < 1e-9


def test_pii_redact_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org or +1 (555) 123-4567."),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.io and 555 0100 9999"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.pii_redact(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert "<PHONE>" in out[1]["text_redacted"]
    assert "jo.doe" not in out[1]["text_redacted"]
    assert "555" not in out[1]["text_redacted"]
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["text_redacted"] == "no pii here"
    assert out[3]["n_emails"] == 2 and out[3]["n_phones"] == 1
    assert out[3]["text_redacted"].count("<EMAIL>") == 2


def test_sample_to_mix_hits_target_and_is_deterministic(spark):
    from pagerank_spark.operators.curation import mix_plan, sample_to_mix

    rows = [(i, "big" if i % 10 < 8 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    # Target 50/50 from an 80/20 corpus: "small" (1000 rows) binds, so
    # the plan keeps all of it and downsamples "big" to ~1000.
    plan = {
        r["grp"]: r
        for r in mix_plan(df, "grp", {"big": 0.5, "small": 0.5}).collect()
    }
    assert plan["small"]["keep_frac"] == 1.0
    assert abs(plan["big"]["keep_frac"] - 0.25) < 1e-9
    kept = sample_to_mix(df, "grp", {"big": 0.5, "small": 0.5}, id_col="id")
    sizes = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(
        F.count("*").alias("n")).collect()}
    assert sizes["small"] == 1000
    assert 850 <= sizes["big"] <= 1150  # binomial around 1000
    # Deterministic: identical keep set on rerun.
    ids1 = sorted(r["id"] for r in kept.select("id").collect())
    ids2 = sorted(
        r["id"]
        for r in sample_to_mix(
            df, "grp", {"big": 0.5, "small": 0.5}, id_col="id"
        ).select("id").collect()
    )
    assert ids1 == ids2
    # Unknown group (weight absent) is dropped entirely.
    df2 = df.union(spark.createDataFrame([(99999, "other")], ["id", "grp"]))
    kept2 = sample_to_mix(df2, "grp", {"big": 0.5, "small": 0.5}, id_col="id")
    assert kept2.where(F.col("grp") == "other").count() == 0


def test_contamination_report_counts_shared_shingles(spark):
    from pagerank_spark.operators.curation import contamination_report

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps elsewhere"),
            (2, "totally unrelated words with zero benchmark overlap here"),
            (3, "the quick brown fox jumps over the lazy dog exactly"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_report(corpus, bench, n=5).collect()
    }
    assert out[1] == 1  # shares exactly "the quick brown fox jumps"
    assert 2 not in out  # clean doc reported nowhere
    assert out[3] == 5  # all 5 benchmark 5-grams present


def test_remove_boilerplate_lines_keeps_order(spark):
    from pagerank_spark.operators.curation import remove_boilerplate_lines

    df = spark.createDataFrame(
        [
            (1, "unique alpha\nshared footer\nunique beta"),
            (2, "other text\nshared footer"),
            (3, "solo document with its own line"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df).collect()}
    assert out[1]["text"] == "unique alpha\nunique beta"  # order preserved
    assert out[1]["n_lines_removed"] == 1
    assert out[2]["text"] == "other text"
    assert out[3]["text"] == "solo document with its own line"
    assert out[3]["n_lines_removed"] == 0


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common common rare1 rare1 rare1"),
            (2, "common rare2"),
            (3, "common filler"),
        ],
        ["doc_id", "text"],
    )
    out = text.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # "common" appears in all docs -> idf 0; doc-specific terms win.
    assert top == {1: "rare1", 2: "rare2", 3: "filler"}
    ranks = {(r["doc_id"], r["rk"]) for r in out}
    assert all(rk == 1 for _, rk in ranks)


def test_word_shingles_short_docs_yield_no_shingles(spark):
    # Docs shorter than n tokens have no n-grams; sequence(1, stop<1)
    # DESCENDS in Spark ([1, 0]) and fed slice a 0 start — this used
    # to be a runtime crash on any short/empty document.
    df = spark.createDataFrame(
        [(1, "only two"), (2, "a b c d e f"), (3, "")],
        ["doc_id", "text"],
    )
    out = dedup.word_shingles(df, "doc_id", "text", n=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in by_doc and 3 not in by_doc
    assert sorted(by_doc[2]) == ["a b c d e", "b c d e f"]


def test_text_ops_null_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "fifty words " * 25)], ["doc_id", "text"]
    )
    g = {r["doc_id"]: r for r in text.gopher_quality(df).collect()}
    assert g[1]["n_words"] == 0 and g[1]["passes_gopher"] is False
    assert g[2]["passes_gopher"] is True
    p = {r["doc_id"]: r for r in text.pii_redact(df).collect()}
    assert p[1]["n_emails"] == 0 and p[1]["text_redacted"] == ""


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from pagerank_spark.operators.curation import (
        bloom_bits,
        bloom_might_contain,
    )

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], ["k"]
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], ["k"]
    )
    bits = bloom_bits(keys, "k", m=1 << 14, k=3)
    # Every inserted key MUST be reported present (no false negatives).
    present = bloom_might_contain(keys, "k", bits, m=1 << 14, k=3)
    assert all(r["might_contain"] for r in present.collect())
    # False positives on disjoint probes stay near (set_bits/m)^3.
    n_bits = bits.count()
    fp = (
        bloom_might_contain(others, "k", bits, m=1 << 14, k=3)
        .where("might_contain")
        .count()
    )
    expected = 2000 * (n_bits / (1 << 14)) ** 3
    assert fp <= max(10, 10 * expected)


def test_pack_sequences_matches_sequential_layout(spark):
    from pagerank_spark.operators.curation import pack_sequences

    rows = [(i, (i * 37) % 200 + 1) for i in range(0, 500, 3)]
    df = spark.createDataFrame(rows, ["id", "n"])
    out = {
        r["id"]: r
        for r in pack_sequences(df, "id", "n", budget=128, blocks=7)
        .collect()
    }
    # Sequential ground truth: running offset in id order.
    start = 0
    for i, n in sorted(rows):
        r = out[i]
        assert r["start_tok"] == start
        assert r["seq_first"] == start // 128
        assert r["seq_last"] == (start + n - 1) // 128
        assert r["offset_in_seq"] == start % 128
        start += n


def test_pack_sequences_empty_and_single_block(spark):
    from pagerank_spark.operators.curation import pack_sequences

    empty = spark.createDataFrame([], "id long, n long")
    assert pack_sequences(empty, "id", "n", budget=16).count() == 0
    one = spark.createDataFrame([(5, 40)], ["id", "n"])
    r = pack_sequences(one, "id", "n", budget=16, blocks=4).collect()[0]
    assert (r["start_tok"], r["seq_first"], r["seq_last"]) == (0, 0, 2)


def test_dataset_split_disjoint_exhaustive_deterministic(spark):
    from pagerank_spark.operators.curation import dataset_split

    df = spark.createDataFrame([(i,) for i in range(4000)], ["id"])
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = dataset_split(df, "id", fr).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    assert sum(counts.values()) == 4000  # exhaustive, disjoint
    assert abs(counts["train"] - 3200) < 150  # binomial concentration
    # Rerun (and re-partitioned input) assigns identically.
    again = dataset_split(df.repartition(13), "id", fr)
    merged = (
        dataset_split(df, "id", fr)
        .withColumnRenamed("split", "a")
        .join(again.withColumnRenamed("split", "b"), on="id")
    )
    assert merged.where("a <> b").count() == 0


def test_cms_never_underestimates_any_key(spark):
    from pagerank_spark.operators.sketch import cms_build, cms_estimate
    from pyspark.sql import functions as F

    # Zipf-ish stream: key j appears ~600/j times.
    rows = [(f"k{j}",) for j in range(1, 60) for _ in range(600 // j)]
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_build(df, "k", width=64, depth=4)
    # Sketch is bounded by depth x width regardless of stream size.
    assert sketch.count() <= 4 * 64
    exact = df.groupBy("k").agg(F.count("*").alias("exact"))
    est = cms_estimate(exact, "k", sketch, width=64, depth=4)
    checked = est.collect()
    assert len(checked) == 59
    assert all(r["cms_est"] >= r["exact"] for r in checked)
    # Mergeability: sketches of two disjoint shards sum cell-wise to
    # the whole-stream sketch (linearity).
    h1 = df.where(F.length("k") == 2)
    h2 = df.where(F.length("k") != 2)
    merged = (
        cms_build(h1, "k", width=64, depth=4)
        .unionAll(cms_build(h2, "k", width=64, depth=4))
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["d"], r["pos"]): r["cnt"] for r in sketch.collect()}
    assert {
        (r["d"], r["pos"]): r["cnt"] for r in merged.collect()
    } == full


def test_unigram_logprob_ranks_rare_token_docs_lower(spark):
    from pagerank_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "the the the zzzquux"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["n_toks"] == 4 and out[2]["n_toks"] == 4
    # Doc 2 contains a corpus-rare token: strictly lower mean logprob.
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"] < 0


def test_merge_grouped_partials_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.relational import merge_grouped_partials

    rows = [(i % 7, float(i * 3 + 1)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"])

    def agg(d):
        return d.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("*").alias("n")
        )

    base, delta = df.where("v < 900"), df.where("v >= 900")
    merged = merge_grouped_partials(
        agg(base), agg(delta), keys=["k"], sum_cols=["s", "n"]
    )
    full = {r["k"]: (r["s"], r["n"]) for r in agg(df).collect()}
    got = {r["k"]: (r["s"], r["n"]) for r in merged.collect()}
    assert got == full
    # A key present only in the delta still appears after the merge.
    extra = spark.createDataFrame([(99, 5.0, 2)], ["k", "s", "n"])
    with_new = merge_grouped_partials(
        agg(base), extra, keys=["k"], sum_cols=["s", "n"]
    )
    assert with_new.where("k = 99").collect()[0]["s"] == 5.0


def test_chunk_documents_windows_and_overlap(spark):
    from pagerank_spark.operators.text import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, toks), (2, "a b"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(
        df, "doc_id", "text", chunk_tokens=4, overlap_tokens=1
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # step=3, n=10 -> ceil((10-1)/3)=3 chunks: [0:4],[3:7],[6:10]
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0]["chunk_text"] == "t0 t1 t2 t3"
    assert by_doc[1][1]["chunk_text"] == "t3 t4 t5 t6"
    assert by_doc[1][2]["chunk_text"] == "t6 t7 t8 t9"
    # consecutive chunks share exactly the 1-token overlap
    assert by_doc[1][0]["chunk_text"].split()[-1] == \
        by_doc[1][1]["chunk_text"].split()[0]
    # short doc: one (short) chunk; empty doc: dropped
    assert by_doc[2][0]["chunk_text"] == "a b"
    assert by_doc[2][0]["n_chunk_toks"] == 2
    assert 3 not in by_doc
    import pytest as _pt

    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", 4, 4)


def test_expectations_report_counts_violations(spark):
    from pagerank_spark.operators.validate import expectations_report

    rows = [
        (1, 10.0, "A"),
        (2, 10.0, "A"),
        (2, 999.0, "B"),   # dup id, range violation
        (None, 5.0, "C"),  # null id, bad status
        (7, None, "A"),    # null value exempt from range
    ]
    df = spark.createDataFrame(rows, "id long, v double, st string")
    ref = spark.createDataFrame([(1,), (2,)], ["k"])
    rep = {
        r["rule"]: (r["violations"], r["passed"])
        for r in expectations_report(
            df,
            not_null=["id"],
            unique=[["id"]],
            ranges={"v": (0.0, 100.0)},
            accepted={"st": ["A", "B"]},
            foreign_keys=[("id", ref, "k")],
        ).collect()
    }
    assert rep["not_null:id"] == (1, False)
    assert rep["unique:id"] == (1, False)  # one surplus row for id=2
    assert rep["range:v"] == (1, False)    # 999 only; NULL exempt
    assert rep["accepted:st"] == (1, False)
    assert rep["fk:id->k"] == (1, False)   # id=7 missing from ref
    # A clean table passes everything.
    clean = spark.createDataFrame(
        [(1, 1.0, "A"), (2, 2.0, "B")], "id long, v double, st string"
    )
    rep2 = expectations_report(
        clean, not_null=["id"], unique=[["id"]],
        ranges={"v": (0.0, 100.0)},
    ).collect()
    assert all(r["passed"] for r in rep2)


def test_sample_weighted_probability_semantics(spark):
    from pagerank_spark.operators.curation import sample_weighted
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, 0.0 if i % 3 == 0 else (1.0 if i % 3 == 1 else 0.5))
         for i in range(3000)],
        "id long, p double",
    )
    kept = sample_weighted(df, "p", "id")
    by_p = {
        r["p"]: r["n"]
        for r in kept.groupBy("p").agg(F.count("*").alias("n")).collect()
    }
    assert 0.0 not in by_p            # p=0 rows never survive
    assert by_p[1.0] == 1000          # p=1 rows always survive
    assert 350 < by_p[0.5] < 650      # p=0.5 concentrates near half
    # Deterministic across reruns and repartitioning.
    a = {r["id"] for r in kept.collect()}
    b = {r["id"] for r in sample_weighted(df.repartition(9), "p", "id").collect()}
    assert a == b
    # Out-of-range probabilities clamp instead of corrupting the coin.
    weird = spark.createDataFrame([(1, 7.0), (2, -3.0)], "id long, p double")
    got = {r["id"] for r in sample_weighted(weird, "p", "id").collect()}
    assert got == {1}


def test_portable_hll_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import hll_estimate, hll_registers

    for n in (100, 5000, 50000):
        df = spark.range(n).select(F.col("id").cast("string").alias("k"))
        est = hll_estimate(hll_registers(df, "k")).collect()[0][
            "hll_estimate"
        ]
        # 256 registers: standard error ~1.04/16 = 6.5%; allow 3 sigma.
        assert abs(est - n) / n < 0.2, (n, est)
    # Duplicates don't move the estimate (distinct semantics).
    base = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_estimate(hll_registers(base, "k")).collect()[0][0]
    b = hll_estimate(hll_registers(dup, "k")).collect()[0][0]
    assert a == b
    # Mergeability: register-wise MAX of two shards == whole build.
    h1 = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    h2 = spark.range(2000, 6000).select(
        F.col("id").cast("string").alias("k")
    )
    merged = (
        hll_registers(h1, "k")
        .unionAll(hll_registers(h2, "k"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(h1.unionAll(h2), "k")
    assert {
        (r["bucket"], r["max_rho"]) for r in merged.collect()
    } == {(r["bucket"], r["max_rho"]) for r in whole.collect()}


def test_minhash_lsh_recall_vs_exhaustive_ground_truth(spark):
    """The one check parity can't make (r9 ADVICE): q26/q187 and their
    DuckDB twins share the SAME band algebra, so an LSH recall
    regression is invisible there — both engines would miss the same
    pairs. This pins recall against the EXHAUSTIVE uncapped
    jaccard_pairs inverted-index plan on a planted corpus where every
    true near-dup pair's Jaccard is known in closed form.

    Corpus: 10 bases of 60 unique words; variants replace the last k
    words, so with 3-shingles J = (58-k)/(58+k) exactly — k=3 plants
    J=0.902 (strong dups: banding must find ALL of them; 16 hashes in
    4x4 bands collide at p≈0.99, and the seeded MinHash makes the
    outcome deterministic for this fixed corpus), k=17 plants J=0.547
    (the marginal band where LSH recall is allowed to dip), k=31
    plants J=0.303 (below threshold: must appear in NEITHER result).
    """
    from pagerank_spark.operators.dedup import (
        jaccard_pairs,
        minhash_neardup_pairs,
        word_shingles,
    )

    rows = []
    planted = {}  # (base_id, var_id) -> expected jaccard
    for i in range(10):
        base = [f"d{i}w{j}" for j in range(60)]
        rows.append((i * 10, " ".join(base)))
        k = {0: 3, 1: 3, 2: 3, 3: 3, 4: 17, 5: 17, 6: 17, 7: 31,
             8: 31, 9: 31}[i]
        var = base[: 60 - k] + [f"d{i}x{j}" for j in range(k)]
        rows.append((i * 10 + 1, " ".join(var)))
        planted[(i * 10, i * 10 + 1)] = (58 - k) / (58 + k)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = word_shingles(df, "doc_id", "text", n=3)
    truth = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", threshold=0.5).collect()
    }
    # the exhaustive plan recovers exactly the planted >=0.5 pairs,
    # at exactly the closed-form Jaccard
    expect = {p: j for p, j in planted.items() if j >= 0.5}
    assert set(truth) == set(expect)
    for p, j in expect.items():
        assert abs(truth[p] - j) < 1e-12, (p, truth[p], j)

    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_neardup_pairs(
            df, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    # verify step is exact => LSH output is a subset of truth with
    # identical values (precision 1.0 by construction)
    assert set(lsh) <= set(truth)
    for p, j in lsh.items():
        assert abs(truth[p] - j) < 1e-12
    # strong dups (J=0.902): banding must recover every one
    strong = {p for p, j in planted.items() if j > 0.9}
    assert strong <= set(lsh), sorted(strong - set(lsh))
    # overall recall floor across the full >=threshold truth set
    recall = len(lsh) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall} vs exhaustive truth"
    # sub-threshold plants appear in neither engine
    below = {p for p, j in planted.items() if j < 0.5}
    assert not (below & set(truth)) and not (below & set(lsh))


def test_minhash_neardup_against_is_cross_boundary_only(spark):
    from pagerank_spark.operators.dedup import minhash_neardup_against

    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon ") * 3
    corpus = spark.createDataFrame(
        [(1, body + "ending one"),
         (2, body + "ending two"),
         (3, "completely different words about other topics entirely "
             "nothing shared here at all with anything else")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(100, body + "ending one extra"),   # near-copy of corpus 1 (and 2)
         (101, "unique fresh content with no overlap whatsoever in any "
               "shingle of any document previously seen")],
        ["doc_id", "text"],
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in minhash_neardup_against(
            new, corpus, threshold=0.5
        ).collect()
    }
    assert (100, 1) in got and got[(100, 1)] > 0.8
    assert all(nid != 101 for nid, _ in got)       # fresh doc clean
    # corpus-internal near-dup pair (1,2) must NOT appear: the operator
    # only ever pairs across the boundary.
    assert all(nid >= 100 for nid, _ in got)


def test_bloom_duplicate_probes_no_false_negative(spark):
    # Duplicate probe rows collapse to one output row but must still
    # report might_contain=True for inserted keys (the old count==k
    # regroup silently false-negatived on duplicates).
    from pagerank_spark.operators.curation import (
        bloom_bits,
        bloom_might_contain,
    )

    keys = spark.createDataFrame([(f"key-{i}",) for i in range(50)], ["k"])
    bits = bloom_bits(keys, "k", m=1 << 14, k=3)
    dup_probes = keys.union(keys)  # every probe twice
    out = bloom_might_contain(dup_probes, "k", bits, m=1 << 14, k=3)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["might_contain"] for r in rows)


def test_neardup_against_thresholds_unrounded_jaccard(spark):
    # A pair whose true jaccard is exactly at the threshold must be
    # kept, and the 6dp rounding applies to OUTPUT only: jaccard
    # 2/3 = 0.666667 rounded UP must not sneak past a 0.6666665+
    # threshold it does not truly meet.
    from pagerank_spark.operators.dedup import minhash_neardup_against

    # Word sets chosen so the deterministic minhash DOES bucket the
    # pair (LSH recall is probabilistic in content, fixed per text).
    new = spark.createDataFrame(
        [(1, "w0x0 w0x1 w0x2 w0x3")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(100, "w0x0 w0x1 w0x2 w0x3 e0")], ["doc_id", "text"]
    )
    # 4 unigram shingles shared + 1 extra: inter=4, union=5 -> 0.8
    kept = minhash_neardup_against(
        new, corpus, "doc_id", "text", threshold=0.8, n=1
    ).collect()
    assert len(kept) == 1 and kept[0]["jaccard"] == 0.8
    # Case where 6dp rounding flips the comparison: jaccard 2/3.
    new2 = spark.createDataFrame([(1, "a0b0 a0b1")], ["doc_id", "text"])
    cor2 = spark.createDataFrame([(100, "a0b0 a0b1 c0")], ["doc_id", "text"])
    # jaccard = 2/3 = 0.6666666...; round6 = 0.666667 > true value.
    out = minhash_neardup_against(
        new2, cor2, "doc_id", "text", threshold=0.6666668, n=1
    ).collect()
    assert out == []  # rounded 0.666667 >= 0.6666668 is ALSO false...
    out2 = minhash_neardup_against(
        new2, cor2, "doc_id", "text", threshold=0.66666665, n=1
    ).collect()
    # true 0.6666666... >= 0.66666665 is TRUE; rounding must not matter
    assert len(out2) == 1


def test_udtf_chunk_text_equals_catalyst_chunker(spark):
    # The Python UDTF (LATERAL-join shape) must produce exactly the
    # chunks the pure-Catalyst chunk_documents plan does — the
    # twin-engine pattern: declarative wins in production, the UDTF
    # covers the Spark 4 API surface.
    from pagerank_spark.functions.udtf_chunks import register
    from pagerank_spark.operators.text import chunk_documents

    register(spark)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "one two three"),
            (3, ""),            # no tokens -> no chunks
            (4, "   padded   tokens here   "),
        ],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_toks"], r["chunk_text"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.n_chunk_toks, c.chunk_text "
            "FROM udtf_docs d, LATERAL chunk_text(d.text, 4, 1) c"
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_toks"], r["chunk_text"])
        for r in chunk_documents(
            docs, chunk_tokens=4, overlap_tokens=1
        ).collect()
    )
    assert got == want and len(want) > 4


def test_repetition_signals_hand_computed(spark):
    from pagerank_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # "a b a b c": 2-grams [ab, ba, ab, bc] -> total 4,
            # distinct 3, top 2 -> dup2 1/4, top2 1/2
            # 3-grams [aba, bab, abc] -> all distinct -> dup3 0
            (1, "a b a b c"),
            # fully repetitive: "x y x y x y" 2-grams [xy,yx,xy,yx,xy]
            # total 5, distinct 2, top 3 -> dup2 3/5, top2 3/5
            (2, "x y x y x y"),
            (3, "single"),   # no 2-grams -> dropped
            (4, ""),          # no tokens -> dropped
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["n2_total"] == 4
    assert r1["dup2_frac"] == 0.25
    assert r1["top2_frac"] == 0.5
    assert r1["dup3_frac"] == 0.0
    # dup2 0.25 <= 0.6 ok, but top2 0.5 > 0.15 -> fails
    assert r1["passes_repetition"] is False
    r2 = out[2]
    assert r2["dup2_frac"] == 0.6 and r2["top2_frac"] == 0.6
    assert r2["passes_repetition"] is False
    # a non-repetitive doc passes
    ok = spark.createDataFrame(
        [(9, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    row = repetition_signals(ok).collect()[0]
    assert row["dup2_frac"] == 0.0 and row["passes_repetition"] is True


def test_kmeans_separates_obvious_clusters(spark):
    from pagerank_spark.operators.similarity import kmeans

    # two tight blobs around (0,0) and (10,10); seeds = first 2 by id
    # land one in each blob
    pts = [
        (0, [0.0, 0.1]), (2, [10.0, 10.1]), (3, [0.2, 0.0]),
        (4, [9.9, 10.0]), (5, [0.1, 0.2]), (6, [10.2, 9.8]),
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r["vec_id"]: r["cluster"] for r in kmeans(df, k=2, iterations=3).collect()}
    assert out[0] == out[3] == out[5]
    assert out[2] == out[4] == out[6]
    assert out[0] != out[2]

    # an empty cluster keeps its seed centroid (k=3 over 2 blobs: the
    # third seed is a blob member, so one centroid may starve — the
    # operator must not crash and must still assign every point)
    out3 = kmeans(df, k=3, iterations=2).collect()
    assert len(out3) == 6
    assert {r["cluster"] for r in out3} <= {0, 1, 2}


def test_semantic_dedup_drops_planted_copies_only(spark):
    from pagerank_spark.operators.similarity import semantic_dedup

    # two blobs; 100/101 are near-copies of 0/2 (scaled 1.0005)
    pts = [
        (0, [1.0, 0.0, 0.2]), (2, [0.0, 1.0, 0.1]),
        (3, [0.9, 0.1, 0.25]), (4, [0.05, 0.95, 0.12]),
        (100, [1.0005, 0.0, 0.2001]), (101, [0.0, 1.0005, 0.10005]),
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, k=2, iterations=2, threshold=0.999
    ).collect()}
    assert len(out) == 6  # every row covered
    assert out[100]["keep"] is False and out[101]["keep"] is False
    assert all(out[i]["keep"] for i in (0, 2, 3, 4))
    # duplicates landed in their source's cluster
    assert out[100]["cluster"] == out[0]["cluster"]
    assert out[101]["cluster"] == out[2]["cluster"]


def test_pca_top_component_recovers_known_eigenpair(spark):
    from pagerank_spark.operators.similarity import pca_top_component

    # rank-1 data along u=(0.6, 0.8): x_i = t_i * u with
    # t = [-2,-1,0,1,2] (mean 0, var 2) => cov = 2*u*uT, so the
    # leading eigenpair is exactly (2, ±u); power iteration from the
    # all-ones start converges in one step with positive sign
    # (u . 1 > 0).
    ts = [-2.0, -1.0, 0.0, 1.0, 2.0]
    pts = [(i, [t * 0.6, t * 0.8]) for i, t in enumerate(ts)]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    rows = {r["pos"]: r for r in pca_top_component(df, iterations=3).collect()}
    assert set(rows) == {0, 1}
    assert abs(rows[0]["component"] - 0.6) < 1e-9
    assert abs(rows[1]["component"] - 0.8) < 1e-9
    assert abs(rows[0]["eigenvalue"] - 2.0) < 1e-9
    # eigenvalue replicated on every row (hash-friendly contract)
    assert rows[0]["eigenvalue"] == rows[1]["eigenvalue"]

    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with _pytest.raises(ValueError):
        pca_top_component(empty)
    with _pytest.raises(ValueError):
        pca_top_component(df, iterations=0)


def test_pca_project_recovers_coordinates_shuffle_free(spark):
    from pagerank_spark.operators.similarity import pca_project

    # x_i = t_i * u (u unit, data mean 0) => centered projection onto
    # the leading component is exactly t_i
    ts = [-2.0, -1.0, 0.0, 1.0, 2.0]
    pts = [(i, [t * 0.6, t * 0.8]) for i, t in enumerate(ts)]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = pca_project(df, iterations=3)
    got = {r["vec_id"]: r["proj"] for r in out.collect()}
    for i, t in enumerate(ts):
        assert abs(got[i] - t) < 1e-9, (i, got[i], t)
    # the projection itself is a pure map: eigenvector + offset are
    # plan literals, so the returned frame must not shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_dup_span_coverage_unions_overlaps_and_keeps_zeros(spark):
    from pagerank_spark.operators.dedup import dup_span_coverage

    docs = [
        (1, "a b c d"),      # "a b" shared with doc 2
        (2, "x a b y"),
        (3, "zz"),           # shorter than n -> all zeros
        (4, "a b a b a"),    # two overlapping dup spans, union = 4 pos
        (5, "a b"),          # fully covered
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in dup_span_coverage(df, n=2).collect()}
    assert len(out) == 5
    assert (out[1]["dup_starts"], out[1]["covered_tokens"]) == (1, 2)
    assert out[1]["dup_frac"] == 0.5
    assert (out[2]["dup_starts"], out[2]["covered_tokens"]) == (1, 2)
    # doc 3: too short, still present with zeros
    assert (out[3]["n_tokens"], out[3]["dup_starts"], out[3]["dup_frac"]) == (
        1, 0, 0.0,
    )
    # doc 4: "b a" repeats only WITHIN doc 4 -> not duplicated (cross-doc
    # definition); "a b" at starts 0 and 2 covers positions {0,1,2,3}
    assert (out[4]["dup_starts"], out[4]["covered_tokens"]) == (2, 4)
    assert out[4]["dup_frac"] == 0.8
    assert out[5]["dup_frac"] == 1.0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dup_span_coverage(df, n=0)


def test_quantize_embeddings_grid_and_mse(spark):
    from pagerank_spark.operators.similarity import quantize_embeddings

    # 2-bit grid (levels=3): dim0 hits grid points exactly, dim1 is
    # constant (scale 0 -> code 0, reconstructs to its min), dim2
    # quantizes with known error
    pts = [
        (0, [0.0, 5.0, 0.0]),
        (1, [1.0, 5.0, 0.4]),
        (2, [2.0, 5.0, 0.6]),
        (3, [3.0, 5.0, 1.0]),
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = quantize_embeddings(df, bits=2)
    got = {r["vec_id"]: r for r in out.collect()}
    assert got[0]["codes"] == [0, 0, 0]
    assert got[1]["codes"] == [1, 0, 1]
    assert got[2]["codes"] == [2, 0, 2]
    assert got[3]["codes"] == [3, 0, 3]
    assert got[0]["mse"] == 0.0 and got[3]["mse"] == 0.0
    expected = ((0.4 - 1.0 / 3.0) ** 2) / 3.0
    assert abs(got[1]["mse"] - expected) < 1e-12
    assert abs(got[2]["mse"] - ((0.6 - 2.0 / 3.0) ** 2) / 3.0) < 1e-12
    # coding is a literal-folded map: no shuffle, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantize_embeddings(df, bits=0)
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with _pytest.raises(ValueError):
        quantize_embeddings(empty)


def test_quantized_ann_matches_exact_at_8_bits(spark):
    from pagerank_spark.operators.similarity import (
        ann_topk_bruteforce,
        quantized_ann_topk,
    )

    # well-separated directions: 8-bit reconstruction error is far
    # below the cosine gaps, so the quantized ranking must equal the
    # exact baseline's
    pts = [
        (0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.1]),
        (3, [0.1, 0.9, 0.0]), (4, [0.0, 0.1, 1.0]), (5, [0.0, 0.0, 0.9]),
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    exact = {
        (r["query_id"], r["rank"]): r["nb_id"]
        for r in ann_topk_bruteforce(df, df, k=2).collect()
    }
    quant = {
        (r["query_id"], r["rank"]): r["nb_id"]
        for r in quantized_ann_topk(df, df, k=2, bits=8).collect()
    }
    assert quant == exact and len(quant) == 12

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantized_ann_topk(df, df, bits=20)


def test_skew_report_metrics_and_takeordered_plan(spark):
    from pagerank_spark.operators.relational import skew_report

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k STRING")
    out = skew_report(df, ["k"], top_n=2)
    got = {r["rank"]: r for r in out.collect()}
    assert len(got) == 2
    assert (got[1]["k"], got[1]["cnt"]) == ("a", 6)
    assert abs(got[1]["share"] - 0.6) < 1e-12
    # max 6 / mean 2.5 = 2.4, replicated on every row
    assert abs(got[1]["skew_factor"] - 2.4) < 1e-12
    assert got[1]["skew_factor"] == got[2]["skew_factor"]
    assert (got[2]["k"], got[2]["cnt"]) == ("b", 2)
    # top-N must be TakeOrdered, not a global sort of the key relation
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew_report(df, [])
    with _pytest.raises(ValueError):
        skew_report(df, ["k"], top_n=0)


def test_remove_duplicate_spans_rewrites_and_keeps_empty_docs(spark):
    from pagerank_spark.operators.dedup import remove_duplicate_spans

    docs = [
        (1, "a b c d"),      # "a b" shared with docs 2/4/5 -> "c d"
        (2, "x a b y"),      # -> "x y"
        (3, "zz"),           # too short for any gram -> untouched
        (4, "a b a b a"),    # overlapping dup spans -> "a" survives
        (5, "a b"),          # fully covered -> empty string, row kept
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=2).collect()}
    assert len(out) == 5
    assert (out[1]["clean_text"], out[1]["removed_tokens"]) == ("c d", 2)
    assert (out[2]["clean_text"], out[2]["removed_tokens"]) == ("x y", 2)
    assert (out[3]["clean_text"], out[3]["removed_tokens"]) == ("zz", 0)
    assert (out[4]["clean_text"], out[4]["removed_tokens"]) == ("a", 4)
    assert (out[5]["clean_text"], out[5]["removed_tokens"]) == ("", 2)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        remove_duplicate_spans(df, n=0)


def _bpe_reference(corpus: list[str], merges: int):
    """Pure-Python BPE with the operator's exact contract: pair counts
    weighted by word frequency (overlapping adjacent pairs all count),
    argmax ties broken (count DESC, lhs ASC, rhs ASC), greedy
    leftmost-first sequential-fold rewrite."""
    from collections import Counter

    freqs = Counter(w for text in corpus for w in text.split())
    words = {w: [list(w), f] for w, f in freqs.items()}
    out = []
    for rnd in range(1, merges + 1):
        pairs: Counter = Counter()
        for syms, f in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        assert pairs, "corpus exhausted"
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rnd, a, b, a + b, cnt))
        for w, (syms, f) in words.items():
            acc: list = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            words[w] = [acc, f]
    return out


def test_bpe_train_matches_reference_on_adversarial_corpus(spark):
    from pagerank_spark.operators.text import bpe_train

    # overlapping runs (aaaa), count ties resolved by symbol order,
    # merged symbols that re-pair in later rounds (l+o, lo+w), and a
    # single-char word that can never pair
    corpus = [
        "low low low lower lower newest newest widest",
        "aaaa aaa x ababab low",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text STRING")
    got = [tuple(r) for r in bpe_train(df, merges=6).collect()]
    assert got == _bpe_reference(corpus, 6)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train(df, merges=0)
    # a corpus of only single-char words has no pairs to merge
    single = spark.createDataFrame([("x y z",)], "text STRING")
    with _pytest.raises(ValueError):
        bpe_train(single, merges=1)


def test_bpe_segment_stats_fertility_per_doc(spark):
    from pagerank_spark.operators.text import bpe_segment_stats

    # merges learned corpus-wide: (l,o) cnt 5 then (lo,w) cnt 5 ->
    # low=[low], lower=[low,e,r], newest=[n,e,w,e,s,t]
    docs = [
        (1, "low low low lower"),
        (2, "lower newest"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in bpe_segment_stats(df, merges=2).collect()}
    assert (got[1]["n_words"], got[1]["n_chars"], got[1]["n_tokens"]) == (
        4, 14, 6,
    )
    assert abs(got[1]["chars_per_token"] - 14 / 6) < 1e-12
    assert (got[2]["n_words"], got[2]["n_chars"], got[2]["n_tokens"]) == (
        2, 11, 9,
    )
    assert abs(got[2]["chars_per_token"] - 11 / 9) < 1e-12


def test_ann_ivf_adc_matches_exact_within_probed_lists(spark):
    from pagerank_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_ivf_adc,
    )

    # two tight blobs; seeds (first 2 ids) land one per blob, so with
    # n_probe=1 each query scores only its own blob — and 8-bit
    # reconstruction error is far below the in-blob cosine gaps, so
    # the per-blob ranking must equal the exact baseline's
    pts = [
        (0, [1.0, 0.05, 0.0]), (1, [0.0, 0.1, 1.0]),
        (2, [0.9, 0.0, 0.1]), (3, [0.05, 0.0, 0.95]),
        (4, [0.95, 0.1, 0.05]), (5, [0.1, 0.05, 1.05]),
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = ann_ivf_adc(df, df, k=2, n_centroids=2, n_probe=1, bits=8)
    got = {(r["query_id"], r["rank"]): r["nb_id"] for r in out.collect()}
    exact = {
        (r["query_id"], r["rank"]): r["nb_id"]
        for r in ann_topk_bruteforce(df, df, k=5).collect()
    }
    # every query returns its 2 in-blob neighbors, in exact order
    assert len(got) == 12
    for (q, rank), nb in got.items():
        assert exact[(q, rank)] == nb, (q, rank, nb)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ann_ivf_adc(df, df, bits=0)


def test_binary_auc_matches_pairwise_definition(spark):
    from pagerank_spark.operators.analytics import binary_auc

    rows = [(1, 3.0), (1, 2.0), (1, 2.0), (0, 1.0), (0, 2.0), (0, 0.0)]
    df = spark.createDataFrame(rows, "y INT, score DOUBLE")
    got = binary_auc(df, "y", "score").collect()[0]
    # pairwise: P(s_pos > s_neg) + 0.5 P(tie) over all 9 pairs
    pos = [3.0, 2.0, 2.0]
    neg = [1.0, 2.0, 0.0]
    expected = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert (got["n_pos"], got["n_neg"]) == (3, 3)
    assert abs(got["auc"] - expected) < 1e-12

    # degenerate orderings pin the endpoints
    perfect = spark.createDataFrame(
        [(1, 5.0), (1, 4.0), (0, 1.0), (0, 2.0)], "y INT, score DOUBLE"
    )
    assert binary_auc(perfect, "y", "score").collect()[0]["auc"] == 1.0
    random_ties = spark.createDataFrame(
        [(1, 1.0), (0, 1.0)], "y INT, score DOUBLE"
    )
    assert binary_auc(random_ties, "y", "score").collect()[0]["auc"] == 0.5


def test_pr_at_thresholds_confusion_and_null_conventions(spark):
    from pagerank_spark.operators.analytics import pr_at_thresholds

    rows = [(1, 5.0), (1, 3.0), (0, 4.0), (0, 1.0)]
    df = spark.createDataFrame(rows, "y INT, score DOUBLE")
    got = {
        r["threshold"]: r
        for r in pr_at_thresholds(df, "y", "score", [0.0, 4.0, 10.0]).collect()
    }
    # t=0: everything predicted positive
    assert (got[0.0]["tp"], got[0.0]["fp"], got[0.0]["fn"]) == (2, 2, 0)
    assert got[0.0]["precision"] == 0.5 and got[0.0]["recall"] == 1.0
    # t=4: one true positive (5.0), one false positive (4.0)
    assert (got[4.0]["tp"], got[4.0]["fp"], got[4.0]["fn"]) == (1, 1, 1)
    assert got[4.0]["f1"] == 0.5
    # t=10: nothing predicted positive -> precision and f1 NULL
    assert (got[10.0]["tp"], got[10.0]["fp"], got[10.0]["fn"]) == (0, 0, 2)
    assert got[10.0]["precision"] is None
    assert got[10.0]["recall"] == 0.0
    assert got[10.0]["f1"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pr_at_thresholds(df, "y", "score", [])


def test_token_entropy_hand_values(spark):
    import math

    from pagerank_spark.operators.text import token_entropy

    docs = [
        (1, "a a b"),      # H = ln3 - (2 ln2)/3
        (2, "x y z"),      # uniform: H = ln3
        (3, "a a a a"),    # degenerate: H = 0
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert (got[1]["n_tokens"], got[1]["vocab"]) == (3, 2)
    assert abs(got[1]["entropy"] - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12
    assert abs(got[1]["ttr"] - 2 / 3) < 1e-12
    assert abs(got[2]["entropy"] - math.log(3)) < 1e-12
    assert got[3]["entropy"] == 0.0 and got[3]["ttr"] == 0.25


def test_ewma_recurrence_per_key(spark):
    from pagerank_spark.operators.analytics import ewma

    rows = [("u", 1, 4.0), ("u", 2, 8.0), ("u", 3, 0.0), ("v", 1, 2.0)]
    df = spark.createDataFrame(rows, "k STRING, ts INT, x DOUBLE")
    got = {
        (r["k"], r["ts"]): r["ewma"]
        for r in ewma(df, "k", "ts", "x", alpha=0.25).collect()
    }
    # e1=4; e2=.25*8+.75*4=5; e3=.75*5=3.75; v restarts at its own x0
    assert got == {("u", 1): 4.0, ("u", 2): 5.0, ("u", 3): 3.75, ("v", 1): 2.0}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ewma(df, "k", "ts", "x", alpha=0.0)
    with _pytest.raises(ValueError):
        ewma(df, "k", "ts", "x", alpha=1.5)


def test_random_walks_match_reference_walker(spark):
    import hashlib

    from pagerank_spark.graph.walks import random_walks

    edges = [(1, 2), (1, 3), (2, 1), (4, 3), (4, 3)]  # 3 dangling; 4->3 doubled
    df = spark.createDataFrame(edges, "src LONG, dst LONG")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    adj = {1: [2, 3], 2: [1], 4: [3, 3]}

    def walk(start: int, steps: int):
        path, cur = [start], start
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[h60(f"{cur}#{t}") % len(nbrs)]
            path.append(cur)
        return "->".join(map(str, path)), len(path)

    got = {r["start"]: (r["path"], r["walk_len"])
           for r in random_walks(df, steps=3).collect()}
    assert set(got) == {1, 2, 4}  # one walk per SOURCE node
    for s in (1, 2, 4):
        assert got[s] == walk(s, 3), (s, got[s])
    # node 4's walk must reach the dangling node 3 and stop early
    assert got[4][0].startswith("4->3")
    assert got[4][1] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        random_walks(df, steps=0)


def _n2v_reference(edges, steps, p, q):
    """Pure-Python twin of node2vec_walks' documented rule (uniform
    hash step 1; inverse-CDF weighted pick thereafter)."""
    import hashlib
    from collections import defaultdict

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    for s in adj:
        adj[s].sort()
    eset = set(edges)

    out = {}
    for start in sorted(adj):
        cur = start
        path = [start]
        prev = None
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                continue  # stalled: later steps can't move either
            if t == 1:
                nxt = nbrs[h60(f"{cur}#1") % len(nbrs)]
            else:
                ws = [
                    (1.0 / p) if x == prev
                    else 1.0 if (prev, x) in eset
                    else (1.0 / q)
                    for x in nbrs
                ]
                u = (h60(f"{prev}>{cur}#{t}") % 1000000) / 1000000.0
                target = u * sum(ws)
                cum = 0.0
                nxt = None
                for x, wt in zip(nbrs, ws):
                    cum += wt
                    if cum > target:
                        nxt = x
                        break
            prev, cur = cur, nxt
            path.append(cur)
        out[start] = ("->".join(map(str, path)), len(path))
    return out


def test_node2vec_matches_reference_walker(spark):
    """Exact path equality vs the Python twin on a graph with a
    doubled edge, a dangling sink, and both triangle (distance-1) and
    open (distance-2) continuations, across several (p, q) settings."""
    from pagerank_spark.graph.walks import node2vec_walks

    edges = [
        (1, 2), (1, 3), (2, 1), (2, 3), (2, 4),
        (3, 1), (4, 3), (4, 3), (4, 5), (5, 1),
    ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    for p, q in [(1.0, 1.0), (2.0, 0.5), (0.25, 4.0)]:
        got = {
            r["start"]: (r["path"], r["walk_len"])
            for r in node2vec_walks(df, steps=4, p=p, q=q).collect()
        }
        want = _n2v_reference(edges, 4, p, q)
        assert got == want, (p, q, got, want)


def test_node2vec_pq_extremes(spark):
    """Grover & Leskovec limits: p → ∞ never returns when any
    alternative exists; q → ∞ keeps the walk inside prev's
    neighborhood (return or triangle edge only)."""
    from pagerank_spark.graph.walks import node2vec_walks

    # from 2 (prev=1): 1 is return, 3 closes the triangle (1->3), 4 is
    # the open distance-2 hop
    edges = [(1, 2), (1, 3), (2, 1), (2, 3), (2, 4), (3, 2), (4, 2)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")

    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)

    big = 2.0**30
    for r in node2vec_walks(df, steps=5, p=big, q=1.0).collect():
        hops = [int(x) for x in r["path"].split("->")]
        for a, mid, b in zip(hops, hops[1:], hops[2:]):
            # returning is only allowed when it is FORCED (the middle
            # node's sole out-edge points back)
            if a == b:
                assert adj[mid] == {a}, f"returned with p→∞: {r['path']}"

    eset = {(s, d) for s, d in edges}
    for r in node2vec_walks(df, steps=5, p=1.0, q=big).collect():
        hops = [int(x) for x in r["path"].split("->")]
        for prev, cur, nxt in zip(hops, hops[1:], hops[2:]):
            assert nxt == prev or (prev, nxt) in eset, (
                f"left the neighborhood with q→∞: {r['path']}"
            )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        node2vec_walks(df, steps=0)
    with _pytest.raises(ValueError):
        node2vec_walks(df, p=0.0)

    # strict_parity: cross-engine hash parity is only guaranteed for
    # power-of-two p/q (exact binary-fraction weights); the flag turns
    # the docstring constraint into a loud precondition (r12 ADVICE)
    with _pytest.raises(ValueError, match="power of two"):
        node2vec_walks(df, p=3.0, q=0.5, strict_parity=True)
    with _pytest.raises(ValueError, match="power of two"):
        node2vec_walks(df, p=2.0, q=0.3, strict_parity=True)
    assert (
        node2vec_walks(df, steps=2, p=0.25, q=4.0, strict_parity=True)
        .count() > 0
    )


def test_node2vec_uniform_limit_is_weighted_uniform(spark):
    """p = q = 1 makes every candidate weight 1.0 — the pick reduces
    to ceil-index selection over the uniform CDF, which on a
    multi-edge adjacency still respects multiplicity."""
    from pagerank_spark.graph.walks import node2vec_walks

    edges = [(1, 2), (2, 3), (2, 3), (2, 4), (3, 2), (4, 2)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["start"]: r["path"]
        for r in node2vec_walks(df, steps=3, p=1.0, q=1.0).collect()
    }
    want = _n2v_reference(edges, 3, 1.0, 1.0)
    assert got == {s: pw[0] for s, pw in want.items()}


def test_skipgram_pairs_window_counts(spark):
    from pagerank_spark.graph.walks import skipgram_pairs

    # one walk 1->2->3, window 1: symmetric adjacent pairs only
    walks = spark.createDataFrame(
        [(1, "1->2->3", 3)], "start LONG, path STRING, walk_len INT"
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=1).collect()
    }
    assert got == {(1, 2): 1, (2, 1): 1, (2, 3): 1, (3, 2): 1}

    # window 2 adds the distance-2 pair both ways
    got2 = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got2[(1, 3)] == 1 and got2[(3, 1)] == 1
    assert sum(got2.values()) == 6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


def test_ppmi_hand_values(spark):
    import math

    from pagerank_spark.graph.walks import ppmi_matrix

    # N=4; pc(a)=3 pc(c)=1; px(b)=2 px(d)=2
    # (a,b): ln(2*4/(3*2)) = ln(4/3) > 0
    # (c,d): ln(1*4/(1*2)) = ln 2 > 0
    # (a,d): ln(1*4/(3*2)) = ln(2/3) < 0 -> clamps to 0
    pairs = [("a", "b", 2), ("c", "d", 1), ("a", "d", 1)]
    df = spark.createDataFrame(pairs, "center STRING, context STRING, cnt LONG")
    got = {(r["center"], r["context"]): r["ppmi"] for r in ppmi_matrix(df).collect()}
    assert abs(got[("a", "b")] - math.log(4 / 3)) < 1e-12
    assert abs(got[("c", "d")] - math.log(2)) < 1e-12
    assert got[("a", "d")] == 0.0


def test_negative_samples_integer_cdf(spark):
    import hashlib

    from pagerank_spark.graph.walks import negative_samples

    pairs = [(1, 10, 3), (2, 20, 1)]
    df = spark.createDataFrame(pairs, "center LONG, context LONG, cnt LONG")
    out = negative_samples(df, k=2).collect()
    # every pair gets exactly k negatives
    assert len(out) == 4
    # replicate the draw: context marginal c(10)=3, c(20)=1 ->
    # CDF (ordered by context): 10 -> [0,3), 20 -> [3,4); total 4
    def draw(center, context, slot):
        h = int(
            hashlib.md5(f"{center}#{context}#n{slot}".encode())
            .hexdigest()[:15],
            16,
        ) % 4
        return 10 if h < 3 else 20

    for r in out:
        assert r["negative"] == draw(r["center"], r["context"], r["slot"])
        assert r["is_collision"] == (r["negative"] == r["context"])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        negative_samples(df, k=0)


def test_join_cardinality_predicts_exact_size(spark):
    from pagerank_spark.operators.relational import join_cardinality

    a = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 1 + [("z",)] * 2, "k STRING"
    )
    b = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "k STRING")
    out = join_cardinality(a, b, ["k"], top_n=5).collect()
    got = {r["k"]: r for r in out}
    # x: 3*4=12, y: 1*2=2, z: no match -> absent; total 14
    assert set(got) == {"x", "y"}
    assert got["x"]["pairs"] == 12 and got["x"]["rank"] == 1
    assert got["y"]["pairs"] == 2
    assert got["x"]["total_pairs"] == 14
    # prediction equals the real join size
    assert a.join(b, on="k").count() == 14
    assert abs(got["x"]["blowup_left"] - 14 / 6) < 1e-12
    assert abs(got["x"]["blowup_right"] - 14 / 6) < 1e-12

    import pytest as _pytest

    with _pytest.raises(ValueError):
        join_cardinality(a, b, [])


def test_winsorize_clips_to_group_band(spark):
    from pagerank_spark.operators.relational import winsorize

    rows = [("g", float(v)) for v in range(1, 21)] + [("h", 1000.0)] * 3
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    out = winsorize(df, ["k"], "v", lower=0.1, upper=0.9).collect()
    g = [r for r in out if r["k"] == "g"]
    lo, hi = g[0]["__lo"], g[0]["__hi"]
    assert 1.0 <= lo < hi <= 20.0
    for r in g:
        assert r["v_clipped"] == min(max(r["v"], lo), hi)
    # values inside the band are untouched
    assert any(r["v_clipped"] == r["v"] for r in g)
    # a constant group clips to itself
    h = [r for r in out if r["k"] == "h"]
    assert all(r["v_clipped"] == 1000.0 for r in h)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, ["k"], "v", lower=0.9, upper=0.1)


def test_psi_report_zero_on_identical_positive_on_shift(spark):
    from pagerank_spark.operators.analytics import psi_report

    a = spark.createDataFrame([(float(v),) for v in range(100)], "x DOUBLE")
    same = psi_report(a, a, "x", 0.0, 100.0, n_buckets=10).collect()
    assert all(abs(r["contrib"]) < 1e-15 for r in same)
    assert abs(same[0]["psi"]) < 1e-15

    b = spark.createDataFrame(
        [(float(v) + 50.0,) for v in range(100)], "x DOUBLE"
    )
    drift = psi_report(a, b, "x", 0.0, 100.0, n_buckets=10).collect()
    psi = drift[0]["psi"]
    assert psi > 0.25  # half the mass moved out of range: clear drift
    # overflow bucket (11) exists on the current side
    assert any(r["bucket"] == 11 and r["n_cur"] > 0 for r in drift)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_report(a, b, "x", 5.0, 5.0)


def test_epoch_shuffle_reproducible_partition(spark):
    from pagerank_spark.operators.curation import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id LONG")
    e2a = {r["doc_id"]: (r["shard"], r["pos"])
           for r in epoch_shuffle(df, epoch=2, n_shards=4).collect()}
    e2b = {r["doc_id"]: (r["shard"], r["pos"])
           for r in epoch_shuffle(df, epoch=2, n_shards=4).collect()}
    e3 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in epoch_shuffle(df, epoch=3, n_shards=4).collect()}
    assert e2a == e2b                      # reproducible
    assert e2a != e3                       # epochs permute differently
    assert len(e2a) == 100                 # exhaustive, no dup/drop
    # positions within each shard are 0..len-1 exactly
    from collections import defaultdict

    shards = defaultdict(list)
    for shard, pos in e2a.values():
        shards[shard].append(pos)
    for s, ps in shards.items():
        assert sorted(ps) == list(range(len(ps))), s

    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_shuffle(df, epoch=-1, n_shards=4)
    with _pytest.raises(ValueError):
        epoch_shuffle(df, epoch=0, n_shards=0)


def test_bm25_hand_values(spark):
    import math

    from pagerank_spark.operators.text import bm25_rank

    df = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog dog"),
            (3, "bird bird bird bird"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in bm25_rank(df, ["cat"], top_k=10).collect()
    }
    # Only docs containing 'cat' score; doc 1 (tf=3) beats doc 2 (tf=1).
    assert set(rows) == {1, 2}
    assert rows[1]["rk"] == 1 and rows[2]["rk"] == 2
    # Closed form: N=3, df=2, dl=4=avgdl for every doc.
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf):
        return round(
            idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * 1.0)), 6
        )

    assert rows[1]["score"] == pytest.approx(s(3), abs=1e-9)
    assert rows[2]["score"] == pytest.approx(s(1), abs=1e-9)


def test_bm25_requires_terms(spark):
    from pagerank_spark.operators.text import bm25_rank

    with pytest.raises(ValueError, match="query_terms"):
        bm25_rank(spark.range(1).withColumn("text", F.lit("x")), [])


def test_bigram_logprob_hand_values(spark):
    import math

    from pagerank_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # Corpus: tokens a,b,a,a -> c(a)=3, c(b)=1, T=4.
    # Bigrams: (a,b) x1, (a,a) x1.
    lam = 0.75
    p_ab = lam * 1 / 3 + (1 - lam) * 1 / 4
    p_aa = lam * 1 / 3 + (1 - lam) * 3 / 4
    assert out[1]["n_bigrams"] == 1 and out[2]["n_bigrams"] == 1
    assert out[1]["avg_logprob"] == pytest.approx(
        round(math.log(p_ab), 6), abs=1e-9
    )
    assert out[2]["avg_logprob"] == pytest.approx(
        round(math.log(p_aa), 6), abs=1e-9
    )
    # Word order matters: the likelier continuation scores higher.
    assert out[2]["avg_logprob"] > out[1]["avg_logprob"]


def test_bigram_logprob_drops_short_docs(spark):
    from pagerank_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        ["doc_id", "text"],
    )
    assert [r["doc_id"] for r in bigram_logprob(df).collect()] == [3]


def test_longest_streaks_hand_values(spark):
    from datetime import datetime

    from pagerank_spark.operators.analytics import longest_streaks

    rows = [
        # user 1: days 1,2,3 then 5 -> best streak 3 starting Jan 1
        (1, datetime(2024, 1, 1, 9)),
        (1, datetime(2024, 1, 1, 17)),  # same day, deduped
        (1, datetime(2024, 1, 2, 1)),
        (1, datetime(2024, 1, 3, 23)),
        (1, datetime(2024, 1, 5, 12)),
        # user 2: two 2-day streaks -> tie broken by EARLIEST start
        (2, datetime(2024, 2, 1)),
        (2, datetime(2024, 2, 2)),
        (2, datetime(2024, 2, 10)),
        (2, datetime(2024, 2, 11)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r["user_id"]: r for r in longest_streaks(df).collect()}
    assert got[1]["n_active_days"] == 4
    assert got[1]["best_streak"] == 3
    assert got[1]["best_start"] == "2024-01-01"
    assert got[2]["best_streak"] == 2
    assert got[2]["best_start"] == "2024-02-01"


def test_scd2_runs_hand_values(spark):
    from datetime import datetime

    from pagerank_spark.operators.analytics import scd2_runs

    rows = [
        # user 1: A A B A -> three runs, versions 1..3
        (10, datetime(2024, 1, 1, 0, 0, 0), 1, "A", 0.0, ""),
        (11, datetime(2024, 1, 1, 0, 1, 0), 1, "A", 0.0, ""),
        (12, datetime(2024, 1, 1, 0, 2, 0), 1, "B", 0.0, ""),
        (13, datetime(2024, 1, 1, 0, 3, 0), 1, "A", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = sorted(scd2_runs(df).collect(), key=lambda r: r["version"])
    assert [r["event_type"] for r in out] == ["A", "B", "A"]
    assert [r["n_events"] for r in out] == [2, 1, 1]
    assert [r["is_current"] for r in out] == [False, False, True]
    # Runs tile the timeline in order with whole-second epochs.
    assert out[0]["valid_to"] - out[0]["valid_from"] == 60
    assert out[0]["valid_to"] < out[1]["valid_from"] < out[2]["valid_from"]


def test_scd2_runs_same_second_ties_are_deterministic(spark):
    from datetime import datetime

    from pagerank_spark.operators.analytics import scd2_runs

    # Both runs start inside the SAME second: version order must come
    # from event_id, not from partition luck.
    t = datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (100, t, 7, "X", 0.0, ""),
        (101, t, 7, "Y", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    for _ in range(3):
        out = sorted(
            scd2_runs(df.repartition(8)).collect(),
            key=lambda r: r["version"],
        )
        assert [r["event_type"] for r in out] == ["X", "Y"]


def test_profile_columns_timestamp_ntz_and_date(spark):
    """min_num/max_num for TIMESTAMP_NTZ and DATE columns must be the
    tz-free naive epoch DuckDB's epoch() gives on naive timestamps —
    the round-6 q176 bug was timestamp_ntz falling through to the
    no-numeric branch and returning NULLs."""
    from datetime import date, datetime

    from pagerank_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [
            (datetime(2001, 8, 1, 0, 0, 0), date(2001, 8, 1), "a"),
            (datetime(2001, 8, 2, 12, 30, 5), date(2001, 8, 3), "b"),
        ],
        "ts timestamp_ntz, d date, s string",
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = {r["column"]: r for r in profile_columns(df).collect()}
    # 2001-08-01 00:00:00 naive epoch = 996624000
    assert out["ts"]["min_num"] == 996624000.0
    assert out["ts"]["max_num"] == 996624000.0 + 86400 + 12 * 3600 + 30 * 60 + 5
    assert out["d"]["min_num"] == 996624000.0
    assert out["d"]["max_num"] == 996624000.0 + 2 * 86400
    assert out["s"]["min_num"] is None and out["s"]["min_str"] == "a"


def test_er_resolve_clusters_and_canonicalizes(spark):
    from pagerank_spark.operators.dedup import er_resolve

    df = spark.createDataFrame(
        [
            ("acme corp",),
            ("acme corq",),   # dist 1 from "acme corp", same block "corq"? no
            ("acme borp",),   # blocked with corp? block = last token "borp"
            ("zeta inc",),
            (None,),
        ],
        "p_name string",
    )
    # blocks: corp / corq / borp / inc — defaults block on last token,
    # so nothing pairs; use a constant block to exercise the closure.
    import pyspark.sql.functions as F

    out = {
        r["name"]: r
        for r in er_resolve(
            df, "p_name", max_dist=2, block=F.lit("all")
        ).collect()
    }
    # "acme corp" ~ "acme corq" (1) and "acme corp" ~ "acme borp" (1):
    # transitive closure puts all three in one cluster, canonical = min
    assert out["acme corp"]["canonical_name"] == "acme borp"
    assert out["acme corq"]["canonical_name"] == "acme borp"
    assert out["acme borp"]["is_canonical"]
    assert out["acme corp"]["cluster_size"] == 3
    assert out["zeta inc"]["cluster_size"] == 1
    assert out["zeta inc"]["is_canonical"]
    assert None not in out  # NULLs dropped from the value relation


def test_sorted_neighborhood_catches_blocking_key_typos(spark):
    # The case key blocking (fuzzy_blocked_pairs) misses by design: a
    # typo in the blocking key itself. "acme corp" vs "acme corq"
    # block apart on last-token keys but sort adjacent.
    from pagerank_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [
            ("acme corp",),
            ("acme corq",),
            ("beta llc",),
            ("beta lld",),
            ("zeta inc",),
            (None,),
        ],
        "p_name string",
    )
    pairs = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in sorted_neighborhood_pairs(df, "p_name").collect()
    }
    assert pairs[("acme corp", "acme corq")] == 1
    assert pairs[("beta llc", "beta lld")] == 1
    assert all(a < b for (a, b) in pairs)
    assert not any("zeta inc" in p and "acme corp" in p for p in pairs)


def test_sorted_neighborhood_shared_prefix_ids(spark):
    # ID-shaped columns share a long head ("Customer#000..."): the
    # block key must come from AFTER the relation-wide common prefix,
    # or every value lands in one block (the single-partition sort the
    # operator exists to avoid). Recall must survive that strip.
    import pyspark.sql.functions as F

    from pagerank_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(f"Customer#{i:012d}",) for i in range(200)]
    rows.append(("Customer#00000000004q",))  # last-char typo of ...0049
    df = spark.createDataFrame(rows, "c_name string")
    pairs = sorted_neighborhood_pairs(df, "c_name")
    hit = pairs.where(
        (F.col("name_a") == "Customer#000000000049")
        & (F.col("name_b") == "Customer#00000000004q")
    ).collect()
    assert len(hit) == 1 and hit[0]["dist"] == 1
    # block column really fans out: >1 distinct __blk after the strip
    from pagerank_spark.operators import dedup as _d
    base = df.select(F.col("c_name").alias("name")).distinct()
    b = base.agg(F.min("name").alias("lo"), F.max("name").alias("hi")).collect()[0]
    import os as _os
    lcp = len(_os.path.commonprefix([b["lo"], b["hi"]]))
    nblk = base.select(
        F.substring("name", lcp + 1, 2).alias("__blk")
    ).distinct().count()
    assert nblk > 1


def test_ngram_novelty_first_owner_semantics(spark):
    from pagerank_spark.operators.dedup import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: "a b c", "b c d" — all novel
            (2, "a b c x"),        # "a b c" seen in doc 1, "b c x" novel
            (3, "a b"),            # too short: 0 shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["n_shingles"] == 2 and out[1]["novelty"] == 1.0
    assert out[2]["n_shingles"] == 2 and out[2]["novel_shingles"] == 1
    assert out[2]["novelty"] == 0.5
    assert out[3]["n_shingles"] == 0 and out[3]["novelty"] == 0.0


def test_zipf_slope_on_power_law_corpus(spark):
    """A corpus with freq(term_r) = 2^(10-r) has ln f = const - r·ln2;
    against ln(rank) that's not exactly linear, but the slope must be
    strongly negative and the fit deterministic."""
    import pyspark.sql.functions as F

    from pagerank_spark.operators.text import zipf_slope

    rows = []
    for r in range(1, 9):
        rows.extend([(f"t{r:02d}",)] * (2 ** (9 - r)))
    df = spark.createDataFrame(rows, "text string")
    out = zipf_slope(df, "text", top_n=8).collect()[0]
    assert out["n_terms"] == 8
    assert out["slope"] < -1.0
    # repeated runs give the identical rounded fit
    out2 = zipf_slope(df.repartition(7), "text", top_n=8).collect()[0]
    assert out["slope"] == out2["slope"]
    assert out["intercept"] == out2["intercept"]


def test_equidepth_histogram_counts_and_ranges(spark):
    from pagerank_spark.operators.analytics import equidepth_histogram

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    out = {r["bucket"]: r for r in equidepth_histogram(df, "v", 4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert [out[b]["n"] for b in (1, 2, 3, 4)] == [25, 25, 25, 25]
    assert out[1]["min_v"] == 1.0 and out[4]["max_v"] == 100.0
    # bins tile: each bucket's min is the previous max + 1 on integers
    assert out[2]["min_v"] == out[1]["max_v"] + 1


def test_containment_pairs_detects_quote_jaccard_misses(spark):
    from pagerank_spark.operators.dedup import containment_pairs

    # doc 2 is fully contained in doc 1 (a "quote"): containment 1.0
    # one way, Jaccard only 3/10.
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
            (2, "w4 w5 w6"),
            (3, "x1 x2 x3"),
        ],
        "doc_id long, text string",
    )
    out = containment_pairs(df, n=1, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cont_ba"] == 1.0 and r["cont_ab"] == 0.3
    assert r["n_inter"] == 3 and r["n_a"] == 10 and r["n_b"] == 3


def test_leakage_safe_split_keeps_neardups_together(spark):
    from pagerank_spark.operators.dedup import leakage_safe_split

    # 40 singleton docs + one near-dup pair (identical text): the pair
    # must share a split; every doc gets exactly one split.
    rows = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(40)]
    rows += [(100, "same text here please"), (101, "same text here please")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(
        df, n=1, threshold=0.9, val_frac=0.25, test_frac=0.25
    ).collect()
    assert len(out) == 42
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[100]["split"] == by_id[101]["split"]
    assert by_id[100]["canonical_id"] == by_id[101]["canonical_id"] == 100
    splits = {r["split"] for r in out}
    assert splits <= {"train", "val", "test"}
    assert len(splits) >= 2  # 42 docs at 50/25/25: all-one-split ~impossible


def test_groupwise_ols_matches_closed_form_and_degenerates(spark):
    from pagerank_spark.operators.analytics import groupwise_ols

    rows = [
        # group g1: perfect line y = 2x + 1 -> r2 = 1
        ("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
        # group g2: constant x -> slope NULL
        ("g2", 4.0, 1.0), ("g2", 4.0, 2.0),
        # group g3: constant y, varying x -> slope 0, r2 = 1
        # (SQL regr_r2's horizontal perfect fit, NOT NULL)
        ("g3", 1.0, 5.0), ("g3", 2.0, 5.0),
        # group g4: NULL pairs dropped before counting (regr_count)
        ("g4", 1.0, 2.0), ("g4", 2.0, 4.0), ("g4", None, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in groupwise_ols(df, ["g"], "x", "y").collect()}
    assert out["g1"]["slope"] == 2.0 and out["g1"]["intercept"] == 1.0
    assert out["g1"]["r2"] == 1.0 and out["g1"]["n"] == 3
    assert out["g2"]["slope"] is None
    assert out["g3"]["slope"] == 0.0 and out["g3"]["r2"] == 1.0
    assert out["g4"]["n"] == 2 and out["g4"]["slope"] == 2.0


def test_pq_adc_refined_topic_precision(spark):
    """PQ with refined codebooks on structured (topic+noise)
    embeddings: every retrieved neighbor shares the query's topic —
    the structure PQ codes preserve. (Exact-rank recall at 4x6-bit
    codes is tie-dominated by construction: same-topic docs collapse
    to equal codes; that is the compression working, not failing.)"""
    from pagerank_spark.operators.similarity import pq_adc_topk

    def unit(seed, j, scale):
        return (
            (F.pmod(F.hash(seed, F.lit(j)), F.lit(2001)) - 1000)
            / 1000.0
            * scale
        )

    topic = F.pmod(F.hash(F.col("id"), F.lit("t")), F.lit(16))
    comps = [
        unit(topic, j, 1.0) + unit(F.col("id"), j + 1000, 0.3)
        for j in range(32)
    ]
    emb = spark.range(800).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )
    tmap = {
        r["vec_id"]: r["t"]
        for r in spark.range(800)
        .select(F.col("id").alias("vec_id"), topic.alias("t"))
        .collect()
    }
    q = emb.where(F.col("vec_id") % 100 == 0)
    rows = pq_adc_topk(
        emb, q, k=5, n_subspaces=4, n_codes=32, refine=1
    ).collect()
    assert len(rows) == 8 * 5
    assert all(tmap[r["nb_id"]] == tmap[r["query_id"]] for r in rows)
    # determinism: same call, same result
    rows2 = pq_adc_topk(
        emb.repartition(5), q, k=5, n_subspaces=4, n_codes=32, refine=1
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted((r["query_id"], r["rank"], r["nb_id"]) for r in rows) == \
        sorted((r["query_id"], r["rank"], r["nb_id"]) for r in rows2)


def test_pq_encode_shapes_and_code_range(spark):
    from pagerank_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.col("id") * (j + 1) % 17).cast("double") for j in range(8)
        ]).alias("embedding"),
    )
    cb = pq_codebooks(emb, n_subspaces=2, n_codes=4)
    assert cb.count() == 2 * 4
    enc = pq_encode(emb, cb, n_subspaces=2)
    assert enc.count() == 50 * 2
    codes = [r["code"] for r in enc.collect()]
    assert all(0 <= c < 4 for c in codes)


def test_autocorrelation_matches_numpy_estimator(spark):
    # Classic estimator r_k = sum((x_t-mu)(x_{t+k}-mu)) / sum((x-mu)^2)
    # cross-checked against a direct numpy computation; a pure sine
    # has acf(period) ~ 1 and acf(period/2) ~ -1.
    import math

    import numpy as np

    from pagerank_spark.operators.analytics import autocorrelation

    xs = [math.sin(2 * math.pi * i / 8) + 0.001 * i for i in range(64)]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x double"
    )
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "t", "x", max_lag=8).collect()
    }
    arr = np.array(xs)
    mu = arr.mean()
    ss = ((arr - mu) ** 2).sum()
    for k in (1, 4, 8):
        want = ((arr[:-k] - mu) * (arr[k:] - mu)).sum() / ss
        assert abs(got[k] - want) < 1e-6, (k, got[k], want)
    assert got[8] > 0.8 and got[4] < -0.8


def test_stratified_exact_sample_counts_and_nesting(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.curation import stratified_exact_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, g string")
    s20 = stratified_exact_sample(df, ["g"], 0.2, "id")
    got = {
        r["g"]: r["c"]
        for r in s20.groupBy("g").agg(F.count("*").alias("c")).collect()
    }
    assert got == {"a": 12, "b": 6}  # ceil(.2*60), ceil(.2*30)
    # nesting: the 10% sample is exactly the rank-prefix of the 20%
    s10 = stratified_exact_sample(df, ["g"], 0.1, "id")
    ids10 = {r["id"] for r in s10.collect()}
    ids20_prefix = {
        r["id"]
        for r in s20.where(
            F.col("__rk") <= F.ceil(F.lit(0.1) * F.when(F.col("g") == "a", 60).otherwise(30))
        ).collect()
    }
    assert ids10 == ids20_prefix
    import pytest

    with pytest.raises(ValueError):
        stratified_exact_sample(df, ["g"], 0.0, "id")


def test_seasonal_decompose_recovers_planted_cycle(spark):
    # Planted series: linear trend + exact period-3 cycle. The
    # width-3 centered MA recovers the trend exactly on a linear
    # series, the phase means recover the cycle, residuals ~0.
    import pytest

    from pagerank_spark.operators.analytics import seasonal_decompose

    season = {0: 2.0, 1: -1.0, 2: -1.0}
    rows = [(t, 10.0 + 0.5 * t + season[t % 3]) for t in range(30)]
    df = spark.createDataFrame(rows, "t long, x double")
    out = {r["t"]: r for r in seasonal_decompose(df, "t", "x", period=3).collect()}
    assert out[0]["trend"] is None and out[29]["trend"] is None  # edges
    for t in range(1, 29):
        assert abs(out[t]["trend"] - (10.0 + 0.5 * t)) < 1e-6, t
        assert abs(out[t]["seasonal"] - season[t % 3]) < 1e-6, t
        assert abs(out[t]["resid"]) < 1e-6, t
    with pytest.raises(ValueError):
        seasonal_decompose(df, "t", "x", period=4)


def test_index_scratch_root_and_remove(spark, tmp_path, monkeypatch):
    """index_scratch_root resolution order (conf > env > mkdtemp), each
    call unique; remove_index deletes through the Hadoop FS API so the
    same cleanup call works for local paths and shared-storage URIs."""
    import os

    from pagerank_spark.operators.similarity import (
        index_scratch_root,
        remove_index,
    )

    # env fallback
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "envbase"))
    r1 = index_scratch_root(spark, prefix="t_")
    r2 = index_scratch_root(spark, prefix="t_")
    assert r1.startswith(str(tmp_path / "envbase") + "/t_")
    assert r1 != r2  # concurrent callers never share a root
    # conf wins over env
    spark.conf.set("spark.pagerank.scratchDir", str(tmp_path / "confbase"))
    try:
        r3 = index_scratch_root(spark)
        assert r3.startswith(str(tmp_path / "confbase") + "/ivf_")
    finally:
        spark.conf.unset("spark.pagerank.scratchDir")
    # mkdtemp fallback when neither is set
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH")
    r4 = index_scratch_root(spark, prefix="t_")
    assert os.path.isdir(r4)
    # remove_index works on a written parquet tree and on a missing root
    spark.range(5).write.parquet(r1 + "/lists")
    assert os.path.isdir(r1)
    remove_index(spark, r1)
    assert not os.path.exists(r1)
    remove_index(spark, r1)  # idempotent no-op
    remove_index(spark, r4)
    assert not os.path.exists(r4)


def test_persisted_ivf_matches_in_memory_and_prunes(spark, tmp_path):
    # Build-once/query-many IVF: the persisted index returns exactly
    # the in-memory ann_ivf results (same codebook derivation), and
    # the probe's list scan partition-prunes on cid.
    import pyspark.sql.functions as F

    from pagerank_spark.operators.similarity import (
        ann_ivf,
        ann_ivf_persisted,
        build_ivf_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    queries = emb.where(F.col("vec_id") % 5 == 0).limit(10)

    expected = {
        (r["query_id"], r["rank"]): (r["nb_id"], r["cos"])
        for r in ann_ivf(corpus, queries, k=5).collect()
    }
    root = str(tmp_path / "ivf")
    build_ivf_index(corpus, root)
    out_df = ann_ivf_persisted(spark, root, queries, k=5)
    got = {
        (r["query_id"], r["rank"]): (r["nb_id"], r["cos"])
        for r in out_df.collect()
    }
    assert got == expected and len(got) > 0

    # partition pruning reaches the list scan (checked on the index
    # layout itself — the operator's returned frame is an eagerly
    # materialized top-k checkpoint, so its plan no longer shows the
    # scan it already executed)
    import contextlib
    import io

    probe_scan = spark.read.parquet(f"{root}/lists").where(
        F.col("cid").isin([0, 1])
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe_scan.explain("formatted")
    p = buf.getvalue()
    seg = p.split("PartitionFilters")
    assert len(seg) > 1 and "cid" in seg[1][:200]


def test_training_order_is_deterministic_permutation(spark):
    """The shuffle is a PERMUTATION (positions exactly 0..N-1, no
    gaps/dups), identical across partitionings and block counts
    (deterministic hash slices — nothing sampled), different per seed,
    and NOT the identity order."""
    from pagerank_spark.operators.curation import training_order

    df = spark.range(0, 500).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["position"]
         for r in training_order(df, "doc_id", seed=7).collect()}
    assert sorted(a.values()) == list(range(500))
    b = {r["doc_id"]: r["position"]
         for r in training_order(
             df.repartition(13), "doc_id", seed=7, blocks=5
         ).collect()}
    assert a == b  # partitioning- and block-count-independent
    c = {r["doc_id"]: r["position"]
         for r in training_order(df, "doc_id", seed=8).collect()}
    assert sorted(c.values()) == list(range(500))
    assert c != a  # a new epoch seed reshuffles
    ident = sum(1 for k, v in a.items() if k == v)
    assert ident < 25  # hash order is nothing like id order


def test_mixture_order_proportional_interleave(spark):
    """A 2:1 mix over equal-size sources must interleave
    proportionally in every prefix (not concatenate blocks), stay a
    permutation, be partitioning-independent, and raise in-plan on a
    source without a weight."""
    import pytest

    from pagerank_spark.operators.curation import mixture_order

    # source sizes proportional to weights (400 a : 200 b at 2:1), so
    # neither source exhausts early and the ratio must hold in EVERY
    # prefix — with equal sizes the heavy source legitimately runs dry
    # midway and the tail is all-b (rate interleave, not resampling)
    rows = [(i, "a" if i % 3 < 2 else "b") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_order(
        df, {"a": 2, "b": 1}, "source", "doc_id", seed=3
    ).collect()
    pos = sorted((r["position"], r["source"]) for r in out)
    assert [p for p, _ in pos] == list(range(600))
    # every prefix holds the 2:1 ratio within rounding slack
    n_a = 0
    for i, (_, s) in enumerate(pos, start=1):
        n_a += s == "a"
        assert abs(n_a - (2 / 3) * i) <= 2, (i, n_a)
    # deterministic across partitionings and block counts
    again = {
        (r["doc_id"], r["position"])
        for r in mixture_order(
            df.repartition(7), {"a": 2, "b": 1}, "source", "doc_id",
            seed=3, blocks=5,
        ).collect()
    }
    assert again == {(r["doc_id"], r["position"]) for r in out}
    # a source missing from parts must fail loudly, not drop rows
    with pytest.raises(Exception, match="source without a weight"):
        mixture_order(
            df, {"a": 1}, "source", "doc_id"
        ).collect()
    with pytest.raises(ValueError):
        mixture_order(df, {"a": 0, "b": 1}, "source", "doc_id")


def test_rrf_fuse_hand_example(spark):
    from pagerank_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rk int"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rk int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 3 appears in both arms: 1/63 + 1/61
    assert out[3]["score"] == round(1 / 63 + 1 / 61, 6)
    assert out[3]["rk"] == 1                      # highest fused score
    assert out[1]["score"] == round(1 / 61, 6)    # single-arm docs
    assert out[4]["score"] == round(1 / 62, 6)
    # ordering: 3 (both arms) > 1 (a rank 1) > {2, 4} (both 1/62,
    # tie broken by id asc)
    order = [d for d, r in sorted(out.items(), key=lambda kv: kv[1]["rk"])]
    assert order == [3, 1, 2, 4]


def test_rrf_fuse_top_k_and_tie_break(spark):
    from pagerank_spark.operators.similarity import rrf_fuse

    # identical ranks -> identical scores; ties break by id asc
    a = spark.createDataFrame(
        [(9, 1), (5, 1)], "doc_id long, rk int"
    )
    rows = rrf_fuse([a], k=60, top_k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 5

    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_word_skipgram_pairs_hand_example(spark):
    """'a b c a' with window=2: forward occurrences within 2 positions
    are (a,b),(a,c),(b,c),(b,a),(c,a) — each also counted reversed, so
    cnt(a,b) = fwd(a,b) + fwd(b,a). Checks exact directed counts,
    symmetry, min_count filtering, and validation."""
    import pytest as _pytest

    from pagerank_spark.operators.text import word_skipgram_pairs

    docs = spark.createDataFrame(
        [(1, "a b c a")], "doc_id long, text string"
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in word_skipgram_pairs(docs, window=2).collect()
    }
    # fwd: (a,b),(a,c) from pos0; (b,c),(b,a) from pos1; (c,a) from pos2
    want_fwd = {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                ("b", "a"): 1, ("c", "a"): 1}
    want = {}
    for (x, y), n in want_fwd.items():
        want[(x, y)] = want.get((x, y), 0) + n
        want[(y, x)] = want.get((y, x), 0) + n
    assert got == want
    # symmetric by construction
    for (x, y), n in got.items():
        assert got[(y, x)] == n
    # min_count drops the cnt=1 pairs: only (a,b)/(b,a) (=2) and
    # (a,c)/(c,a) (=2) survive
    got2 = {
        (r["center"], r["context"]): r["cnt"]
        for r in word_skipgram_pairs(docs, window=2, min_count=2).collect()
    }
    assert got2 == {k: v for k, v in want.items() if v >= 2}
    with _pytest.raises(ValueError):
        word_skipgram_pairs(docs, window=0)
    with _pytest.raises(ValueError):
        word_skipgram_pairs(docs, min_count=0)


def test_word_skipgram_pairs_feed_sgns_strings(spark):
    """String word nodes flow through the SGNS trainer unchanged: the
    hash init and the negative sampler key on the node's string form,
    so a tiny text corpus trains end to end and returns one vector
    per vocabulary word on each side."""
    from pagerank_spark.graph.embeddings import sgns_train
    from pagerank_spark.operators.text import word_skipgram_pairs

    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "y z y z x")],
        "doc_id long, text string",
    )
    pairs = word_skipgram_pairs(docs, window=2)
    res = sgns_train(pairs, dim=2, rounds=1, lr=0.5)
    u_nodes = {r["node"] for r in res.u.select("node").distinct().collect()}
    assert u_nodes == {"x", "y", "z"}
    assert res.u.count() == 3 * 2  # vocab x dim
