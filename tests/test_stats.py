"""Closed-form unit tests for operators/stats.py — every statistic is
checked against a hand-computed or numpy-computed value on a tiny
frame, independent of the DuckDB parity twins."""

from __future__ import annotations

import hashlib
import math

import pytest

from pagerank_spark.operators.stats import (
    ab_assign_srm,
    jackknife_ci,
    mad_outliers,
    markov_transitions,
    mutual_information,
    welch_ttest,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_mutual_information_independent_is_zero(spark):
    # x and y fully crossed with equal counts -> exactly independent
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = mutual_information(df, "x", "y").collect()[0]
    assert got["mi_nats"] == 0.0
    assert got["n_rows"] == 20
    assert got["n_cells"] == 4


def test_mutual_information_identity_is_entropy(spark):
    # y == x with p = (0.25, 0.75) -> MI = H(X)
    rows = [("a", "a")] * 5 + [("b", "b")] * 15
    df = spark.createDataFrame(rows, ["x", "y"])
    got = mutual_information(df, "x", "y").collect()[0]
    h = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    assert got["mi_nats"] == pytest.approx(h, abs=1e-6)


def test_markov_transitions_counts_and_row_norm(spark):
    # user 1: a b a b  -> ab, ba, ab ; user 2: a a -> aa
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 5, "a"), (2, 6, "a"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        (r["type_from"], r["type_to"]): (r["cnt"], r["prob"])
        for r in markov_transitions(
            df, ts_col="ts", tiebreak_col="ts"
        ).collect()
    }
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "a")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "a")] == (1, 1.0)
    # rows of the matrix sum to 1
    assert got[("a", "b")][1] + got[("a", "a")][1] == pytest.approx(1.0)


def test_welch_ttest_matches_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [("A", x) for x in a] + [("B", x) for x in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = welch_ttest(df, "v", "g", "A", "B").collect()[0]
    ma, mb = sum(a) / 4, sum(b) / 5
    va = sum((x - ma) ** 2 for x in a) / 3
    vb = sum((x - mb) ** 2 for x in b) / 4
    sa, sb = va / 4, vb / 5
    t = (ma - mb) / math.sqrt(sa + sb)
    dfw = (sa + sb) ** 2 / (sa**2 / 3 + sb**2 / 4)
    assert (got["n_a"], got["n_b"]) == (4, 5)
    assert got["t_stat"] == pytest.approx(t, abs=1e-6)
    # df_welch is rounded to 4dp by the operator
    assert got["df_welch"] == pytest.approx(dfw, abs=1e-4)


def test_mad_outliers_flags_the_wild_point(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = mad_outliers(df, "v").collect()[0]
    # median of 6 values = (12+13)/2; MAD around it
    assert got["med"] == 12.5
    assert got["n"] == 6
    assert got["n_outliers"] == 1
    assert got["max_abs_z"] > 3.5


def test_mad_outliers_clean_data_has_none(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    got = mad_outliers(df, "v").collect()[0]
    assert got["n_outliers"] == 0


def test_ab_assign_srm_deterministic_and_balanced(spark):
    rows = [(i, float(i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    out1 = sorted(
        ab_assign_srm(df, "user_id", "value").collect(),
        key=lambda r: r["arm"],
    )
    out2 = sorted(
        ab_assign_srm(df, "user_id", "value").collect(),
        key=lambda r: r["arm"],
    )
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert [r["arm"] for r in out1] == [0, 1]
    n0, n1 = out1[0]["n_units"], out1[1]["n_units"]
    assert n0 + n1 == 400
    # md5 split of 400 units: both arms populated, chi2 consistent
    exp = 200.0
    chi2 = (n0 - exp) ** 2 / exp + (n1 - exp) ** 2 / exp
    assert out1[0]["srm_chi2"] == pytest.approx(chi2, abs=1e-6)
    # arm of a specific unit matches the python md5 replay
    arm42 = _h60("exp1#42") % 2
    assert arm42 in (0, 1)


def test_jackknife_ci_matches_numpy_replay(spark):
    vals = [float(i * i % 97) for i in range(300)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["rid", "v"]
    )
    got = jackknife_ci(
        df, "v", buckets=10, id_expr="CAST(rid AS STRING)"
    ).collect()[0]
    # replay the md5 bucketing + jackknife in pure python
    S = {}
    C = {}
    for i, v in enumerate(vals):
        b = _h60(f"jk#{i}") % 10
        S[b] = S.get(b, 0.0) + v
        C[b] = C.get(b, 0) + 1
    tot_s, tot_c = sum(S.values()), sum(C.values())
    loo = [(tot_s - S[b]) / (tot_c - C[b]) for b in S]
    mbar = sum(loo) / len(loo)
    var_j = (len(loo) - 1) / len(loo) * sum((m - mbar) ** 2 for m in loo)
    se = math.sqrt(var_j)
    mean = tot_s / tot_c
    assert got["n"] == 300
    assert got["n_buckets"] == len(S)
    assert got["mean"] == pytest.approx(mean, abs=1e-6)
    assert got["se_jack"] == pytest.approx(se, abs=1e-6)
    assert got["ci_lo"] == pytest.approx(mean - 1.96 * se, abs=1e-5)
    assert got["ci_hi"] == pytest.approx(mean + 1.96 * se, abs=1e-5)


def test_jackknife_ci_constant_column_zero_se(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(50)], ["rid", "v"]
    )
    got = jackknife_ci(
        df, "v", buckets=8, id_expr="CAST(rid AS STRING)"
    ).collect()[0]
    assert got["mean"] == 5.0
    assert got["se_jack"] == 0.0
    assert got["ci_lo"] == 5.0 == got["ci_hi"]


def test_spearman_perfect_monotone_is_one(spark):
    # y = x^3 is nonlinear but perfectly monotone -> rho = 1
    df = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(1, 30)], ["a", "b"]
    )
    from pagerank_spark.operators.stats import spearman_corr

    got = spearman_corr(df, "a", "b").collect()[0]
    assert got["rho_spearman"] == 1.0
    assert got["n_rows"] == 29


def test_spearman_ties_use_average_ranks(spark):
    # scipy-free closed form: x = [1,2,2,3], y = [10,20,30,40]
    # avg ranks x: [1, 2.5, 2.5, 4], y: [1,2,3,4] -> pearson of those
    import math

    xs, ys = [1.0, 2.0, 2.0, 3.0], [10.0, 20.0, 30.0, 40.0]
    rx, ry = [1.0, 2.5, 2.5, 4.0], [1.0, 2.0, 3.0, 4.0]
    mx, my = sum(rx) / 4, sum(ry) / 4
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    df = spark.createDataFrame(list(zip(xs, ys)), ["a", "b"])
    from pagerank_spark.operators.stats import spearman_corr

    got = spearman_corr(df, "a", "b").collect()[0]
    assert got["rho_spearman"] == pytest.approx(num / den, abs=1e-6)


def test_chi2_independence_zero_when_independent(spark):
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(6)]
    df = spark.createDataFrame(rows, ["x", "y"])
    from pagerank_spark.operators.stats import chi2_independence

    got = chi2_independence(df, "x", "y").collect()[0]
    assert got["chi2"] == 0.0
    assert got["dof"] == 1
    assert got["n_cells"] == 4


def test_chi2_independence_counts_zero_cells(spark):
    # ("a","c") and ("b","d") only: grid must still have 4 cells
    rows = [("a", "c")] * 5 + [("b", "d")] * 5
    df = spark.createDataFrame(rows, ["x", "y"])
    from pagerank_spark.operators.stats import chi2_independence

    got = chi2_independence(df, "x", "y").collect()[0]
    assert got["n_cells"] == 4
    # perfect association in a 2x2 with equal margins: chi2 = n
    assert got["chi2"] == pytest.approx(10.0, abs=1e-6)


def test_cusum_finds_planted_level_shift(spark):
    import datetime

    rows = []
    for d in range(20):
        day = datetime.datetime(2024, 1, 1 + d)
        level = 10.0 if d < 10 else 20.0
        for j in range(3):
            rows.append((day + datetime.timedelta(hours=j), level + j))
    df = spark.createDataFrame(rows, ["ts", "value"])
    from pagerank_spark.operators.stats import cusum_changepoint

    got = cusum_changepoint(df, "value").collect()[0]
    # |CUSUM| peaks on the last day of the old level
    assert got["cp_day"] == "2024-01-10"
    assert got["n_days"] == 20
    assert got["max_abs_s"] == pytest.approx(50.0, abs=1e-6)


def test_benford_on_exact_distribution(spark):
    import math

    from pagerank_spark.operators.validate import benford_audit

    # plant counts exactly proportional to Benford -> chi2 == 0
    rows = []
    for d in range(1, 10):
        n_d = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(d) * 10 + 0.5,)] * n_d
    df = spark.createDataFrame(rows, ["v"])
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    total = sum(r["n_obs"] for r in got.values())
    for d in range(1, 10):
        assert got[d]["p_obs"] == pytest.approx(
            got[d]["n_obs"] / total, abs=1e-6
        )
    # counts were rounded to integers, so chi2 is near-zero, not 0
    assert got[1]["chi2"] < 0.01


def test_k_anonymity_hand_counts(spark):
    from pagerank_spark.operators.validate import k_anonymity

    rows = [("US", "A")] * 6 + [("US", "B")] * 2 + [("FR", "A")] * 1
    df = spark.createDataFrame(rows, ["nat", "seg"])
    got = k_anonymity(df, ["nat", "seg"], k=5).collect()[0]
    assert got["n_rows"] == 9
    assert got["n_groups"] == 3
    assert got["min_group"] == 1
    assert got["n_violating_groups"] == 2
    assert got["rows_at_risk"] == 3
    assert got["frac_at_risk"] == pytest.approx(3 / 9, abs=1e-6)


def test_concentration_uniform_vs_dominant(spark):
    from pagerank_spark.operators.analytics import concentration_report

    uni = spark.createDataFrame(
        [(g, 10) for g in "abcd" for _ in range(3)], ["g", "w"]
    )
    got = concentration_report(uni, "g", "w").collect()[0]
    assert got["hhi"] == pytest.approx(0.25, abs=1e-6)
    assert got["gini"] == pytest.approx(0.0, abs=1e-6)
    assert got["top_share"] == pytest.approx(0.25, abs=1e-6)
    dom = spark.createDataFrame(
        [("big", 97), ("s1", 1), ("s2", 1), ("s3", 1)], ["g", "w"]
    )
    got2 = concentration_report(dom, "g", "w").collect()[0]
    assert got2["hhi"] > 0.9
    assert got2["top_share"] == pytest.approx(0.97, abs=1e-6)
    assert got2["gini"] > 0.7


def test_rfm_segments_grid_sums_and_extremes(spark):
    import datetime

    from pagerank_spark.operators.analytics import rfm_segments

    # 10 customers, customer i orders (i+1) times, amounts i*100,
    # last order day 2024-01-(i+1): higher i = more recent, more
    # frequent, higher spend -> customer 9 must land in '555'
    rows = []
    for i in range(10):
        for j in range(i + 1):
            rows.append(
                (
                    i,
                    datetime.datetime(2024, 1, 1 + i - min(j, i)),
                    float((i + 1) * 100),
                )
            )
    df = spark.createDataFrame(
        rows, ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    out = rfm_segments(df).collect()
    assert sum(r["n_customers"] for r in out) == 10
    # ntile(5) over 10 customers -> 2 per tile: the top tile holds
    # customers 8 and 9 (recencies 1 and 0)
    best = {r["segment"]: r for r in out}["555"]
    assert best["n_customers"] == 2
    assert best["avg_recency_days"] == 0.5


def test_kaplan_meier_textbook_curve(spark):
    """Hand-computed product-limit estimator, mixed censoring, with the
    longest duration an OBSERVED event (d == n at the last time point)
    so survival must drop to exactly 0 there — the Spark log(0)→NULL
    trap this operator guards against."""
    from pagerank_spark.operators.stats import kaplan_meier

    # units: t=1 death, t=2 censored, t=3 death, t=3 death, t=5 death
    rows = [(1, True), (2, False), (3, True), (3, True), (5, True)]
    df = spark.createDataFrame(rows, ["duration", "observed"])
    out = {r["t"]: r for r in kaplan_meier(df).collect()}

    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == pytest.approx(4 / 5, abs=1e-6)
    # censoring at t=2 leaves survival unchanged
    assert out[2]["n_censored"] == 1
    assert out[2]["survival"] == pytest.approx(4 / 5, abs=1e-6)
    # t=3: 3 at risk, 2 die -> S = 4/5 * 1/3
    assert out[3]["n_risk"] == 3 and out[3]["n_events"] == 2
    assert out[3]["survival"] == pytest.approx(4 / 15, abs=1e-6)
    # t=5: last unit dies (d == n): survival is exactly 0, not a
    # silently-skipped NULL step leaving it at 4/15
    assert out[5]["n_risk"] == 1 and out[5]["n_events"] == 1
    assert out[5]["survival"] == 0.0


def test_kaplan_meier_all_censored_stays_at_one(spark):
    from pagerank_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(1, False), (2, False), (4, False)], ["duration", "observed"]
    )
    out = kaplan_meier(df).collect()
    assert all(r["survival"] == 1.0 for r in out)
    assert [r["n_risk"] for r in sorted(out, key=lambda r: r["t"])] == [
        3,
        2,
        1,
    ]


def test_spearman_continuous_matches_pandas_and_partitions_ranks(spark):
    """Continuous (all-distinct) columns: values exact vs a pandas
    average-rank replay, and the rank windows are PARTITIONED by the
    value-range block — not one unpartitioned sort of the whole
    distinct-value relation (which is corpus-sized when values are
    continuous)."""
    import pandas as pd

    from pagerank_spark.operators.stats import spearman_corr

    # deterministic non-monotone continuous pairs, all distinct
    rows = [
        (math.sin(i * 0.7) * 100 + i * 0.01, (i * i % 89) + i * 1e-4)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    out = spearman_corr(df, "x", "y", blocks=8)
    got = out.collect()[0]

    pdf = pd.DataFrame(rows, columns=["x", "y"])
    rx, ry = pdf["x"].rank(), pdf["y"].rank()
    expect = rx.corr(ry)  # Pearson over average ranks == Spearman
    assert got["n_rows"] == 500
    assert got["rho_spearman"] == pytest.approx(expect, abs=1e-6)

    # plan: every Window node must be partitioned on the block key —
    # the formatted plan renders an unpartitioned spec as
    # "Window [...], [col ASC ...]" with no partition list; the
    # blocked spec mentions __blk
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__blk" in line or "__tot" in line, line


def test_spearman_constant_column_single_block(spark):
    from pagerank_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(5.0, float(i)) for i in range(20)], "x double, y double"
    )
    got = spearman_corr(df, "x", "y").collect()[0]
    # zero x-variance: rho is NULL (0/0), n still counted
    assert got["rho_spearman"] is None
    assert got["n_rows"] == 20


def test_percentile_rank_midranks_and_edges(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.stats import percentile_rank

    # ties get the average rank; NULL passes through with NULL rank
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 20.0), (4, None)],
        "id long, v double",
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in percentile_rank(df, "v").collect()
    }
    # midrank(10) = 1.5 -> (1.5-0.5)/3; midrank(20) = 3 -> (3-0.5)/3
    assert abs(got[1] - (1.0 / 3)) < 1e-6 and got[1] == got[2]
    assert abs(got[3] - (2.5 / 3)) < 1e-6
    assert got[4] is None

    # constant column: every row is the middle -> 0.5
    const = spark.createDataFrame([(i, 7.0) for i in range(5)], "id long, v double")
    vals = {r["pct_rank"] for r in percentile_rank(const, "v").collect()}
    assert vals == {0.5}

    # all-NULL column: NULL ranks, no crash
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v double"
    )
    out = percentile_rank(nulls, "v").collect()
    assert all(r["pct_rank"] is None for r in out) and len(out) == 2


# ---- grouped HLL rollup (round 11: mergeable sketch aggregate) ------


def test_hll_merge_equals_single_shot(spark):
    # registers are a commutative idempotent monoid:
    # merge(rollup(a), rollup(b)) == rollup(a ∪ b) BIT-EXACTLY
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import (
        hll_grouped_estimate,
        hll_grouped_registers,
        hll_merge,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 7919 % 997).alias("k"),
    )
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)
    merged = hll_merge(
        hll_grouped_registers(a, "k", ["g"]),
        hll_grouped_registers(b, "k", ["g"]),
        ["g"],
    )
    single = hll_grouped_registers(df, "k", ["g"])
    m = {(r["g"], r["bucket"]): r["max_rho"] for r in merged.collect()}
    s = {(r["g"], r["bucket"]): r["max_rho"] for r in single.collect()}
    assert m == s
    # idempotence: merging a rollup with itself changes nothing
    again = hll_merge(single, single, ["g"])
    assert {(r["g"], r["bucket"]): r["max_rho"]
            for r in again.collect()} == s
    # and the folded estimates agree with the ungrouped fold per group
    est = {r["g"]: r["hll_estimate"]
           for r in hll_grouped_estimate(single, ["g"]).collect()}
    assert set(est) == {"0", "1", "2"}
    for g, e in est.items():
        exact = df.where(F.col("g") == g).select("k").distinct().count()
        assert abs(e - exact) / exact < 3 * 1.04 / 16.0


def test_hll_grouped_register_bound(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import hll_grouped_registers

    df = spark.range(50000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    regs = hll_grouped_registers(df, "k", ["g"])
    counts = {r["g"]: r["n"] for r in regs.groupBy("g")
              .agg(F.count("*").alias("n")).collect()}
    assert all(n <= 256 for n in counts.values())


def test_bottomk_merge_equals_single_shot(spark):
    # bottomk(a ∪ b) == bottomk(bottomk(a) ∪ bottomk(b)) exactly
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import bottomk_sample

    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("g")
    )
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)
    sa = bottomk_sample(a, "k", k=7, group_cols=["g"]).drop("sample_rank")
    sb = bottomk_sample(b, "k", k=7, group_cols=["g"]).drop("sample_rank")
    merged = bottomk_sample(
        sa.unionByName(sb), "k", k=7, group_cols=["g"]
    )
    single = bottomk_sample(df, "k", k=7, group_cols=["g"])
    ms = sorted((r["g"], r["k"], r["sample_rank"]) for r in merged.collect())
    ss = sorted((r["g"], r["k"], r["sample_rank"]) for r in single.collect())
    assert ms == ss
    assert len(ss) == 28  # 4 groups x 7


def test_bottomk_ungrouped_is_take_ordered(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import bottomk_sample

    df = spark.range(10000).select(F.col("id").alias("k"))
    out = bottomk_sample(df, "k", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 10

    import pytest

    with pytest.raises(ValueError):
        bottomk_sample(df, "k", k=0)


def test_weighted_bottomk_prefers_heavy_weights(spark):
    # with weights 1000 vs 1, the heavy rows dominate the sample
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import weighted_bottomk_sample

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, 1000.0).otherwise(1.0).alias("w"),
    )
    out = weighted_bottomk_sample(df, "k", "w", k=50)
    rows = out.collect()
    assert len(rows) == 50
    heavy = sum(1 for r in rows if r["k"] < 100)
    assert heavy >= 40  # ~100 heavy rows at 1000x weight dominate
    # zero/negative weights never sampled
    df2 = df.withColumn(
        "w", F.when(F.col("k") % 2 == 0, -1.0).otherwise(F.col("w"))
    )
    out2 = weighted_bottomk_sample(df2, "k", "w", k=50)
    assert all(r["k"] % 2 == 1 for r in out2.collect())
