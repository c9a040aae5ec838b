"""Property-based tests (hypothesis) for operator invariants.

Each property runs a handful of examples (Spark jobs are not cheap) with
derandomized generation so CI is stable.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_spark.operators import dedup, text
from pagerank_spark.streaming import sessionize

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_exact_dedup_keeps_min_order_per_key(spark, rows):
    df = spark.createDataFrame(rows, "key INT, ord INT")
    out = dedup.exact_dedup(df, ["key"], "ord").collect()
    want_keys = {k for k, _ in rows}
    assert {r["key"] for r in out} == want_keys
    assert len(out) == len(want_keys)  # exactly one survivor per key
    mins = {}
    for k, o in rows:
        mins[k] = min(mins.get(k, o), o)
    for r in out:
        assert r["ord"] == mins[r["key"]]


@settings(**SETTINGS)
@given(
    gaps=st.lists(st.integers(1, 4000), min_size=1, max_size=25),
)
def test_sessionize_counts_gap_boundaries(spark, gaps):
    # One user; consecutive inter-event gaps in seconds. Expected session
    # count = 1 + number of gaps strictly above the 1800s threshold.
    ts = [1_700_000_000]
    for g in gaps:
        ts.append(ts[-1] + g)
    rows = [(1, t, 1.0) for t in ts]
    df = spark.createDataFrame(rows, "user_id LONG, ep LONG, value DOUBLE")
    events = df.selectExpr(
        "user_id", "CAST(ep AS TIMESTAMP) AS ts", "value"
    )
    out = sessionize(events, gap="30 minutes").collect()
    want_sessions = 1 + sum(1 for g in gaps if g > 1800)
    assert len(out) == want_sessions
    assert sum(r["n_events"] for r in out) == len(ts)


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    ),
    seed=st.integers(0, 1000),
)
def test_fingerprint_is_order_insensitive(spark, words, seed):
    import random

    shuffled = words[:]
    random.Random(seed).shuffle(shuffled)
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(shuffled))], ["doc_id", "text"]
    )
    out = {r["doc_id"]: (r["fingerprint"], r["n_tokens"])
           for r in text.fingerprint(df, "doc_id").collect()}
    assert out[1] == out[2]


@settings(**SETTINGS)
@given(
    sizes=st.tuples(st.integers(1, 40), st.integers(1, 40)),
    w_a=st.integers(1, 9),
)
def test_sample_to_mix_plan_feasibility(spark, sizes, w_a):
    # Invariants for ANY two-group corpus and weight split: keep
    # fractions never exceed 1, the binding group (min n/w) is kept
    # whole, and the keep set is a subset of the input chosen
    # deterministically.
    from pagerank_spark.operators.curation import mix_plan, sample_to_mix

    n_a, n_b = sizes
    weights = {"a": w_a / 10.0, "b": 1.0 - w_a / 10.0}
    rows = [(i, "a") for i in range(n_a)] + [
        (n_a + i, "b") for i in range(n_b)
    ]
    df = spark.createDataFrame(rows, "id INT, grp STRING")
    plan = {
        r["grp"]: r for r in mix_plan(df, "grp", weights).collect()
    }
    assert all(r["keep_frac"] <= 1.0 + 1e-12 for r in plan.values())
    binding = min(plan, key=lambda g: plan[g]["n_rows"] / plan[g]["weight"])
    assert plan[binding]["keep_frac"] == 1.0
    kept1 = sorted(
        r["id"] for r in sample_to_mix(df, "grp", weights, "id").collect()
    )
    kept2 = sorted(
        r["id"]
        for r in sample_to_mix(
            df.repartition(7), "grp", weights, "id"
        ).collect()
    )
    assert kept1 == kept2  # partitioning-invariant keep set
    assert set(kept1) <= {i for i, _ in rows}


@settings(**SETTINGS)
@given(
    lines=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll",), max_codepoint=122
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_boilerplate_removal_single_doc_is_identity(spark, lines):
    # With one document no line can reach min_docs=2 distinct docs, so
    # the text must round-trip unchanged with zero removals.
    from pagerank_spark.operators.curation import remove_boilerplate_lines

    txt = "\n".join(lines)
    df = spark.createDataFrame([(1, txt)], "doc_id INT, text STRING")
    out = remove_boilerplate_lines(df).collect()[0]
    assert out["text"] == txt
    assert out["n_lines_removed"] == 0


@settings(**SETTINGS)
@given(
    sizes=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    budget=st.integers(4, 64),
)
def test_pack_sequences_equals_sequential_scan(spark, sizes, budget):
    # The distributed two-level prefix sum must equal the sequential
    # layout for ANY size profile (zeros included) and any budget.
    from pagerank_spark.operators.curation import pack_sequences

    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "id long, n long")
    out = {
        r["id"]: r
        for r in pack_sequences(df, "id", "n", budget=budget, blocks=3)
        .collect()
    }
    start = 0
    for i, n in rows:
        r = out[i]
        assert r["start_tok"] == start
        assert r["seq_first"] == start // budget
        assert r["seq_last"] == (start + max(n - 1, 0)) // budget
        start += n


@settings(**SETTINGS)
@given(
    n_rows=st.integers(1, 300),
    fracs=st.tuples(
        st.floats(0.1, 5.0), st.floats(0.1, 5.0), st.floats(0.1, 5.0)
    ),
)
def test_dataset_split_partition_properties(spark, n_rows, fracs):
    # Exhaustive + disjoint for arbitrary (unnormalized) fractions,
    # and stable across repartitioning.
    from pagerank_spark.operators.curation import dataset_split

    df = spark.createDataFrame([(i,) for i in range(n_rows)], ["id"])
    names = {"a": fracs[0], "b": fracs[1], "c": fracs[2]}
    out = dataset_split(df, "id", names).collect()
    assert len(out) == n_rows
    assert {r["split"] for r in out} <= {"a", "b", "c"}
    again = {
        r["id"]: r["split"]
        for r in dataset_split(df.repartition(7), "id", names).collect()
    }
    assert {r["id"]: r["split"] for r in out} == again


@settings(**SETTINGS)
@given(
    keys=st.lists(st.integers(0, 25), min_size=1, max_size=120),
    width=st.integers(8, 64),
)
def test_cms_estimate_never_underestimates(spark, keys, width):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(f"k{k}",) for k in keys], ["k"])
    sketch = cms_build(df, "k", width=width, depth=3)
    exact = df.groupBy("k").agg(F.count("*").alias("exact"))
    est = cms_estimate(exact, "k", sketch, width=width, depth=3)
    for r in est.collect():
        assert r["cms_est"] >= r["exact"]


def test_no_duplicate_toplevel_defs_anywhere():
    """A module with two same-named top-level defs silently shadows
    the first — exactly how round 8 briefly broke q172 (a new
    bigram_logprob appended to text.py shadowed the existing one).
    Python has no warning for this; this gate does."""
    import ast
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = {}
    files = glob.glob(os.path.join(repo, "pagerank_spark", "**", "*.py"),
                      recursive=True)
    files.append(os.path.join(repo, "__spark_entry__.py"))
    for path in files:
        tree = ast.parse(open(path).read())
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    offenders.setdefault(
                        os.path.relpath(path, repo), []
                    ).append(node.name)
                seen[node.name] = node.lineno
    assert not offenders, offenders
