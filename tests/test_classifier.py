"""logreg_train / logreg_predict / hashed_token_features.

The distributed trainer must match a dense NumPy implementation of the
IDENTICAL update rule to float precision (same zero init, same
full-batch mean gradient, same lr/l2), separate cleanly on a separable
toy problem, and — as the end-to-end evidence — learn a lang='en'
scorer over hashed token features whose training AUC (through the same
binary_auc machinery as q155) beats the fixed n_chars heuristic.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pagerank_spark.functions import word_tokens
from pagerank_spark.operators.classifier import (
    BIAS_INDEX,
    hashed_token_features,
    logreg_predict,
    logreg_train,
)


def _numpy_logreg(X, y, rounds, lr, l2=0.0):
    """Dense twin of the distributed update rule (zero init, bias as
    an extra all-ones column, mean gradient, l2 on weights only as the
    trainer applies it — every coefficient including bias)."""
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) / n
        w = w - lr * (g + l2 * w)
    return w  # [w_0..w_{d-1}, bias]


def _sparse_df(spark, X, ids=None):
    rows = []
    for i in range(X.shape[0]):
        for j in range(X.shape[1]):
            if X[i, j] != 0.0:
                rows.append((i if ids is None else ids[i], j, float(X[i, j])))
    return spark.createDataFrame(
        rows, "doc_id long, feature_index long, feature_value double"
    )


def _labels_df(spark, y, ids=None):
    return spark.createDataFrame(
        [
            (i if ids is None else ids[i], float(v))
            for i, v in enumerate(y)
        ],
        "doc_id long, y double",
    )


def _wdict(weights_df):
    return {
        r["feature_index"]: r["weight"] for r in weights_df.collect()
    }


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(40, 5)
    X[rng.rand(40, 5) < 0.4] = 0.0  # genuinely sparse input
    y = (X[:, 0] + 0.5 * X[:, 3] + 0.2 * rng.randn(40) > 0).astype(float)
    res = logreg_train(
        _sparse_df(spark, X), _labels_df(spark, y), rounds=7, lr=0.3
    )
    assert res.iterations == 7
    got = _wdict(res.weights)
    ref = _numpy_logreg(X, y, rounds=7, lr=0.3)
    for j in range(5):
        assert got.get(j, 0.0) == pytest.approx(ref[j], abs=1e-12)
    assert got[BIAS_INDEX] == pytest.approx(ref[5], abs=1e-12)


def test_matches_numpy_with_l2(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(30, 4)
    y = (X[:, 1] > 0.2).astype(float)
    res = logreg_train(
        _sparse_df(spark, X), _labels_df(spark, y), rounds=5, lr=0.4, l2=0.05
    )
    ref = _numpy_logreg(X, y, rounds=5, lr=0.4, l2=0.05)
    got = _wdict(res.weights)
    for j in range(4):
        assert got.get(j, 0.0) == pytest.approx(ref[j], abs=1e-12)
    assert got[BIAS_INDEX] == pytest.approx(ref[4], abs=1e-12)


def test_separable_hand_case(spark):
    """Feature 0 perfectly separates the labels: the weight on it must
    grow positive, the loss must fall monotonically, and prediction
    must rank every positive above every negative (AUC = 1)."""
    X = np.array([[1.0, 1.0], [2.0, 0.5], [-1.0, 1.0], [-2.0, 0.5]])
    y = np.array([1.0, 1.0, 0.0, 0.0])
    feats = _sparse_df(spark, X)
    res = logreg_train(
        feats, _labels_df(spark, y), rounds=40, lr=1.0, track_loss=True
    )
    w = _wdict(res.weights)
    assert w[0] > 1.0
    assert abs(w[1]) < abs(w[0])  # non-informative feature stays small
    assert res.losses == sorted(res.losses, reverse=True)  # monotone ↓
    assert res.losses[-1] < 0.2

    scored = {
        r["doc_id"]: r["score"]
        for r in logreg_predict(feats, res.weights).collect()
    }
    assert min(scored[0], scored[1]) > max(scored[2], scored[3])


def test_tol_early_stop(spark):
    """Non-separable data has an interior optimum, so the gradient
    decays geometrically and tol must fire well before the round cap
    (a separable problem would decay only ~1/t)."""
    X = np.array([[1.0], [1.0], [1.0], [-1.0], [-1.0]])
    y = np.array([1.0, 1.0, 0.0, 0.0, 1.0])
    res = logreg_train(
        _sparse_df(spark, X),
        _labels_df(spark, y),
        rounds=200,
        lr=0.5,
        tol=1e-4,
    )
    # the NumPy twin of this exact problem converges at round 44
    assert res.iterations < 60


def test_round1_gradient_exact(spark):
    """Round 1 closed form (w=0 → p=0.5): w_j = -lr * mean((0.5-y)·x_j).
    Pins the zero-init contract the unrolled SQL twin relies on."""
    X = np.array([[2.0, 0.0], [0.0, 4.0]])
    y = np.array([1.0, 0.0])
    res = logreg_train(
        _sparse_df(spark, X), _labels_df(spark, y), rounds=1, lr=0.5
    )
    w = _wdict(res.weights)
    # g_0 = ((0.5-1)*2 + 0)/2 = -0.5 → w_0 = 0.25
    # g_1 = (0 + (0.5-0)*4)/2 = 1.0 → w_1 = -0.5
    # g_b = ((0.5-1) + (0.5-0))/2 = 0 → bias = 0
    assert w[0] == pytest.approx(0.25, abs=1e-15)
    assert w[1] == pytest.approx(-0.5, abs=1e-15)
    assert w[BIAS_INDEX] == pytest.approx(0.0, abs=1e-15)


def test_hashed_token_features_multiplicity(spark):
    df = spark.createDataFrame(
        [(1, "Alpha alpha beta"), (2, "beta  beta\tbeta")],
        "doc_id long, text string",
    )
    out = hashed_token_features(df, n_features=1 << 20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # lowercased: 'alpha' twice collapses into one index, |value| = 2
    assert sorted(abs(r["feature_value"]) for r in by_doc[1]) == [1.0, 2.0]
    assert [abs(r["feature_value"]) for r in by_doc[2]] == [3.0]
    # same token → same index across docs
    beta1 = [r for r in by_doc[1] if abs(r["feature_value"]) == 1.0][0]
    assert beta1["feature_index"] == by_doc[2][0]["feature_index"]


def test_hashed_token_features_normalize(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc")], "doc_id long, text string"
    )
    out = hashed_token_features(df, n_features=1 << 20, normalize=True)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r["feature_value"])
    for vals in by_doc.values():
        assert sum(v * v for v in vals) == pytest.approx(1.0, abs=1e-12)
    # relative magnitudes preserved: doc 1 has |2|/sqrt(5), |1|/sqrt(5)
    assert sorted(abs(v) for v in by_doc[1]) == pytest.approx(
        [1 / 5**0.5, 2 / 5**0.5]
    )


def test_trained_scorer_beats_heuristic_auc(spark):
    """End-to-end evidence on the fixture corpus, evaluated through the
    q155 binary_auc machinery. The synthetic documents share ONE
    vocabulary across langs (lang is token-blind by construction), so
    the learnable target is token presence: y = doc contains 'vector'
    (77/23 split). The trained BoW scorer must approach perfect
    separation; the length heuristic (longer docs are more likely to
    contain any given token) sets the non-trivial bar it must beat."""
    from pagerank_spark.operators.analytics import binary_auc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = hashed_token_features(docs, n_features=256)
    labels = docs.select(
        "doc_id",
        F.array_contains(word_tokens(F.lower(F.col("text"))), "vector")
        .cast("double")
        .alias("y"),
    )
    model = logreg_train(feats, labels, rounds=40, lr=1.0)
    scored = logreg_predict(feats, model.weights).join(labels, "doc_id")

    auc_trained = binary_auc(scored, "y", "score").collect()[0]["auc"]
    auc_heuristic = binary_auc(
        docs.join(labels, "doc_id").select("y", "n_chars"),
        "y",
        "n_chars",
    ).collect()[0]["auc"]
    assert auc_trained > 0.95
    assert auc_heuristic < auc_trained


# ---------------------------------------------------------------------------
# softmax (multiclass) trainer


def _numpy_softmax(X, y, n_classes, rounds, lr):
    """Dense twin of softmax_train's update rule (zero init, bias as an
    extra all-ones column, max-shifted softmax, mean gradient)."""
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    W = np.zeros((n_classes, d + 1))
    Y = np.zeros((n, n_classes))
    Y[np.arange(n), y] = 1.0
    for _ in range(rounds):
        Z = Xb @ W.T
        Z -= Z.max(axis=1, keepdims=True)
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        G = (P - Y).T @ Xb / n
        W = W - lr * G
    return W  # [k, (w_0..w_{d-1}, bias)]


def test_softmax_matches_numpy_reference(spark):
    from pagerank_spark.operators.classifier import softmax_train

    rng = np.random.default_rng(7)
    X = np.round(rng.normal(size=(30, 6)), 3)
    y = rng.integers(0, 3, size=30)
    labels = spark.createDataFrame(
        [(i, f"c{v}") for i, v in enumerate(y)],
        "doc_id long, label string",
    )
    model = softmax_train(
        _sparse_df(spark, X), labels, rounds=7, lr=0.4
    )
    W = _numpy_softmax(X, y, 3, rounds=7, lr=0.4)
    got = {
        (r["class_index"], r["feature_index"]): r["weight"]
        for r in model.weights.collect()
    }
    classes = {
        r["label"]: r["class_index"] for r in model.classes.collect()
    }
    assert classes == {"c0": 0, "c1": 1, "c2": 2}
    for k in range(3):
        for j in range(6):
            assert got[(k, j)] == pytest.approx(W[k, j], abs=1e-12)
        assert got[(k, -1)] == pytest.approx(W[k, 6], abs=1e-12)


def test_softmax_round1_loss_is_ln_k(spark):
    """Zero init ⇒ round-1 probabilities are exactly 1/K, so the
    tracked starting loss is ln(K) — and training must reduce it."""
    from pagerank_spark.operators.classifier import softmax_train

    rng = np.random.default_rng(3)
    X = np.round(rng.normal(size=(24, 5)), 3)
    y = rng.integers(0, 4, size=24)
    labels = spark.createDataFrame(
        [(i, f"c{v}") for i, v in enumerate(y)],
        "doc_id long, label string",
    )
    model = softmax_train(
        _sparse_df(spark, X), labels, rounds=6, lr=0.5, track_loss=True
    )
    assert model.losses[0] == pytest.approx(np.log(4), rel=1e-9)
    assert model.losses[-1] < model.losses[0]


def test_softmax_validation(spark):
    from pagerank_spark.operators.classifier import softmax_train

    X = np.ones((4, 2))
    one_class = spark.createDataFrame(
        [(i, "only") for i in range(4)], "doc_id long, label string"
    )
    with pytest.raises(ValueError, match="rounds"):
        softmax_train(_sparse_df(spark, X), one_class, rounds=0)
    with pytest.raises(ValueError, match="classes"):
        softmax_train(_sparse_df(spark, X), one_class, rounds=1)


def test_softmax_beats_charclass_heuristic(spark):
    """Trained language-ID vs the q22 marker heuristic on a corpus of
    two domain 'dialects' that contain NO marker stopwords: the
    heuristic can only answer 'unknown' (accuracy 0), while the
    trained softmax separates the vocabularies perfectly — the
    fastText-vs-rules gap the LEARNING tier exists to close."""
    from pagerank_spark.operators.classifier import (
        softmax_predict,
        softmax_train,
    )
    from pagerank_spark.operators.text import language_id

    tech = "kernel scheduler mutex paging interrupt syscall buffer "
    bio = "enzyme protein ribosome mitosis chromosome peptide cell "
    rows = [(i, (tech if i % 2 == 0 else bio) * 3) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {i: ("tech" if i % 2 == 0 else "bio") for i in range(40)}
    labels = spark.createDataFrame(
        [(i, v) for i, v in truth.items()], "doc_id long, label string"
    )

    feats = hashed_token_features(docs, n_features=256, normalize=True)
    model = softmax_train(feats, labels, rounds=25, lr=1.0)
    pred = {
        r["doc_id"]: r["label"]
        for r in softmax_predict(feats, model).collect()
    }
    acc_trained = sum(pred[i] == truth[i] for i in truth) / len(truth)

    heur = {
        r["doc_id"]: r["pred_lang"]
        for r in language_id(docs).collect()
    }
    acc_heur = sum(heur[i] == truth[i] for i in truth) / len(truth)

    assert acc_trained == 1.0
    assert acc_heur == 0.0  # marker-free corpus: all 'unknown'
    assert acc_trained > acc_heur


def test_softmax_predict_scores_feature_docs_only(spark):
    """softmax_predict's scoring universe is the FEATURE relation's
    doc ids (bias rows built from features.distinct — the q258
    'predict consumes features only' precedent): a doc with zero
    feature rows (blank text upstream) must be ABSENT from the
    output, not intercept-scored. Pins the contract the q263 oracle
    twin's xp CTE mirrors (r13 ADVICE)."""
    from pagerank_spark.operators.classifier import (
        softmax_predict,
        softmax_train,
    )

    rng = np.random.default_rng(5)
    X = np.round(rng.normal(size=(12, 4)), 3)
    y = rng.integers(0, 2, size=12)
    labels = spark.createDataFrame(
        [(i, f"c{v}") for i, v in enumerate(y)]
        + [(99, "c0")],  # labeled but feature-less (blank doc)
        "doc_id long, label string",
    )
    feats = _sparse_df(spark, X)  # doc_ids 0..11 only — no 99
    model = softmax_train(feats, labels, rounds=3, lr=0.5)
    got_ids = {
        r["doc_id"] for r in softmax_predict(feats, model).collect()
    }
    assert got_ids == set(range(12))
    assert 99 not in got_ids
