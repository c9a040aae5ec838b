"""kn_trigram_probs / kn_perplexity vs a pure-Python Kneser–Ney.

The reference implements the documented interpolated fixed-discount
estimate (Chen & Goodman 1999) from raw token lists; the distributed
trainer must match it to float precision (both sides compute the same
exact-integer expression tree). Backoff/OOV semantics are pinned
separately: unseen contexts back off with full weight, unseen
continuations NULL-poison the doc's perplexity.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from pagerank_spark.operators.ngram_lm import (
    kn_perplexity,
    kn_trigram_probs,
)

D = 0.75


def ref_kn(docs_tokens):
    """Count relations + probability function from raw token lists."""
    tg = Counter()
    for toks in docs_tokens:
        arr = ["<s>", "<s>"] + toks + ["</s>"]
        for i in range(len(arr) - 2):
            tg[(arr[i], arr[i + 1], arr[i + 2])] += 1
    c2, n3 = Counter(), Counter()
    cc_sets = defaultdict(set)
    mid_ncc, mid_fol = Counter(), defaultdict(set)
    for (w1, w2, w3), c in tg.items():
        c2[(w1, w2)] += c
        mid_ncc[w2] += 1
        mid_fol[w2].add(w3)
        cc_sets[(w2, w3)].add(w1)
    n3.update({k: 0 for k in c2})
    seen3 = defaultdict(set)
    for (w1, w2, w3) in tg:
        seen3[(w1, w2)].add(w3)
    n3 = {k: len(v) for k, v in seen3.items()}
    cc = {k: len(v) for k, v in cc_sets.items()}
    n1 = Counter()
    for (w2, w3) in cc:
        n1[w3] += 1
    nbi = len(cc)

    def p(w1, w2, w3):
        p1 = n1.get(w3, 0) / nbi
        if w2 in mid_ncc:
            ncc = mid_ncc[w2]
            p2 = (
                max(cc.get((w2, w3), 0) - D, 0.0) / ncc
                + ((D * len(mid_fol[w2])) / ncc) * p1
            )
        else:
            p2 = p1
        if (w1, w2) in c2:
            cd = c2[(w1, w2)]
            return (
                max(tg.get((w1, w2, w3), 0) - D, 0.0) / cd
                + ((D * n3[(w1, w2)]) / cd) * p2
            )
        return p2

    return tg, p


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat sat",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string",
    )


def test_kn_probs_match_reference(spark):
    tg, p = ref_kn([t.split() for t in CORPUS])
    got = {
        (r["w1"], r["w2"], r["w3"]): r["p"]
        for r in kn_trigram_probs(_docs(spark)).collect()
    }
    assert set(got) == set(tg)
    for key, prob in got.items():
        assert prob == pytest.approx(p(*key), abs=1e-12), key


def test_kn_probs_sum_to_one(spark):
    """For any observed context, Σ over the FULL continuation
    vocabulary of P(w3|w1,w2) must be exactly 1 — the property that
    makes KN a distribution (discount mass exactly redistributed)."""
    tg, p = ref_kn([t.split() for t in CORPUS])
    vocab = {w3 for (_, _, w3) in tg} | {w for t in CORPUS for w in t.split()}
    for ctx in {(w1, w2) for (w1, w2, _) in tg}:
        total = sum(p(ctx[0], ctx[1], w3) for w3 in vocab)
        assert total == pytest.approx(1.0, abs=1e-9), ctx


def test_kn_perplexity_matches_reference(spark):
    _, p = ref_kn([t.split() for t in CORPUS])
    out = {
        r["doc_id"]: r for r in kn_perplexity(_docs(spark)).collect()
    }
    for i, text in enumerate(CORPUS):
        arr = ["<s>", "<s>"] + text.split() + ["</s>"]
        lps = [
            math.log(p(arr[j], arr[j + 1], arr[j + 2]))
            for j in range(len(arr) - 2)
        ]
        want = math.exp(-sum(lps) / len(lps))
        assert out[i]["n_tokens"] == len(lps)
        assert out[i]["ppl"] == pytest.approx(want, rel=1e-9)


def test_kn_backoff_and_oov(spark):
    """Cross-corpus scoring: a doc whose every token is in-vocabulary
    but whose n-grams are novel gets a finite backed-off ppl; a doc
    containing a token never seen as a continuation reports NULL
    (flagged, not floored)."""
    train = _docs(spark)
    score = spark.createDataFrame(
        [(100, "mat the dog"), (101, "the zebra sat")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in kn_perplexity(score, train_docs=train).collect()
    }
    assert out[100]["ppl"] is not None and out[100]["ppl"] > 1.0
    assert out[101]["ppl"] is None
    # reference cross-check for the backed-off doc
    _, p = ref_kn([t.split() for t in CORPUS])
    arr = ["<s>", "<s>"] + "mat the dog".split() + ["</s>"]
    want = math.exp(
        -sum(
            math.log(p(arr[j], arr[j + 1], arr[j + 2]))
            for j in range(len(arr) - 2)
        )
        / (len(arr) - 2)
    )
    assert out[100]["ppl"] == pytest.approx(want, rel=1e-9)


def test_kn_ranks_fluency(spark):
    """The model must prefer in-domain word order: a fixture document
    scored as-is gets lower ppl than the same tokens reversed (both
    scored under the fixture-trained model) for the clear majority of
    docs — the CCNet ranking signal."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    from pyspark.sql import functions as F

    rev = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.reverse(F.split(F.trim("text"), r"\s+"))
        ).alias("text"),
    )
    out = kn_perplexity(docs.unionByName(rev), train_docs=docs)
    rows = {r["doc_id"]: r["ppl"] for r in out.collect()}
    fwd_ids = [i for i in rows if i < 1_000_000]
    better = sum(
        1
        for i in fwd_ids
        if rows.get(i + 1_000_000) is None
        or rows[i] < rows[i + 1_000_000]
    )
    assert better / len(fwd_ids) > 0.7, f"{better}/{len(fwd_ids)}"


def test_kn_beats_unigram_on_order_auc(spark):
    """Fluency separation through the q155 AUC machinery: label
    fixture docs 1 (as-is) vs 0 (tokens reversed), score both with the
    KN model and with q119's unigram mean logprob, both trained on the
    forward corpus. The unigram scorer is ORDER-BLIND — a reversed doc
    has the identical score, so its AUC is exactly 0.5 (all ties);
    Kneser-Ney reads n-gram order and must separate cleanly."""
    from pyspark.sql import functions as F

    from pagerank_spark.operators.analytics import binary_auc
    from pagerank_spark.operators.text import unigram_logprob

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    rev = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.reverse(F.split(F.trim("text"), r"\s+"))
        ).alias("text"),
    )
    both = docs.unionByName(rev)
    lab = F.when(F.col("doc_id") < 1_000_000, 1.0).otherwise(0.0)

    kn = kn_perplexity(both, train_docs=docs).select(
        "doc_id", (-F.col("ppl")).alias("score"), lab.alias("y")
    )
    auc_kn = binary_auc(kn, "y", "score").collect()[0]["auc"]

    uni = unigram_logprob(both).select(
        "doc_id", F.col("avg_logprob").alias("score"), lab.alias("y")
    )
    auc_uni = binary_auc(uni, "y", "score").collect()[0]["auc"]

    assert auc_uni == pytest.approx(0.5, abs=0.02), auc_uni
    assert auc_kn > 0.85, auc_kn


def test_ppl_quality_bands_population_and_ties(spark):
    """Value-banding semantics: bands are ~equal-population in value
    order, ties share a band, fluent repeated docs land in band 1 and
    the disfluent outlier in the last band."""
    from pagerank_spark.operators.ngram_lm import ppl_quality_bands

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(6)]           # 6 identical docs
    rows += [(10, "the cat sat on the hat"),
             (11, "mat the on sat cat the"),         # scrambled
             (12, "hat mat cat sat on the on")]      # disfluent
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ppl_quality_bands(docs, n_bands=3)
    got = {r["doc_id"]: (r["ppl"], r["band"]) for r in out.collect()}
    assert len(got) == 9
    # identical texts => identical ppl => identical band (ties share)
    fluent_bands = {got[i][1] for i in range(6)}
    assert len(fluent_bands) == 1
    # the 6 fluent docs are the ppl minimum => band 1
    assert got[0][1] == 1
    min_ppl = min(p for p, _ in got.values())
    assert got[0][0] == min_ppl
    # the max-ppl doc is in band 3
    worst = max(got, key=lambda d: got[d][0])
    assert got[worst][1] == 3
    # bands are monotone in ppl
    by_ppl = sorted(got.values())
    bands_in_order = [b for _, b in by_ppl]
    assert bands_in_order == sorted(bands_in_order)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bands"):
        ppl_quality_bands(docs, n_bands=1)


def test_ppl_quality_bands_flags_oov_docs(spark):
    """Out-of-domain scoring: a doc whose unigram continuation was
    never seen in training gets NULL ppl and NULL band — flagged, not
    silently binned — while in-vocab docs still band normally."""
    from pagerank_spark.operators.ngram_lm import ppl_quality_bands

    train = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "b c a")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "a b c"), (2, "c a b"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    out = ppl_quality_bands(score, train_docs=train, n_bands=2)
    got = {r["doc_id"]: (r["ppl"], r["band"]) for r in out.collect()}
    assert got[3] == (None, None)
    assert got[1][0] is not None and got[1][1] in (1, 2)
    assert got[2][0] is not None and got[2][1] in (1, 2)
