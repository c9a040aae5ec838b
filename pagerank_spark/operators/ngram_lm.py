"""Interpolated Kneser–Ney n-gram language model — trained and applied
as pure joins/aggregations (Chen & Goodman 1999, the CCNet scoring
model's classic form; q119's unigram logprob is the degenerate case).

The model is ENTIRELY count relations derived from one pass over the
corpus: per-doc token arrays are padded (``<s> <s> … </s>``), trigram
instances exploded from array expressions (no window over the corpus,
no self-join — each position is an ``element_at`` triple), and every
KN quantity is a grouped (distinct-)count over the trigram TYPE
relation:

    c3(w1,w2,w3)   trigram instance count
    c2(w1,w2)      trigram-context marginal (Σ_w3 c3)
    n3(w1,w2)      N1+(w1 w2 •)  — distinct continuations
    cc(w2,w3)      N1+(• w2 w3)  — distinct left-extensions
    ncc(w2)        N1+(• w2 •)
    nfol(w2)       N1+(w2 •)
    n1(w3)         N1+(• w3)
    nbi            total distinct (w2,w3) types (scalar)

with the fixed-discount interpolated estimate (D = 0.75, an exact
binary fraction)::

    P1(w3)        = n1 / nbi
    P2(w3|w2)     = max(cc−D,0)/ncc + (D·nfol/ncc)·P1
    P3(w3|w1,w2)  = max(c3−D,0)/c2  + (D·n3/c2)·P2

Unseen contexts back off with full weight (the CASE chain); a token
whose unigram continuation is unseen scores zero and NULL-poisons its
doc's perplexity (the tokenizer tier's flagging discipline) instead of
fabricating a floor.

Determinism (the q260/q261 oracle twins): every input is an exact
integer count and D is an exact binary fraction, so each probability
is ONE fixed scalar expression tree over exact values — bit-identical
across engines, no rounding tricks needed inside the model. Only the
per-doc log-likelihood sum (reduction order) and ln/exp (libm ulps)
drift, absorbed by the queries' 6-decimal output rounding.

Scale shape: one corpus scan to explode trigrams; every count
relation is TYPE-bounded (≤ distinct n-grams, the Heaps-law
vocabulary curve — far sublinear in corpus size); training is ~6
partial-combined aggregations; scoring is a chain of equi-joins of
the instance relation against the type relations on token keys —
co-partitionable, broadcastable when the model is small. No windows,
no driver state beyond the one ``nbi`` scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kn_trigram_probs", "kn_perplexity"]

BOS = "<s>"
EOS = "</s>"


def _trigram_instances(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2, w3) — one row per padded trigram position.

    The padded token array is PROJECTED to a column before the
    position transform: inlining it would re-evaluate the whole
    split/filter/concat expression for every one of the 3·n
    ``element_at`` accesses — O(len²) re-tokenization per doc, the
    same expression-duplication class as the q257 Viterbi when-chain
    (measured ~4× on q261 at sf0.1)."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    padded = F.concat(
        F.array(F.lit(BOS), F.lit(BOS)), words, F.array(F.lit(EOS))
    )
    arr = F.col("__arr")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 2),
        lambda i: F.struct(
            F.element_at(arr, i).alias("w1"),
            F.element_at(arr, i + 1).alias("w2"),
            F.element_at(arr, i + 2).alias("w3"),
        ),
    )
    return (
        docs.select(F.col(id_col), padded.alias("__arr"))
        .select(F.col(id_col), F.explode(tri).alias("t"))
        .select(id_col, "t.w1", "t.w2", "t.w3")
    )


def _kn_relations(tg: DataFrame):
    """The eight count relations listed in the module docstring."""
    c3 = tg.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    c2 = c3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"), F.count("*").alias("n3")
    )
    cc = c3.groupBy("w2", "w3").agg(F.countDistinct("w1").alias("cc"))
    mid = c3.groupBy("w2").agg(
        F.count("*").alias("ncc"), F.countDistinct("w3").alias("nfol")
    )
    n1 = cc.groupBy("w3").agg(F.count("*").alias("n1"))
    nbi = cc.agg(F.count("*").alias("nbi"))
    return c3, c2, cc, mid, n1, nbi


def _p_expr(discount: float):
    """The fixed interpolated-KN expression tree (identical shape to
    the SQL twin — exact-integer inputs make it bit-reproducible).
    NULL-count columns mean 'unseen': each order backs off with full
    weight; an unseen unigram continuation yields p = 0."""
    d = F.lit(discount)
    p1 = F.coalesce(F.col("n1"), F.lit(0)).cast("double") / F.col("nbi")
    p2 = F.when(
        F.col("ncc").isNotNull(),
        F.greatest(
            F.coalesce(F.col("cc"), F.lit(0)) - d, F.lit(0.0)
        ) / F.col("ncc")
        + ((d * F.col("nfol")) / F.col("ncc")) * p1,
    ).otherwise(p1)
    return F.when(
        F.col("c2").isNotNull(),
        F.greatest(
            F.coalesce(F.col("c3"), F.lit(0)) - d, F.lit(0.0)
        ) / F.col("c2")
        + ((d * F.col("n3")) / F.col("c2")) * p2,
    ).otherwise(p2)


def _join_model(scored: DataFrame, rels) -> DataFrame:
    """Left-join the count relations onto (w1, w2, w3) rows."""
    c3, c2, cc, mid, n1, nbi = rels
    return (
        scored.join(c3, on=["w1", "w2", "w3"], how="left")
        .join(c2, on=["w1", "w2"], how="left")
        .join(cc, on=["w2", "w3"], how="left")
        .join(mid, on="w2", how="left")
        .join(n1, on="w3", how="left")
        .crossJoin(F.broadcast(nbi))
    )


def kn_trigram_probs(
    train_docs: DataFrame,
    discount: float = 0.75,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train: emit ``(w1, w2, w3, p)`` for every OBSERVED trigram type
    — the materialized model head (lower-order mass is inside ``p``
    via interpolation). ``p`` is unrounded; callers round for
    hash-stable output."""
    if not 0 < discount < 1:
        raise ValueError(
            f"kn_trigram_probs: discount must be in (0,1), got {discount}"
        )
    tg = _trigram_instances(train_docs, text_col, id_col)
    rels = _kn_relations(tg)
    types = rels[0].select("w1", "w2", "w3")
    # joined onto the TYPE relation every count is present — the CASE
    # chain always takes its seen branch here
    return _join_model(types, rels).select(
        "w1", "w2", "w3", _p_expr(discount).alias("p")
    )


def kn_perplexity(
    score_docs: DataFrame,
    train_docs: DataFrame | None = None,
    discount: float = 0.75,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score: per-doc ``(id_col, n_tokens, ppl)`` where ``ppl =
    exp(−Σ ln P / n_tokens)`` over the padded trigram positions
    (``n_tokens`` = words + 1 EOS prediction). Trains on
    ``train_docs`` (default: the scored corpus itself — the CCNet
    in-domain shape). A doc containing a zero-probability token
    (unigram continuation never seen in training) reports NULL ppl —
    flagged, not floored."""
    if not 0 < discount < 1:
        raise ValueError(
            f"kn_perplexity: discount must be in (0,1), got {discount}"
        )
    rels = _kn_relations(
        _trigram_instances(
            train_docs if train_docs is not None else score_docs,
            text_col,
            id_col,
        )
    )
    inst = _trigram_instances(score_docs, text_col, id_col)
    p = _join_model(inst, rels).select(
        F.col(id_col), _p_expr(discount).alias("p")
    )
    return (
        p.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("p") > 0, F.log("p"))).alias("__ll"),
            F.count(F.when(F.col("p") > 0, F.lit(1))).alias("__npos"),
        )
        .select(
            id_col,
            "n_tokens",
            F.when(
                F.col("__npos") == F.col("n_tokens"),
                F.exp(-F.col("__ll") / F.col("n_tokens")),
            ).alias("ppl"),
        )
    )


def ppl_quality_bands(
    score_docs: DataFrame,
    train_docs: DataFrame | None = None,
    discount: float = 0.75,
    *,
    n_bands: int = 3,
    round_dp: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity quality banding (Wenzek et al. 2020):
    score every document under the Kneser–Ney model
    (:func:`kn_perplexity`) and split the corpus into ``n_bands``
    equal-population perplexity bands — band 1 = most fluent (head),
    band ``n_bands`` = least (tail); the classic curation move keeps
    head+middle. Returns ``(id_col, n_tokens, ppl, band)``; docs with
    NULL ppl (a zero-probability token — impossible when training
    in-domain on the scored corpus itself, the default) keep band
    NULL: flagged, not silently binned.

    Banding is BY VALUE, not by row rank: band(v) = 1 +
    floor(n_bands · |{ppl < v}| / n), so ties share a band and the
    result is independent of any row order. The cumulative count
    rides the DISTINCT-ppl relation (the q155 AUC idiom — its window
    is value-cardinality-bounded), never a corpus-sized global
    window, and the per-doc band attaches back with one equi-join on
    the rounded ppl. ``round_dp`` pins the band keys cross-engine
    (the per-doc ln-sum reduction order drifts ~1e-15; rounding
    BEFORE banding makes the band a pure function of the rounded
    score on any engine).
    """
    if n_bands < 2:
        raise ValueError(
            f"ppl_quality_bands: n_bands must be >= 2, got {n_bands}"
        )
    from pyspark.sql import Window

    scored = kn_perplexity(
        score_docs, train_docs, discount,
        text_col=text_col, id_col=id_col,
    ).select(
        F.col(id_col),
        "n_tokens",
        F.round("ppl", round_dp).alias("ppl"),
    )
    ok = scored.where(F.col("ppl").isNotNull())
    dist = ok.groupBy("ppl").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("ppl").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = dist.select(
        "ppl",
        F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__lo"),
    )
    tot = ok.agg(F.count(F.lit(1)).alias("__n"))
    bands = cum.crossJoin(F.broadcast(tot)).select(
        "ppl",
        F.least(
            F.lit(n_bands).cast("long"),
            F.lit(1)
            + F.floor(
                F.lit(n_bands) * F.col("__lo") / F.col("__n")
            ),
        )
        .cast("int")
        .alias("band"),
    )
    return scored.join(bands, on="ppl", how="left").select(
        id_col, "n_tokens", "ppl", "band"
    )
