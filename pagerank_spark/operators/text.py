"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (regexp/split/length/bit aggregates) so
they run in whole-stage codegen at corpus scale and every one has an
exact DuckDB oracle twin:

- ``language_id``    — stopword-hit n-gram heuristic over a small
  per-language marker list (broadcast-free: the lists are literals
  compiled into the expression).
- ``quality_score``  — length / punctuation-ratio / stopword-ratio
  blend, the usual cheap pre-filter before expensive dedup.
- ``token_stats``    — whitespace token count plus a BPE-ish subword
  count (regex on letter-runs/digits/punctuation).
- ``fingerprint``    — order-insensitive 60-bit document fingerprint:
  bit_xor of token hashes + token count (rolling-hash-class digest,
  associative so it partial-aggregates map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions import portable_hash60, word_tokens

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["的", "是", "了", "在", "我"],
}

# BPE-ish subword splitter: letter runs, digit runs, or single
# non-space symbols — a cheap deterministic proxy for tokenizer counts.
SUBWORD_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def marker_pattern(words: list[str]) -> str:
    """Regex counting whole-word marker hits (shared with the DuckDB twin).

    \\b word boundaries so "a" matches only the word "a", never every word
    containing the letter. CJK markers skip the boundaries: they are
    non-word chars to \\b (which would then never match inside CJK runs),
    and substring matching is the correct n-gram semantics for unsegmented
    scripts anyway.
    """
    if all(w.isascii() for w in words):
        return "\\b(?:" + "|".join(words) + ")\\b"
    return "(?:" + "|".join(words) + ")"


def _marker_hits(text: Column, words: list[str]) -> Column:
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(marker_pattern(words)), F.lit(0))
    )


def language_scores(text: Column) -> list[Column]:
    return [
        _marker_hits(text, words).alias(f"hits_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by max marker hits (ties → lexicographic lang).

    The arg-max is a greatest/when chain — deterministic and portable.
    """
    text = F.col(text_col)
    scored = df.select("*", *language_scores(text))
    hit_cols = [f"hits_{lang}" for lang in LANG_MARKERS]
    best = F.greatest(*[F.col(c) for c in hit_cols])
    pred = F.lit("unknown")
    # build the when-chain in reverse so earlier (lexicographic) langs win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality features + blended score in [0, ~1].

    score = 0.4·min(len/500,1) + 0.3·(1-punct_ratio) + 0.3·stopword_ratio
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = word_tokens(text)
    n_tokens = F.size(toks)
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit("[\\.,;:!\\?]"), F.lit(0))
    )
    stop_hits = _marker_hits(text, LANG_MARKERS["en"])
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (
        F.lit(0.4) * F.least(n_chars / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stop_ratio, F.lit(1.0))
    )
    return df.select(
        "*",
        n_chars.alias("len_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 9).alias("punct_ratio"),
        F.round(stop_ratio, 9).alias("stopword_ratio"),
        F.round(score, 9).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count per row."""
    text = F.col(text_col)
    return df.select(
        "*",
        F.size(word_tokens(text)).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(text, F.lit(SUBWORD_PATTERN), F.lit(0))
        ).alias("n_subwords"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Order-insensitive 60-bit doc fingerprint: bit_xor of token hashes.

    XOR is associative/commutative → partial aggregation map-side; the
    token count disambiguates docs whose XOR collides on repeats.
    """
    tokens = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    return tokens.groupBy(id_col).agg(
        F.expr("bit_xor(" + _hash_sql("tok") + ")").alias("fingerprint"),
        F.count("*").alias("n_tokens"),
    )


def _hash_sql(col: str) -> str:
    """SQL text of portable_hash60 for use inside aggregate expressions."""
    return f"CAST(conv(substr(md5({col}),1,15),16,10) AS BIGINT)"


__all__ = [
    "LANG_MARKERS",
    "SUBWORD_PATTERN",
    "language_id",
    "quality_score",
    "token_stats",
    "fingerprint",
    "portable_hash60",
]
