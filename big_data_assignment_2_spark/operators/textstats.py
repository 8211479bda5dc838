"""Text analysis for training-data pipelines (extension — not in reference;
required by the north-star brief): token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is native column expressions (codegen'd, no Python on the data
path); each op has a declared query + DuckDB oracle in
``plans/text_queries.py``.  At 100 TB these are embarrassingly parallel
map-side transforms — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

# Marker-word profiles for the language-ID heuristic.  A real pipeline would
# use character n-gram profiles (à la Cavnar-Trenkle) or fastText; the
# heuristic here is deliberately tiny, deterministic, and oracle-friendly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "and", "of", "is", "in", "to", "it")

# BPE-ish pre-tokenization: word pieces OR single non-space symbols —
# the GPT-2 style contraction/word/number/symbol split, simplified to what
# both regex dialects agree on.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count (empty-safe)."""
    return F.size(tokenize(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens via regexp_count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: lengths, word-shape ratios, stopword ratio.
    All ratios rounded to 6 dp for engine parity."""
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(text_col, r"[^0-9]", ""))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(F.when(n_tok > 0, n_chars.cast("double") / n_tok)
                .otherwise(F.lit(0.0)), 6).alias("chars_per_token"),
        F.round(F.when(n_tok > 0, stop.cast("double") / n_tok)
                .otherwise(F.lit(0.0)), 6).alias("stopword_ratio"),
        F.round(F.when(n_chars > 0, alpha.cast("double") / n_chars)
                .otherwise(F.lit(0.0)), 6).alias("alpha_ratio"),
        F.round(F.when(n_chars > 0, digit.cast("double") / n_chars)
                .otherwise(F.lit(0.0)), 6).alias("digit_ratio"),
    )


def lang_scores(text_col: Column | str) -> list[Column]:
    toks = tokenize(text_col)
    return [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def predict_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax marker hits, ties → lexicographically
    first language, zero hits → 'und'."""
    scored = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                         *lang_scores(text_col))
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first lang reaching the max wins ties
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select("doc_id", *[f"score_{l}" for l in langs],
                         pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the characters of
    the whitespace-normalized text (content-defined, order-sensitive —
    unlike the token-set key used by exact dedup)."""
    from ..functions.text import char_poly_hash, normalize_whitespace

    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        char_poly_hash(normalize_whitespace(text_col)).alias("fingerprint"),
    )
