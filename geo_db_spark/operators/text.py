"""Text-analysis operators for training-data pipelines (engine-growth
contract; no reference counterpart). All built-in expressions — JVM-side,
whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def word_tokens(col: Column) -> Column:
    """BPE-ish regex tokenization: words, numbers, punctuation runs."""
    return F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, alpha/space/punct
    ratios, stopword ratio. Single pass over the text column; every metric
    is an exact integer or a single IEEE division (oracle-stable).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^ ]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    n_tok = token_count(t)
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|a|an|and|or|of|to|in|is|it)\b"), 0
        )
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        (n_alpha.cast("double") / n_chars).alias("alpha_ratio"),
        (n_space.cast("double") / n_chars).alias("space_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        (n_chars.cast("double") / n_tok).alias("mean_token_len"),
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|with)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
    "de": r"\b(der|die|das|und|ist)\b",
}


def lang_scores(col: Column) -> list[Column]:
    lc = F.lower(col)
    return [
        F.size(F.regexp_extract_all(lc, F.lit(pat), 0)).alias(f"score_{lang}")
        for lang, pat in LANG_MARKERS.items()
    ]


def fingerprint(col: Column) -> Column:
    """64-bit-ish document fingerprint: md5 of the normalized text's sorted
    distinct tokens (a content fingerprint robust to token order)."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "))
    )
    return F.md5(F.array_join(toks, " ").cast("binary"))
