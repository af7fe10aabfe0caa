"""Text analysis for training-data pipelines over the ``documents`` table.

Pure Catalyst expressions (regex/length/split arithmetic) — these run inside
whole-stage codegen on the scan, so at 100 TB they cost one pass over the
text column with everything else pruned away.

Operators: token counting, quality scoring, language-ID heuristic, document
fingerprinting. Each has a DuckDB oracle twin in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "text_profile",
]

# Tiny English stopword set for the heuristic language scorer. A real
# pipeline swaps in per-language n-gram tables; the *shape* (ratio of hits
# over a broadcast lexicon, computed via split+filter) is what matters.
_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def token_count(text: Column | str) -> Column:
    """Whitespace tokenization count (BPE-ish regex splits on non-word runs)."""
    t = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(t)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + word-length sanity + alpha ratio.

    Mirrors the intent of the reference's non-empty/preview gating
    (``web/handlers/api.go:299-301``) as a graded score instead of a filter.
    """
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t).cast("double")
    n_tokens = token_count(t).cast("double")
    avg_word = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z一-鿿]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    len_band = F.when((n_chars >= 20) & (n_chars <= 10000), F.lit(1.0)).otherwise(F.lit(0.3))
    word_band = F.when((avg_word >= 2.0) & (avg_word <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return len_band * 0.4 + word_band * 0.3 + alpha_ratio * 0.3


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are English stopwords (split + filter, JVM-side)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def lang_id(text: Column | str) -> Column:
    """n-gram-free heuristic language ID: CJK char share → zh; else stopword
    ratio → en; else unknown. Deliberately simple and exactly mirrorable in
    ANSI SQL for the oracle."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t).cast("double")
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", "")).cast("double")
    cjk_ratio = F.when(n_chars > 0, cjk / n_chars).otherwise(F.lit(0.0))
    return (
        F.when(cjk_ratio > 0.3, F.lit("zh"))
        .when(stopword_ratio(t) >= 0.05, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lower-cased text (the reference fingerprints files with SHA-256,
    ``internal/app/utils/hash.go:12-25``; md5 here because both Spark and
    DuckDB expose it with identical hex output for oracle parity)."""
    t = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: tokens, quality, language, fingerprint per document."""
    t = F.col(text_col)
    return df.select(
        *df.columns,
        token_count(t).alias("n_tokens"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )
